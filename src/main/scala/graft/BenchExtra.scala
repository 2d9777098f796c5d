package graft

/** Optimization-round measurement harness (guide §1.4): isolates
  * individual queries from [[SparkEntry.queries]] under EXACTLY the
  * per-query conditions of [[Bench]] (same session recipe, same
  * shuffle shape, same outputHash action) but with a configurable
  * sample count, per-query output hash (instant result-drift
  * detection while optimizing), and optional `.explain("formatted")`
  * dumps for the plan evidence in plans/r08/.
  *
  * This is a SEPARATE main on purpose: Bench.scala is frozen for
  * measurement; extra benchmarks live here (round-8 rules).
  *
  * Usage: runMain graft.BenchExtra [query ...]
  *   env SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
  *   env SPARK_GRAFT_CPUS     cores (default 32)
  *   env GRAFT_REPEATS        timed samples per query (default 3)
  *   env GRAFT_PLANS_DIR      if set, write <dir>/<query>.txt explain
  *   no query args = the full SparkEntry.queries surface
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repeats = sys.env.getOrElse("GRAFT_REPEATS", "3").toInt
    val plansDir = sys.env.get("GRAFT_PLANS_DIR")
    val spark = Bench.localSession(cpus, cpus)

    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    val jiffies0 = Bench.cpuJiffies
    val load0 = Bench.loadavg
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(s"bench-extra: $name")
      plansDir.foreach { dir =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(dir, s"$name.txt"), plan)
      }
      var hash = 0L
      val samples = (1 to repeats).map { _ =>
        System.gc()
        val (h, sec) = Bench.time(Bench.outputHash(fn(spark, sfDir)))
        hash = h
        sec
      }
      spark.sparkContext.setJobDescription(null)
      (name, samples, hash)
    }
    val qs = results.map { case (n, ss, h) =>
      s""""$n":{"samples":[${ss.map(s => f"$s%.3f").mkString(",")}],""" +
        s""""min":${f"${ss.min}%.3f"},"hash":$h}"""
    }.mkString("{", ",", "}")
    println(
      s"""{"bench_extra":$qs,"sf":"$sfDir","cores":$cpus,""" +
        s""""loadavg_start":"$load0","loadavg_end":"${Bench.loadavg}",""" +
        s""""steal_pct":"${Bench.stealPctSince(jiffies0)}"}""")
    spark.stop()
  }
}
