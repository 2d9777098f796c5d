package graft

import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence for the north rule ("≥0.8 throughput
  * scaling efficiency from N to 4N executors"). No real cluster in this
  * sandbox (BASELINE.md), so the same job runs at 8 and 32 cores on the
  * same input — shuffle partitions scaled with cores — and
  * efficiency = (rows/s @32) / (4 × rows/s @8).
  *
  * Methodology for a NOISY shared host (observed: external load of
  * ~12 cores appearing/disappearing over minutes, individual run times
  * varying 2-15x):
  *  - alternate 8-core and 32-core sessions round-robin so slow drift
  *    in neighbor load hits both sides equally;
  *  - several runs per session, keep the MINIMUM (the least-interfered
  *    observation estimates true machine capacity);
  *  - shuffle dirs on tmpfs (/dev/shm) so the comparison is CPU-bound,
  *    not bound by the shared disk;
  *  - report per-round times + loadavg for transparency.
  *
  * Usage: runMain graft.ScalingBench [nAssign] [nPipeline] [rounds]
  */
object ScalingBench {

  /** Session with `nExec` executor JVMs x `coresPer` cores each.
    * local-cluster (separate executor JVMs, own GC — the faithful
    * "N vs 4N executors" shape) when SPARK_GRAFT_CLUSTER=1; single-JVM
    * local[n] otherwise. */
  private def session(nExec: Int, coresPer: Int): SparkSession = {
    val totalCores = nExec * coresPer
    val shm = new java.io.File("/dev/shm")
    val builder = SparkSession.builder()
      // 4x overdecomposition (matches Bench's input partitioning): with
      // exactly one shuffle partition per core, the slowest reduce task
      // stretches the stage by its full delay — smaller tasks smooth
      // stragglers, which is also the realistic many-splits 100-TB shape
      .config("spark.sql.shuffle.partitions", totalCores * 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    if (shm.isDirectory && shm.canWrite)
      builder.config("spark.local.dir", "/dev/shm/graft-shuffle")
    val s = (if (sys.env.get("SPARK_GRAFT_CLUSTER").contains("1"))
      builder
        .master(s"local-cluster[$nExec,$coresPer,6144]")
        .config("spark.jars", sys.props.getOrElse("graft.jar",
          "target/scala-2.13/tcdspark_2.13-0.1.0.jar"))
        .config("spark.executor.memory", "5g")
        // each executor JVM sized like a real cluster node: GC/JIT
        // thread pools scaled to ITS cores, not the host's 32
        .config("spark.executor.extraJavaOptions",
          s"-XX:ActiveProcessorCount=$coresPer")
    else builder.master(s"local[$totalCores]"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Best (min) wall seconds of `job` over `runsPerSession` runs in a
    * fresh session at the given shape. */
  def bestOf(nExec: Int, coresPer: Int, runsPerSession: Int,
             warm: SparkSession => Unit, job: SparkSession => Unit): Double = {
    val spark = session(nExec, coresPer)
    try {
      warm(spark)
      (1 to runsPerSession).map { _ =>
        System.gc()
        Bench.time(job(spark))._2
      }.min
    } finally spark.stop()
  }

  final case class Result(best8: Double, best32: Double, rounds: Seq[(Double, Double)])

  /** Alternate 8-core and 32-core sessions for `rounds` rounds; keep
    * global minima. */
  def alternating(rounds: Int, runsPerSession: Int, coresPer: Int,
                  warm: SparkSession => Unit, job: SparkSession => Unit): Result = {
    val pairs = (1 to rounds).map { r =>
      val tN = bestOf(1, coresPer, runsPerSession, warm, job)
      val t4N = bestOf(4, coresPer, runsPerSession, warm, job)
      System.err.println(f"[scaling] round $r: tN=$tN%.2f t4N=$t4N%.2f load=${Bench.loadavg}")
      (tN, t4N)
    }
    Result(pairs.map(_._1).min, pairs.map(_._2).min, pairs)
  }

  def main(args: Array[String]): Unit = {
    val nAssign = args.headOption.map(_.toLong).getOrElse(16000000L)
    val nPipeline = if (args.length > 1) args(1).toLong else 4000000L
    val rounds = if (args.length > 2) args(2).toInt else 3
    // N and 4N worker cores. On this shared host external load of
    // 10-19 cores is common; N=4 (4 vs 16) keeps BOTH configurations
    // within the free capacity so the ratio measures the ENGINE, not
    // the neighbors. Override with SPARK_GRAFT_BASE_CORES=8 for 8 vs 32.
    val baseCores = sys.env.getOrElse("SPARK_GRAFT_BASE_CORES", "4").toInt

    def report(job: String, rows: Long, r: Result): Unit = {
      val eff = (rows / r.best32) / (4.0 * (rows / r.best8))
      val roundsJson = r.rounds.map { case (a, b) => f"[$a%.2f,$b%.2f]" }
        .mkString("[", ",", "]")
      println(f"""{"job":"$job","rows":$rows,"cores_n":$baseCores,""" +
        f""""cores_4n":${4 * baseCores},"sec_n":${r.best8}%.3f,""" +
        f""""sec_4n":${r.best32}%.3f,"rows_per_sec_n":${(rows / r.best8).toLong},""" +
        f""""rows_per_sec_4n":${(rows / r.best32).toLong},""" +
        f""""scaling_efficiency":$eff%.3f,"rounds":$roundsJson}""")
    }

    // mode "n" / "4n": measure ONE side only (caller pins the JVM's
    // ActiveProcessorCount to that side's cores → fair GC/JIT sizing;
    // see tools/scaling_run.sh). Default "both" = alternating rounds.
    val mode = if (args.length > 3) args(3) else "both"
    if (mode == "n" || mode == "4n") {
      val nExec = if (mode == "n") 1 else 4
      val jiffies0 = Bench.cpuJiffies
      // FULL-SIZE warm-up, best of 3: JIT compile threads scale with
      // the pinned ActiveProcessorCount, so a quarter-size warm-up left
      // the short 4N-side runs partially interpreted — systematically
      // biasing measured efficiency down (probe: warm merge phase
      // scales at 0.85, semi-cold samples read 0.56-0.78)
      val aSec = (1 to rounds).map(_ => bestOf(nExec, baseCores, 3,
        s => Bench.tileAssignJobN(s, nAssign),
        s => Bench.tileAssignJobN(s, nAssign))).min
      val pSec = (1 to rounds).map(_ => bestOf(nExec, baseCores, 3,
        s => Bench.pipelineJobN(s, nPipeline),
        s => Bench.pipelineJobN(s, nPipeline))).min
      println(f"""{"mode":"$mode","cores":${nExec * baseCores},""" +
        f""""assign_rows":$nAssign,"assign_sec":$aSec%.3f,""" +
        f""""pipeline_rows":$nPipeline,"pipeline_sec":$pSec%.3f,""" +
        f""""load":"${Bench.loadavg}","steal_pct":"${Bench.stealPctSince(jiffies0)}"}""")
      return
    }
    report("tile_assign", nAssign,
      alternating(rounds, 2, baseCores, s => Bench.tileAssignJobN(s, nAssign / 4),
        s => Bench.tileAssignJobN(s, nAssign)))
    report("pipeline", nPipeline,
      alternating(rounds, 2, baseCores, s => Bench.pipelineJobN(s, nPipeline / 4),
        s => Bench.pipelineJobN(s, nPipeline)))
  }
}
