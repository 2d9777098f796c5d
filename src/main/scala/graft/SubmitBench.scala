package graft

import org.apache.spark.sql.SparkSession

/** The literal-`spark-submit` side of the scaling evidence: one
  * cluster size per submission, master and executor shape taken
  * ENTIRELY from the submit environment (`tools/scaling_submit.sh`
  * submits this class at `local-cluster[1,C]` then `[4,C]` and
  * computes the N→4N efficiency from the two printed JSON lines).
  * Runs the same two jobs as [[ScalingBench]] ([[Bench.tileAssignJobN]]
  * / [[Bench.pipelineJobN]]) with the same protocol: full-size warm-up,
  * best-of-3, shuffle overdecomposed 4× the cluster's cores. */
object SubmitBench {

  def main(args: Array[String]): Unit = {
    val nAssign = args.headOption.map(_.toLong).getOrElse(24000000L)
    val nPipeline = if (args.length > 1) args(1).toLong else 6000000L
    val builder = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
    if (!sys.props.contains("spark.master")) {
      // bare-java fallback only: same conventions as Bench/ScalingBench
      // (cores from SPARK_GRAFT_CPUS, tmpfs shuffle) so ad-hoc runs are
      // comparable to the documented protocol
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
      builder.master(s"local[$cpus]").config("spark.ui.enabled", "false")
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite)
        builder.config("spark.local.dir", "/dev/shm/graft-shuffle")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // cluster width from the MASTER STRING, not defaultParallelism:
    // right after startup executors haven't registered yet and
    // defaultParallelism reads its 2-core floor — sizing the shuffle
    // from that would under-decompose the 4N side 4×
    val cores = "local-cluster\\[(\\d+),(\\d+),\\d+\\]".r
      .findFirstMatchIn(spark.sparkContext.master)
      .map(m => m.group(1).toInt * m.group(2).toInt)
      .getOrElse { // local[n] / yarn: force a job so executors register
        spark.range(1L << 20).count()
        spark.sparkContext.defaultParallelism
      }
    // same overdecomposition as ScalingBench (straggler smoothing;
    // the realistic many-splits shape); the bench parallelism override
    // makes even the FIRST warm-up generate input at the cluster's real
    // width (defaultParallelism still reads its floor at this point)
    spark.conf.set("spark.sql.shuffle.partitions", (cores * 4).toString)
    spark.conf.set("graft.bench.parallelism", cores.toString)
    def bestOf(job: => Unit): Double = {
      job // full-size warm-up (JIT at this cluster's thread count)
      (1 to 3).map { _ => System.gc(); Bench.time(job)._2 }.min
    }
    val jiffies0 = Bench.cpuJiffies
    val aSec = bestOf(Bench.tileAssignJobN(spark, nAssign))
    val pSec = bestOf(Bench.pipelineJobN(spark, nPipeline))
    println(f"""{"master":"${spark.sparkContext.master}","cores":$cores,""" +
      f""""assign_rows":$nAssign,"assign_sec":$aSec%.3f,""" +
      f""""pipeline_rows":$nPipeline,"pipeline_sec":$pSec%.3f,""" +
      f""""load":"${Bench.loadavg}","steal_pct":"${Bench.stealPctSince(jiffies0)}"}""")
    spark.stop()
  }
}
