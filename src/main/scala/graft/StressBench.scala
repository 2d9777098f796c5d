package graft

import scala.jdk.CollectionConverters._

/** 10× DATA-scale stress for the two headline jobs at one topology —
  * the sandbox analogue of "would this plan survive a 100-TB input".
  * Each job runs at the reference input size and at `factor`× that
  * size in the shared Bench.localSession shape (SPARK_GRAFT_CPUS
  * cores, default 32, × 4 shuffle over-decomposition — the JSON
  * carries `cores` and `xmx_mb` so the artifact self-identifies its
  * engine); it reports rows/sec at both sizes,
  * the data-scaling ratio (rate_big / rate_small — fixed costs
  * amortize, so a healthy plan holds ≳1; a knee means some stage
  * stopped streaming), and the peak JVM heap across the big runs (a
  * plan that buffers proportionally to input would show here long
  * before a real cluster OOMs).
  *
  * Usage: runMain graft.StressBench [nAssign] [nPipeline] [factor] [runs]
  */
object StressBench {

  /** Sum of per-pool peak heap usage since the last reset — an upper
    * bound on concurrent heap use, good enough for the "no
    * proportional buffering" check (footprint, not precision). */
  private def heapPools =
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
  private def resetPeaks(): Unit = heapPools.foreach(_.resetPeakUsage())
  private def peakHeapMb(): Long =
    heapPools.map(_.getPeakUsage.getUsed).sum / (1024 * 1024)

  def main(args: Array[String]): Unit = {
    val nAssign = args.headOption.map(_.toLong).getOrElse(24000000L)
    val nPipeline = if (args.length > 1) args(1).toLong else 6000000L
    val factor = if (args.length > 2) args(2).toInt else 10
    val runs = if (args.length > 3) args(3).toInt else 2
    // mirror Bench.main — the shared-localSession rationale (stress and
    // bench on ONE engine configuration) extends to the core count; a
    // hardcoded 32 on a smaller host oversubscribes and mixes
    // scheduling noise into the rate ratio
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // same 4× shuffle over-decomposition as the scaling bench — the
    // realistic many-splits shape, and straggler insurance
    val spark = Bench.localSession(cores, cores * 4)

    def stress(job: String, small: Long,
               run: Long => Unit): Unit = {
      // sample BEFORE the warm-up so loadavg_start means the same
      // thing as Bench's: pre-work external load, not our own warm-up
      val loadBefore = Bench.loadavg
      val jiffies0 = Bench.cpuJiffies
      run(small) // warm-up: JIT + codegen
      def best(n: Long): Double = (1 to runs).map { _ =>
        System.gc()
        Bench.time(run(n))._2
      }.min
      val sSmall = best(small)
      val big = small * factor
      System.gc()
      resetPeaks()
      val sBig = best(big)
      val peakMb = peakHeapMb()
      val rateSmall = (small / sSmall).toLong
      val rateBig = (big / sBig).toLong
      val ratio = rateBig.toDouble / rateSmall
      println(f"""{"job":"$job","rows_small":$small,"sec_small":$sSmall%.2f,""" +
        f""""rows_per_sec_small":$rateSmall,"rows_big":$big,"sec_big":$sBig%.2f,""" +
        f""""rows_per_sec_big":$rateBig,"rate_ratio_big_over_small":$ratio%.3f,""" +
        f""""peak_heap_mb_big":$peakMb,"runs":$runs,"cores":$cores,""" +
        f""""xmx_mb":${Runtime.getRuntime.maxMemory / (1024 * 1024)},""" +
        f""""loadavg_start":"$loadBefore","loadavg_end":"${Bench.loadavg}",""" +
        f""""steal_pct":"${Bench.stealPctSince(jiffies0)}"}""")
    }

    stress("tile_assign", nAssign, n => { Bench.tileAssignJobN(spark, n); () })
    stress("pipeline", nPipeline, n => { Bench.pipelineJobN(spark, n); () })
    spark.stop()
  }
}
