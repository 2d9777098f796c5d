package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingIngest
import graft.tables.{IcebergLite, PagesGen}

/** Structured-Streaming façade: micro-batch ingest through the same
  * operators, committing IcebergLite snapshots; watermarked windowed
  * aggregation. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("foreachBatch ingest commits snapshots; stream rows equal batch rows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Long]
    val pages = StreamingIngest.pagesFromIndices(mem.toDF())
    val wh = java.nio.file.Files.createTempDirectory("stream_wh").toString
    val cp = java.nio.file.Files.createTempDirectory("stream_cp").toString

    mem.addData(0L until 2000L: _*)
    val q = StreamingIngest.ingest(spark, pages, wh, cp).start()
    q.awaitTermination(60000)

    val assigned = IcebergLite.read(spark, wh, "stream_assign").get
    // identical to the batch path on the same indices
    val batch = graft.operators.GeoOps.assignTiles(PagesGen.pages(spark, 2000))
      .select(col("i"), col("tile_id"))
    assert(assigned.count() === batch.count())
    val streamSet = assigned.select("i", "tile_id").collect().map(_.toString()).toSet
    val batchSet = batch.collect().map(_.toString()).toSet
    assert(streamSet === batchSet)
    // lineage recorded per region
    assert(IcebergLite.committedKeys(spark, wh, "stream_assign").get.count() >= 1)

    // second increment appends a new snapshot, no reprocessing of batch 1
    mem.addData(2000L until 3000L: _*)
    val q2 = StreamingIngest.ingest(spark, pages, wh, cp).start()
    q2.awaitTermination(60000)
    assert(IcebergLite.read(spark, wh, "stream_assign").get.count() ===
      graft.operators.GeoOps.assignTiles(PagesGen.pages(spark, 3000)).count())
  }

  test("mapGroupsWithState running cell counts accumulate across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Long]
    val pages = StreamingIngest.pagesFromIndices(mem.toDF())
    val q = StreamingIngest.runningCellCounts(pages)
      .toDF("cell", "total", "delta")
      .writeStream.format("memory").queryName("running_counts")
      .outputMode("update").start()
    mem.addData(0L until 500L: _*)
    q.processAllAvailable()
    val t1 = spark.sql("SELECT sum(delta) FROM running_counts").head().getLong(0)
    assert(t1 === 500L)
    mem.addData(500L until 1000L: _*)
    q.processAllAvailable()
    q.stop()
    // totals are cumulative: the latest total per cell sums to 1000
    val latest = spark.sql(
      """SELECT sum(total) FROM (
        |  SELECT cell, max(total) AS total FROM running_counts GROUP BY cell)""".stripMargin)
      .head().getLong(0)
    assert(latest === 1000L)
    assert(spark.sql("SELECT sum(delta) FROM running_counts").head().getLong(0) === 1000L)
  }

  test("streaming exact dedup: first-seen wins within and across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = StreamingIngest.streamingDedup(docs)
      .toDF("h", "keeper")
      .writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    // batch 1: 10 distinct texts, each duplicated once (ids 100+)
    mem.addData((0L until 10L).map(i => (i, s"text $i")) ++
      (0L until 10L).map(i => (100L + i, s"text $i")): _*)
    q.processAllAvailable()
    val out1 = spark.sql("SELECT keeper FROM stream_dedup").collect().map(_.getLong(0)).sorted
    assert(out1.toSeq === (0L until 10L), "within-batch dedup keeps min doc_id")
    // batch 2: 5 replays of old texts + 5 new
    mem.addData((0L until 5L).map(i => (200L + i, s"text $i")) ++
      (0L until 5L).map(i => (300L + i, s"new $i")): _*)
    q.processAllAvailable()
    q.stop()
    val out2 = spark.sql("SELECT keeper FROM stream_dedup").collect().map(_.getLong(0)).sorted
    // cross-batch replays dropped; only the 5 new docs appended
    assert(out2.toSeq === (0L until 10L) ++ (300L until 305L))
    // matches the batch keeper policy on the union of all input
    val all = ((0L until 10L).map(i => (i, s"text $i")) ++
      (0L until 10L).map(i => (100L + i, s"text $i")) ++
      (0L until 5L).map(i => (200L + i, s"text $i")) ++
      (0L until 5L).map(i => (300L + i, s"new $i"))).toDF("doc_id", "text")
    val batchKeepers = graft.operators.Dedup.exact(all)
      .select("keeper").collect().map(_.getLong(0)).sorted
    assert(out2.toSeq === batchKeepers.toSeq)
  }

  test("streaming dedup TTL: expired state re-admits a hash") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    // generous TTL: the within-horizon check below requires the
    // duplicate's batch to process within ttlMs of the first sighting —
    // batches run every 200 ms, so 5 s absorbs multi-second GC/JIT
    // stalls on a loaded host without making the test flaky
    val ttlMs = 5000L
    // NOTE: processAllAvailable() CANNOT be used here — with
    // ProcessingTimeTimeout armed, the stateful operator's
    // shouldRunAnotherBatch is always true (a later batch may need to
    // fire evictions), so the engine never raises the no-new-data flag
    // that call waits on. The engine instead runs micro-batches
    // continuously; the test polls the sink with a deadline.
    val q = StreamingIngest.streamingDedup(docs, ttlMs)
      .toDF("h", "keeper")
      .writeStream.format("memory").queryName("stream_dedup_ttl")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
      .start()
    try {
      def keepers() =
        spark.sql("SELECT keeper FROM stream_dedup_ttl").collect().map(_.getLong(0)).sorted.toSeq
      def awaitKeepers(expect: Seq[Long], why: String): Unit = {
        val deadline = System.currentTimeMillis + 60000
        while (System.currentTimeMillis < deadline && keepers() != expect) Thread.sleep(100)
        assert(keepers() === expect, why)
      }
      mem.addData((1L, "dup text"))
      awaitKeepers(Seq(1L), "first sighting emits")
      // within the TTL horizon the duplicate is still dropped: wait until
      // the duplicate's batch is fully processed (the marker doc from the
      // SAME addData call proves it), then check nothing extra appeared
      mem.addData((5L, "dup text"), (50L, "marker text"))
      awaitKeepers(Seq(1L, 50L), "duplicate within TTL horizon is dropped")
      // let the TTL lapse; the engine's continuous timeout batches evict
      // the idle hash, and the next sighting is re-admitted fresh
      Thread.sleep(ttlMs + 1500)
      mem.addData((7L, "dup text"))
      awaitKeepers(Seq(1L, 7L, 50L),
        "hash unseen for > TTL must be re-admitted after state eviction")
    } finally q.stop() // TTL-armed queries batch FOREVER — never leak one
  }

  test("streaming dedup runs on the RocksDB state store provider (scale conf smoke)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // The documented 100-TB configuration: out-of-heap RocksDB state
    // (provider ships in spark-sql) + changelog checkpointing so a
    // batch commit uploads an incremental log, not a full snapshot
    // zip. One micro-batch only — the provider's per-batch commit is
    // heavyweight on this sandbox FS, and the TTL state-machine logic
    // is already covered store-independently above.
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val partsKey = "spark.sql.shuffle.partitions"
    val changelogKey = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val prev = spark.conf.getOption(provKey)
    val prevParts = spark.conf.get(partsKey)
    val prevChangelog = spark.conf.getOption(changelogKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(partsKey, "2") // state store count fixes at query start
    spark.conf.set(changelogKey, "true")
    try {
      val mem = MemoryStream[(Long, String)]
      val q = StreamingIngest.streamingDedup(mem.toDF().toDF("doc_id", "text"))
        .toDF("h", "keeper")
        .writeStream.format("memory").queryName("stream_dedup_rocks")
        .outputMode("append").start()
      try {
        mem.addData((1L, "a"), (2L, "a"), (3L, "b"))
        q.processAllAvailable()
      } finally q.stop() // don't leak the query if the batch throws
      val out = spark.sql("SELECT keeper FROM stream_dedup_rocks")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(out === Seq(1L, 3L), "dedup semantics identical on RocksDB state")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
      spark.conf.set(partsKey, prevParts)
      prevChangelog match {
        case Some(v) => spark.conf.set(changelogKey, v)
        case None => spark.conf.unset(changelogKey)
      }
    }
  }

  test("watermarked windowed cell counts aggregate by event time") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Long]
    val pages = StreamingIngest.pagesFromIndices(mem.toDF())
    val agg = StreamingIngest.cellCountsWindowed(pages, "1 minute", "2 minutes")
    val q = agg.writeStream.format("memory").queryName("cell_counts")
      .outputMode("update").start()
    mem.addData(0L until 1000L: _*)
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT sum(cnt) FROM cell_counts").head().getLong(0)
    assert(rows === 1000L)
  }
}
