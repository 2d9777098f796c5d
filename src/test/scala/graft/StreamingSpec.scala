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
