package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.GeoOps
import graft.tables.{IcebergLite, PagesGen}

/** Structured-Streaming façade over the batch engine. The reference is
  * batch-with-checkpointing (SURVEY.md §2.10 — no event-time semantics
  * exist in it), so streaming here is an INGEST mode: micro-batches of
  * pages flow through the same geocode → tile-assign operators and each
  * batch commits one IcebergLite snapshot with per-region lineage —
  * `foreachBatch` + the commit log, exactly the pattern the survey
  * prescribes. Event-time windowed aggregation with a watermark is
  * provided for completeness (`cellCountsWindowed`).
  */
object StreamingIngest {

  /** Turn a stream of page indices into the deterministic pages schema
    * (same closed-form columns as the batch generator — one code path
    * would drift, so both call PagesGen's column logic via a join-free
    * projection). */
  def pagesFromIndices(indices: DataFrame): DataFrame = {
    // Reuse the batch generator expressions by re-deriving columns from i.
    val df = indices.toDF("i")
    val spark = indices.sparkSession
    // PagesGen.pages is range-based; mirror its projections on a stream:
    PagesGen.projectColumns(df)
  }

  /** Micro-batch ingest: per batch, tile-assign and commit one snapshot
    * (stage "stream_assign") with per-region lineage. Returns the
    * writer (caller starts/awaits). */
  def ingest(spark: SparkSession, pages: DataFrame, warehouse: String,
             checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] = {
    pages.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val assigned = GeoOps.assignTiles(batch)
            .select(col("i"), col("region"), col("tile_id"), col("x"), col("y"))
          // batchId as idempotency key: replay after a crash between
          // manifest rename and checkpoint write is a no-op
          IcebergLite.commit(spark, warehouse, "stream_assign", assigned,
            "region", idempotencyKey = batchId)
          ()
        }
      }
  }

  /** Custom-state streaming: cumulative per-cell page counts maintained
    * with `mapGroupsWithState` (GroupState survives across
    * micro-batches) — the KeyValueGroupedDataset stateful-processing
    * shape for state the built-in aggregations can't express. Emits
    * (cell, running_total, batch_delta) per updated cell per batch. */
  def runningCellCounts(pages: DataFrame): Dataset[(Long, Long, Long)] = {
    import graft.functions._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val spark = pages.sparkSession
    import spark.implicits._
    pages
      .withColumn("cell", cell_encode(col("x"), col("y"), 6, 2048.0, 2048.0))
      .select(col("cell")).as[Long]
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (cell: Long, rows: Iterator[Long],
         state: org.apache.spark.sql.streaming.GroupState[Long]) => {
          val delta = rows.size.toLong
          val total = state.getOption.getOrElse(0L) + delta
          state.update(total)
          (cell, total, delta)
        })
  }

  /** Streaming exact dedup — the continuous-ingest flavor of
    * [[graft.operators.Dedup.exact]]: first-seen content hash wins
    * across micro-batches (within a batch the minimum doc_id, matching
    * the batch keeper policy); later duplicates are dropped. State is
    * one boolean per distinct hash in the state store, keyed exactly
    * like the batch groupBy. Emits (h, keeper_doc_id) once per distinct
    * document.
    *
    * SCALE CONTRACT: without a TTL the state grows one entry per
    * distinct hash FOREVER — at 10^12-doc ingest that is unbounded.
    * `ttlMs > 0` arms a processing-time timeout per hash, re-armed on
    * every sighting (TTL-of-inactivity): a hash unseen for `ttlMs` is
    * evicted and a later duplicate is RE-ADMITTED — the standard
    * bounded-state trade (exactly-once dedup within the TTL horizon,
    * at-least-once beyond it). Pair with the RocksDB state store
    * provider for out-of-heap state:
    * `spark.sql.streaming.stateStore.providerClass =
    * org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`
    * (exercised in StreamingSpec).
    *
    * Caveat: with a TTL armed the engine schedules micro-batches
    * CONTINUOUSLY (a later batch may need to fire evictions), so set a
    * real `Trigger.ProcessingTime`, and don't wait on
    * `processAllAvailable()` — the no-new-data flag it blocks on is
    * never raised while timeouts are pending. */
  def streamingDedup(docs: DataFrame, ttlMs: Long = -1L): Dataset[(String, Long)] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    docs.select(md5(col("text")).as("h"), col("doc_id").cast("long").as("doc_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (h: String, rows: Iterator[(String, Long)],
         state: org.apache.spark.sql.streaming.GroupState[Boolean]) => {
          if (state.hasTimedOut) {
            // eviction callback (no rows): drop the hash; the next
            // sighting re-admits it as a fresh first-seen
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs) // re-arm on sighting
            Iterator.empty
          } else {
            state.update(true)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            var keeper = Long.MaxValue
            rows.foreach(r => if (r._2 < keeper) keeper = r._2)
            Iterator.single((h, keeper))
          }
        })
  }

  /** Event-time tumbling-window per-cell counts with a watermark —
    * the standard streaming aggregation shape (not required by the
    * reference; provided as the engine's streaming-agg operator). */
  def cellCountsWindowed(pages: DataFrame, windowDur: String = "1 minute",
                         watermark: String = "2 minutes"): DataFrame = {
    import graft.functions._
    pages
      .withColumn("cell", cell_encode(col("x"), col("y"), 6, 2048.0, 2048.0))
      .withWatermark("warc_ts", watermark)
      .groupBy(window(col("warc_ts"), windowDur), col("cell"))
      .agg(count(lit(1)).as("cnt"))
  }
}
