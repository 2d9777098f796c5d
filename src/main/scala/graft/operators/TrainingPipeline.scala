package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed training-data corpus cleaner — the standard web-corpus
  * pipeline shape (quality filter → language id → exact dedup →
  * near-dup removal), built entirely from the engine's operators so one
  * call runs the whole flow as a single Catalyst plan per stage.
  *
  * Dedup keeps the lowest doc_id of each duplicate group (exact) and
  * drops the higher side of every near-duplicate pair (MinHash-LSH
  * candidates) — the usual keep-first policy.
  *
  * The pre-LSH stages ([[annotate]], [[exactDeduped]]) are exposed both
  * for oracle checkability (they are plain SQL) and because real
  * pipelines checkpoint between stages (IcebergLite.commit is the
  * cluster-scale checkpoint; the in-session path persists instead).
  */
object TrainingPipeline {

  /** Stage 1: language id + quality columns in ONE narrow pass (no
    * join), then the quality filter. */
  def annotate(docs: DataFrame, minTokens: Int = 5): DataFrame =
    TextOps.qualityColumns
      .foldLeft(TextOps.langId(docs)) { case (df, (n, c)) => df.withColumn(n, c) }
      .filter(col("n_tokens") >= minTokens && col("n_uniq_tokens") >= 2)

  /** Stage 2: exact dedup over the annotated corpus — keep the minimum
    * doc_id per content hash (the dedup suite's keeper policy). */
  def exactDeduped(annotated: DataFrame): DataFrame = {
    val keepers = Dedup.exact(annotated).select(col("keeper").as("doc_id"))
    annotated.join(keepers, Seq("doc_id"), "left_semi")
  }

  def cleanCorpus(docs: DataFrame, minTokens: Int = 5,
                  nearDupThrMilli: Int = 800): DataFrame = {
    // annotate is the engine's most expensive projection (8-profile
    // langId per row) and feeds the dedup agg AND the semi-join left
    // side; exactDeduped feeds the LSH input AND the anti-join left
    // side. localCheckpoint (eager) computes each ONCE and cuts the
    // lineage; unlike Dataset.persist (whose plan the CacheManager pins
    // for the whole session and leaks across calls), the checkpoint
    // blocks are RDD-level storage that the ContextCleaner frees once
    // the returned plan is garbage-collected. At cluster scale,
    // checkpoint between stages through IcebergLite.commit instead.
    val annotated = annotate(docs, minTokens).localCheckpoint()
    val deduped = exactDeduped(annotated).localCheckpoint()

    // near-dup removal: drop the b side of every MinHash-LSH pair
    val nearDupLosers = Dedup.minhashLshPairs(deduped,
        n = 3, numHashes = 32, bands = 8, thrMilli = nearDupThrMilli)
      .select(col("b").as("doc_id")).distinct()
    deduped.join(nearDupLosers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("text"), col("pred_lang"),
        col("n_tokens"), col("n_uniq_tokens"))
  }
}
