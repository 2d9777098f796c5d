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
  */
object TrainingPipeline {

  def cleanCorpus(docs: DataFrame, minTokens: Int = 5,
                  nearDupThrMilli: Int = 800): DataFrame = {
    // 1. quality + language annotation in ONE narrow pass (no join)
    val annotated = TextOps.qualityColumns
      .foldLeft(TextOps.langId(docs)) { case (df, (n, c)) => df.withColumn(n, c) }
      .filter(col("n_tokens") >= minTokens && col("n_uniq_tokens") >= 2)

    // 2. exact dedup: keep the minimum doc_id per content hash (the
    // dedup suite's keeper policy — Dedup.exact)
    val keepers = Dedup.exact(annotated).select(col("keeper").as("doc_id"))
    val exactDeduped = annotated.join(keepers, Seq("doc_id"), "left_semi")

    // 3. near-dup removal: drop the b side of every MinHash-LSH pair
    val nearDupLosers = Dedup.minhashLshPairs(exactDeduped,
        n = 3, numHashes = 32, bands = 8, thrMilli = nearDupThrMilli)
      .select(col("b").as("doc_id")).distinct()
    exactDeduped.join(nearDupLosers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("text"), col("pred_lang"),
        col("n_tokens"), col("n_uniq_tokens"))
  }
}
