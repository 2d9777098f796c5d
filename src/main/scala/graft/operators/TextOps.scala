package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: language id,
  * quality statistics, token counting, document fingerprinting. All
  * declarative column expressions (regexp / higher-order functions) —
  * no UDFs, everything whole-stage-codegen-eligible except the HOFs.
  */
object TextOps {

  /** Tiny per-language stopword profiles for the n-gram/stopword
    * heuristic language identifier. Public-knowledge function words. */
  val Profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu", "mit", "den"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "une", "du", "dans"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en", "un", "por", "con"),
    "pt" -> Seq("o", "a", "de", "que", "e", "do", "da", "em", "um", "para"),
    "ru" -> Seq("и", "в", "не", "на", "что", "с", "он", "как", "это", "по"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "他", "这", "中", "不"),
    "ja" -> Seq("の", "に", "は", "を", "た", "が", "で", "て", "と", "です"))

  /** Heuristic language id: score = #tokens in each profile; argmax
    * (ties → lexicographically first language), 'und' when no hit. */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = split(lower(col(textCol)), "[\\s\\p{Punct}]+")
    val langs = Profiles.toSeq.sortBy(_._1)
    // prio descends with lexicographic rank so the descending struct
    // sort breaks score ties by FIRST language alphabetically
    val scored = langs.zipWithIndex.map { case ((lang, words), idx) =>
      struct(size(filter(toks, t => t.isin(words: _*))).as("score"),
        lit(langs.size - idx).as("prio"), lit(lang).as("lang"))
    }
    // hoist the scored sort into ONE named column: CollapseProject keeps
    // multiply-referenced non-cheap aliases in their own projection, so
    // the 8-profile scan + sort runs once per row, not twice
    docs.withColumn("_lang_best", sort_array(array(scored: _*), asc = false)(0))
      .withColumn("pred_lang",
        when(col("_lang_best")("score") > 0, col("_lang_best")("lang")).otherwise("und"))
      .drop("_lang_best")
  }

  /** Quality statistic columns (integer-valued → oracle-exact):
    * n_tokens, n_uniq_tokens, total_token_chars, n_punct, n_stopwords.
    * Exposed as named columns so callers can annotate in place (one
    * narrow pass, no join). */
  def qualityColumns: Seq[(String, Column)] = {
    val toks = split(col("text"), " ")
    val stop = Seq("the", "a", "and", "of", "to", "in", "is")
    Seq(
      "n_tokens" -> size(toks).cast("long"),
      "n_uniq_tokens" -> size(array_distinct(toks)).cast("long"),
      "total_token_chars" -> (length(col("text")) - (size(toks) - 1)).cast("long"),
      "n_punct" -> (length(col("text")) -
        length(regexp_replace(col("text"), "[,.!?;:]", ""))).cast("long"),
      "n_stopwords" -> size(filter(toks, t => t.isin(stop: _*))).cast("long"))
  }

  def qualityStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id") +: qualityColumns.map { case (n, c) => c.as(n) }: _*)

  /** BPE-ish token count: alnum runs + each non-alnum non-space char
    * counts as one token (regexp_extract_all — same regex class in
    * DuckDB for the oracle). */
  def tokenCount(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit("[A-Za-z0-9]+|[^A-Za-z0-9 ]"), lit(0)))
        .cast("long").as("n_bpe_tokens"))

  /** Karp–Rabin polynomial rolling-hash document fingerprint: left fold
    * h = (h·131 + codepoint) mod 1e9+7 — order-sensitive (unlike md5
    * bucketing it supports incremental/windowed extension). One linear
    * imperative pass per row in `mapPartitions` (the sanctioned escape
    * hatch, like [[Dedup.simhash]]): the previous column formulation —
    * `ascii(substring(text, i, 1))` inside `transform(sequence(...))` —
    * re-walked the string per character, O(n²) per document (a 100 KB
    * doc ≈ 10¹⁰ char ops; scale-killer). Matches the DuckDB
    * `list_reduce` oracle exactly; null text hashes like empty. */
  def fingerprint(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val P = 1000000007L
    // Option[Long] id: a null (or non-numeric, cast -> null) doc_id
    // passes through as null instead of crashing the primitive decoder
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Option[Long], String)]
      .mapPartitions { rows =>
        rows.map { case (id, text0) =>
          val text = if (text0 == null) "" else text0
          var h = 0L
          var i = 0
          while (i < text.length) {
            val cp = text.codePointAt(i)
            h = (h * 131 + cp) % P
            i += Character.charCount(cp)
          }
          (id, h)
        }
      }.toDF("doc_id", "fingerprint")
  }
}
