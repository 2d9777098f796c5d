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
    docs.withColumn("pred_lang",
      when(sort_array(array(scored: _*), asc = false)(0)("score") > 0,
        sort_array(array(scored: _*), asc = false)(0)("lang")).otherwise("und"))
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

  /** Karp–Rabin polynomial rolling-hash document fingerprint:
    * h = Σ c_i · 131^i (mod 1e9+7) over the characters, expressed with
    * `aggregate` over the char sequence — order-sensitive (unlike md5
    * bucketing it supports incremental/windowed extension). */
  def fingerprint(docs: DataFrame): DataFrame = {
    val P = 1000000007L
    val h = aggregate(
      transform(sequence(lit(1), length(col("text"))),
        i => ascii(substring(col("text"), i, lit(1))).cast("long")),
      lit(0L), (acc, b) => pmod(acc * 131 + b, lit(P)))
    docs.select(col("doc_id"), h.as("fingerprint"))
  }
}
