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
    * (ties → lexicographically first language), 'und' when no hit.
    *
    * Tokenization stays the built-in `split(lower(text), ...)` (so it
    * can never drift from the oracle's replica); the 8-profile scoring
    * + argmax — previously 8 × `filter(toks, isin(10 words))` HOFs
    * plus a `sort_array` over 8 structs per row, all interpreted — is
    * one [[LangIdPick]] expression doing a single hash-map pass over
    * the tokens (identical result: same membership test, same
    * alphabetical tie-break, same 'und' fallback; parity with the HOF
    * formulation is asserted by OpsSpec on the sf0.01 corpus). */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = split(lower(col(textCol)), "[\\s\\p{Punct}]+")
    docs.withColumn("pred_lang",
      org.apache.spark.sql.graft.Bridge.column(
        LangIdPick(org.apache.spark.sql.graft.Bridge.expression(toks))))
  }

  /** The HOF formulation [[langId]] replaced — kept as the reference
    * for the OpsSpec parity pin (one definition each, compared on the
    * real corpus). */
  private[graft] def langIdHof(docs: DataFrame, textCol: String = "text"): DataFrame = {
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

  /** Static lookup behind [[LangIdPick]]: token → bitmask of profile
    * languages containing it, over the alphabetically sorted language
    * list (the argmax order). Built once per JVM. */
  private[operators] object LangIdKernel {
    import org.apache.spark.unsafe.types.UTF8String
    val sortedLangs: Array[String] = Profiles.keys.toArray.sorted
    val langStrings: Array[UTF8String] =
      sortedLangs.map(UTF8String.fromString)
    val Und: UTF8String = UTF8String.fromString("und")
    private val wordMask: java.util.HashMap[UTF8String, Integer] = {
      val m = new java.util.HashMap[UTF8String, Integer]()
      sortedLangs.zipWithIndex.foreach { case (lang, i) =>
        Profiles(lang).foreach { w =>
          val k = UTF8String.fromString(w)
          val prev = m.get(k)
          m.put(k, if (prev == null) (1 << i) else (prev | (1 << i)))
        }
      }
      m
    }

    /** Argmax language over token membership counts — identical to the
      * HOF formulation: per-language score = count of tokens in that
      * profile (duplicates count), max score wins, ties go to the
      * alphabetically first language, score 0 → "und". Null token
      * elements score nothing (isin(null) is null → filter drops). */
    def pick(toks: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
      val counts = new Array[Int](sortedLangs.length)
      val n = toks.numElements()
      var i = 0
      while (i < n) {
        if (!toks.isNullAt(i)) {
          val m = wordMask.get(toks.getUTF8String(i))
          if (m != null) {
            var bits = m.intValue()
            while (bits != 0) {
              val b = java.lang.Integer.numberOfTrailingZeros(bits)
              counts(b) += 1
              bits &= bits - 1
            }
          }
        }
        i += 1
      }
      var best = 0
      var bi = 1
      while (bi < counts.length) {
        if (counts(bi) > counts(best)) best = bi // strict >: first wins ties
        bi += 1
      }
      if (counts(best) <= 0) Und else langStrings(best)
    }
  }

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

/** Language pick over a pre-split token array (see
  * [[TextOps.langId]]): one interpreted expression call running a
  * single hash-map pass, replacing 8 interpreted `filter`+`isin` HOFs
  * and a struct `sort_array` per row. Tokenization is NOT part of this
  * expression — the child stays the built-in `split(lower(text))`, so
  * the token stream is byte-identical to the oracle replica's. Null
  * input (null text) yields "und", matching the HOF formulation's
  * `when(score > 0, lang).otherwise('und')` on an all-null score row. */
case class LangIdPick(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.StringType
  override def nullable: Boolean = false
  override def prettyName: String = "lang_id_pick"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) TextOps.LangIdKernel.Und
    else TextOps.LangIdKernel.pick(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): LangIdPick = copy(child = c)
}
