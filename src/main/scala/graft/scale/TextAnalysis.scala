package graft.scale

import graft.{QueryModule, Tables => T}
import graft.scale.Layout.widen
import graft.functions.PortableFuncs._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Text-analysis operators for LLM training-data pipelines (BASELINE
  * north star): language ID (stopword/n-gram heuristic), quality
  * scoring, token counting, document fingerprinting — all over the
  * `documents` table.
  *
  * Scale design: every operator here is a pure per-row projection of
  * codegen'd built-ins (regexp, array lambdas, md5) — embarrassingly
  * parallel, zero shuffles, pipelined inside WholeStageCodegen over
  * the parquet scan. At 100 TB these run at scan speed.
  */
object TextAnalysis extends QueryModule {

  /** Tiny per-language stopword lists (ASCII-only — the normalizer
    * strips accents). Order of comparison below is the deterministic
    * tie-break: en > de > fr > es.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "a"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "auf", "zu"),
    "fr" -> Seq("le", "les", "et", "des", "est", "dans", "que", "pour", "une", "du"),
    "es" -> Seq("el", "los", "de", "que", "y", "en", "un", "por", "con", "para")
  )

  private def stopHits(ws: Column, list: Seq[String]): Column =
    size(filter(ws, w => array_contains(array(list.map(lit): _*), w)))

  /** Heuristic language ID: stopword hit counts per language, argmax
    * with fixed-order tie-break; compared against the labeled `lang`. */
  def langId(docs0: DataFrame): DataFrame = {
    val docs = widen(docs0)
    val ws = words(col("text"))
    val scored = docs.select(
      (Seq(col("doc_id"), col("lang")) ++
        stopwords.map { case (l, list) => stopHits(ws, list).as(s"score_$l") }): _*)
    val langs = stopwords.map(_._1)
    val pred = argmaxLang(langs, l => col(s"score_$l"))
    scored.select(
      (Seq(col("doc_id"), col("lang")) ++
        langs.map(l => col(s"score_$l")) ++
        Seq(pred.as("pred_lang"))): _*)
  }

  /** Characteristic character n-grams per language — the classic
    * Cavnar-Trenkle-style profile signal, sub-word where [[stopwords]]
    * is word-level; counts are non-overlapping substring occurrences,
    * identical semantics in Spark's regexp_count and DuckDB's
    * regexp_extract_all. */
  val charNgrams: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("th", "ing", "wh", "ow"),
    "de" -> Seq("sch", "ich", "ung", "ei"),
    "fr" -> Seq("eur", "que", "oux", "ai"),
    "es" -> Seq("cion", "ado", "os", "ar")
  )

  private def argmaxLang(langs: Seq[String], score: String => Column): Column =
    langs.init.foldRight(lit(langs.last): Column) { (l, rest) =>
      val geAll = langs.filter(_ != l).map(o => score(l) >= score(o)).reduce(_ && _)
      when(geAll, lit(l)).otherwise(rest)
    }

  /** Doc-level language ID from character n-gram profiles, rolled up as
    * a label × prediction confusion matrix — the aggregate a corpus
    * audit reads. Pure projection + one hash-aggregate. */
  def langNgramConfusion(docs0: DataFrame): DataFrame = {
    val docs = widen(docs0)
    val t = lower(col("text"))
    val scored = docs.select(
      (Seq(col("doc_id"), col("lang")) ++
        charNgrams.map { case (l, ngs) =>
          ngs.map(ng => regexp_count(t, lit(ng))).reduce(_ + _).as(s"ng_$l")
        }): _*)
    val pred = argmaxLang(charNgrams.map(_._1), l => col(s"ng_$l"))
    scored.groupBy(col("lang"), pred.as("pred_lang"))
      .agg(count(lit(1)).as("n"))
  }

  /** Quality scoring: length / punctuation / stopword / word-shape
    * signals folded into one deterministic [0,1] score. */
  def qualityScore(docs0: DataFrame): DataFrame = {
    val docs = widen(docs0)
    val ws = words(col("text"))
    val nWords = greatest(size(ws), lit(1))
    val nChars = greatest(length(col("text")), lit(1))
    val stopRatio = stopHits(ws, stopwords.head._2).cast("double") / nWords
    val punctRatio = regexp_count(col("text"), lit("[.,;:!?]")).cast("double") / nChars
    val digitRatio = regexp_count(col("text"), lit("[0-9]")).cast("double") / nChars
    val avgWlen = length(array_join(ws, "")).cast("double") / nWords
    val quality = least(size(ws).cast("double") / 100d, lit(1.0)) * 0.5 +
      stopRatio * 0.3 + (lit(1.0) - punctRatio) * 0.2
    docs.select(
      col("doc_id"),
      size(ws).as("n_words"),
      round(avgWlen, 4).as("avg_wlen"),
      round(stopRatio, 4).as("stop_ratio"),
      round(punctRatio, 4).as("punct_ratio"),
      round(digitRatio, 4).as("digit_ratio"),
      round(quality, 4).as("quality"))
  }

  /** Token counting: whitespace tokens, a BPE-ish regex segmentation
    * (letter runs / digit runs / single symbols), and the chars/4
    * heuristic LLM-token estimate. */
  def tokenCount(docs: DataFrame): DataFrame =
    widen(docs).select(
      col("doc_id"),
      size(filter(split(trim(col("text")), "\\s+"), w => w =!= "")).as("ws_tokens"),
      regexp_count(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).as("bpe_tokens"),
      ceil(length(col("text")).cast("double") / 4d).cast("long").as("est_llm_tokens"))

  /** Document fingerprinting: md5 content fingerprint over normalized
    * text, a 60-bit portable hash, and a polynomial rolling hash over
    * the word sequence (mod 2^31-1) — order-sensitive, unlike md5 of
    * the bag of words. */
  def fingerprint(docs0: DataFrame): DataFrame = {
    val docs = widen(docs0)
    val M = 2147483647L
    val ws = words(col("text"))
    val rolling = aggregate(
      transform(ws, w => portableHash60(w) % M),
      lit(0L),
      (acc, h) => (acc * 31L + h) % M)
    docs.select(
      col("doc_id"),
      md5(normText(col("text"))).as("fp_md5"),
      portableHash60(normText(col("text"))).as("fp60"),
      rolling.as("fp_rolling"))
  }

  /** Corpus-statistics commonness score: how boilerplate-heavy a
    * document is, measured against the corpus itself — phase 1 builds
    * the corpus word-frequency table (one hash-aggregate), phase 2
    * joins it back per word occurrence and rolls up per document. The
    * classic two-phase shape (aggregate → join-back) of every
    * corpus-relative signal (TF-IDF, LM scoring).
    *
    * Determinism: the per-doc rollup sums corpus COUNTS (integers —
    * order-independent, unlike a double sum across partitions); the
    * only float op is one final division per row (IEEE-exact both
    * engines). Log-prob scoring would need `ln`, whose libm results
    * differ across engines by ulps — deliberately avoided. */
  def commonness(docs0: DataFrame): DataFrame = {
    val docs = widen(docs0)
    val w = docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
    val freq = w.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    w.join(freq, "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("cnt")).as("tot_freq"))
      .select(col("doc_id"), col("n_words"), col("tot_freq"),
        (col("tot_freq").cast("double") / col("n_words")).as("avg_freq"))
  }

  /** Corpus stats rollup per (lang, source): doc counts + char-length
    * distribution — one hash-aggregate pass. */
  def corpusStats(docs: DataFrame): DataFrame =
    docs.groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 2).as("avg_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        min(col("doc_id")).as("first_doc"))

  // ---- driver-gate query registry ----

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_lang_id" -> ((s, d) => langId(T.documents(s, d))),
    "q34_quality_score" -> ((s, d) => qualityScore(T.documents(s, d))),
    "q35_token_count" -> ((s, d) => tokenCount(T.documents(s, d))),
    "q36_fingerprint" -> ((s, d) => fingerprint(T.documents(s, d))),
    "q37_corpus_stats" -> ((s, d) => corpusStats(T.documents(s, d))),
    "q46_lang_ngram" -> ((s, d) => langNgramConfusion(T.documents(s, d))),
    "q60_commonness" -> ((s, d) => commonness(T.documents(s, d)))
  )

  private val normSql =
    "trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g'))"
  private val wsSql =
    s"list_filter(string_split_regex($normSql, ' +'), w -> w <> '')"

  private def stopHitsSql(list: Seq[String]): String =
    s"CAST(len(list_filter(ws, w -> list_contains(${list.mkString("['", "', '", "']")}, w))) AS INTEGER)"

  private val predSql: String = {
    val langs = stopwords.map(_._1)
    val cases = langs.init.map { l =>
      val geAll = langs.filter(_ != l).map(o => s"score_$l >= score_$o").mkString(" AND ")
      s"WHEN $geAll THEN '$l'"
    }.mkString(" ")
    s"CASE $cases ELSE '${langs.last}' END"
  }

  override val oracle: Map[String, String] = Map(
    "q33_lang_id" ->
      s"""WITH w AS (SELECT doc_id, lang, $wsSql AS ws FROM documents),
         |scored AS (SELECT doc_id, lang,
         |  ${stopwords.map { case (l, list) => s"${stopHitsSql(list)} AS score_$l" }.mkString(",\n  ")}
         |FROM w)
         |SELECT doc_id, lang, ${stopwords.map(s => "score_" + s._1).mkString(", ")},
         |  $predSql AS pred_lang
         |FROM scored""".stripMargin,
    "q34_quality_score" ->
      s"""WITH w AS (SELECT doc_id, text, $wsSql AS ws FROM documents),
         |m AS (SELECT doc_id,
         |  CAST(len(ws) AS INTEGER) AS n_words,
         |  GREATEST(len(ws), 1) AS nw,
         |  GREATEST(len(text), 1) AS nc,
         |  len(list_filter(ws, x -> list_contains(${stopwords.head._2.mkString("['", "', '", "']")}, x))) AS stop_hits,
         |  len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
         |  len(regexp_extract_all(text, '[0-9]')) AS n_digit,
         |  len(array_to_string(ws, '')) AS word_chars
         |FROM w)
         |SELECT doc_id, n_words,
         |  ROUND(CAST(word_chars AS DOUBLE)/nw, 4) AS avg_wlen,
         |  ROUND(CAST(stop_hits AS DOUBLE)/nw, 4) AS stop_ratio,
         |  ROUND(CAST(n_punct AS DOUBLE)/nc, 4) AS punct_ratio,
         |  ROUND(CAST(n_digit AS DOUBLE)/nc, 4) AS digit_ratio,
         |  ROUND(LEAST(CAST(n_words AS DOUBLE)/100, 1.0)*0.5
         |    + (CAST(stop_hits AS DOUBLE)/nw)*0.3
         |    + (1.0 - CAST(n_punct AS DOUBLE)/nc)*0.2, 4) AS quality
         |FROM m""".stripMargin,
    "q35_token_count" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(trim(text), '\s+'), w -> w <> '')) AS INTEGER) AS ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INTEGER) AS bpe_tokens,
        |  CAST(CEIL(CAST(len(text) AS DOUBLE)/4) AS BIGINT) AS est_llm_tokens
        |FROM documents""".stripMargin,
    "q36_fingerprint" ->
      s"""WITH w AS (SELECT doc_id, $normSql AS norm, $wsSql AS ws FROM documents)
         |SELECT doc_id, md5(norm) AS fp_md5,
         |  CAST('0x' || substr(md5(norm),1,15) AS BIGINT) AS fp60,
         |  list_reduce(
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform(ws, x -> CAST('0x' || substr(md5(x),1,15) AS BIGINT) % 2147483647)),
         |    (acc, h) -> (acc * 31 + h) % 2147483647) AS fp_rolling
         |FROM w""".stripMargin,
    "q46_lang_ngram" -> {
      val langs = charNgrams.map(_._1)
      val scoreSql = charNgrams.map { case (l, ngs) =>
        ngs.map(ng => s"len(regexp_extract_all(lower(text), '$ng'))")
          .mkString("(", " + ", s") AS ng_$l")
      }.mkString(",\n  ")
      val cases = langs.init.map { l =>
        val geAll = langs.filter(_ != l).map(o => s"ng_$l >= ng_$o").mkString(" AND ")
        s"WHEN $geAll THEN '$l'"
      }.mkString(" ")
      s"""WITH s AS (SELECT doc_id, lang,
         |  $scoreSql
         |FROM documents)
         |SELECT lang, CASE $cases ELSE '${langs.last}' END AS pred_lang,
         |  COUNT(*) AS n
         |FROM s GROUP BY 1, 2""".stripMargin
    },
    "q60_commonness" ->
      s"""WITH w AS (SELECT doc_id, unnest($wsSql) AS w FROM documents),
         |freq AS (SELECT w, COUNT(*) AS cnt FROM w GROUP BY w)
         |SELECT doc_id, COUNT(*) AS n_words,
         |  CAST(SUM(cnt) AS BIGINT) AS tot_freq,
         |  CAST(SUM(cnt) AS DOUBLE) / COUNT(*) AS avg_freq
         |FROM w JOIN freq USING (w)
         |GROUP BY doc_id""".stripMargin,
    "q37_corpus_stats" ->
      """SELECT lang, source, COUNT(*) AS n_docs,
        |  ROUND(AVG(n_chars), 2) AS avg_chars,
        |  CAST(MIN(n_chars) AS BIGINT) AS min_chars,
        |  CAST(MAX(n_chars) AS BIGINT) AS max_chars,
        |  CAST(MIN(doc_id) AS BIGINT) AS first_doc
        |FROM documents GROUP BY lang, source""".stripMargin
  )
}
