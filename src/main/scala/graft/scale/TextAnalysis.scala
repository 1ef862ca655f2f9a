package graft.scale

import graft.{QueryModule, Tables => T}
import graft.Materialize.CoreOps
import graft.scale.Layout.widen
import graft.functions.PortableFuncs._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DecimalType, IntegerType, StringType}

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
  /** The q34 composite-quality column (length cap + stopword ratio +
    * punctuation penalty) as a reusable scan-side expression — shared
    * with [[Curation.budgetSelect]] so "quality" means one thing
    * everywhere it ranks documents. */
  private[graft] def qualityExpr(text: Column): Column = {
    val ws = words(text)
    val nWords = greatest(size(ws), lit(1))
    val nChars = greatest(length(text), lit(1))
    val stopRatio = stopHits(ws, stopwords.head._2).cast("double") / nWords
    val punctRatio = regexp_count(text, lit("[.,;:!?]")).cast("double") / nChars
    least(size(ws).cast("double") / 100d, lit(1.0)) * 0.5 +
      stopRatio * 0.3 + (lit(1.0) - punctRatio) * 0.2
  }

  def qualityScore(docs0: DataFrame): DataFrame =
    scoredDocs(docs0).select(
      col("doc_id"), col("n_words"), col("avg_wlen"), col("stop_ratio"),
      col("punct_ratio"), col("digit_ratio"), col("quality"))

  /** ONE corpus pass carrying every column the quality family reads —
    * q34's per-doc signals plus `source` (q125's rollup key) and
    * `toks` (q105's budget unit). The shared quality-scan core: the
    * gate registry memoizes it per (JVM, sfDir) via [[graft.Shared]]
    * so a batch run tokenizes and regex-scans the corpus once for the
    * three boards instead of three times; a consumer that needs fewer
    * columns prunes them at its projection. */
  private[scale] def scoredDocs(docs0: DataFrame): DataFrame = {
    val docs = widen(docs0)
    val ws = words(col("text"))
    val nWords = greatest(size(ws), lit(1))
    val nChars = greatest(length(col("text")), lit(1))
    val stopRatio = stopHits(ws, stopwords.head._2).cast("double") / nWords
    val punctRatio = regexp_count(col("text"), lit("[.,;:!?]")).cast("double") / nChars
    val digitRatio = regexp_count(col("text"), lit("[0-9]")).cast("double") / nChars
    val avgWlen = length(array_join(ws, "")).cast("double") / nWords
    val quality = qualityExpr(col("text"))
    // source/lang ride along when the input carries them (the gate
    // corpus does; a doc-only caller like qualityScore's public
    // contract — (doc_id, text) frames — need not), mirroring
    // tokenCore's guard
    val passthrough = Seq("source", "lang")
      .filter(docs.columns.contains).map(col)
    docs.select(
      (Seq(col("doc_id")) ++ passthrough ++ Seq(
      size(ws).as("n_words"),
      portableRound(avgWlen, 4).as("avg_wlen"),
      portableRound(stopRatio, 4).as("stop_ratio"),
      portableRound(punctRatio, 4).as("punct_ratio"),
      portableRound(digitRatio, 4).as("digit_ratio"),
      portableRound(quality, 4).as("quality"),
      ceil(length(col("text")).cast("double") / 4d).cast("long").as("toks"))): _*)
  }

  /** The memoized quality-scan core for the gate registry. */
  /** The corpus-wide quality gate threshold — ONE definition for every
    * Scala default (sourceQuality, filterFunnel, gateAgreement) and
    * the three oracle restatements: the curation pipeline's most
    * shared knob must not drift between engines or boards. */
  val QualityMin = 0.5

  private[scale] def gateScored(s: SparkSession, d: String): DataFrame =
    graft.Shared.memo(s, s"text:quality-scan:$d")(scoredDocs(T.documents(s, d)))

  /** (doc_id, source, ws) — ONE tokenize pass over the corpus, the
    * input every token-level board derives from. The words() regex
    * chain is the dominant per-document cost of the whole text suite;
    * the gate registry memoizes this table ([[gateTokens]]) so a batch
    * run pays it once for q60/q66/q67/q75/q94/q96/q97/q104 instead of
    * eight times. Storage is one projected token pass — the bill the
    * cheapest single consumer already paid. */
  private[scale] def tokenCore(docs0: DataFrame): DataFrame = {
    val base = widen(docs0)
    // source rides along when the input carries it (the gate corpus
    // does; spec fixtures and doc-only callers need not)
    val cols = Seq(col("doc_id")) ++
      (if (base.columns.contains("source")) Seq(col("source")) else Nil) ++
      Seq(words(col("text")).as("ws"))
    base.select(cols: _*)
  }

  private[scale] def gateTokens(s: SparkSession, d: String): DataFrame =
    graft.Shared.memo(s, s"text:tokens:$d")(tokenCore(T.documents(s, d)))

  /** q125: per-source quality rollup — the which-crawl-is-garbage
    * dashboard a curation owner reads before touching mixture weights:
    * per ingest source, the mean q34 composite quality (exactSum
    * decimal accumulator — partition-order proof), and the share of
    * docs at or above the 0.5 gate (integer count, one division).
    * Per-doc quality is the ROUNDED q34 value so both engines
    * aggregate the same 4-decimal numbers. One scan + one aggregate
    * keyed by source.
    */
  def sourceQuality(docs0: DataFrame, minQuality: Double = QualityMin): DataFrame =
    sourceQualityFrom(scoredDocs(docs0), minQuality)

  /** [[sourceQuality]] from the pre-scored quality table —
    * shared-core form for the gate registry (unused score columns
    * prune at the projection). */
  private[scale] def sourceQualityFrom(scored: DataFrame,
                                       minQuality: Double = QualityMin): DataFrame =
    scored
      .select(col("source"), col("quality").as("q"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        portableRound(exactSum(col("q")) / count(lit(1)), 4).as("mean_quality"),
        sum(when(col("q") >= minQuality, 1L).otherwise(0L)).as("n_good"))
      .withColumn("good_share",
        col("n_good").cast("double") / col("n_docs").cast("double"))

  /** Token counting: whitespace tokens, a BPE-ish regex segmentation
    * (letter runs / digit runs / single symbols), and the chars/4
    * heuristic LLM-token estimate. */
  def tokenCount(docs: DataFrame): DataFrame =
    widen(docs).select(
      col("doc_id"),
      size(filter(split(trim(col("text")), "\\s+"), w => w =!= "")).as("ws_tokens"),
      regexp_count(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).as("bpe_tokens"),
      ceil(length(col("text")).cast("double") / 4d).cast("long").as("est_llm_tokens"))

  /** q117: token-length histogram per language on power-of-two
    * buckets — the corpus shape report read before choosing packing
    * lengths and length filters (a mass of sub-32-token docs is
    * boilerplate; a fat 4096+ tail wants chunking). `bucket_lo` is the
    * bucket's inclusive lower bound (2^k ≤ ws_tokens < 2^(k+1) for
    * k < 21; the LAST bucket, bucket_lo = 2^21, is OPEN-ENDED and
    * catches everything ≥ 2^21), derived by an exact integer
    * comparison cascade — no log2 call, so boundary docs land
    * identically in any engine. One scan + one
    * aggregate; the share division runs over the ≤ langs×21-row
    * aggregated table, never the corpus.
    */
  def lengthHistogram(docs: DataFrame): DataFrame = {
    val toks = size(filter(split(trim(col("text")), "\\s+"), w => w =!= ""))
    val bucketLo = (0 until 21).foldRight(lit(1L << 21): Column)((k, acc) =>
      when(toks < lit(1L << (k + 1)), lit(1L << k)).otherwise(acc))
    widen(docs)
      .filter(toks > 0)
      .select(col("lang"), bucketLo.as("bucket_lo"))
      .groupBy(col("lang"), col("bucket_lo"))
      .agg(count(lit(1)).as("n"))
      .withColumn("share",
        col("n").cast("double") /
          sum(col("n")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("lang"))).cast("double"))
  }

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
  def commonness(docs0: DataFrame): DataFrame =
    commonnessFrom(widen(docs0)
      .select(col("doc_id"), explode(words(col("text"))).as("w")))

  /** [[commonness]] from a (doc_id, token) stream — shared-core form
    * (the gate registry feeds the memoized token table). */
  private[scale] def commonnessFrom(w: DataFrame): DataFrame = {
    val freq = w.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    w.join(freq, "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("cnt")).as("tot_freq"))
      .select(col("doc_id"), col("n_words"), col("tot_freq"),
        (col("tot_freq").cast("double") / col("n_words")).as("avg_freq"))
  }

  /** Gopher-style quality-rule signals (Rae et al. 2021, appendix A1 —
    * the standard web-corpus filter battery): word count, mean word
    * length, lexical diversity (distinct/total words), fraction of
    * words containing a letter, symbol-to-word ratio (# and ellipsis),
    * bullet-line and ellipsis-line fractions, and an English stopword
    * floor, folded into one deterministic pass/fail flag.
    *
    * Scale design: pure per-row projection of codegen'd built-ins —
    * no shuffle, runs at scan speed; the filter flag is exactly the
    * predicate a 100 TB curation job pushes into its first pass.
    * Thresholds are the published Gopher values where applicable
    * (50 ≤ words ≤ 100k, mean length in [3,10], symbol ratio < 0.1,
    * bullet lines < 90%, ellipsis lines < 30%, ≥80% alphabetic words,
    * ≥2 stopwords). */
  /** The Gopher signal battery over a words column + the raw text —
    * ONE definition shared by [[gopherRules]] and [[curationGate]], so
    * a threshold tweak cannot silently diverge between them. */
  private final case class GopherSignals(
      nWords: Column, meanWlen: Column, distinctFrac: Column,
      alphaFrac: Column, symbolRatio: Column, bulletFrac: Column,
      ellipsisFrac: Column, stopHits: Column) {
    def pass: Column =
      nWords.between(50, 100000) &&
        meanWlen.between(3.0, 10.0) &&
        symbolRatio < 0.1 &&
        bulletFrac < 0.9 &&
        ellipsisFrac < 0.3 &&
        alphaFrac > 0.8 &&
        stopHits >= 2
  }

  private def gopherSignals(ws: Column, text: Column): GopherSignals = {
    val nw = greatest(size(ws), lit(1))
    val lines = filter(transform(split(text, "\n"), l => trim(l)), l => l =!= "")
    val nl = greatest(size(lines), lit(1))
    GopherSignals(
      nWords = size(ws),
      meanWlen = length(array_join(ws, "")).cast("double") / nw,
      distinctFrac = size(array_distinct(ws)).cast("double") / nw,
      alphaFrac = size(filter(ws, w => w.rlike("[a-z]"))).cast("double") / nw,
      symbolRatio = (countOccurrences(text, "#") +
        countOccurrences(text, "...")).cast("double") / nw,
      bulletFrac = size(filter(lines, l =>
        l.startsWith("-") || l.startsWith("*") || l.startsWith("•"))).cast("double") / nl,
      ellipsisFrac = size(filter(lines, l => l.endsWith("..."))).cast("double") / nl,
      stopHits = stopHits(ws, stopwords.head._2))
  }

  def gopherRules(docs0: DataFrame): DataFrame = {
    val docs = widen(docs0)
    val g = gopherSignals(words(col("text")), col("text"))
    docs.select(
      col("doc_id"),
      g.nWords.as("n_words"),
      portableRound(g.meanWlen, 4).as("mean_wlen"),
      portableRound(g.distinctFrac, 4).as("distinct_frac"),
      portableRound(g.alphaFrac, 4).as("alpha_frac"),
      portableRound(g.symbolRatio, 4).as("symbol_ratio"),
      portableRound(g.bulletFrac, 4).as("bullet_frac"),
      portableRound(g.ellipsisFrac, 4).as("ellipsis_frac"),
      g.stopHits.as("stop_hits"),
      g.pass.as("gopher_pass"))
  }

  /** Repetition metrics (the Gopher/C4 duplicate-content signals that
    * word-level stats miss): per document, the fraction of word
    * bigrams that are repeats, the share held by the single most
    * frequent bigram, and the distinct-bigram fraction.
    *
    * Scale design: explode → count is the one shape that needs a
    * shuffle here, and it shuffles on (doc_id, bigram) — perfectly
    * spread keys, map-side partial counts, no skew by construction
    * (a key is one document's one bigram). Docs with fewer than two
    * words surface with zero counts via the left join rather than
    * silently dropping. All fractions are integer-ratio divisions —
    * deterministic across engines. */
  def repetition(docs0: DataFrame): DataFrame = {
    val docs = widen(docs0)
    val bi = docs.select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(shinglesFromWords(col("ws"), 2)).as("bg"))
    val cnt = bi.groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
    val stats = cnt.groupBy(col("doc_id")).agg(
      sum(col("c")).as("n_bigrams"),
      count(lit(1)).as("n_distinct"),
      max(col("c")).as("top_cnt"),
      sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dup_cnt"))
    docs.select(col("doc_id")).join(stats, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        portableRound(when(col("n_bigrams").isNotNull,
          col("dup_cnt").cast("double") / col("n_bigrams")).otherwise(lit(0.0)), 4)
          .as("dup_bigram_frac"),
        portableRound(when(col("n_bigrams").isNotNull,
          col("top_cnt").cast("double") / col("n_bigrams")).otherwise(lit(0.0)), 4)
          .as("top_bigram_frac"))
  }

  /** Longest repeated word-run per document — the MAXIMAL-k repetition
    * signal that [[repetition]]'s fixed-bigram fractions approximate:
    * a doc whose longest repeat covers most of its length is a
    * degenerate loop (lorem filler, keyword stuffing, decode glitch)
    * even when its bigram dup fraction looks tame. One native
    * suffix-automaton pass per row
    * ([[graft.functions.LongestDupRunExpression]]) — a pure scan-side
    * projection: no shuffle, no row expansion, O(words) per document.
    * `rep_frac` = max_rep / n_words is the curation-ready ratio. */
  def longestRepetition(docs0: DataFrame): DataFrame = {
    val docs = widen(docs0)
    // coalesce null text to an empty word array: size(NULL) is -1
    // under Spark's legacy sizeOfNull while the oracle's len(NULL) is
    // NULL — both engines must state n_words = 0 for a null document
    docs.select(col("doc_id"),
      coalesce(words(col("text")),
        array().cast(ArrayType(StringType))).as("ws"))
      .select(col("doc_id"), size(col("ws")).as("n_words"),
        longestDupRun(col("ws")).as("max_rep"))
      .select(col("doc_id"), col("n_words"), col("max_rep"),
        portableRound(when(col("n_words") > 0,
          col("max_rep").cast("double") / col("n_words")).otherwise(lit(0.0)), 4)
          .as("rep_frac"))
  }

  /** PII patterns shared by [[piiScan]] and its oracle — restricted to
    * syntax with identical semantics in Java regex (Spark) and RE2
    * (DuckDB): plain character classes and counted repetition, no
    * lookaround, no backrefs. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "emails" -> "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}",
    "phones" -> "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}",
    "ips" -> "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}",
    "cards" -> "[0-9]{13,16}")

  /** PII scan + redaction — the compliance pass a training-data
    * pipeline runs before anything ships: per document, occurrence
    * counts for each PII pattern (emails, phone numbers, IPv4
    * addresses, long digit runs), an any-PII flag, and the redacted
    * text with every match replaced by a typed placeholder.
    *
    * Scale design: pure per-row projection of codegen'd regexp
    * built-ins — zero shuffles, runs at scan speed, and the redaction
    * happens in the SAME pass as the counts (one text traversal per
    * pattern). The any_pii flag is the pushable predicate a 100 TB
    * redaction job filters on before rewriting only dirty rows. */
  def piiScan(docs0: DataFrame): DataFrame = {
    val docs = widen(docs0)
    val counts = piiPatterns.map { case (name, pat) =>
      name -> regexp_count(col("text"), lit(pat))
    }
    val redacted = piiPatterns.foldLeft(col("text")) { case (c, (name, pat)) =>
      regexp_replace(c, pat, s"<${name.toUpperCase.dropRight(1)}>")
    }
    docs.select(
      (Seq(col("doc_id")) ++ counts.map { case (n, e) => e.as(s"n_$n") } ++ Seq(
        counts.map(_._2 > 0).reduce(_ || _).as("any_pii"),
        redacted.as("redacted"))): _*)
  }

  /** q130: per-source PII incidence — the compliance dashboard a
    * pipeline owner reads to decide which ingest source needs the
    * redaction pass (and to catch a crawl that suddenly starts leaking
    * emails): per source, the scanned/dirty doc counts, total match
    * count per PII pattern, and the dirty-doc rate.
    *
    * Scale design: the per-row flags are [[piiScan]]'s codegen'd
    * regexp projections (zero shuffles, scan speed); the rollup is one
    * hash-aggregate keyed by the handful of sources with map-side
    * partials. All counts are integers; the rate is one division of
    * exact integers rounded identically in both engines. */
  def sourcePii(docs0: DataFrame): DataFrame = {
    val docs = widen(docs0)
    val counts = piiPatterns.map { case (name, pat) =>
      name -> regexp_count(col("text"), lit(pat))
    }
    val scored = docs.select(
      (Seq(col("source")) ++ counts.map { case (n, e) => e.as(s"n_$n") } ++
        Seq(counts.map(_._2 > 0).reduce(_ || _).as("any_pii"))): _*)
    val aggs = Seq(count(lit(1)).as("n_docs"),
      count(when(col("any_pii"), 1)).as("n_pii_docs")) ++
      piiPatterns.map { case (n, _) => sum(col(s"n_$n")).as(s"tot_$n") }
    scored.groupBy(col("source"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("pii_rate",
        portableRound(col("n_pii_docs").cast("double") / col("n_docs"), 4))
  }

  /** The combined curation gate the Gopher/C4 pipelines actually run:
    * word-level quality rules ([[gopherRules]]) AND repetition
    * thresholds ([[repetition]]) evaluated together as ONE per-row
    * projection — no shuffle anywhere, so at 100 TB the joint pass/
    * fail flag streams out of the scan and is exactly the predicate
    * the first curation pass pushes down.
    *
    * The repetition signals are recomputed WITHOUT the (doc_id,
    * bigram) shuffle that [[repetition]] uses: the bigram array is
    * sorted per row, then
    *  - duplicate-bigram count = total − singletons, where a singleton
    *    is an element differing from both sorted neighbors;
    *  - top-bigram count = longest equal run, via one left-to-right
    *    fold with a (prev, run, top) struct accumulator.
    * Same counts as the groupBy formulation, zero data movement.
    *
    * The words and sorted-bigram arrays pass through generator
    * barriers (`explode(array(struct(…)))`): higher-order-function
    * lambdas evaluate interpreted with no CSE, so a collapsed
    * projection would re-run the tokenize/sort chain once per
    * reference — the barrier materializes each exactly once per row
    * (same technique as [[Similarity.quantizeStats]]).
    *
    * Repetition thresholds are the Gopher-family values: duplicate
    * 2-gram fraction < 0.2, top 2-gram fraction < 0.18. */
  def curationGate(docs0: DataFrame): DataFrame =
    gateFlagsCarry(widen(docs0), Seq("doc_id"))

  /** The q70 flag chain with caller-chosen carried columns instead of
    * a hard-wired `doc_id` — the streaming funnel monitor needs the
    * same per-row flags with `ts`/token columns riding along (and no
    * [[widen]], which a streaming source cannot take). Identical
    * expressions to the original gate; [[curationGate]] IS this with
    * carry = doc_id. */
  private[graft] def gateFlagsCarry(docs: DataFrame,
                                    carry: Seq[String]): DataFrame = {
    val cs = carry.map(col)
    val withWs = docs
      .select(cs ++ Seq(col("text"),
        explode(array(struct(words(col("text")).as("ws")))).as("s")): _*)
      .select(cs ++ Seq(col("text"), col("s.ws").as("ws")): _*)
    val withBgs = withWs
      .select(cs ++ Seq(col("text"), col("ws"),
        explode(array(struct(
          sort_array(shinglesFromWords(col("ws"), 2)).as("bgs")))).as("s2")): _*)
      .select(cs ++ Seq(col("text"), col("ws"), col("s2.bgs").as("bgs")): _*)

    val ws = col("ws"); val bgs = col("bgs")
    val gopherPass = gopherSignals(ws, col("text")).pass

    val nBg = size(bgs)
    // a sorted element is a singleton iff it differs from both
    // neighbors; everything else belongs to a duplicated bigram
    val singles = when(nBg > 0,
      size(filter(sequence(lit(1), nBg), i =>
        (i === 1 || element_at(bgs, i) =!= element_at(bgs, i - 1)) &&
          (i === nBg || element_at(bgs, i) =!= element_at(bgs, i + 1)))))
      .otherwise(lit(0))
    val dupCnt = (nBg - singles).cast("long")
    val topCnt = aggregate(bgs,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"), lit(0L).as("top")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("top"), run).as("top"))
      },
      acc => acc.getField("top"))
    val dupFrac = when(nBg > 0, dupCnt.cast("double") / nBg).otherwise(lit(0.0))
    val topFrac = when(nBg > 0, topCnt.cast("double") / nBg).otherwise(lit(0.0))
    val repPass = dupFrac < 0.2 && topFrac < 0.18

    withBgs.select(cs ++ Seq(
      gopherPass.as("gopher_pass"),
      nBg.cast("long").as("n_bigrams"),
      portableRound(dupFrac, 4).as("dup_bigram_frac"),
      portableRound(topFrac, 4).as("top_bigram_frac"),
      repPass.as("rep_pass"),
      (gopherPass && repPass).as("keep")): _*)
  }

  /** q150: the filter funnel — stage-by-stage attrition through the
    * curation battery in pipeline order (ingested → nonempty → Gopher
    * → repetition → quality ≥ θ → PII-clean → exact-dedup kept), the
    * survival table every corpus paper publishes (RefinedWeb/FineWeb
    * style) and the first thing an operator reads when a pipeline
    * change moves the kept-token count: per stage, surviving docs and
    * tokens, survival vs ingested, and the per-step keep rate that
    * localizes WHICH gate ate the corpus. Where q78 counts each gate
    * independently, this is the SEQUENTIAL composition — the numbers a
    * real run ships with.
    *
    * Scale design: one scan-side projection carries tokens, quality,
    * PII flags and the md5 fingerprint; the gate flags ride the q70
    * projection (zero-shuffle per-row); the only shuffles are the
    * md5-group rep aggregate and two doc_id equi-joins. The stage
    * fold collapses to ONE hash-aggregate with map-side partials
    * (14 conditional sums), and the 7-row board explodes from its
    * single output row — nothing after the aggregate is corpus-sized. */
  def filterFunnel(docs0: DataFrame, qualityMin: Double = QualityMin): DataFrame = {
    val docs = widen(docs0)
    val base = docs.select(
      col("doc_id"),
      ceil(length(col("text")).cast("double") / 4d).cast("long").as("toks"),
      portableRound(qualityExpr(col("text")), 4).as("quality"),
      piiPatterns.map { case (_, p) => regexp_count(col("text"), lit(p)) > 0 }
        .reduce(_ || _).as("any_pii"),
      md5(col("text")).as("fp"))
    val reps = base.groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id"))
    val gate = curationGate(docs)
      .select(col("doc_id"), col("gopher_pass"), col("rep_pass"))
    val flags = base.join(reps, Seq("fp")).join(gate, Seq("doc_id"))
    val stages: Seq[(String, Column)] = Seq(
      "1_ingested" -> lit(true),
      "2_nonempty" -> (col("toks") > 0L),
      "3_gopher" -> col("gopher_pass"),
      "4_repetition" -> col("rep_pass"),
      "5_quality" -> (col("quality") >= qualityMin),
      "6_pii" -> !col("any_pii"),
      "7_exact_dedup" -> (col("doc_id") === col("keep_id")))
    // cumulative AND in pipeline order — stage k survives iff every
    // gate up to k passed
    val cum = stages.tail.scanLeft(stages.head) {
      case ((_, acc), (n, c)) => (n, acc && c)
    }
    val aggs = cum.zipWithIndex.flatMap { case ((_, c), i) =>
      Seq(count(when(c, 1)).as(s"d_$i"),
        coalesce(sum(when(c, col("toks"))), lit(0L)).as(s"t_$i"))
    }
    val wide = flags.agg(aggs.head, aggs.tail: _*)
    val entries = cum.zipWithIndex.map { case ((n, _), i) =>
      val stepPrev = if (i == 0) col("d_0") else col(s"d_${i - 1}")
      struct(
        lit(i + 1).as("stage_idx"), lit(n).as("stage"),
        col(s"d_$i").as("n_docs"), col(s"t_$i").as("n_toks"),
        when(col("d_0") > 0L,
          portableRound(col(s"d_$i").cast("double") / col("d_0"), 4))
          .as("survival_rate"),
        when(stepPrev > 0L,
          portableRound(col(s"d_$i").cast("double") / stepPrev, 4))
          .as("step_keep_rate"))
    }
    wide.select(explode(array(entries: _*)).as("s")).select(col("s.*"))
  }

  /** q151: gate agreement — Cohen's κ between the two cheap quality
    * signals this pipeline runs (the q70 Gopher+repetition `keep` gate
    * and the q34 composite-quality threshold): the 2×2 confusion
    * counts, observed agreement p_obs, chance agreement p_chance, and
    * κ = (p_obs − p_chance)/(1 − p_chance). The read a curation owner
    * does before paying for BOTH filters at 100 TB: κ near 1 means the
    * second gate is redundant, κ near 0 means each adds independent
    * signal (and the funnel ordering in q150 matters).
    *
    * Scale design: both flags are zero-shuffle per-row projections;
    * one doc_id equi-join, then ONE hash-aggregate of four conditional
    * counts — everything after runs on a single row. Portability: the
    * rates divide exact integer counts with identical expression trees
    * in both engines; κ divides the UNROUNDED rates (then r6), so the
    * one-ulp hazards of rounding intermediates never arise. */
  def gateAgreement(docs0: DataFrame, qualityMin: Double = QualityMin): DataFrame = {
    val docs = widen(docs0)
    val q = docs.select(col("doc_id"),
      (portableRound(qualityExpr(col("text")), 4) >= qualityMin).as("q_pass"))
    val g = curationGate(docs).select(col("doc_id"), col("keep").as("g_pass"))
    val agg = q.join(g, Seq("doc_id")).agg(
      count(lit(1)).as("n_docs"),
      count(when(col("g_pass") && col("q_pass"), 1)).as("both_pass"),
      count(when(col("g_pass") && !col("q_pass"), 1)).as("gate_only"),
      count(when(!col("g_pass") && col("q_pass"), 1)).as("quality_only"),
      count(when(!col("g_pass") && !col("q_pass"), 1)).as("neither"))
    def r6(x: Column) = floor(x * 1000000d + 0.5d) / 1000000d
    val n = col("n_docs").cast("double")
    val a = col("both_pass").cast("double")
    val b = col("gate_only").cast("double")
    val c = col("quality_only").cast("double")
    val d = col("neither").cast("double")
    val po = (a + d) / n
    val pe = ((a + b) / n) * ((a + c) / n) + ((c + d) / n) * ((b + d) / n)
    agg.select(col("n_docs"), col("both_pass"), col("gate_only"),
      col("quality_only"), col("neither"),
      r6(po).as("p_obs"), r6(pe).as("p_chance"),
      when(pe < 1.0d, r6((po - pe) / (lit(1.0) - pe))).as("kappa"))
  }

  /** TF-IDF top-k terms per document — the corpus-relative keyword
    * signal. Two-phase shape: per-(doc, term) frequency aggregate,
    * document-frequency aggregate over it, join back on term, rank
    * per document.
    *
    * Scale design: the tf aggregate shuffles on (doc_id, term) with
    * map-side partials; the df table is vocabulary-sized (≪ corpus)
    * and joins back on term — at 100 TB both shuffles are on short
    * string keys and the window ranks within doc_id partitions. The
    * idf is the BM25-family rational form (N − df + ½)/(df + ½)
    * rather than a logarithm: same ranking, but exact one-operation
    * IEEE arithmetic that reproduces bit-for-bit in any engine (libm
    * `ln` does not). Ties rank deterministically by term. */
  def tfidfTop(docs0: DataFrame, k: Int = 5): DataFrame =
    tfidfTopFrom(tokenCore(docs0), k)

  /** [[tfidfTop]] from the (doc_id, source, ws) token core. */
  private[scale] def tfidfTopFrom(core: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = core
    val w = core.select(col("doc_id"), explode(col("ws")).as("term"))
    // materialize tf ONCE: it feeds both the df aggregate and the
    // join-back, and without a barrier Spark recomputes the whole
    // explode+tokenize chain (the dominant cost) for each consumer —
    // tf is narrow (doc_id, term, tf), so checkpointing it is cheap
    // relative to running the words() regex chain twice per document
    val tf = w.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .coreCheckpoint()
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // n_docs still comes from the raw table, not tf: a doc with zero
    // words has no tf rows but must count toward N. This extra scan is
    // column-pruned to a bare count — no tokenize work.
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "term").crossJoin(n)
      .withColumn("score", col("tf").cast("double") *
        ((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
    val win = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rk", row_number().over(win))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        portableRound(col("score"), 4).as("tfidf"), col("rk"))
  }

  /** BM25 retrieval over the corpus for a fixed term query — the
    * ranking function a training-data search/inspection tool runs.
    * Okapi BM25 with k1 = 1.2, b = 0.75 and the rational idf (see
    * [[tfidfTop]] on why no logarithm).
    *
    * Scale design: per-term frequencies come from counting inside the
    * already-tokenized words array (a fixed, small query term set ⇒
    * fixed work per row, no explode); corpus stats (N, Σdl, per-term
    * df) reduce to ONE 1-row aggregate broadcast back with a cross
    * join — so the whole query is scan → 1-row agg → scan-side
    * scoring, a single pass over the corpus plus a global top-k. The
    * per-document score sums its term contributions in fixed written
    * order — no cross-row float accumulation anywhere. */
  def bm25(docs0: DataFrame, terms: Seq[String] = Seq("spark", "join", "query"),
           k: Int = 10): DataFrame =
    bm25From(tokenCore(docs0), terms, k)

  /** [[bm25]] from the (doc_id, source, ws) token core. */
  private[scale] def bm25From(core: DataFrame, terms: Seq[String],
                              k: Int): DataFrame = {
    require(terms.nonEmpty && terms.size <= 8, s"1-8 query terms: $terms")
    val ws = col("ws")
    // materialize the tokenized per-doc stats ONCE: m feeds both the
    // 1-row corpus aggregate and the scoring join, and `g` is an
    // aggregate OF m — without a barrier the corpus is scanned and the
    // words() tokenize chain (the dominant cost) runs twice. m is
    // narrow (doc_id, dl, one small int per query term), so the
    // checkpoint is cheap against a second full tokenize pass.
    val m = core.select(
      (Seq(col("doc_id"), size(ws).as("dl")) ++
        terms.map(t => size(filter(ws, w => w === t)).as(s"tf_$t"))): _*)
      .coreCheckpoint()
    val aggCols = count(lit(1)).as("n_docs") +: sum(col("dl")).as("sdl") +:
      terms.map(t => count(when(col(s"tf_$t") > 0, lit(1))).as(s"df_$t"))
    val g = m.agg(aggCols.head, aggCols.tail: _*)
    val avgdl = col("sdl").cast("double") / col("n_docs")
    def termScore(t: String): Column = {
      val tf = col(s"tf_$t"); val df = col(s"df_$t")
      ((col("n_docs") - df + lit(0.5)) / (df + lit(0.5))) *
        ((tf * lit(2.2)) / (tf + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / avgdl))))
    }
    val score = terms.map(termScore).reduceLeft(_ + _)
    m.crossJoin(g)
      .withColumn("bm25_raw", score)
      .filter(col("bm25_raw") > 0)
      .select(
        (Seq(col("doc_id"), col("dl")) ++ terms.map(t => col(s"tf_$t")) ++
          Seq(portableRound(col("bm25_raw"), 6).as("bm25"), col("bm25_raw"))): _*)
      .orderBy(col("bm25_raw").desc, col("doc_id"))
      .limit(k)
      .drop("bm25_raw")
  }

  /** Hashed linear classifier score — the fasttext/CCNet-style quality
    * model shape: every word hashes into one of [[ClassifierBuckets]]
    * feature buckets, each bucket carries a fixed weight, and the
    * document score is the mean bucket weight over its words. The
    * weights here are a deterministic stand-in (md5-derived, embedded
    * as plan literals) — a trained model would ship its weights the
    * same way: a broadcast-sized literal array, NO model server in the
    * scan loop.
    *
    * Scale design: pure per-row projection (hash → array lookup →
    * fold), zero shuffles, runs at scan speed; the fold is
    * left-to-right in both engines so the double sum is bit-identical.
    * The sigmoid is deliberately omitted (libm exp differs across
    * engines by ulps); the raw linear score ranks identically. */
  val ClassifierBuckets = 64

  /** Deterministic per-bucket weights in [-1, 1): hash60("w_<i>")
    * scaled — reproducible from md5 in any engine, embedded as
    * literals in the plan and the oracle alike. */
  val classifierWeights: Seq[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until ClassifierBuckets).map { i =>
      val hex = md.digest(s"w_$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      (java.lang.Long.parseLong(hex, 16) % 2001 - 1000) / 1000.0
    }
  }

  /** The q74 per-doc weight fold over a words-array column — one
    * hashed-weight lookup per token, summed left-to-right (shared by
    * [[classifierScore]] and [[scoreCalibration]]). */
  private def classifierSumExpr(ws: Column): Column = {
    val wArr = array(classifierWeights.map(lit): _*)
    aggregate(
      transform(ws, w =>
        element_at(wArr, (pmod(portableHash60(w), lit(ClassifierBuckets.toLong)) + 1L)
          .cast(IntegerType))),
      lit(0.0), (acc, x) => acc + x)
  }

  def classifierScore(docs0: DataFrame): DataFrame = {
    val docs = widen(docs0)
    val withWs = docs
      .select(col("doc_id"), explode(array(struct(words(col("text")).as("ws")))).as("s"))
      .select(col("doc_id"), col("s.ws").as("ws"))
      .filter(size(col("ws")) > 0)
    val score = classifierSumExpr(col("ws"))
    // generator barrier: the fold (an md5 per word) feeds both the
    // mean and the flag; inlined twice it would hash every word twice
    // (interpreted HOFs have no CSE)
    withWs
      .select(col("doc_id"), size(col("ws")).as("n_words"),
        explode(array(struct(score.as("sum")))).as("s"))
      .select(col("doc_id"), col("n_words"),
        portableRound(col("s.sum") / col("n_words"), 6).as("score"),
        (col("s.sum") > 0d).as("pred_keep"))
  }

  /** q131: classifier calibration audit — the q88/q103/q116
    * certify-the-approximation discipline applied to q74's quality
    * classifier: scoreable docs bucketed by fixed score intervals over
    * [-1, 1], each bucket's size, mean score, and mean GOLD quality
    * (the q34 composite), with a `monotone_ok` flag (bucket mean
    * quality non-decreasing in score) — a classifier whose higher
    * scores stop predicting higher gold quality flips the gate before
    * its threshold ships into a curation pass.
    *
    * Scale design: score and gold quality ride ONE widened scan (a
    * doc_id self-join of the q74 and q34 boards would shuffle the
    * corpus twice for columns the same row determines); the bucket is
    * fixed integer arithmetic on the rounded score — no percentile
    * pass; the rollup is one hash-aggregate over ≤ `nBuckets` keys and
    * the lag window runs over those ≤ `nBuckets` rows (vocabCoverage's
    * bounded-window discipline). Determinism: round-then-bucket,
    * exactSum decimal means, floor of an exact +1.0 shift — identical
    * expression trees in both engines. The generator barrier keeps the
    * per-token weight fold from re-running for the bucket and the mean
    * (interpreted HOFs have no CSE). */
  def scoreCalibration(docs0: DataFrame, nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 2 && nBuckets % 2 == 0, s"even nBuckets: $nBuckets")
    scoreCalibrationFrom(calibScored(docs0, nBuckets), nBuckets)
  }

  /** The per-doc (bucket, score, quality) table q131 aggregates. */
  private[scale] def calibScored(docs0: DataFrame,
                                 nBuckets: Int = 10): DataFrame = {
    val docs = widen(docs0)
    val half = nBuckets / 2.0
    val withWs = docs
      // portableRound(…, 4) = the q34 board's own per-doc rounding (qualitySql
      // twin) — the calibration means aggregate the SAME doubles q34
      // publishes, not a higher-precision sibling
      .select(col("doc_id"), portableRound(qualityExpr(col("text")), 4).as("quality"),
        explode(array(struct(words(col("text")).as("ws")))).as("s"))
      .select(col("doc_id"), col("quality"), col("s.ws").as("ws"))
      .filter(size(col("ws")) > 0)
    withWs
      .select(col("quality"),
        explode(array(portableRound(classifierSumExpr(col("ws")) / size(col("ws")), 6)))
          .as("score"))
      .select(
        least(greatest(floor((col("score") + 1.0d) * half), lit(0L)),
          lit(nBuckets - 1L)).cast("long").as("bucket"),
        col("score"), col("quality"))
  }

  /** [[calibScored]] from the memoized token and quality cores — the
    * batch form: two narrow checkpointed tables joined by doc_id
    * replace the standalone form's third full text scan (regex
    * tokenize + stopword pass) per batch run. */
  private[scale] def calibScoredFrom(tokens: DataFrame, scored: DataFrame,
                                     nBuckets: Int): DataFrame = {
    val half = nBuckets / 2.0
    tokens.select(col("doc_id"), col("ws"))
      .filter(size(col("ws")) > 0)
      .join(scored.select(col("doc_id"), col("quality")), Seq("doc_id"))
      .select(col("quality"),
        explode(array(portableRound(classifierSumExpr(col("ws")) / size(col("ws")), 6)))
          .as("score"))
      .select(
        least(greatest(floor((col("score") + 1.0d) * half), lit(0L)),
          lit(nBuckets - 1L)).cast("long").as("bucket"),
        col("score"), col("quality"))
  }

  private[scale] def scoreCalibrationFrom(scored: DataFrame,
                                          nBuckets: Int): DataFrame = {
    // round-half-up written floor(x·10⁴+0.5)/10⁴ on BOTH sides — a
    // mean can land on a half-tie where round() diverges across
    // engines (hit at sf0.001; the q47 discipline)
    def r4(c: Column): Column = floor(c * 10000d + 0.5d) / 10000d
    val buckets = scored.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        r4(exactSum(col("score")) / count(lit(1))).as("mean_score"),
        r4(exactSum(col("quality")) / count(lit(1))).as("mean_quality"))
    // ≤ nBuckets rows: the bounded-window discipline
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
    buckets.withColumn("monotone_ok",
      coalesce(col("mean_quality") >= lag(col("mean_quality"), 1).over(w),
        lit(true)))
  }

  /** Vocabulary coverage profile: corpus word frequencies ranked, with
    * each rank's cumulative share of all tokens — the curve that sizes
    * a tokenizer vocabulary ("how many types cover 95% of tokens").
    * One hash-aggregate builds the frequency table (map-side partials
    * over (word) keys); top-`topK` selection is a bounded
    * [[graft.functions.TopKAgg]] aggregate, so no task ever sorts the
    * full vocabulary (the former global `Window.orderBy` funneled
    * every distinct word through ONE partition — vocabulary ≪ corpus
    * by Heaps' law, but at 100 TB of web text "vocabulary" is still
    * 10⁸ tokens); the exchange carries ≤ topK rows per map task and
    * the cumulative sum runs over the topK survivors only (row_number
    * cum at rank r reads ranks 1..r, all of which survive the
    * rank ≤ topK filter — the prefix is self-contained). Count ties
    * break by word ASC in UTF8 binary order = DuckDB's default
    * varchar collation; counts are exact in the double score up to
    * 2⁵³ tokens. */
  def vocabCoverage(docs0: DataFrame, topK: Int = 200): DataFrame =
    vocabCoverageFrom(widen(docs0)
      .select(explode(words(col("text"))).as("w")), topK)

  /** [[vocabCoverage]] from a bare token stream — shared-core form. */
  private[scale] def vocabCoverageFrom(toks: DataFrame,
                                       topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // materialize the frequency table ONCE: it feeds both the total
    // aggregate and the ranking, and without a barrier the
    // tokenize+explode chain reruns per consumer (same fix as tfidf)
    val freq = toks
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .coreCheckpoint()
    val total = freq.agg(coalesce(sum(col("cnt")), lit(0L)).as("total"))
    val top = freq
      .groupBy()
      .agg(graft.functions.TopKAgg.topKStr(
        col("cnt").cast("double"), col("w"), topK).as("top"))
      .select(posexplode(col("top")))
      .select((col("pos") + 1).as("rank"), col("col.id").as("w"),
        col("col.score").cast("long").as("cnt"))
    // the running sum's window input is the topK survivors — a
    // constant-bounded relation, not the vocabulary
    val w = Window.orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.withColumn("cum_cnt", sum(col("cnt")).over(w))
      .crossJoin(total)
      .select(col("rank"), col("w"), col("cnt"),
        portableRound(col("cum_cnt").cast("double") / col("total"), 6).as("cum_frac"))
  }

  /** Per-source token-distribution drift: for each source, the tokens
    * most over-represented relative to the whole corpus — the mixture
    * QA signal that catches a source drifting (boilerplate flooding
    * one crawl, a domain dominating a slice) before it skews training.
    * Score is the relative-frequency ratio
    * `(tf_src / total_src) / (tf_corpus / total_corpus)`, the
    * log-free core of PMI — like [[commonness]], `ln` is deliberately
    * avoided (libm ulp drift across engines); the ratio is one IEEE
    * division of exact integer-derived doubles, bit-identical in both
    * engines for the identical expression tree.
    *
    * Determinism: all counts are integers; a token exclusive to one
    * source scores exactly `total_corpus / total_src` (the max), so
    * exclusive tokens tie — broken by token ASC in UTF8 binary order
    * (= DuckDB varchar collation, same as [[vocabCoverage]]). The
    * `minCount` floor keeps one-off noise out of the board.
    *
    * Scale design: ONE tokenize pass builds the (source, token) table
    * (checkpointed — it feeds the per-source totals, the corpus
    * totals, and the scoring join); corpus-level counts derive from
    * re-aggregating that table, never a second scan. Per-source top-k
    * is the bounded [[graft.functions.TopKAgg]] aggregate — the
    * exchange carries ≤ k rows per task per source, not the
    * vocabulary. Source totals and the corpus total are tiny
    * (n_sources rows / 1 row): broadcast join + the documented 1-row
    * cross-join shape. */
  def tokenDrift(docs0: DataFrame, k: Int = 10, minCount: Long = 3L): DataFrame =
    tokenDriftFrom(widen(docs0)
      .select(col("source"), explode(words(col("text"))).as("w")), k, minCount)

  /** [[tokenDrift]] from a (source, token) stream — shared-core form. */
  private[scale] def tokenDriftFrom(tagged: DataFrame, k: Int,
                                    minCount: Long): DataFrame =
    overRepTokens(tagged, "source", k, minCount)

  /** The drift/topic scoring core shared by [[tokenDrift]] (label =
    * ingest source) and [[clusterTopics]] (label = embedding cell):
    * per label, the k tokens most over-represented vs the corpus by
    * relative-frequency ratio, counts re-attached. `tagged` is one
    * (label, token-occurrence) row per token instance. */
  private def overRepTokens(tagged: DataFrame, label: String, k: Int,
                            minCount: Long): DataFrame = {
    val tf = tagged
      .groupBy(col(label), col("w")).agg(count(lit(1)).as("cnt"))
      .coreCheckpoint()
    val labTot = tf.groupBy(col(label)).agg(sum(col("cnt")).as("lab_tot"))
    val corpTf = tf.groupBy(col("w")).agg(sum(col("cnt")).as("corp_cnt"))
    val total = tf.agg(coalesce(sum(col("cnt")), lit(0L)).as("total"))
    val scored = tf.filter(col("cnt") >= minCount)
      .join(corpTf, "w")
      .join(broadcast(labTot), label)
      .crossJoin(total)
      .withColumn("ratio",
        (col("cnt").cast("double") * col("total")) /
          (col("corp_cnt").cast("double") * col("lab_tot")))
    val top = scored.groupBy(col(label))
      .agg(graft.functions.TopKAgg.topKStr(col("ratio"), col("w"), k).as("top"))
      .select(col(label), posexplode(col("top")))
      .select(col(label), (col("pos") + 1).as("rank"),
        col("col.id").as("w"), col("col.score").as("ratio"))
    // re-attach the counts for operational value: `top` is k×labels
    // rows, broadcast back against the scored table (whose base is the
    // checkpointed tf — no second tokenize pass anywhere)
    scored.join(broadcast(top.select(col(label), col("w"), col("rank"))),
        Seq(label, "w"))
      .select(col(label), col("rank"), col("w"), col("cnt"),
        col("corp_cnt"), col("ratio"))
  }

  /** Topic labels for embedding-space clusters — the "what is actually
    * IN each cluster" report a curation pipeline runs after clustering
    * its corpus (mixture design, cluster-level filtering, SemDeDup
    * triage all start from it): assign every document to its nearest
    * seed centroid in embedding space, then name each cluster by the
    * tokens most over-represented in its documents relative to the
    * whole corpus. Bridges the two modalities the engine indexes —
    * vectors pick the cluster, text explains it.
    *
    * Scale design: cell assignment is the scan-side `argmax_cosine`
    * kernel over the bounded seed-centroid plan constant (zero joins,
    * the q38/q95 contract); the text side joins docs to cells by id
    * BEFORE tokenizing, so the equi-join moves corpus-sized rows, not
    * token-sized; scoring is [[overRepTokens]] — one tokenize pass,
    * bounded top-k per cell. */
  def clusterTopics(docs0: DataFrame, emb: DataFrame,
                    nCells: Int = Similarity.IvfCells, k: Int = 10,
                    minCount: Long = 3L): DataFrame =
    clusterTopicsFrom(tokenCore(docs0), emb, nCells, k, minCount)

  /** [[clusterTopics]] from the (doc_id, source, ws) token core. */
  private[scale] def clusterTopicsFrom(core: DataFrame, emb: DataFrame,
                                       nCells: Int, k: Int,
                                       minCount: Long): DataFrame = {
    // seeds from the nonzero-norm universe only (oracle cents bounds
    // nrm > 0) — a zero-norm seed poisons the argmax scan with NaN
    // and swallows every row while the oracle's NULL cosine sorts
    // last (fuzz r20). Rows keep the full universe.
    val cents = Similarity.seedCentroidList(Similarity.nonZeroNorm(emb), nCells)
    val cells = widen(emb).select(col("vec_id").as("doc_id"),
      graft.functions.VectorExpressions.argMaxCosine(
        toDoubleArray(col("embedding")), cents).as("cell_id"))
    val tagged = core.select(col("doc_id"), col("ws"))
      .join(cells, Seq("doc_id"))
      .select(col("cell_id"), explode(col("ws")).as("w"))
    overRepTokens(tagged, "cell_id", k, minCount)
  }

  /** Exact top-k frequent tokens with a CAPACITY-BOUNDED exchange —
    * the heavy-hitters problem solved the way 100 TB requires:
    * a Misra–Gries sketch aggregate
    * ([[graft.functions.FreqSketch.misraGries]]) nominates ≤ `capacity`
    * candidates with its map-side partials never exceeding `capacity`
    * entries per task, then ONE exact count pass over candidate tokens
    * only (broadcast semi-join — candidates are driver-bounded)
    * restores exact counts, and the bounded top-k aggregate ranks the
    * ≤ `capacity` survivors. Compare [[vocabCoverage]]'s plain
    * `groupBy(token)`: its exchange is vocabulary-sized (10⁸+ keys on
    * web text by Heaps' law); this one is capacity-sized regardless of
    * corpus OR vocabulary.
    *
    * Exactness is GUARANTEED, not probabilistic, and guarded: MG
    * retains every item with true count > N/(capacity+1), so if each
    * reported count clears N/capacity, any token outside the candidate
    * set must rank strictly below all k reported — the result is
    * identical to the exact form (the q93 confirm pattern on the
    * frequency axis). The guard is an integer-exact per-row check
    * (`cnt · capacity > N`) that RAISES on violation rather than
    * silently publishing a possibly-incomplete board — undersized
    * capacity is a configuration error, not a result.
    *
    * Determinism: MG's surviving sub-threshold candidates vary with
    * partitioning/merge order, but the guarded top-k does not — exact
    * counts come from the confirm pass, ordering is (cnt DESC, token
    * ASC UTF8) = DuckDB's varchar collation. */
  def heavyHitters(docs0: DataFrame, k: Int = 20,
                   capacity: Int = 256): DataFrame =
    // the token stream feeds the sketch AND the confirm pass — one
    // tokenize, barriered (same fix as tfidf/vocabCoverage)
    heavyHittersFrom(widen(docs0)
      .select(explode(words(col("text"))).as("w")).coreCheckpoint(),
      k, capacity)

  /** [[heavyHitters]] from a materialized token stream — shared-core
    * form (the caller guarantees `toks` is already a barrier: the
    * sketch and the confirm pass both re-read it). */
  private[scale] def heavyHittersFrom(toks: DataFrame, k: Int,
                                      capacity: Int): DataFrame = {
    require(k <= capacity, s"top-k ($k) cannot exceed capacity ($capacity)")
    // one aggregation yields the candidate list, the exactness flag
    // and N together
    val sk = toks.agg(
        graft.functions.FreqSketch.misraGriesExact(col("w"), capacity)
          .as("skx"),
        count(lit(1)).as("total"))
      .select(col("skx.cand").as("cand"), col("skx.exact").as("exact"),
        col("total"))
      .coreCheckpoint()
    val cands = sk.select(explode(col("cand")).as("w"))
    val exact = toks.join(broadcast(cands), Seq("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    // the board must fill the EXPECTED number of slots BEFORE the
    // per-row threshold check: on adversarial (near-uniform) data the
    // sketch can shed candidates wholesale — a merge's
    // (cap+1)-th-largest subtraction zeroes every tied entry — and an
    // empty candidate set would otherwise publish an empty board with
    // no row to trip the guard. Expected slots come from the sketch's
    // OWN exactness flag (zero extra passes — an exact countDistinct
    // would be the vocabulary-sized exchange this sketch exists to
    // avoid at 100 TB): `exact` means no decrement ever ran, so `cand`
    // IS the whole vocabulary and min(k, |cand|) slots is the full
    // legitimate board (fuzz tiny profile — the oracle's `rank <= k`
    // fills the same); any decrement implies the vocabulary exceeded
    // capacity ≥ k somewhere, so all k slots are owed and a short
    // board means shedding — raise.
    val expected = when(col("exact"),
      least(lit(k), size(col("cand")))).otherwise(lit(k))
    val top = exact.groupBy()
      .agg(graft.functions.TopKAgg.topKStr(
        col("cnt").cast("double"), col("w"), k).as("top"))
      .crossJoin(sk.select(col("cand"), col("exact")))
      .select(when(size(col("top")) === expected, col("top"))
        .otherwise(raise_error(concat(
          lit(s"heavy_hitters: capacity $capacity too small — only "),
          size(col("top")).cast("string"),
          lit(s" of $k candidates survived the exact confirm; " +
            "exactness not certifiable, raise capacity (or lower k " +
            "below the corpus vocabulary size)")))).as("top"))
      .select(posexplode(col("top")))
      .select((col("pos") + 1).as("rank"), col("col.id").as("w"),
        col("col.score").cast("long").as("cnt"))
    top.crossJoin(sk.select(col("total")))
      .select(col("rank"), col("w"),
        when(col("cnt") * capacity > col("total"), col("cnt"))
          .otherwise(raise_error(concat(
            lit(s"heavy_hitters: capacity $capacity too small — token '"),
            col("w"), lit("' count "), col("cnt").cast("string"),
            lit(" does not clear N/capacity = "),
            (col("total") / capacity).cast("string"),
            lit("; exactness not certifiable, raise capacity"))))
          .as("cnt"))
  }

  /** Corpus-level collocation mining: the bigrams most over-represented
    * relative to their parts — lift
    * `P(ab) / (P(a)·P(b)) = (c_ab/B) / ((c_a/N)·(c_b/N))`, the
    * log-free core of PMI and the word2vec phrase-detection rule
    * (Mikolov et al. 2013 §4). Where [[repetition]] measures bigram
    * repetition WITHIN a doc and [[tokenDrift]] ranks unigrams by
    * source, this ranks CROSS-CORPUS phrases — the signal that finds
    * boilerplate stock phrases and true multi-word terms before
    * tokenizer/vocab decisions bake them in.
    *
    * Determinism (the [[commonness]]/[[tokenDrift]] libm discipline):
    * all counts are integers; lift is computed in ONE fixed
    * parenthesization of integer-derived doubles —
    * `((c_ab·N)·N) / ((B·c_a)·c_b)` — identical IEEE ops in both
    * engines, no `ln`. A bigram of two corpus-exclusive words ties with
    * its peers by construction; ties break bigram ASC in UTF8 binary
    * order (= DuckDB varchar collation). The `minCount` floor keeps
    * one-off juxtapositions off the board.
    *
    * Scale design: ONE tokenize pass (checkpointed) feeds unigram
    * counts, bigram counts, and both totals; bigram→unigram count
    * attachment is two equi-joins on single-word keys (vocabulary-sized
    * right sides, shuffle equi-joins — never a cross product); ranking
    * is the bounded top-k aggregate (≤ k rows per task cross the
    * exchange, not the bigram vocabulary); count re-attachment is the
    * tokenDrift broadcast-back of the k winners. */
  def collocations(docs0: DataFrame, k: Int = 25,
                   minCount: Long = 5L): DataFrame =
    collocationsFrom(widen(docs0)
      .select(words(col("text")).as("ws")).coreCheckpoint(), k, minCount)

  /** [[collocations]] from a materialized words-array table —
    * shared-core form (unigram and bigram passes both re-read it). */
  private[scale] def collocationsFrom(ws: DataFrame, k: Int,
                                      minCount: Long): DataFrame = {
    val uni = ws.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .coreCheckpoint()
    val nTokens = uni.agg(coalesce(sum(col("c")), lit(0L)).as("n_tokens"))
    val bc = ws.filter(size(col("ws")) >= 2)
      .select(explode(shinglesFromWords(col("ws"), 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c_ab"))
      .coreCheckpoint()
    val nBigrams = bc.agg(coalesce(sum(col("c_ab")), lit(0L)).as("n_bigrams"))
    val scored = bc.filter(col("c_ab") >= minCount)
      .select(col("bg"), col("c_ab"),
        split(col("bg"), " ").getItem(0).as("wa"),
        split(col("bg"), " ").getItem(1).as("wb"))
      .join(uni.select(col("w").as("wa"), col("c").as("c_a")), Seq("wa"))
      .join(uni.select(col("w").as("wb"), col("c").as("c_b")), Seq("wb"))
      .crossJoin(nTokens).crossJoin(nBigrams)
      .withColumn("lift",
        (col("c_ab").cast("double") * col("n_tokens") * col("n_tokens")) /
          (col("n_bigrams").cast("double") * col("c_a") * col("c_b")))
    val top = scored.groupBy()
      .agg(graft.functions.TopKAgg.topKStr(col("lift"), col("bg"), k).as("top"))
      .select(posexplode(col("top")))
      .select((col("pos") + 1).as("rank"), col("col.id").as("bg"))
    scored.join(broadcast(top), Seq("bg"))
      .select(col("rank"), col("bg"), col("c_ab"), col("c_a"), col("c_b"),
        col("lift"))
  }

  /** q129: first-iteration BPE merge candidates — the top adjacent
    * character pairs across the corpus, weighted by word frequency:
    * the statistic a byte-pair-encoding tokenizer trainer (Sennrich
    * et al. 2016) computes to pick each merge, here the first
    * iteration over the raw character vocabulary.
    *
    * Scale design: the trainer trick that makes BPE feasible at
    * corpus scale is WORD-COUNT PREPROCESSING — pair statistics are
    * computed over the distinct-word table (Heaps-bounded: ~10⁸ rows
    * at 100 TB, vs ~10¹² corpus tokens) with each word's pairs
    * weighted by its count, never over the token stream. Here: one
    * shared tokenize pass ([[tokenCore]] — a batch run reuses the
    * memoized table), one vocabulary hash-aggregate, a bounded
    * explode (avg word length × vocabulary rows), and the top-k as
    * the capacity-bounded [[graft.functions.TopKAgg]] aggregate —
    * the exchange carries ≤ k rows per map task, never the pair
    * vocabulary. Determinism: counts are integers; ties break by
    * pair ASC in UTF8 binary order (= DuckDB varchar collation —
    * tokens are [a-z0-9]+ so byte order is unambiguous). */
  def bpeMerges(docs0: DataFrame, k: Int = 20, minCount: Long = 2L): DataFrame =
    bpeMergesFrom(widen(docs0)
      .select(explode(words(col("text"))).as("w")), k, minCount)

  /** [[bpeMerges]] from a bare token stream — shared-core form. */
  private[scale] def bpeMergesFrom(toks: DataFrame, k: Int,
                                   minCount: Long): DataFrame =
    bpeMergesFromFreq(
      toks.groupBy(col("w")).agg(count(lit(1)).as("cnt")), k, minCount)

  /** [[bpeMerges]] from the (w, cnt) vocabulary table — the form
    * [[bpeApply]] shares so one vocabulary aggregate feeds both the
    * merge mining and the application audit. */
  private[scale] def bpeMergesFromFreq(freq: DataFrame, k: Int,
                                       minCount: Long): DataFrame = {
    // pairs within a word keep duplicates (explode), each weighted by
    // the word's corpus count — `aa` in "aaa" counts twice per use
    val pairCnt = freq
      .filter(length(col("w")) >= 2)
      .select(col("cnt"),
        explode(transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("cnt")).as("cnt"))
      .filter(col("cnt") >= minCount)
    pairCnt.groupBy()
      .agg(graft.functions.TopKAgg.topKStr(
        col("cnt").cast("double"), col("pair"), k).as("top"))
      .select(posexplode(col("top")))
      .select((col("pos") + 1).as("rank"), col("col.id").as("pair"),
        col("col.score").cast("long").as("cnt"))
  }

  /** q133: BPE merge-application audit — certify-the-estimate for the
    * q129 merge table (the q103/q116 discipline applied to the
    * tokenizer trainer): q129's pair counts are the standard ADJACENT
    * pair statistic, which over-counts what a merge actually achieves
    * when occurrences overlap (`aaa` counts `aa` twice but one
    * left-to-right pass applies it once). Per mined pair, the ACTUAL
    * non-overlapping application count over the weighted vocabulary,
    * the words touched, and the overlap excess (estimate − actual, ≥ 0
    * always; > 0 names the run-heavy pairs whose estimate a trainer
    * should discount).
    *
    * Scale design: rides the SAME vocabulary aggregate as q129
    * (checkpointed — mining and application both read it); the
    * application pass is vocabulary × k broadcast rows, with actual
    * counts from one `regexp_replace` length delta per (word, pair) —
    * the pair is [a-z0-9]{2} so the literal-regex semantics (leftmost,
    * non-overlapping) are identical in both engines. No corpus-sized
    * exchange anywhere past the shared vocabulary build. */
  def bpeApply(docs0: DataFrame, k: Int = 20, minCount: Long = 2L): DataFrame =
    bpeApplyFrom(widen(docs0)
      .select(explode(words(col("text"))).as("w")), k, minCount)

  /** [[bpeApply]] from a bare token stream — shared-core form. */
  private[scale] def bpeApplyFrom(toks: DataFrame, k: Int,
                                  minCount: Long): DataFrame = {
    // the vocabulary feeds the merge mining AND the application join —
    // one aggregate, barriered (tfidf discipline)
    val freq = toks.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .coreCheckpoint()
    val merges = bpeMergesFromFreq(freq, k, minCount)
      .select(col("rank"), col("pair"), col("cnt").as("est_cnt"))
    freq.crossJoin(broadcast(merges))
      .filter(col("w").contains(col("pair")))
      .select(col("rank"), col("pair"), col("est_cnt"), col("cnt"),
        // each non-overlapping application replaces 2 chars with 1 —
        // the length delta IS the application count
        (length(col("w")) -
          length(regexp_replace(col("w"), col("pair"), lit("@")))).as("napp"))
      .groupBy(col("rank"), col("pair"), col("est_cnt"))
      .agg(sum(col("cnt") * col("napp")).as("n_applications"),
        count(lit(1)).as("n_words"))
      .withColumn("overlap_excess", col("est_cnt") - col("n_applications"))
      .select(col("rank"), col("pair"), col("est_cnt"),
        col("n_applications"), col("n_words"), col("overlap_excess"))
  }

  /** q139: the BPE merge LOOP — `iters` mine→apply→re-mine rounds over
    * the word-count vocabulary, the part a tokenizer trainer actually
    * runs (q129 is iteration 1's statistic; q133 certifies its overlap
    * bias; this proves the word-count representation SURVIVES the
    * loop). Each round mines the argmax adjacent pair, rewrites the
    * vocabulary by replacing the pair with a fresh single-character
    * symbol outside the [a-z0-9] token alphabet ('A', 'B', …), and
    * re-mines over the rewritten vocabulary — exactly how Sennrich et
    * al. 2016 iterate on the word-count dictionary. Per iteration: the
    * chosen pair (in symbol space), its fully-expanded base-character
    * spelling, and its weighted count.
    *
    * Scale design: each round is ONE Heaps-bounded-vocabulary
    * aggregate (pair counts, map-side partials), a TakeOrdered(1)
    * argmax (1 row crosses the exchange), and a map-side vocabulary
    * rewrite — fixed rounds with a checkpoint each (the LPA/PageRank
    * discipline); the corpus token stream is never revisited after the
    * shared vocabulary build. The 1-row argmax rides to the driver as
    * a plan constant (the pqTrainedCents discipline). The rewrite
    * needs NO count re-aggregation: merged symbols are fresh
    * characters absent from every input word, so the rewrite is
    * injective on the vocabulary (char-wise expansion inverts it) and
    * counts carry over unchanged.
    *
    * Determinism: counts are integers; the argmax breaks ties pair
    * ASC in UTF8 binary order (symbols are single-byte ASCII);
    * `replace` is leftmost-non-overlapping literal replacement in
    * both engines — which is also the greedy left-to-right order a
    * BPE encoder applies a single merge in. */
  def bpeLoop(docs0: DataFrame, iters: Int = 3,
              minCount: Long = 2L): DataFrame =
    bpeLoopFrom(widen(docs0)
      .select(explode(words(col("text"))).as("w")), iters, minCount)

  /** [[bpeLoop]] from a bare token stream — shared-core form. */
  private[scale] def bpeLoopFrom(toks: DataFrame, iters: Int,
                                 minCount: Long): DataFrame = {
    require(iters >= 1 && iters <= 26, s"bpe_loop: iters $iters not in [1,26]")
    val session = toks.sparkSession
    var vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .coreCheckpoint()
    // sym -> fully-expanded base spelling, for the decoded column
    val expansion = scala.collection.mutable.Map.empty[Char, String]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (i <- 1 to iters) {
      val sym = ('A' + (i - 1)).toChar
      val (pair, cnt) = minePair(vocab, minCount).getOrElse(
        throw new IllegalArgumentException(
          s"bpe_loop: no pair meets minCount=$minCount at iteration $i"))
      val decoded = pair.flatMap(c => expansion.getOrElse(c, c.toString))
      out += ((i, pair, decoded, cnt))
      expansion(sym) = decoded
      if (i < iters)
        vocab = applyMerge(vocab, pair, sym)
    }
    import session.implicits._
    out.toSeq.toDF("iter", "pair", "decoded", "cnt")
  }

  /** One BPE mining round: the (cnt DESC, pair ASC) argmax adjacent
    * pair over a (w, cnt) vocabulary — a vocabulary aggregate plus a
    * TakeOrdered(1); the 1-row result rides to the driver as a plan
    * constant. Shared by [[bpeLoop]] and [[bpeCompression]]. */
  private def minePair(vocab: DataFrame,
                       minCount: Long): Option[(String, Long)] =
    vocab.filter(length(col("w")) >= 2)
      .select(col("cnt"),
        explode(transform(sequence(lit(1), length(col("w")) - 1),
          j => col("w").substr(j, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("cnt")).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(1).collect()
      .headOption.map(r => (r.getAs[String]("pair"), r.getAs[Long]("cnt")))

  /** Rewrite the vocabulary with one merge: leftmost-non-overlapping
    * literal replacement of `pair` by the fresh symbol — map-side,
    * checkpointed (fixed-round lineage discipline). */
  private def applyMerge(vocab: DataFrame, pair: String,
                         sym: Char): DataFrame =
    vocab.select(replace(col("w"), lit(pair), lit(sym.toString)).as("w"),
      col("cnt")).coreCheckpoint()

  /** q157: per-language BPE fertility — the tokenizer-equity read a
    * multilingual mixture owner puts next to the q138/q149 boards:
    * merges are mined GLOBALLY (the q139 loop — majority languages
    * dominate the pair statistics, exactly as in a real shared
    * tokenizer), then applied to each language's own vocabulary, and
    * the per-language symbols-per-word before/after tells who the
    * shared vocabulary actually serves. A language whose fertility
    * barely moves pays more sequence positions per word than the
    * majority language — the inequity that motivates per-language
    * boosts in the first place.
    *
    * Scale design: the [[bpeLoop]] machinery (Heaps-bounded global
    * vocabulary, TakeOrdered(1) argmax per round) plus a per-(lang,
    * word) vocabulary that is rewritten map-side each round and
    * reduced to ≤ n_langs rows at the end; nothing rescans the corpus
    * after the two initial aggregates. Determinism: symbol counts are
    * exact integers, the three fertility columns are single r6'd IEEE
    * divisions. */
  def bpeFertility(docs0: DataFrame, iters: Int = 3,
                   minCount: Long = 2L): DataFrame = {
    require(iters >= 1 && iters <= 26,
      s"bpe_fertility: iters $iters not in [1,26]")
    def r6(c: Column): Column = floor(c * 1000000d + 0.5d) / 1000000d
    val toks = widen(docs0)
      .select(col("lang"), explode(words(col("text"))).as("w"))
    var vocabG = toks.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .coreCheckpoint()
    val l0 = toks.groupBy(col("lang"), col("w"))
      .agg(count(lit(1)).as("cnt")).coreCheckpoint()
    var vocabL = l0
    val base = l0.groupBy(col("lang"))
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * length(col("w"))).as("raw_chars"))
    for (i <- 1 to iters) {
      val sym = ('A' + (i - 1)).toChar
      val (pair, _) = minePair(vocabG, minCount).getOrElse(
        throw new IllegalArgumentException(
          s"bpe_fertility: no pair meets minCount=$minCount at iteration $i"))
      if (i < iters) vocabG = applyMerge(vocabG, pair, sym)
      vocabL = vocabL.select(col("lang"),
        replace(col("w"), lit(pair), lit(sym.toString)).as("w"), col("cnt"))
        .coreCheckpoint()
    }
    val merged = vocabL.groupBy(col("lang"))
      .agg(sum(col("cnt") * length(col("w"))).as("merged_symbols"))
    base.join(merged, Seq("lang"))
      .select(col("lang"), col("n_words"), col("raw_chars"),
        col("merged_symbols"),
        r6(col("raw_chars").cast("double") / col("n_words")).as("fert_raw"),
        r6(col("merged_symbols").cast("double") / col("n_words"))
          .as("fert_merged"),
        r6((col("raw_chars") - col("merged_symbols")).cast("double")
          / col("raw_chars")).as("saved_frac"))
  }

  /** q142: BPE compression trajectory — the metric a tokenizer trainer
    * actually tracks across the [[bpeLoop]] iterations: after applying
    * merges 1..i, the corpus size in SYMBOLS (Σ count·len over the
    * rewritten vocabulary), the symbols saved by iteration i's merge
    * (= its actual non-overlapping application count, the q133
    * statistic re-derived by the rewrite itself), and the compression
    * ratio vs the raw character baseline. Row 0 is the baseline.
    *
    * Scale design: the [[bpeLoop]] machinery plus ONE Heaps-bounded
    * vocabulary aggregate per iteration (Σ cnt·len collapses map-side
    * to 1 row). Determinism: symbol counts are integers; the ratio is
    * one IEEE division floor-rounded to 6 decimals (the r6
    * discipline). */
  def bpeCompression(docs0: DataFrame, iters: Int = 3,
                     minCount: Long = 2L): DataFrame =
    bpeCompressionFrom(widen(docs0)
      .select(explode(words(col("text"))).as("w")), iters, minCount)

  /** [[bpeCompression]] from a bare token stream — shared-core form. */
  private[scale] def bpeCompressionFrom(toks: DataFrame, iters: Int,
                                        minCount: Long): DataFrame = {
    require(iters >= 1 && iters <= 26,
      s"bpe_compression: iters $iters not in [1,26]")
    val session = toks.sparkSession
    var vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .coreCheckpoint()
    def symbols(v: DataFrame): Long =
      v.agg(coalesce(sum(col("cnt") * length(col("w"))), lit(0L)).as("s"))
        .collect()(0).getAs[Long]("s")
    val base = symbols(vocab)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Option[String], Long, Long, Double)]
    out += ((0, None, base, 0L, 1.0))
    var prev = base
    for (i <- 1 to iters) {
      val sym = ('A' + (i - 1)).toChar
      val (pair, _) = minePair(vocab, minCount).getOrElse(
        throw new IllegalArgumentException(
          s"bpe_compression: no pair meets minCount=$minCount at iteration $i"))
      vocab = applyMerge(vocab, pair, sym)
      val cur = symbols(vocab)
      out += ((i, Some(pair), cur, prev - cur,
        math.floor(cur.toDouble / base * 1e6 + 0.5) / 1e6))
      prev = cur
    }
    import session.implicits._
    out.toSeq.toDF("iter", "pair", "total_symbols", "saved", "ratio")
  }

  /** Corpus health report — the one-row dashboard a pipeline operator
    * reads daily, composing the gate battery: corpus size and language
    * spread, Gopher/repetition/joint-keep pass counts, PII incidence,
    * and exact-duplicate pressure (groups + excess copies), with the
    * two headline rates.
    *
    * Scale design: four independent one-pass aggregates (gate flags,
    * base counts, PII flags, md5-group dedup), each reduced to ONE row
    * with map-side partials, then 1-row cross joins — the documented
    * safe cross-join shape. Catalyst prunes what each branch doesn't
    * need (e.g. [[piiScan]]'s redaction column never evaluates here —
    * only the any_pii flag is referenced). */
  def corpusReport(docs: DataFrame): DataFrame = {
    val gate = curationGate(docs).agg(
      count(when(col("gopher_pass"), 1)).as("n_gopher_pass"),
      count(when(col("rep_pass"), 1)).as("n_rep_pass"),
      count(when(col("keep"), 1)).as("n_keep"))
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("lang")).as("n_langs"))
    val pii = piiScan(docs).agg(
      count(when(col("any_pii"), 1)).as("n_pii"))
    val dups = Dedup.exactDedup(docs).agg(
      count(when(col("n_copies") > 1, 1)).as("n_dup_groups"),
      coalesce(sum(when(col("n_copies") > 1, col("n_copies") - 1)), lit(0L))
        .as("n_excess_copies"))
    base.crossJoin(gate).crossJoin(pii).crossJoin(dups)
      .select(col("n_docs"), col("n_langs"),
        col("n_gopher_pass"), col("n_rep_pass"), col("n_keep"), col("n_pii"),
        col("n_dup_groups"), col("n_excess_copies"),
        portableRound(col("n_keep").cast("double") / col("n_docs"), 4).as("keep_rate"),
        portableRound(col("n_pii").cast("double") / col("n_docs"), 4).as("pii_rate"))
  }

  /** Corpus stats rollup per (lang, source): doc counts + char-length
    * distribution — one hash-aggregate pass. */
  def corpusStats(docs: DataFrame): DataFrame =
    docs.groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        portableRound(avg(col("n_chars")), 2).as("avg_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        min(col("doc_id")).as("first_doc"))

  /** q162: n-gram LM fluency gate — the CCNet/KenLM-style "does a
    * reference language model find this text plausible" filter. An
    * add-one-smoothed BIGRAM model is trained on the q140 TRAIN split
    * only (val/test are scored by a model that never saw them), the
    * vocabulary is the top-`vocabSize` train unigrams (everything else
    * maps to `<unk>`), and the shipped model is the top-`maxBigrams`
    * bigram table — a BOUNDED artifact, the way a production KenLM
    * ships as a fixed file, never a corpus-scale side input. Per
    * document: bigram count, how many bigrams the model has seen
    * (`n_hits`/`hit_rate`), how many conditioned on an
    * out-of-vocabulary context, and the mean smoothed bigram
    * probability `mean_p` — the fluency score (low = the gibberish /
    * pathological text the filter drops). Beyond-reference scale
    * operator (the LLM-data-pipeline layer), like the rest of the
    * curation battery.
    *
    * Log-free on purpose: true perplexity exponentiates a mean LOG
    * probability, but libm `ln` differs across engines by ulps (the
    * same reason q67 keeps the BM25 odds-ratio un-logged and q74 omits
    * the sigmoid); the mean probability ranks documents for the same
    * gate decision from exact-integer inputs. Each probability is ONE
    * IEEE division of exact integers ((c2+1)/(c1+V+1)) — bit-identical
    * in any engine — then fixed-point-scaled to a BIGINT so the
    * per-doc mean is an order-free integer sum, never a float
    * accumulation.
    *
    * Scale design: the model is built with two token-keyed aggregates
    * (map-side partials collapse the Zipf-hot words/bigrams per task
    * before the exchange) and two bounded TakeOrderedAndProject
    * selections; vocab and bigram table are then BROADCAST, so the
    * scoring pass is scan-side — raw bigrams explode from each doc's
    * token array (no positional self-join), broadcast hash lookups
    * attach counts, and the only corpus shuffle is the final
    * doc_id-keyed aggregate (unique-ish keys, no skew). The `<unk>`
    * unigram mass is exact: total train tokens minus in-vocab tokens,
    * two 1-row aggregates cross-joined (the documented 1-row broadcast
    * shape). */
  def lmFluency(docs0: DataFrame, vocabSize: Int = 1024,
                maxBigrams: Int = 1 << 16): DataFrame =
    lmFluencyFrom(tokenCore(docs0), vocabSize, maxBigrams)

  /** [[lmFluency]] from the (doc_id, ws) token core — shared-core form
    * for the gate registry. */
  private[scale] def lmFluencyFrom(core0: DataFrame, vocabSize: Int,
                                   maxBigrams: Int): DataFrame =
    lmFluencyFromScored(lmScoredBigrams(core0, vocabSize, maxBigrams))

  /** The q162 per-doc rollup over a scored-bigram stream — split out
    * so the gate registry can feed q162 and q167 from ONE memoized
    * stream (the LM build + corpus scoring pass is the dominant cost
    * of both boards; a batch run pays it once). */
  private[scale] def lmFluencyFromScored(scored: DataFrame): DataFrame = {
    def r6(c: Column): Column = floor(c * 1000000d + 0.5d) / 1000000d
    scored
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        count(when(col("hit"), 1)).as("n_hits"),
        count(when(col("unk_ctx"), 1)).as("n_unk_ctx"),
        sum(col("p9")).as("sp9"))
      .select(col("doc_id"), col("n_bigrams"), col("n_hits"), col("n_unk_ctx"),
        r6(col("n_hits").cast("double") / col("n_bigrams")).as("hit_rate"),
        r6(col("sp9").cast("double") /
          (col("n_bigrams").cast("double") * 1000000000d)).as("mean_p"))
  }

  /** The scored-bigram stream shared by q162 (per-doc rollup) and q167
    * (per-source rollup): one row per corpus bigram with its model hit
    * flag, unk-context flag and fixed-point smoothed probability. The
    * optional `source` column rides along when the core carries it. */
  private def lmScoredBigrams(core0: DataFrame, vocabSize: Int,
                              maxBigrams: Int): DataFrame = {
    val passthrough =
      if (core0.columns.contains("source")) Seq(col("source")) else Nil
    val core = core0.select(Seq(col("doc_id")) ++ passthrough ++
      Seq(col("ws")): _*)
    val train = core.filter(Curation.splitExpr(col("doc_id")) === "train")
    // train unigram counts — a Heaps-bounded vocabulary table; it
    // feeds the top-V selection AND the exact token totals, so
    // checkpoint the one aggregate instead of tokenizing train twice
    val wordCnt = train.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .coreCheckpoint()
    // vocab is NOT checkpointed: each of its consumers (four broadcast
    // exchanges + the total) re-derives the bounded TopK from the
    // checkpointed wordCnt — cheaper than an extra eager job barrier
    // when the whole gate board contends for task slots
    val vocab = wordCnt.orderBy(col("cnt").desc, col("w").asc)
      .limit(vocabSize)
    val unk = wordCnt.agg(coalesce(sum(col("cnt")), lit(0L)).as("t"))
      .crossJoin(vocab.agg(coalesce(sum(col("cnt")), lit(0L)).as("v")))
      .select((col("t") - col("v")).as("unk_cnt"))
    // raw bigram rows from the token array — ONE native shingle-kernel
    // pass (tokens are space-free by the words() contract, so the
    // "w1 w2" shingle splits back losslessly); vocab membership +
    // context count attach by broadcast hash lookups
    def bigramRows(df: DataFrame): DataFrame =
      df.select(Seq(col("doc_id")) ++ passthrough ++
          Seq(explode(shinglesFromWords(col("ws"), 2)).as("raw")): _*)
        .withColumn("w1", substring_index(col("raw"), " ", 1))
        .withColumn("w2", substring_index(col("raw"), " ", -1))
        .drop("raw")
        .join(broadcast(vocab.select(col("w").as("w1"), col("cnt").as("c1v"))),
          Seq("w1"), "left")
        .join(broadcast(vocab.select(col("w").as("w2"), lit(1).as("in2"))),
          Seq("w2"), "left")
        .withColumn("m1",
          when(col("c1v").isNotNull, col("w1")).otherwise(lit("<unk>")))
        .withColumn("m2",
          when(col("in2").isNotNull, col("w2")).otherwise(lit("<unk>")))
        .withColumn("bigram", concat_ws(" ", col("m1"), col("m2")))
    // the shipped model: top-B train bigrams over the mapped alphabet
    val bigCnt = bigramRows(train)
      .groupBy(col("bigram")).agg(count(lit(1)).as("c2"))
      .orderBy(col("c2").desc, col("bigram").asc).limit(maxBigrams)
    val denom = lit((vocabSize + 1).toLong)
    bigramRows(core)
      .join(broadcast(bigCnt), Seq("bigram"), "left")
      .crossJoin(broadcast(unk))
      .select(Seq(col("doc_id")) ++ passthrough ++ Seq(
        col("c2").isNotNull.as("hit"),
        (col("m1") === "<unk>").as("unk_ctx"),
        floor(((coalesce(col("c2"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("c1v"), col("unk_cnt")) + denom).cast("double"))
          * 1000000000d + 0.5d).cast("long").as("p9")): _*)
  }

  /** q167: LM-signal domain reweighting — the DoReMi-shaped read: a
    * source whose text the reference LM finds LESS fluent than the
    * corpus average carries information the model hasn't absorbed, so
    * its mixture weight gets a boost proportional to that excess
    * (DoReMi proper trains a proxy model per round; this board is the
    * one-shot analogue using the q162 bigram LM as the loss proxy —
    * `excess = max(0, corpus_mean_p − source_mean_p)`). Per source:
    * token share, micro-averaged fluency, excess, the boosted raw
    * weight `share × (1 + α·excess)` and the normalized mixture
    * weight. q138 reweights by SIZE (temperature); this reweights by
    * MODEL SIGNAL — the two boards bracket the mixture decision.
    *
    * Determinism: per-source fluency means come from exact BIGINT p9
    * sums (the q162 contract); excess subtracts two r6 values; the
    * boost and raw weight are a fixed two-op IEEE chain; raw weights
    * are r6'd BEFORE the normalizer so the weight-sum rides the
    * DECIMAL(18,6) exact accumulator (the q138 normalization
    * discipline) — partition order can't move any digit.
    *
    * Scale design: rides the q162 scored-bigram stream (the model
    * build is the same two bounded aggregates); adds one source-keyed
    * aggregate (map-side partials), a ≤ n_sources corpus rollup and
    * 1-row broadcast joins. Nothing new touches the corpus. */
  def domainReweight(docs0: DataFrame, vocabSize: Int = 1024,
                     maxBigrams: Int = 1 << 16,
                     alpha: Double = 10d): DataFrame =
    domainReweightFrom(tokenCore(docs0), vocabSize, maxBigrams, alpha)

  /** [[domainReweight]] from the (doc_id, source, ws) token core —
    * shared-core form for the gate registry. */
  private[scale] def domainReweightFrom(core: DataFrame, vocabSize: Int,
                                        maxBigrams: Int,
                                        alpha: Double): DataFrame =
    domainReweightFromScored(core,
      lmScoredBigrams(core, vocabSize, maxBigrams), alpha)

  /** The q167 rollup over a pre-scored bigram stream (plus the token
    * core for per-source doc/token counts) — shared-stream form. */
  private[scale] def domainReweightFromScored(core: DataFrame,
                                              scoredBigrams: DataFrame,
                                              alpha: Double): DataFrame = {
    def r6(c: Column): Column = floor(c * 1000000d + 0.5d) / 1000000d
    require(core.columns.contains("source"), "domainReweight needs source")
    val srcTok = core.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(size(col("ws"))).as("n_toks"))
    val perSrc = scoredBigrams
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p9")).as("sp9"))
      .coreCheckpoint() // ≤ n_sources rows; feeds the corpus rollup too
    val corpus = perSrc.agg(sum(col("n_bigrams")).as("nbt"),
      sum(col("sp9")).as("spt"))
    val tokTot = srcTok.agg(sum(col("n_toks")).as("toks_total"))
    val meanP = r6(col("sp9").cast("double") /
      (col("n_bigrams").cast("double") * 1000000000d))
    val corpusMeanP = r6(col("spt").cast("double") /
      (col("nbt").cast("double") * 1000000000d))
    // LEFT join: a source whose docs all have < 2 tokens has no
    // bigram rows, but it still holds token share — dropping it would
    // publish weights that don't sum to 1 (its tokens stay in
    // toks_total). It gets n_bigrams = 0, NULL mean_p (no evidence),
    // excess = 0 (no boost), and rides the share-only weight.
    val boosted = srcTok.join(perSrc, Seq("source"), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
      .crossJoin(broadcast(corpus)).crossJoin(broadcast(tokTot))
      .select(col("source"), col("n_docs"), col("n_toks"), col("n_bigrams"),
        when(col("n_bigrams") > 0L, meanP).as("mean_p"),
        when(col("n_bigrams") > 0L, greatest(lit(0d), corpusMeanP - meanP))
          .otherwise(lit(0d)).as("excess"),
        (col("n_toks").cast("double") / col("toks_total").cast("double"))
          .as("share_raw"))
      .withColumn("w6",
        r6(col("share_raw") * (lit(1d) + lit(alpha) * col("excess"))))
      .coreCheckpoint() // bounded; feeds the normalizer and the output
    val wtot = boosted.agg(exactSum(col("w6")).as("wtot"))
    boosted.crossJoin(broadcast(wtot))
      .select(col("source"), col("n_docs"), col("n_toks"), col("n_bigrams"),
        col("mean_p"), r6(col("excess")).as("excess"),
        r6(col("share_raw")).as("share"), col("w6").as("raw_weight"),
        r6(col("w6") / col("wtot")).as("weight"))
  }

  /** q171: stupid-backoff bigram scoring — the Brants et al. 2007
    * ("Large Language Models in Machine Translation") scheme, the
    * production alternative to q162's add-one smoothing: a bigram the
    * shipped model knows scores the exact MLE ratio c2/c1; a bigram
    * it doesn't BACKS OFF to the context-free unigram share scaled by
    * the fixed discount α = 2/5 (Brants' 0.4, kept a rational so no
    * decimal literal is in play). Scores are unnormalized by design
    * (Brants' S, not P — "stupid" is the published name): they rank
    * documents for the same gate decision while never paying add-one's
    * bias toward small vocabularies, and disagreement between the two
    * boards (high q162 mean_p with low q171 hit share) is the
    * signature of a document whose apparent fluency is smoothing mass,
    * not model coverage. "Miss" means not in the TOP-maxBigrams
    * shipped table — the bounded-artifact contract q162 set.
    *
    * Determinism (the q162 discipline): vocabulary, bigram table and
    * all counts are exact integers; a hit is ONE IEEE division of
    * exact integers (c2 ≤ c1 by construction); a backoff is
    * (2·c(w2)) / (5·T) where both sides are exact integer PRODUCTS —
    * one exactly-rounded division, never a 0.4 multiply after a
    * divide; fixed-point p9 longs make the per-doc mean an order-free
    * BIGINT sum.
    *
    * Scale design: identical to q162 — two bounded token-keyed
    * aggregates build the model (map-side partials swallow the Zipf
    * head), vocab / bigram table / the 1-row totals broadcast, the
    * scoring pass is scan-side over the shared token core, and the
    * only corpus shuffle is the final doc-keyed rollup. */
  def lmBackoff(docs0: DataFrame, vocabSize: Int = 1024,
                maxBigrams: Int = 1 << 16): DataFrame =
    lmBackoffFrom(tokenCore(docs0), vocabSize, maxBigrams)

  /** [[lmBackoff]] from the (doc_id, ws) token core — shared-core form
    * for the gate registry. */
  private[scale] def lmBackoffFrom(core0: DataFrame, vocabSize: Int,
                                   maxBigrams: Int): DataFrame = {
    def r6(c: Column): Column = floor(c * 1000000d + 0.5d) / 1000000d
    val core = core0.select(col("doc_id"), col("ws"))
    val train = core.filter(Curation.splitExpr(col("doc_id")) === "train")
    val wordCnt = train.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .coreCheckpoint()
    val vocab = wordCnt.orderBy(col("cnt").desc, col("w").asc)
      .limit(vocabSize)
    // T (total train tokens) and the <unk> unigram mass, one row
    val tot = wordCnt.agg(coalesce(sum(col("cnt")), lit(0L)).as("t"))
      .crossJoin(vocab.agg(coalesce(sum(col("cnt")), lit(0L)).as("v")))
      .select(col("t"), (col("t") - col("v")).as("unk_cnt"))
    def bigramRows(df: DataFrame): DataFrame =
      df.select(col("doc_id"),
          explode(shinglesFromWords(col("ws"), 2)).as("raw"))
        .withColumn("w1", substring_index(col("raw"), " ", 1))
        .withColumn("w2", substring_index(col("raw"), " ", -1))
        .drop("raw")
        .join(broadcast(vocab.select(col("w").as("w1"), col("cnt").as("c1v"))),
          Seq("w1"), "left")
        .join(broadcast(vocab.select(col("w").as("w2"), col("cnt").as("c2v"))),
          Seq("w2"), "left")
        .withColumn("m1",
          when(col("c1v").isNotNull, col("w1")).otherwise(lit("<unk>")))
        .withColumn("m2",
          when(col("c2v").isNotNull, col("w2")).otherwise(lit("<unk>")))
        .withColumn("bigram", concat_ws(" ", col("m1"), col("m2")))
    val bigCnt = bigramRows(train)
      .groupBy(col("bigram")).agg(count(lit(1)).as("c2"))
      .orderBy(col("c2").desc, col("bigram").asc).limit(maxBigrams)
    val scored = bigramRows(core)
      .join(broadcast(bigCnt), Seq("bigram"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        col("c2").isNotNull.as("hit"),
        floor(when(col("c2").isNotNull,
            col("c2").cast("double") /
              coalesce(col("c1v"), col("unk_cnt")).cast("double"))
          // t = 0 (empty train split) would make the backoff division
          // 0/0 → NaN, which Spark's cast-to-long maps to 0 while
          // DuckDB's CAST(FLOOR(NaN)) errors — pin the score to 0 in
          // BOTH engines so the degenerate corpus stays cross-portable
          .otherwise(when(col("t") > 0,
            (coalesce(col("c2v"), col("unk_cnt")) * lit(2L)).cast("double") /
              (col("t") * lit(5L)).cast("double")).otherwise(lit(0d)))
          * 1000000000d + 0.5d).cast("long").as("s9"))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        count(when(col("hit"), 1)).as("n_hits"),
        sum(col("s9")).as("ss9"))
      .select(col("doc_id"), col("n_bigrams"), col("n_hits"),
        (col("n_bigrams") - col("n_hits")).as("n_backoff"),
        r6(col("n_hits").cast("double") / col("n_bigrams")).as("hit_rate"),
        r6(col("ss9").cast("double") /
          (col("n_bigrams").cast("double") * 1000000000d)).as("mean_s"))
  }

  /** q164: quality-signal correlation board — per source, the Pearson
    * correlation between every pair of the q34 quality sub-signals
    * (word count, stopword ratio, punctuation ratio, composite
    * quality). The signals-redundancy read a curation owner does
    * before adding a new filter: a pair at |r| ≈ 1 means the second
    * signal adds no information and its gate threshold is a disguised
    * copy of the first; a near-zero pair justifies keeping both. Run
    * per source because signal coupling differs by corpus (code vs
    * prose vs chat).
    *
    * Determinism: each signal is an exact integer (the r4-rounded
    * ratios fixed-point-scaled ×10⁴), every moment (Σx, Σx², Σxy) is
    * an EXACT decimal sum — associative, partition-order-proof, the
    * [[graft.functions.PortableFuncs.exactSum]] discipline widened to
    * DECIMAL(38,0) (DuckDB's HUGEINT twin) so second moments keep
    * headroom at 10¹¹ documents — and the only floating-point steps
    * are one cast of each exact integer moment to double, two IEEE
    * sqrt (exactly rounded by spec), one multiply, one divide, then
    * r6. `corr` is NULL when either signal is constant within the
    * source (zero variance). Built-in `corr()` would stream double
    * accumulations in partition order and could never hash-match.
    *
    * Scale design: ONE corpus scan (the signals are scan-side
    * projections of the memoized quality core), one hash-aggregate
    * keyed by source computing all 14 moments with map-side partials,
    * then the pair board explodes from the ≤ n_sources aggregate rows
    * — never from data. */
  def signalCorrelation(docs0: DataFrame): DataFrame =
    signalCorrelationFrom(scoredDocs(docs0))

  /** [[signalCorrelation]] from the pre-scored quality table —
    * shared-core form for the gate registry. */
  private[scale] def signalCorrelationFrom(scored: DataFrame): DataFrame = {
    def r6(c: Column): Column = floor(c * 1000000d + 0.5d) / 1000000d
    def s4(c: Column): Column = floor(c * 10000d + 0.5d).cast("long")
    val sigs: Seq[(String, Column)] = Seq(
      "n_words" -> col("n_words").cast("long"),
      "stop_ratio" -> s4(col("stop_ratio")),
      "punct_ratio" -> s4(col("punct_ratio")),
      "quality" -> s4(col("quality")))
    val base = scored.select(
      col("source") +: sigs.map { case (n, c) => c.as(s"s_$n") }: _*)
    val pairNames =
      for { i <- sigs.indices; j <- i + 1 until sigs.size }
        yield (sigs(i)._1, sigs(j)._1)
    val dec = DecimalType(38, 0)
    val moments: Seq[Column] =
      sigs.map { case (n, _) => sum(col(s"s_$n").cast(dec)).as(s"sx_$n") } ++
      sigs.map { case (n, _) =>
        sum((col(s"s_$n") * col(s"s_$n")).cast(dec)).as(s"sxx_$n") } ++
      pairNames.map { case (a, b) =>
        sum((col(s"s_$a") * col(s"s_$b")).cast(dec)).as(s"sxy_${a}_$b") }
    val allAggs = count(lit(1)).as("n") +: moments
    val g = base.groupBy(col("source")).agg(allAggs.head, allAggs.tail: _*)
    val nD = col("n").cast(dec)
    def pairStruct(a: String, b: String): Column = {
      val num = (nD * col(s"sxy_${a}_$b") - col(s"sx_$a") * col(s"sx_$b"))
        .cast("double")
      val denx = (nD * col(s"sxx_$a") - col(s"sx_$a") * col(s"sx_$a"))
        .cast("double")
      val deny = (nD * col(s"sxx_$b") - col(s"sx_$b") * col(s"sx_$b"))
        .cast("double")
      struct(lit(a).as("sig_a"), lit(b).as("sig_b"),
        when(denx > 0 && deny > 0,
          r6(num / (sqrt(denx) * sqrt(deny)))).as("corr"))
    }
    g.select(col("source"), col("n").as("n_docs"),
        explode(array(pairNames.map { case (a, b) => pairStruct(a, b) }: _*))
          .as("p"))
      .select(col("source"), col("p.sig_a").as("sig_a"),
        col("p.sig_b").as("sig_b"), col("n_docs"), col("p.corr").as("corr"))
  }

  // ---- driver-gate query registry ----

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_lang_id" -> ((s, d) => langId(T.documents(s, d))),
    "q34_quality_score" -> ((s, d) => gateScored(s, d).select(
      col("doc_id"), col("n_words"), col("avg_wlen"), col("stop_ratio"),
      col("punct_ratio"), col("digit_ratio"), col("quality"))),
    "q35_token_count" -> ((s, d) => tokenCount(T.documents(s, d))),
    "q117_length_histogram" -> ((s, d) => lengthHistogram(T.documents(s, d))),
    "q125_source_quality" -> ((s, d) => sourceQualityFrom(gateScored(s, d))),
    "q36_fingerprint" -> ((s, d) => fingerprint(T.documents(s, d))),
    "q37_corpus_stats" -> ((s, d) => corpusStats(T.documents(s, d))),
    "q46_lang_ngram" -> ((s, d) => langNgramConfusion(T.documents(s, d))),
    "q60_commonness" -> ((s, d) => commonnessFrom(gateTokens(s, d)
      .select(col("doc_id"), explode(col("ws")).as("w")))),
    "q64_gopher_rules" -> ((s, d) => gopherRules(T.documents(s, d))),
    "q65_repetition" -> ((s, d) => repetition(T.documents(s, d))),
    "q66_tfidf" -> ((s, d) => tfidfTopFrom(gateTokens(s, d), k = 5)),
    "q67_bm25" -> ((s, d) => bm25From(gateTokens(s, d),
      terms = Seq("spark", "join", "query"), k = 10)),
    // the compiled gate-flag chain is memoized: q70 publishes it and
    // q169's ledger reads the same table
    "q70_curation_gate" -> ((s, d) => gateCuration(s, d)),
    "q72_pii_scan" -> ((s, d) => piiScan(T.documents(s, d))),
    "q74_classifier_score" -> ((s, d) => classifierScore(T.documents(s, d))),
    "q75_vocab_coverage" -> ((s, d) => vocabCoverageFrom(gateTokens(s, d)
      .select(explode(col("ws")).as("w")), topK = 200)),
    "q78_corpus_report" -> ((s, d) => corpusReport(T.documents(s, d))),
    // maximal repeated word-run per doc (suffix automaton, scan-side)
    "q89_longest_dup" -> ((s, d) => longestRepetition(T.documents(s, d))),
    // per-source over-represented tokens (mixture drift QA)
    "q94_token_drift" -> ((s, d) => tokenDriftFrom(gateTokens(s, d)
      .select(col("source"), explode(col("ws")).as("w")),
      k = 10, minCount = 3L)),
    // topic labels for embedding clusters: scan-side cell assignment
    // × per-cell over-represented tokens
    "q104_cluster_topics" -> ((s, d) =>
      clusterTopicsFrom(gateTokens(s, d), T.embeddings(s, d),
        nCells = Similarity.IvfCells, k = 10, minCount = 3L)),
    // exact top-k tokens via the capacity-bounded Misra–Gries sketch +
    // exact confirm; guarded identical to the plain exact form
    "q96_heavy_hitters" -> ((s, d) => heavyHittersFrom(gateTokens(s, d)
      .select(explode(col("ws")).as("w")), k = 20, capacity = 256)),
    // cross-corpus phrase mining: top bigrams by lift (log-free PMI)
    "q97_collocations" -> ((s, d) =>
      collocationsFrom(gateTokens(s, d).select(col("ws")),
        k = 25, minCount = 5L)),
    // first-iteration BPE merge table over the word-count vocabulary
    "q129_bpe_merges" -> ((s, d) => bpeMergesFrom(gateTokens(s, d)
      .select(explode(col("ws")).as("w")), k = 20, minCount = 2L)),
    // per-source PII incidence: which crawl needs the redaction pass
    "q130_source_pii" -> ((s, d) => sourcePii(T.documents(s, d))),
    // classifier calibration: bucket mean gold quality vs score —
    // fed from the memoized token + quality cores in a batch run
    "q131_score_calibration" -> ((s, d) => scoreCalibrationFrom(
      calibScoredFrom(gateTokens(s, d), gateScored(s, d), 10), 10)),
    // merge-application audit: q129's estimate vs actual non-
    // overlapping applications over the weighted vocabulary
    "q133_bpe_apply" -> ((s, d) => bpeApplyFrom(gateTokens(s, d)
      .select(explode(col("ws")).as("w")), k = 20, minCount = 2L)),
    // the merge LOOP: three mine→apply→re-mine rounds over the
    // word-count vocabulary (rides the memoized token core)
    "q139_bpe_loop" -> ((s, d) => bpeLoopFrom(gateTokens(s, d)
      .select(explode(col("ws")).as("w")), iters = 3, minCount = 2L)),
    // compression trajectory across the q139 merge rounds
    "q142_bpe_compression" -> ((s, d) => bpeCompressionFrom(gateTokens(s, d)
      .select(explode(col("ws")).as("w")), iters = 3, minCount = 2L)),
    // the sequential filter-funnel survival board
    "q150_filter_funnel" -> ((s, d) => filterFunnel(T.documents(s, d))),
    // Cohen's κ between the Gopher gate and the quality threshold
    "q151_gate_agreement" -> ((s, d) => gateAgreement(T.documents(s, d))),
    // per-language fertility under the globally-mined merge table
    "q157_bpe_fertility" -> ((s, d) => bpeFertility(T.documents(s, d))),
    // bigram-LM fluency gate: model trained on the q140 train split,
    // broadcast as a bounded artifact (rides the memoized token core).
    // The gate model is deliberately SMALL (V=16, B=64) so the test
    // corpus (31 distinct words) exercises the <unk> mapping, the
    // unk-context denominator and the bigram-miss smoothing paths
    // cross-engine — a V≥31 model would score every bigram as a hit.
    // q162 and q167 read ONE memoized scored-bigram stream
    "q162_lm_fluency" -> ((s, d) => lmFluencyFromScored(gateLmScored(s, d))),
    // stupid-backoff scoring over the same shared token core and the
    // same gate-model geometry (own model build: MLE + 2/5 backoff,
    // no smoothing — deliberately NOT the q162 stream)
    "q171_lm_backoff" -> ((s, d) =>
      lmBackoffFrom(gateTokens(s, d), GateLmVocab, GateLmBigrams)),
    // per-source Pearson matrix over the q34 signals (exact moments;
    // rides the memoized quality core)
    "q164_signal_corr" -> ((s, d) => signalCorrelationFrom(gateScored(s, d))),
    // DoReMi-shaped mixture reweighting by LM excess signal (same
    // small gate model as q162; reads the SAME memoized stream)
    "q167_domain_reweight" -> ((s, d) => domainReweightFromScored(
      gateTokens(s, d), gateLmScored(s, d), alpha = 10d))
  )

  /** The memoized q70 gate-flag table — q70's own board plus q169's
    * survival ledger read one build per batch. */
  private[scale] def gateCuration(s: SparkSession, d: String): DataFrame =
    graft.Shared.memo(s, s"text:curation-gate:$d")(
      curationGate(T.documents(s, d)))

  /** Gate-board LM geometry (q162/q167/q170 and their oracles): a
    * deliberately tiny top-V vocab + top-B bigram table so the sf0.01
    * model exercises the <unk>/miss paths. ONE definition feeds BOTH
    * the Scala gate calls and the interpolated DuckDB SQL — a future
    * change moves every consumer at once instead of silently diverging
    * from the oracle (the API defaults stay 1024 / 65536). */
  private[scale] val GateLmVocab = 16
  private[scale] val GateLmBigrams = 64

  /** The memoized q162/q167 scored-bigram stream: the LM build (two
    * bounded aggregates over the train split) plus the corpus scoring
    * pass run ONCE per batch; both boards roll up from the same
    * checkpointed stream (≈ one narrow row per corpus bigram). */
  private def gateLmScored(s: SparkSession, d: String): DataFrame =
    graft.Shared.memo(s, s"text:lm-scored-$GateLmVocab-$GateLmBigrams:$d")(
      lmScoredBigrams(gateTokens(s, d), vocabSize = GateLmVocab,
        maxBigrams = GateLmBigrams))

  /** Batch-start core warmups (the [[graft.scale.Dedup.coreWarmups]]
    * contract). */
  private[graft] def coreWarmups(s: SparkSession,
                                 d: String): Seq[(String, () => Unit)] = Seq(
    "text:tokens" -> (() => { gateTokens(s, d); () }),
    "text:scored" -> (() => { gateScored(s, d); () }),
    "text:lm-scored" -> (() => { gateLmScored(s, d); () }),
    "text:curation" -> (() => { gateCuration(s, d); () }))

  private val normSql =
    "trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g'))"
  private val wsSql =
    s"list_filter(string_split_regex($normSql, ' +'), w -> w <> '')"

  /** The q74 weight fold in SQL over a `ws` list column — the oracle
    * twin of [[classifierSumExpr]], shared by q74 and q131. */
  private lazy val classifierSumSql: String = {
    val warr = classifierWeights.mkString("[", ", ", "]")
    val hashIdx =
      s"CAST((CAST('0x' || substr(md5(x),1,15) AS BIGINT) % $ClassifierBuckets) + 1 AS INTEGER)"
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform(ws, x -> list_extract($warr, $hashIdx))),
       |    (a, b) -> a + b)""".stripMargin
  }

  /** DuckDB literal list of the en stopwords — shared by every oracle
    * that computes the q34 stopword ratio. */
  private[scale] val stopListSql: String =
    stopwords.head._2.mkString("['", "', '", "']")

  /** The q34 composite-quality formula in SQL — the ONE rendition
    * shared by every oracle that scores quality (q34/q105/q125),
    * mirroring [[qualityExpr]] being the one Scala rendition. Expects
    * the conventional CTE aliases: n_words (word count), nw / nc
    * (clamped word/char denominators), stop_hits, n_punct. */
  private[scale] val qualitySql: String =
    "FLOOR((LEAST(CAST(n_words AS DOUBLE)/100, 1.0)*0.5" +
      " + (CAST(stop_hits AS DOUBLE)/nw)*0.3" +
      " + (1.0 - CAST(n_punct AS DOUBLE)/nc)*0.2) * 10000.0 + 0.5) / 10000.0"

  /** CTE chain shared by the q70 gate oracle and the q78 report oracle:
    * defines `r` (per-doc repetition fractions) and `gp` (per-doc
    * gopher pass flag) over `documents`. */
  private[scale] lazy val curationCtes: String =
    s"""w AS (SELECT doc_id, text, $wsSql AS ws,
       |  list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)), x -> x <> '') AS ls
       |FROM documents),
       |g AS (SELECT doc_id,
       |  CAST(len(ws) AS INTEGER) AS n_words,
       |  GREATEST(len(ws), 1) AS nw,
       |  GREATEST(len(ls), 1) AS nl,
       |  COALESCE(len(array_to_string(ws, '')), 0) AS word_chars,
       |  len(list_filter(ws, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
       |  CAST((len(text) - len(replace(text, '#', ''))) / 1 AS BIGINT)
       |    + CAST((len(text) - len(replace(text, '...', ''))) / 3 AS BIGINT) AS n_symbols,
       |  len(list_filter(ls, x -> starts_with(x, '-') OR starts_with(x, '*') OR starts_with(x, '•'))) AS n_bullet,
       |  len(list_filter(ls, x -> ends_with(x, '...'))) AS n_ellipsis,
       |  ${stopHitsSql(stopwords.head._2)} AS stop_hits
       |FROM w),
       |gp AS (SELECT doc_id,
       |  (n_words BETWEEN 50 AND 100000
       |    AND CAST(word_chars AS DOUBLE) / nw BETWEEN 3.0 AND 10.0
       |    AND CAST(n_symbols AS DOUBLE) / nw < 0.1
       |    AND CAST(n_bullet AS DOUBLE) / nl < 0.9
       |    AND CAST(n_ellipsis AS DOUBLE) / nl < 0.3
       |    AND CAST(n_alpha AS DOUBLE) / nw > 0.8
       |    AND stop_hits >= 2) AS gopher_pass
       |FROM g),
       |idx AS (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
       |        FROM w WHERE len(ws) >= 2),
       |bg AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bg FROM idx),
       |cnt AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2),
       |st AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
       |       MAX(c) AS top_cnt,
       |       CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_cnt
       |       FROM cnt GROUP BY 1),
       |r AS (SELECT d.doc_id,
       |  COALESCE(st.n_bigrams, 0) AS n_bigrams,
       |  CASE WHEN st.n_bigrams IS NOT NULL
       |    THEN CAST(st.dup_cnt AS DOUBLE) / st.n_bigrams ELSE 0.0 END AS dup_frac,
       |  CASE WHEN st.n_bigrams IS NOT NULL
       |    THEN CAST(st.top_cnt AS DOUBLE) / st.n_bigrams ELSE 0.0 END AS top_frac
       |  FROM documents d LEFT JOIN st ON st.doc_id = d.doc_id)""".stripMargin

  /** Final select of the q70 gate over [[curationCtes]] — also reused
    * as the `gate` CTE body in the q78 report oracle. */
  private[scale] lazy val curationSelect: String =
    """SELECT r.doc_id, gp.gopher_pass, r.n_bigrams,
      |  FLOOR((r.dup_frac) * 10000.0 + 0.5) / 10000.0 AS dup_bigram_frac,
      |  FLOOR((r.top_frac) * 10000.0 + 0.5) / 10000.0 AS top_bigram_frac,
      |  (r.dup_frac < 0.2 AND r.top_frac < 0.18) AS rep_pass,
      |  (gp.gopher_pass AND r.dup_frac < 0.2 AND r.top_frac < 0.18) AS keep
      |FROM r JOIN gp ON gp.doc_id = r.doc_id""".stripMargin

  /** Any-PII predicate shared by the q72 and q78 oracles. */
  private lazy val piiAnySql: String = piiPatterns.map { case (_, p) =>
    s"len(regexp_extract_all(text, '$p')) > 0"
  }.mkString(" OR ")

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

  /** The q150 oracle: the q70 gate chain + a quality/PII/md5 scan CTE,
    * cumulative stage flags, one aggregate, 7-row UNION unpivot. */
  private lazy val filterFunnelSql: String = {
    val names = Seq("1_ingested", "2_nonempty", "3_gopher", "4_repetition",
      "5_quality", "6_pii", "7_exact_dedup")
    // cumulative conjunctions s1..s6 (s0 ≡ TRUE is the ingested row)
    val conds = Seq("q.toks > 0", "g.gopher_pass", "g.rep_pass",
      s"q.quality >= $QualityMin", "NOT q.any_pii", "q.doc_id = rp.keep_id")
      .scanLeft(Seq.empty[String])(_ :+ _).tail
      .map(_.mkString("(", " AND ", ")"))
    val flagCols = conds.zipWithIndex
      .map { case (c, i) => s"$c AS s${i + 1}" }.mkString(",\n  ")
    val aggCols = (0 to 6).map { i =>
      val g = if (i == 0) "" else s"CASE WHEN s$i THEN "
      val e = if (i == 0) "" else " END"
      s"CAST(COUNT(${g}1$e) AS BIGINT) AS d_$i, " +
        s"CAST(COALESCE(SUM($g toks$e), 0) AS BIGINT) AS t_$i"
    }.mkString(",\n  ")
    val unions = names.zipWithIndex.map { case (n, i) =>
      val prev = s"d_${math.max(i - 1, 0)}"
      s"SELECT ${i + 1} AS stage_idx, '$n' AS stage, d_$i AS n_docs, " +
        s"t_$i AS n_toks, d_0 AS tot, $prev AS prev FROM a"
    }.mkString("\n  UNION ALL ")
    s"""WITH $curationCtes,
       |gate AS (SELECT r.doc_id, gp.gopher_pass,
       |  (r.dup_frac < 0.2 AND r.top_frac < 0.18) AS rep_pass
       | FROM r JOIN gp ON gp.doc_id = r.doc_id),
       |mm AS (SELECT doc_id,
       |  CAST(len(ws) AS INTEGER) AS n_words,
       |  GREATEST(len(ws), 1) AS nw,
       |  GREATEST(len(text), 1) AS nc,
       |  len(list_filter(ws, x -> list_contains($stopListSql, x))) AS stop_hits,
       |  len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
       |  CAST(CEIL(CAST(len(text) AS DOUBLE) / 4) AS BIGINT) AS toks,
       |  ($piiAnySql) AS any_pii,
       |  md5(text) AS fp
       | FROM w),
       |qq AS (SELECT doc_id, toks, any_pii, fp, $qualitySql AS quality FROM mm),
       |reps AS (SELECT fp, MIN(doc_id) AS keep_id FROM qq GROUP BY fp),
       |f AS (SELECT q.doc_id, q.toks,
       |  $flagCols
       | FROM qq q JOIN gate g USING (doc_id) JOIN reps rp ON q.fp = rp.fp),
       |a AS (SELECT
       |  $aggCols
       | FROM f)
       |SELECT stage_idx, stage, n_docs, n_toks,
       |  CASE WHEN tot > 0 THEN FLOOR((CAST(n_docs AS DOUBLE) / tot) * 10000.0 + 0.5) / 10000.0 END
       |    AS survival_rate,
       |  CASE WHEN prev > 0 THEN FLOOR((CAST(n_docs AS DOUBLE) / prev) * 10000.0 + 0.5) / 10000.0 END
       |    AS step_keep_rate
       |FROM (
       |  $unions)""".stripMargin
  }

  /** The q151 oracle: gate chain + quality CTE, one 2×2 aggregate,
    * κ from the UNROUNDED rates with the identical expression tree. */
  private lazy val gateAgreementSql: String =
    s"""WITH $curationCtes,
       |gate AS (SELECT r.doc_id,
       |  (gp.gopher_pass AND r.dup_frac < 0.2 AND r.top_frac < 0.18)
       |    AS g_pass
       | FROM r JOIN gp ON gp.doc_id = r.doc_id),
       |mm AS (SELECT doc_id,
       |  CAST(len(ws) AS INTEGER) AS n_words,
       |  GREATEST(len(ws), 1) AS nw,
       |  GREATEST(len(text), 1) AS nc,
       |  len(list_filter(ws, x -> list_contains($stopListSql, x))) AS stop_hits,
       |  len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct
       | FROM w),
       |qq AS (SELECT doc_id, ($qualitySql >= $QualityMin) AS q_pass FROM mm),
       |agg AS (SELECT
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(COUNT(CASE WHEN g_pass AND q_pass THEN 1 END) AS BIGINT)
       |    AS both_pass,
       |  CAST(COUNT(CASE WHEN g_pass AND NOT q_pass THEN 1 END) AS BIGINT)
       |    AS gate_only,
       |  CAST(COUNT(CASE WHEN NOT g_pass AND q_pass THEN 1 END) AS BIGINT)
       |    AS quality_only,
       |  CAST(COUNT(CASE WHEN NOT g_pass AND NOT q_pass THEN 1 END) AS BIGINT)
       |    AS neither
       | FROM qq JOIN gate USING (doc_id)),
       |e AS (SELECT *,
       |  (CAST(both_pass AS DOUBLE) + CAST(neither AS DOUBLE))
       |    / CAST(n_docs AS DOUBLE) AS po,
       |  ((CAST(both_pass AS DOUBLE) + CAST(gate_only AS DOUBLE))
       |      / CAST(n_docs AS DOUBLE))
       |    * ((CAST(both_pass AS DOUBLE) + CAST(quality_only AS DOUBLE))
       |      / CAST(n_docs AS DOUBLE))
       |  + ((CAST(quality_only AS DOUBLE) + CAST(neither AS DOUBLE))
       |      / CAST(n_docs AS DOUBLE))
       |    * ((CAST(gate_only AS DOUBLE) + CAST(neither AS DOUBLE))
       |      / CAST(n_docs AS DOUBLE)) AS pe
       | FROM agg)
       |SELECT n_docs, both_pass, gate_only, quality_only, neither,
       |  FLOOR(po * 1000000 + 0.5) / 1000000 AS p_obs,
       |  FLOOR(pe * 1000000 + 0.5) / 1000000 AS p_chance,
       |  CASE WHEN pe < 1.0
       |    THEN FLOOR((po - pe) / (1.0 - pe) * 1000000 + 0.5) / 1000000
       |  END AS kappa
       |FROM e""".stripMargin

  override val oracle: Map[String, String] = Map(
    "q150_filter_funnel" -> filterFunnelSql,
    "q151_gate_agreement" -> gateAgreementSql,
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
         |  len(list_filter(ws, x -> list_contains($stopListSql, x))) AS stop_hits,
         |  len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
         |  len(regexp_extract_all(text, '[0-9]')) AS n_digit,
         |  COALESCE(len(array_to_string(ws, '')), 0) AS word_chars
         |FROM w)
         |SELECT doc_id, n_words,
         |  FLOOR((CAST(word_chars AS DOUBLE)/nw) * 10000.0 + 0.5) / 10000.0 AS avg_wlen,
         |  FLOOR((CAST(stop_hits AS DOUBLE)/nw) * 10000.0 + 0.5) / 10000.0 AS stop_ratio,
         |  FLOOR((CAST(n_punct AS DOUBLE)/nc) * 10000.0 + 0.5) / 10000.0 AS punct_ratio,
         |  FLOOR((CAST(n_digit AS DOUBLE)/nc) * 10000.0 + 0.5) / 10000.0 AS digit_ratio,
         |  $qualitySql AS quality
         |FROM m""".stripMargin,
    "q35_token_count" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(trim(text), '\s+'), w -> w <> '')) AS INTEGER) AS ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INTEGER) AS bpe_tokens,
        |  CAST(CEIL(CAST(len(text) AS DOUBLE)/4) AS BIGINT) AS est_llm_tokens
        |FROM documents""".stripMargin,
    "q125_source_quality" ->
      s"""WITH w AS (SELECT source, text, $wsSql AS ws FROM documents),
         |m AS (SELECT source,
         |  CAST(len(ws) AS INTEGER) AS n_words,
         |  GREATEST(len(ws), 1) AS nw,
         |  GREATEST(len(text), 1) AS nc,
         |  len(list_filter(ws, x -> list_contains($stopListSql, x))) AS stop_hits,
         |  len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct
         |FROM w),
         |q AS (SELECT source, $qualitySql AS q FROM m),
         |g AS (SELECT source, COUNT(*) AS n_docs,
         |  ${portableRoundSql(exactSumSql("q") + " / COUNT(*)", 4)} AS mean_quality,
         |  CAST(SUM(CASE WHEN q >= $QualityMin THEN 1 ELSE 0 END) AS BIGINT) AS n_good
         |FROM q GROUP BY 1)
         |SELECT source, n_docs, mean_quality, n_good,
         |  CAST(n_good AS DOUBLE) / n_docs AS good_share
         |FROM g""".stripMargin,
    "q117_length_histogram" -> {
      val cases = (0 until 21).map(k =>
        s"WHEN toks < ${1L << (k + 1)} THEN ${1L << k}").mkString(" ")
      s"""WITH t AS (SELECT lang,
         |    len(list_filter(string_split_regex(trim(text), '\\s+'), w -> w <> '')) AS toks
         |  FROM documents),
         |b AS (SELECT lang,
         |    CAST(CASE $cases ELSE ${1L << 21} END AS BIGINT) AS bucket_lo
         |  FROM t WHERE toks > 0),
         |g AS (SELECT lang, bucket_lo, COUNT(*) AS n FROM b GROUP BY 1, 2)
         |SELECT lang, bucket_lo, n,
         |  CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY lang) AS DOUBLE) AS share
         |FROM g""".stripMargin
    },
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
        |  FLOOR((AVG(n_chars)) * 100.0 + 0.5) / 100.0 AS avg_chars,
        |  CAST(MIN(n_chars) AS BIGINT) AS min_chars,
        |  CAST(MAX(n_chars) AS BIGINT) AS max_chars,
        |  CAST(MIN(doc_id) AS BIGINT) AS first_doc
        |FROM documents GROUP BY lang, source""".stripMargin,
    "q64_gopher_rules" ->
      s"""WITH w AS (SELECT doc_id, text, $wsSql AS ws,
         |  list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)), x -> x <> '') AS ls
         |FROM documents),
         |m AS (SELECT doc_id,
         |  CAST(len(ws) AS INTEGER) AS n_words,
         |  GREATEST(len(ws), 1) AS nw,
         |  GREATEST(len(ls), 1) AS nl,
         |  COALESCE(len(array_to_string(ws, '')), 0) AS word_chars,
         |  len(list_distinct(ws)) AS n_distinct,
         |  len(list_filter(ws, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
         |  CAST((len(text) - len(replace(text, '#', ''))) / 1 AS BIGINT)
         |    + CAST((len(text) - len(replace(text, '...', ''))) / 3 AS BIGINT) AS n_symbols,
         |  len(list_filter(ls, x -> starts_with(x, '-') OR starts_with(x, '*') OR starts_with(x, '•'))) AS n_bullet,
         |  len(list_filter(ls, x -> ends_with(x, '...'))) AS n_ellipsis,
         |  ${stopHitsSql(stopwords.head._2)} AS stop_hits
         |FROM w)
         |SELECT doc_id, n_words,
         |  FLOOR((CAST(word_chars AS DOUBLE) / nw) * 10000.0 + 0.5) / 10000.0 AS mean_wlen,
         |  FLOOR((CAST(n_distinct AS DOUBLE) / nw) * 10000.0 + 0.5) / 10000.0 AS distinct_frac,
         |  FLOOR((CAST(n_alpha AS DOUBLE) / nw) * 10000.0 + 0.5) / 10000.0 AS alpha_frac,
         |  FLOOR((CAST(n_symbols AS DOUBLE) / nw) * 10000.0 + 0.5) / 10000.0 AS symbol_ratio,
         |  FLOOR((CAST(n_bullet AS DOUBLE) / nl) * 10000.0 + 0.5) / 10000.0 AS bullet_frac,
         |  FLOOR((CAST(n_ellipsis AS DOUBLE) / nl) * 10000.0 + 0.5) / 10000.0 AS ellipsis_frac,
         |  stop_hits,
         |  (n_words BETWEEN 50 AND 100000
         |    AND CAST(word_chars AS DOUBLE) / nw BETWEEN 3.0 AND 10.0
         |    AND CAST(n_symbols AS DOUBLE) / nw < 0.1
         |    AND CAST(n_bullet AS DOUBLE) / nl < 0.9
         |    AND CAST(n_ellipsis AS DOUBLE) / nl < 0.3
         |    AND CAST(n_alpha AS DOUBLE) / nw > 0.8
         |    AND stop_hits >= 2) AS gopher_pass
         |FROM m""".stripMargin,
    "q65_repetition" ->
      s"""WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
         |idx AS (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
         |        FROM w WHERE len(ws) >= 2),
         |bg AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bg FROM idx),
         |cnt AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2),
         |st AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
         |       COUNT(*) AS n_distinct, MAX(c) AS top_cnt,
         |       CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_cnt
         |       FROM cnt GROUP BY 1)
         |SELECT doc_id,
         |  COALESCE(n_bigrams, 0) AS n_bigrams,
         |  COALESCE(n_distinct, 0) AS n_distinct,
         |  FLOOR((CASE WHEN n_bigrams IS NOT NULL
         |    THEN CAST(dup_cnt AS DOUBLE) / n_bigrams ELSE 0.0 END) * 10000.0 + 0.5) / 10000.0 AS dup_bigram_frac,
         |  FLOOR((CASE WHEN n_bigrams IS NOT NULL
         |    THEN CAST(top_cnt AS DOUBLE) / n_bigrams ELSE 0.0 END) * 10000.0 + 0.5) / 10000.0 AS top_bigram_frac
         |FROM documents LEFT JOIN st USING (doc_id)""".stripMargin,
    // independent algorithm as the oracle: longest repeated substring
    // length == max LCP of lexicographically ADJACENT suffixes (the
    // suffix-array identity), vs the Spark side's suffix automaton.
    // NULLIF: this DuckDB's list_position returns 0, not NULL, on miss
    // COALESCE(..., []): null text must be 0 words on both engines
    // (matches the Spark side's coalesce-to-empty-array)
    "q89_longest_dup" ->
      s"""WITH w AS (SELECT doc_id, COALESCE($wsSql, []) AS ws FROM documents),
         |suf AS (SELECT doc_id, ws, unnest(range(1, len(ws)+1)) AS i FROM w),
         |sufl AS (SELECT doc_id, ws[i:] AS s FROM suf),
         |ord AS (SELECT doc_id, s,
         |        LAG(s) OVER (PARTITION BY doc_id ORDER BY s) AS prev FROM sufl),
         |lcp AS (SELECT doc_id,
         |  CASE WHEN prev IS NULL THEN 0
         |    ELSE COALESCE(NULLIF(list_position(
         |        list_transform(range(1, least(len(s), len(prev)) + 1),
         |          k -> s[k] = prev[k]), false), 0),
         |      least(len(s), len(prev)) + 1) - 1 END AS l
         |  FROM ord),
         |mx AS (SELECT doc_id, MAX(l) AS max_rep FROM lcp GROUP BY doc_id)
         |SELECT w.doc_id, CAST(len(w.ws) AS INTEGER) AS n_words,
         |  CAST(COALESCE(m.max_rep, 0) AS INTEGER) AS max_rep,
         |  FLOOR((CASE WHEN len(w.ws) > 0
         |    THEN CAST(COALESCE(m.max_rep, 0) AS DOUBLE) / len(w.ws)
         |    ELSE 0.0 END) * 10000.0 + 0.5) / 10000.0 AS rep_frac
         |FROM w LEFT JOIN mx m ON m.doc_id = w.doc_id""".stripMargin,
    // ratio = (tf_src/total_src)/(tf_corp/total_corp) cross-multiplied
    // into ONE division of integer-derived doubles — identical tree to
    // the Spark side, so the raw double hashes bit-identical. SUMs are
    // CAST to BIGINT (DuckDB SUM is HUGEINT). Ties (source-exclusive
    // tokens all score total/src_tot) break by w ASC = UTF8 binary.
    "q94_token_drift" ->
      s"""WITH w AS (SELECT source, unnest($wsSql) AS w FROM documents),
         |tf AS (SELECT source, w, COUNT(*) AS cnt FROM w GROUP BY 1, 2),
         |st AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS src_tot
         |       FROM tf GROUP BY source),
         |ct AS (SELECT w, CAST(SUM(cnt) AS BIGINT) AS corp_cnt
         |       FROM tf GROUP BY w),
         |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM tf),
         |s AS (SELECT tf.source, tf.w, tf.cnt, ct.corp_cnt,
         |        (CAST(tf.cnt AS DOUBLE) * total) /
         |        (CAST(ct.corp_cnt AS DOUBLE) * src_tot) AS ratio
         |      FROM tf JOIN ct USING (w) JOIN st USING (source)
         |      CROSS JOIN tot WHERE tf.cnt >= 3),
         |r AS (SELECT source, w, cnt, corp_cnt, ratio,
         |        ROW_NUMBER() OVER (PARTITION BY source
         |          ORDER BY ratio DESC, w ASC) AS rk
         |      FROM s)
         |SELECT source, CAST(rk AS INTEGER) AS rank, w, cnt, corp_cnt, ratio
         |FROM r WHERE rk <= 10""".stripMargin,
    // q38's seed-centroid assign CTE keyed into q94's drift scoring:
    // cluster id from vectors, topic tokens from text
    "q104_cluster_topics" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v),
         |cents AS (SELECT vec_id AS cell_id, v AS cv, nrm AS cn FROM n
         |          WHERE vec_id < ${Similarity.IvfCells} AND nrm > 0),
         |assign AS (
         |  SELECT vec_id, cell_id FROM (
         |    SELECT a.vec_id, c.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
         |        ORDER BY list_dot_product(a.v, c.cv)/(a.nrm*c.cn) DESC,
         |          c.cell_id ASC) AS rn
         |    FROM n a, cents c) WHERE rn <= 1),
         |w AS (SELECT a.cell_id, unnest($wsSql) AS w
         |      FROM documents d JOIN assign a ON a.vec_id = d.doc_id),
         |tf AS (SELECT cell_id, w, COUNT(*) AS cnt FROM w GROUP BY 1, 2),
         |lt AS (SELECT cell_id, CAST(SUM(cnt) AS BIGINT) AS lab_tot
         |       FROM tf GROUP BY cell_id),
         |ct AS (SELECT w, CAST(SUM(cnt) AS BIGINT) AS corp_cnt
         |       FROM tf GROUP BY w),
         |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM tf),
         |s AS (SELECT tf.cell_id, tf.w, tf.cnt, ct.corp_cnt,
         |        (CAST(tf.cnt AS DOUBLE) * total) /
         |        (CAST(ct.corp_cnt AS DOUBLE) * lab_tot) AS ratio
         |      FROM tf JOIN ct USING (w) JOIN lt USING (cell_id)
         |      CROSS JOIN tot WHERE tf.cnt >= 3),
         |r AS (SELECT cell_id, w, cnt, corp_cnt, ratio,
         |        ROW_NUMBER() OVER (PARTITION BY cell_id
         |          ORDER BY ratio DESC, w ASC) AS rk
         |      FROM s)
         |SELECT cell_id, CAST(rk AS INTEGER) AS rank, w, cnt, corp_cnt, ratio
         |FROM r WHERE rk <= 10""".stripMargin,
    "q66_tfidf" ->
      s"""WITH w AS (SELECT doc_id, unnest($wsSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY 1, 2),
         |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents),
         |s AS (SELECT doc_id, term, tf, df,
         |      CAST(tf AS DOUBLE) * ((n_docs - df + 0.5) / (df + 0.5)) AS score
         |      FROM tf JOIN df USING (term) CROSS JOIN n),
         |r AS (SELECT *, ROW_NUMBER() OVER
         |        (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
         |      FROM s)
         |SELECT doc_id, term, tf, df, FLOOR((score) * 10000.0 + 0.5) / 10000.0 AS tfidf,
         |  CAST(rk AS INTEGER) AS rk
         |FROM r WHERE rk <= 5""".stripMargin,
    "q74_classifier_score" ->
      s"""WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
         |f AS (SELECT doc_id, ws FROM w WHERE len(ws) > 0)
         |SELECT doc_id, CAST(len(ws) AS INTEGER) AS n_words,
         |  FLOOR(($classifierSumSql / len(ws)) * 1000000.0 + 0.5) / 1000000.0 AS score,
         |  ($classifierSumSql > 0) AS pred_keep
         |FROM f""".stripMargin,
    // ONE scan carries score and gold quality (the Spark plan's
    // shape); round-then-bucket, decimal means, ≤10-row lag window
    "q131_score_calibration" ->
      s"""WITH w AS (SELECT doc_id, text, $wsSql AS ws FROM documents),
         |f AS (SELECT doc_id, text, ws FROM w WHERE len(ws) > 0),
         |m AS (SELECT doc_id,
         |  CAST(len(ws) AS INTEGER) AS n_words,
         |  GREATEST(len(ws), 1) AS nw,
         |  GREATEST(len(text), 1) AS nc,
         |  len(list_filter(ws, x -> list_contains($stopListSql, x))) AS stop_hits,
         |  len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
         |  FLOOR(($classifierSumSql / len(ws)) * 1000000.0 + 0.5) / 1000000.0 AS score
         |FROM f),
         |s AS (SELECT
         |  CAST(LEAST(GREATEST(FLOOR((score + 1.0) * 5.0), 0), 9) AS BIGINT) AS bucket,
         |  score, $qualitySql AS quality FROM m),
         |b AS (SELECT bucket, COUNT(*) AS n_docs,
         |  FLOOR(${exactSumSql("score")} / COUNT(*) * 10000 + 0.5) / 10000 AS mean_score,
         |  FLOOR(${exactSumSql("quality")} / COUNT(*) * 10000 + 0.5) / 10000 AS mean_quality
         |FROM s GROUP BY bucket)
         |SELECT bucket, n_docs, mean_score, mean_quality,
         |  COALESCE(mean_quality >= LAG(mean_quality) OVER (ORDER BY bucket),
         |    TRUE) AS monotone_ok
         |FROM b""".stripMargin,
    // same tokenize, same bigram join keys, IDENTICAL lift
    // parenthesization: ((c_ab·N)·N) / ((B·c_a)·c_b)
    "q97_collocations" ->
      s"""WITH w AS (SELECT $wsSql AS ws FROM documents),
         |uni AS (SELECT w, COUNT(*) AS c
         |        FROM (SELECT unnest(ws) AS w FROM w) GROUP BY w),
         |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tokens FROM uni),
         |idx AS (SELECT ws, unnest(range(1, len(ws))) AS i
         |        FROM w WHERE len(ws) >= 2),
         |bgs AS (SELECT ws[i] || ' ' || ws[i+1] AS bg FROM idx),
         |bc AS (SELECT bg, COUNT(*) AS c_ab FROM bgs GROUP BY bg),
         |btot AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n_bigrams FROM bc),
         |sc AS (SELECT f.bg, f.c_ab, a.c AS c_a, b.c AS c_b,
         |    (CAST(f.c_ab AS DOUBLE) * t.n_tokens * t.n_tokens) /
         |    (CAST(bt.n_bigrams AS DOUBLE) * a.c * b.c) AS lift
         |  FROM (SELECT bg, c_ab FROM bc WHERE c_ab >= 5) f
         |  JOIN uni a ON a.w = string_split(f.bg, ' ')[1]
         |  JOIN uni b ON b.w = string_split(f.bg, ' ')[2], tot t, btot bt),
         |r AS (SELECT bg, c_ab, c_a, c_b, lift,
         |  ROW_NUMBER() OVER (ORDER BY lift DESC, bg ASC) AS rank FROM sc)
         |SELECT CAST(rank AS INTEGER) AS rank, bg, c_ab, c_a, c_b, lift
         |FROM r WHERE rank <= 25""".stripMargin,
    // pair stats over the distinct-word table weighted by word count,
    // exactly the Spark chain; range(1, length) is end-exclusive =
    // sequence(1, length-1) inclusive, both 1-based substrings
    "q129_bpe_merges" ->
      s"""WITH w AS (SELECT unnest($wsSql) AS w FROM documents),
         |freq AS (SELECT w, COUNT(*) AS cnt FROM w GROUP BY w),
         |pairs AS (SELECT substring(w, CAST(i AS INTEGER), 2) AS pair, cnt
         |  FROM freq, unnest(range(1, length(w))) t(i)
         |  WHERE length(w) >= 2),
         |pc AS (SELECT pair, CAST(SUM(cnt) AS BIGINT) AS cnt
         |  FROM pairs GROUP BY pair HAVING SUM(cnt) >= 2),
         |r AS (SELECT pair, cnt,
         |  ROW_NUMBER() OVER (ORDER BY cnt DESC, pair ASC) AS rank FROM pc)
         |SELECT CAST(rank AS INTEGER) AS rank, pair, cnt
         |FROM r WHERE rank <= 20""".stripMargin,
    // q129's mining chain + the application join: strpos finds the
    // touched words, the replace() length delta counts non-overlapping
    // applications (leftmost semantics, identical both engines for the
    // [a-z0-9]{2} literal pair)
    "q133_bpe_apply" ->
      s"""WITH w AS (SELECT unnest($wsSql) AS w FROM documents),
         |freq AS (SELECT w, COUNT(*) AS cnt FROM w GROUP BY w),
         |pairs AS (SELECT substring(w, CAST(i AS INTEGER), 2) AS pair, cnt
         |  FROM freq, unnest(range(1, length(w))) t(i)
         |  WHERE length(w) >= 2),
         |pc AS (SELECT pair, CAST(SUM(cnt) AS BIGINT) AS cnt
         |  FROM pairs GROUP BY pair HAVING SUM(cnt) >= 2),
         |r AS (SELECT pair, cnt AS est_cnt,
         |  ROW_NUMBER() OVER (ORDER BY cnt DESC, pair ASC) AS rank FROM pc),
         |top AS (SELECT * FROM r WHERE rank <= 20),
         |app AS (SELECT t.rank, t.pair, t.est_cnt, f.cnt,
         |    length(f.w) - length(replace(f.w, t.pair, '@')) AS napp
         |  FROM top t JOIN freq f ON strpos(f.w, t.pair) > 0),
         |g AS (SELECT rank, pair, est_cnt,
         |    CAST(SUM(cnt * napp) AS BIGINT) AS n_applications,
         |    COUNT(*) AS n_words
         |  FROM app GROUP BY rank, pair, est_cnt)
         |SELECT CAST(rank AS INTEGER) AS rank, pair, est_cnt,
         |  n_applications, n_words,
         |  est_cnt - n_applications AS overlap_excess
         |FROM g""".stripMargin,
    // three chained mine→rewrite rounds; replace() is leftmost-non-
    // overlapping literal replacement in both engines, merge symbols
    // 'A'/'B' are outside the token alphabet, decode expands symbols
    // back to base characters (B's expansion first — it may contain A)
    // the q139 mining chain with lang KEPT on the token stream: merges
    // are global, application and the fertility rollup are per-lang;
    // the three replaces compose in mining order exactly as the loop
    // Pearson over exact fixed-point signals: HUGEINT moments mirror
    // the Spark DECIMAL(38,0) sums; sqrt is IEEE-exact, so both
    // engines make the identical corr from identical integer moments
    "q164_signal_corr" -> {
      val sigNames = Seq("n_words", "stop_ratio", "punct_ratio", "quality")
      val sigSel = Seq(
        "CAST(len(ws) AS BIGINT) AS s_n_words",
        "CAST(FLOOR(FLOOR((CAST(stop_hits AS DOUBLE)/nw) * 10000.0 + 0.5) / 10000.0 * 10000.0 + 0.5) AS BIGINT) AS s_stop_ratio",
        "CAST(FLOOR(FLOOR((CAST(n_punct AS DOUBLE)/nc) * 10000.0 + 0.5) / 10000.0 * 10000.0 + 0.5) AS BIGINT) AS s_punct_ratio",
        s"CAST(FLOOR(($qualitySql) * 10000.0 + 0.5) AS BIGINT) AS s_quality"
      ).mkString(",\n  ")
      val pairs = for {
        i <- sigNames.indices; j <- i + 1 until sigNames.size
      } yield (sigNames(i), sigNames(j))
      val momentSel = (
        sigNames.map(n => s"SUM(s_$n) AS sx_$n") ++
        sigNames.map(n => s"SUM(s_$n * s_$n) AS sxx_$n") ++
        pairs.map { case (a, b) => s"SUM(s_$a * s_$b) AS sxy_${a}_$b" }
      ).mkString(",\n  ")
      val pairSel = pairs.map { case (a, b) =>
        s"""SELECT source, '$a' AS sig_a, '$b' AS sig_b, n AS n_docs,
           |  CASE WHEN CAST(n*sxx_$a - sx_$a*sx_$a AS DOUBLE) > 0
           |        AND CAST(n*sxx_$b - sx_$b*sx_$b AS DOUBLE) > 0 THEN
           |    FLOOR(CAST(n*sxy_${a}_$b - sx_$a*sx_$b AS DOUBLE)
           |      / (SQRT(CAST(n*sxx_$a - sx_$a*sx_$a AS DOUBLE))
           |         * SQRT(CAST(n*sxx_$b - sx_$b*sx_$b AS DOUBLE)))
           |      * 1000000.0 + 0.5) / 1000000.0 END AS corr
           |FROM g""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH w AS (SELECT source, text, $wsSql AS ws FROM documents),
         |m AS (SELECT source,
         |  CAST(len(ws) AS INTEGER) AS n_words,
         |  GREATEST(len(ws), 1) AS nw,
         |  GREATEST(len(text), 1) AS nc,
         |  len(list_filter(ws, x -> list_contains($stopListSql, x))) AS stop_hits,
         |  len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
         |  ws
         |FROM w),
         |sig AS (SELECT source,
         |  $sigSel
         |FROM m),
         |g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         |  $momentSel
         |FROM sig GROUP BY 1)
         |$pairSel""".stripMargin
    },
    // the q162 LM chain rolled up per source, with the DoReMi-shaped
    // boost: excess = max(0, corpus mean_p − source mean_p), raw
    // weight = share × (1 + 10·excess), normalizer via DECIMAL(18,6)
    "q167_domain_reweight" ->
      s"""WITH w AS (SELECT doc_id, source, $wsSql AS ws FROM documents),
         |tr AS (SELECT * FROM w WHERE ${Curation.splitUSql("doc_id")} < 0.8),
         |wc AS (SELECT word, COUNT(*) AS cnt
         |       FROM (SELECT unnest(ws) AS word FROM tr) GROUP BY 1),
         |vocab AS (SELECT word, cnt FROM wc ORDER BY cnt DESC, word
         |         LIMIT $GateLmVocab),
         |unk AS (SELECT CAST((SELECT COALESCE(SUM(cnt), 0) FROM wc)
         |  - (SELECT COALESCE(SUM(cnt), 0) FROM vocab) AS BIGINT) AS unk_cnt),
         |tb AS (SELECT ws[i+1] AS w1, ws[i+2] AS w2
         |       FROM tr, unnest(range(len(ws) - 1)) t(i) WHERE len(ws) >= 2),
         |tm AS (SELECT COALESCE(v1.word, '<unk>') || ' ' ||
         |         COALESCE(v2.word, '<unk>') AS bigram
         |       FROM tb LEFT JOIN vocab v1 ON tb.w1 = v1.word
         |               LEFT JOIN vocab v2 ON tb.w2 = v2.word),
         |bc AS (SELECT bigram, COUNT(*) AS c2 FROM tm GROUP BY 1
         |       ORDER BY c2 DESC, bigram LIMIT $GateLmBigrams),
         |sb AS (SELECT doc_id, source, ws[i+1] AS w1, ws[i+2] AS w2
         |       FROM w, unnest(range(len(ws) - 1)) t(i) WHERE len(ws) >= 2),
         |sm AS (SELECT doc_id, source,
         |         COALESCE(v1.cnt, (SELECT unk_cnt FROM unk)) AS c1,
         |         COALESCE(v1.word, '<unk>') || ' ' ||
         |           COALESCE(v2.word, '<unk>') AS bigram
         |       FROM sb LEFT JOIN vocab v1 ON sb.w1 = v1.word
         |               LEFT JOIN vocab v2 ON sb.w2 = v2.word),
         |p AS (SELECT source,
         |        CAST(FLOOR((CAST(COALESCE(bc.c2, 0) + 1 AS DOUBLE)
         |          / CAST(sm.c1 + ${GateLmVocab + 1} AS DOUBLE)) * 1000000000.0 + 0.5)
         |          AS BIGINT) AS p9
         |      FROM sm LEFT JOIN bc ON sm.bigram = bc.bigram),
         |ps AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |         CAST(SUM(p9) AS BIGINT) AS sp9 FROM p GROUP BY 1),
         |st AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(len(ws)) AS BIGINT) AS n_toks FROM w GROUP BY 1),
         |ct AS (SELECT CAST(SUM(n_bigrams) AS BIGINT) AS nbt,
         |         CAST(SUM(sp9) AS BIGINT) AS spt FROM ps),
         |tt AS (SELECT CAST(SUM(n_toks) AS BIGINT) AS toks_total FROM st),
         |b AS (SELECT st.source, st.n_docs, st.n_toks,
         |  CAST(COALESCE(ps.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |  CASE WHEN ps.n_bigrams > 0 THEN
         |    FLOOR(CAST(ps.sp9 AS DOUBLE)
         |      / (CAST(ps.n_bigrams AS DOUBLE) * 1000000000.0)
         |      * 1000000.0 + 0.5) / 1000000.0 END AS mean_p,
         |  CASE WHEN ps.n_bigrams > 0 THEN GREATEST(0.0,
         |    FLOOR(CAST(ct.spt AS DOUBLE)
         |      / (CAST(ct.nbt AS DOUBLE) * 1000000000.0)
         |      * 1000000.0 + 0.5) / 1000000.0
         |    - FLOOR(CAST(ps.sp9 AS DOUBLE)
         |      / (CAST(ps.n_bigrams AS DOUBLE) * 1000000000.0)
         |      * 1000000.0 + 0.5) / 1000000.0) ELSE 0.0 END AS excess,
         |  CAST(st.n_toks AS DOUBLE) / tt.toks_total AS share_raw
         |  FROM st LEFT JOIN ps USING (source), ct, tt),
         |b2 AS (SELECT *,
         |  FLOOR(share_raw * (1.0 + 10.0 * excess) * 1000000.0 + 0.5)
         |    / 1000000.0 AS w6 FROM b),
         |wt AS (SELECT CAST(SUM(CAST(w6 AS DECIMAL(18,6))) AS DOUBLE)
         |       AS wtot FROM b2)
         |SELECT source, n_docs, n_toks, n_bigrams, mean_p,
         |  FLOOR(excess * 1000000.0 + 0.5) / 1000000.0 AS excess,
         |  FLOOR(share_raw * 1000000.0 + 0.5) / 1000000.0 AS share,
         |  w6 AS raw_weight,
         |  FLOOR(w6 / wtot * 1000000.0 + 0.5) / 1000000.0 AS weight
         |FROM b2, wt""".stripMargin,
    // stupid backoff: hits score the exact MLE ratio c2/c1, misses
    // back off to (2*c(w2))/(5*T) — integer products, one division;
    // same interpolated gate-model geometry as q162
    "q171_lm_backoff" ->
      s"""WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
         |tr AS (SELECT * FROM w WHERE ${Curation.splitUSql("doc_id")} < 0.8),
         |wc AS (SELECT word, COUNT(*) AS cnt
         |       FROM (SELECT unnest(ws) AS word FROM tr) GROUP BY 1),
         |vocab AS (SELECT word, cnt FROM wc ORDER BY cnt DESC, word
         |         LIMIT $GateLmVocab),
         |tot AS (SELECT
         |  CAST((SELECT COALESCE(SUM(cnt), 0) FROM wc) AS BIGINT) AS t,
         |  CAST((SELECT COALESCE(SUM(cnt), 0) FROM wc)
         |    - (SELECT COALESCE(SUM(cnt), 0) FROM vocab) AS BIGINT)
         |    AS unk_cnt),
         |tb AS (SELECT ws[i+1] AS w1, ws[i+2] AS w2
         |       FROM tr, unnest(range(len(ws) - 1)) t(i) WHERE len(ws) >= 2),
         |tm AS (SELECT COALESCE(v1.word, '<unk>') || ' ' ||
         |         COALESCE(v2.word, '<unk>') AS bigram
         |       FROM tb LEFT JOIN vocab v1 ON tb.w1 = v1.word
         |               LEFT JOIN vocab v2 ON tb.w2 = v2.word),
         |bc AS (SELECT bigram, COUNT(*) AS c2 FROM tm GROUP BY 1
         |       ORDER BY c2 DESC, bigram LIMIT $GateLmBigrams),
         |sb AS (SELECT doc_id, ws[i+1] AS w1, ws[i+2] AS w2
         |       FROM w, unnest(range(len(ws) - 1)) t(i) WHERE len(ws) >= 2),
         |sm AS (SELECT doc_id,
         |         COALESCE(v1.cnt, tot.unk_cnt) AS c1,
         |         COALESCE(v2.cnt, tot.unk_cnt) AS cw2,
         |         COALESCE(v1.word, '<unk>') || ' ' ||
         |           COALESCE(v2.word, '<unk>') AS bigram,
         |         tot.t AS t
         |       FROM sb LEFT JOIN vocab v1 ON sb.w1 = v1.word
         |               LEFT JOIN vocab v2 ON sb.w2 = v2.word, tot),
         |p AS (SELECT doc_id, (bc.bigram IS NOT NULL) AS hit,
         |        CAST(FLOOR(CASE WHEN bc.bigram IS NOT NULL
         |            THEN CAST(bc.c2 AS DOUBLE) / CAST(sm.c1 AS DOUBLE)
         |            ELSE CASE WHEN sm.t > 0 THEN CAST(2 * sm.cw2 AS DOUBLE)
         |              / CAST(5 * sm.t AS DOUBLE) ELSE 0.0 END END
         |          * 1000000000.0 + 0.5) AS BIGINT) AS s9
         |      FROM sm LEFT JOIN bc ON sm.bigram = bc.bigram)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |  CAST(COUNT(CASE WHEN hit THEN 1 END) AS BIGINT) AS n_hits,
         |  CAST(COUNT(*) - COUNT(CASE WHEN hit THEN 1 END) AS BIGINT)
         |    AS n_backoff,
         |  FLOOR(CAST(COUNT(CASE WHEN hit THEN 1 END) AS DOUBLE)
         |    / COUNT(*) * 1000000.0 + 0.5) / 1000000.0 AS hit_rate,
         |  FLOOR(CAST(SUM(s9) AS DOUBLE)
         |    / (CAST(COUNT(*) AS DOUBLE) * 1000000000.0) * 1000000.0 + 0.5)
         |    / 1000000.0 AS mean_s
         |FROM p GROUP BY doc_id""".stripMargin,
    // bigram LM over the q140 train split: top-V vocab, top-B bigram
    // table, add-one smoothing; every probability is one IEEE division
    // of exact integers, per-doc means are exact BIGINT sums
    "q162_lm_fluency" ->
      s"""WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
         |tr AS (SELECT * FROM w WHERE ${Curation.splitUSql("doc_id")} < 0.8),
         |wc AS (SELECT word, COUNT(*) AS cnt
         |       FROM (SELECT unnest(ws) AS word FROM tr) GROUP BY 1),
         |vocab AS (SELECT word, cnt FROM wc ORDER BY cnt DESC, word
         |         LIMIT $GateLmVocab),
         |unk AS (SELECT CAST((SELECT COALESCE(SUM(cnt), 0) FROM wc)
         |  - (SELECT COALESCE(SUM(cnt), 0) FROM vocab) AS BIGINT) AS unk_cnt),
         |tb AS (SELECT ws[i+1] AS w1, ws[i+2] AS w2
         |       FROM tr, unnest(range(len(ws) - 1)) t(i) WHERE len(ws) >= 2),
         |tm AS (SELECT COALESCE(v1.word, '<unk>') || ' ' ||
         |         COALESCE(v2.word, '<unk>') AS bigram
         |       FROM tb LEFT JOIN vocab v1 ON tb.w1 = v1.word
         |               LEFT JOIN vocab v2 ON tb.w2 = v2.word),
         |bc AS (SELECT bigram, COUNT(*) AS c2 FROM tm GROUP BY 1
         |       ORDER BY c2 DESC, bigram LIMIT $GateLmBigrams),
         |sb AS (SELECT doc_id, ws[i+1] AS w1, ws[i+2] AS w2
         |       FROM w, unnest(range(len(ws) - 1)) t(i) WHERE len(ws) >= 2),
         |sm AS (SELECT doc_id,
         |         COALESCE(v1.word, '<unk>') AS m1,
         |         COALESCE(v1.cnt, (SELECT unk_cnt FROM unk)) AS c1,
         |         COALESCE(v1.word, '<unk>') || ' ' ||
         |           COALESCE(v2.word, '<unk>') AS bigram
         |       FROM sb LEFT JOIN vocab v1 ON sb.w1 = v1.word
         |               LEFT JOIN vocab v2 ON sb.w2 = v2.word),
         |p AS (SELECT doc_id, (bc.bigram IS NOT NULL) AS hit,
         |        (m1 = '<unk>') AS unk_ctx,
         |        CAST(FLOOR((CAST(COALESCE(bc.c2, 0) + 1 AS DOUBLE)
         |          / CAST(sm.c1 + ${GateLmVocab + 1} AS DOUBLE)) * 1000000000.0 + 0.5)
         |          AS BIGINT) AS p9
         |      FROM sm LEFT JOIN bc ON sm.bigram = bc.bigram)
         |SELECT doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |  CAST(COUNT(CASE WHEN hit THEN 1 END) AS BIGINT) AS n_hits,
         |  CAST(COUNT(CASE WHEN unk_ctx THEN 1 END) AS BIGINT) AS n_unk_ctx,
         |  FLOOR(CAST(COUNT(CASE WHEN hit THEN 1 END) AS DOUBLE)
         |    / COUNT(*) * 1000000.0 + 0.5) / 1000000.0 AS hit_rate,
         |  FLOOR(CAST(SUM(p9) AS DOUBLE)
         |    / (CAST(COUNT(*) AS DOUBLE) * 1000000000.0) * 1000000.0 + 0.5)
         |    / 1000000.0 AS mean_p
         |FROM p GROUP BY doc_id""".stripMargin,
    "q157_bpe_fertility" ->
      s"""WITH w AS (SELECT lang, unnest($wsSql) AS w FROM documents),
         |v0 AS (SELECT w, COUNT(*) AS cnt FROM w GROUP BY w),
         |p1 AS (SELECT substring(w, CAST(i AS INTEGER), 2) AS pair,
         |    CAST(SUM(cnt) AS BIGINT) AS cnt
         |  FROM v0, unnest(range(1, length(w))) t(i)
         |  WHERE length(w) >= 2
         |  GROUP BY 1 HAVING SUM(cnt) >= 2),
         |m1 AS (SELECT pair FROM p1 ORDER BY cnt DESC, pair ASC LIMIT 1),
         |v1 AS (SELECT replace(v0.w, m1.pair, 'A') AS w, v0.cnt FROM v0, m1),
         |p2 AS (SELECT substring(w, CAST(i AS INTEGER), 2) AS pair,
         |    CAST(SUM(cnt) AS BIGINT) AS cnt
         |  FROM v1, unnest(range(1, length(w))) t(i)
         |  WHERE length(w) >= 2
         |  GROUP BY 1 HAVING SUM(cnt) >= 2),
         |m2 AS (SELECT pair FROM p2 ORDER BY cnt DESC, pair ASC LIMIT 1),
         |v2 AS (SELECT replace(v1.w, m2.pair, 'B') AS w, v1.cnt FROM v1, m2),
         |p3 AS (SELECT substring(w, CAST(i AS INTEGER), 2) AS pair,
         |    CAST(SUM(cnt) AS BIGINT) AS cnt
         |  FROM v2, unnest(range(1, length(w))) t(i)
         |  WHERE length(w) >= 2
         |  GROUP BY 1 HAVING SUM(cnt) >= 2),
         |m3 AS (SELECT pair FROM p3 ORDER BY cnt DESC, pair ASC LIMIT 1),
         |l0 AS (SELECT lang, w, COUNT(*) AS cnt FROM w GROUP BY 1, 2),
         |l3 AS (SELECT lang,
         |    replace(replace(replace(l0.w, m1.pair, 'A'), m2.pair, 'B'),
         |      m3.pair, 'C') AS w, cnt
         |  FROM l0, m1, m2, m3),
         |base AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n_words,
         |    CAST(SUM(cnt * length(w)) AS BIGINT) AS raw_chars
         |  FROM l0 GROUP BY 1),
         |mg AS (SELECT lang,
         |    CAST(SUM(cnt * length(w)) AS BIGINT) AS merged_symbols
         |  FROM l3 GROUP BY 1)
         |SELECT lang, n_words, raw_chars, merged_symbols,
         |  FLOOR(CAST(raw_chars AS DOUBLE) / n_words * 1000000 + 0.5)
         |    / 1000000 AS fert_raw,
         |  FLOOR(CAST(merged_symbols AS DOUBLE) / n_words * 1000000 + 0.5)
         |    / 1000000 AS fert_merged,
         |  FLOOR(CAST(raw_chars - merged_symbols AS DOUBLE) / raw_chars
         |    * 1000000 + 0.5) / 1000000 AS saved_frac
         |FROM base JOIN mg USING (lang)""".stripMargin,
    "q139_bpe_loop" ->
      s"""WITH w AS (SELECT unnest($wsSql) AS w FROM documents),
         |v0 AS (SELECT w, COUNT(*) AS cnt FROM w GROUP BY w),
         |p1 AS (SELECT substring(w, CAST(i AS INTEGER), 2) AS pair,
         |    CAST(SUM(cnt) AS BIGINT) AS cnt
         |  FROM v0, unnest(range(1, length(w))) t(i)
         |  WHERE length(w) >= 2
         |  GROUP BY 1 HAVING SUM(cnt) >= 2),
         |m1 AS (SELECT pair, cnt FROM p1 ORDER BY cnt DESC, pair ASC LIMIT 1),
         |v1 AS (SELECT replace(v0.w, m1.pair, 'A') AS w, v0.cnt FROM v0, m1),
         |p2 AS (SELECT substring(w, CAST(i AS INTEGER), 2) AS pair,
         |    CAST(SUM(cnt) AS BIGINT) AS cnt
         |  FROM v1, unnest(range(1, length(w))) t(i)
         |  WHERE length(w) >= 2
         |  GROUP BY 1 HAVING SUM(cnt) >= 2),
         |m2 AS (SELECT pair, cnt FROM p2 ORDER BY cnt DESC, pair ASC LIMIT 1),
         |v2 AS (SELECT replace(v1.w, m2.pair, 'B') AS w, v1.cnt FROM v1, m2),
         |p3 AS (SELECT substring(w, CAST(i AS INTEGER), 2) AS pair,
         |    CAST(SUM(cnt) AS BIGINT) AS cnt
         |  FROM v2, unnest(range(1, length(w))) t(i)
         |  WHERE length(w) >= 2
         |  GROUP BY 1 HAVING SUM(cnt) >= 2),
         |m3 AS (SELECT pair, cnt FROM p3 ORDER BY cnt DESC, pair ASC LIMIT 1)
         |SELECT CAST(1 AS INTEGER) AS iter, m1.pair, m1.pair AS decoded,
         |  m1.cnt FROM m1
         |UNION ALL
         |SELECT CAST(2 AS INTEGER), m2.pair,
         |  replace(m2.pair, 'A', m1.pair), m2.cnt FROM m2, m1
         |UNION ALL
         |SELECT CAST(3 AS INTEGER), m3.pair,
         |  replace(replace(m3.pair, 'B', replace(m2.pair, 'A', m1.pair)),
         |    'A', m1.pair), m3.cnt FROM m3, m2, m1""".stripMargin,
    // the q139 chain's per-level symbol sums: saved_i is the merge's
    // actual non-overlapping application count, ratio is one r6'd
    // IEEE division
    "q142_bpe_compression" ->
      s"""WITH w AS (SELECT unnest($wsSql) AS w FROM documents),
         |v0 AS (SELECT w, COUNT(*) AS cnt FROM w GROUP BY w),
         |p1 AS (SELECT substring(w, CAST(i AS INTEGER), 2) AS pair,
         |    CAST(SUM(cnt) AS BIGINT) AS cnt
         |  FROM v0, unnest(range(1, length(w))) t(i)
         |  WHERE length(w) >= 2
         |  GROUP BY 1 HAVING SUM(cnt) >= 2),
         |m1 AS (SELECT pair FROM p1 ORDER BY cnt DESC, pair ASC LIMIT 1),
         |v1 AS (SELECT replace(v0.w, m1.pair, 'A') AS w, v0.cnt FROM v0, m1),
         |p2 AS (SELECT substring(w, CAST(i AS INTEGER), 2) AS pair,
         |    CAST(SUM(cnt) AS BIGINT) AS cnt
         |  FROM v1, unnest(range(1, length(w))) t(i)
         |  WHERE length(w) >= 2
         |  GROUP BY 1 HAVING SUM(cnt) >= 2),
         |m2 AS (SELECT pair FROM p2 ORDER BY cnt DESC, pair ASC LIMIT 1),
         |v2 AS (SELECT replace(v1.w, m2.pair, 'B') AS w, v1.cnt FROM v1, m2),
         |p3 AS (SELECT substring(w, CAST(i AS INTEGER), 2) AS pair,
         |    CAST(SUM(cnt) AS BIGINT) AS cnt
         |  FROM v2, unnest(range(1, length(w))) t(i)
         |  WHERE length(w) >= 2
         |  GROUP BY 1 HAVING SUM(cnt) >= 2),
         |m3 AS (SELECT pair FROM p3 ORDER BY cnt DESC, pair ASC LIMIT 1),
         |v3 AS (SELECT replace(v2.w, m3.pair, 'C') AS w, v2.cnt FROM v2, m3),
         |s0 AS (SELECT CAST(SUM(cnt * length(w)) AS BIGINT) AS sym FROM v0),
         |s1 AS (SELECT CAST(SUM(cnt * length(w)) AS BIGINT) AS sym FROM v1),
         |s2 AS (SELECT CAST(SUM(cnt * length(w)) AS BIGINT) AS sym FROM v2),
         |s3 AS (SELECT CAST(SUM(cnt * length(w)) AS BIGINT) AS sym FROM v3)
         |SELECT CAST(0 AS INTEGER) AS iter, CAST(NULL AS VARCHAR) AS pair,
         |  s0.sym AS total_symbols, CAST(0 AS BIGINT) AS saved,
         |  CAST(1.0 AS DOUBLE) AS ratio FROM s0
         |UNION ALL
         |SELECT CAST(1 AS INTEGER), m1.pair, s1.sym, s0.sym - s1.sym,
         |  FLOOR(CAST(s1.sym AS DOUBLE) / s0.sym * 1000000 + 0.5) / 1000000
         |FROM m1, s0, s1
         |UNION ALL
         |SELECT CAST(2 AS INTEGER), m2.pair, s2.sym, s1.sym - s2.sym,
         |  FLOOR(CAST(s2.sym AS DOUBLE) / s0.sym * 1000000 + 0.5) / 1000000
         |FROM m2, s0, s1, s2
         |UNION ALL
         |SELECT CAST(3 AS INTEGER), m3.pair, s3.sym, s2.sym - s3.sym,
         |  FLOOR(CAST(s3.sym AS DOUBLE) / s0.sym * 1000000 + 0.5) / 1000000
         |FROM m3, s0, s2, s3""".stripMargin,
    // the guarded MG+confirm result is identical to plain exact top-k
    // by construction — the oracle states the exact form directly
    "q96_heavy_hitters" ->
      s"""WITH w AS (SELECT unnest($wsSql) AS w FROM documents),
         |freq AS (SELECT w, COUNT(*) AS cnt FROM w GROUP BY w),
         |r AS (SELECT w, cnt,
         |  ROW_NUMBER() OVER (ORDER BY cnt DESC, w ASC) AS rank FROM freq)
         |SELECT CAST(rank AS INTEGER) AS rank, w, cnt
         |FROM r WHERE rank <= 20""".stripMargin,
    "q75_vocab_coverage" ->
      s"""WITH w AS (SELECT unnest($wsSql) AS w FROM documents),
         |freq AS (SELECT w, COUNT(*) AS cnt FROM w GROUP BY w),
         |tot AS (SELECT SUM(cnt) AS total FROM freq),
         |r AS (SELECT w, cnt,
         |  ROW_NUMBER() OVER (ORDER BY cnt DESC, w ASC) AS rank,
         |  SUM(cnt) OVER (ORDER BY cnt DESC, w ASC
         |    ROWS UNBOUNDED PRECEDING) AS cum_cnt
         |  FROM freq)
         |SELECT CAST(rank AS INTEGER) AS rank, w, cnt,
         |  FLOOR((CAST(cum_cnt AS DOUBLE) / total) * 1000000.0 + 0.5) / 1000000.0 AS cum_frac
         |FROM r, tot WHERE rank <= 200""".stripMargin,
    "q72_pii_scan" -> {
      val countSel = piiPatterns.map { case (n, p) =>
        s"CAST(len(regexp_extract_all(text, '$p')) AS INTEGER) AS n_$n"
      }.mkString(",\n  ")
      val anySql = piiAnySql
      val redactSql = piiPatterns.foldLeft("text") { case (c, (n, p)) =>
        s"regexp_replace($c, '$p', '<${n.toUpperCase.dropRight(1)}>', 'g')"
      }
      s"""SELECT doc_id,
         |  $countSel,
         |  ($anySql) AS any_pii,
         |  $redactSql AS redacted
         |FROM documents""".stripMargin
    },
    "q70_curation_gate" ->
      s"""WITH $curationCtes
         |$curationSelect""".stripMargin,
    // q72's per-row flags rolled up by source; SUM(int) cast off
    // DuckDB's HUGEINT, the rate divides the same exact integers
    "q130_source_pii" -> {
      val countSel = piiPatterns.map { case (n, p) =>
        s"CAST(len(regexp_extract_all(text, '$p')) AS INTEGER) AS n_$n"
      }.mkString(",\n  ")
      val totSel = piiPatterns.map { case (n, _) =>
        s"CAST(SUM(n_$n) AS BIGINT) AS tot_$n"
      }.mkString(",\n  ")
      s"""WITH s AS (SELECT source,
         |  $countSel,
         |  ($piiAnySql) AS any_pii
         |FROM documents)
         |SELECT source, COUNT(*) AS n_docs,
         |  COUNT(CASE WHEN any_pii THEN 1 END) AS n_pii_docs,
         |  $totSel,
         |  FLOOR((CAST(COUNT(CASE WHEN any_pii THEN 1 END) AS DOUBLE)
         |    / COUNT(*)) * 10000.0 + 0.5) / 10000.0 AS pii_rate
         |FROM s GROUP BY source""".stripMargin
    },
    "q78_corpus_report" ->
      s"""WITH $curationCtes,
         |gate AS ($curationSelect),
         |gateagg AS (SELECT
         |  COUNT(CASE WHEN gopher_pass THEN 1 END) AS n_gopher_pass,
         |  COUNT(CASE WHEN rep_pass THEN 1 END) AS n_rep_pass,
         |  COUNT(CASE WHEN keep THEN 1 END) AS n_keep FROM gate),
         |base AS (SELECT COUNT(*) AS n_docs,
         |  COUNT(DISTINCT lang) AS n_langs FROM documents),
         |piiagg AS (SELECT
         |  COUNT(CASE WHEN $piiAnySql THEN 1 END) AS n_pii FROM documents),
         |dup AS (SELECT md5(text) AS fp, COUNT(*) AS c
         |        FROM documents GROUP BY md5(text)),
         |dupagg AS (SELECT
         |  COUNT(CASE WHEN c > 1 THEN 1 END) AS n_dup_groups,
         |  CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c - 1 END), 0) AS BIGINT)
         |    AS n_excess_copies FROM dup)
         |SELECT n_docs, n_langs, n_gopher_pass, n_rep_pass, n_keep, n_pii,
         |  n_dup_groups, n_excess_copies,
         |  FLOOR((CAST(n_keep AS DOUBLE) / n_docs) * 10000.0 + 0.5) / 10000.0 AS keep_rate,
         |  FLOOR((CAST(n_pii AS DOUBLE) / n_docs) * 10000.0 + 0.5) / 10000.0 AS pii_rate
         |FROM base, gateagg, piiagg, dupagg""".stripMargin,
    "q67_bm25" -> {
      val terms = Seq("spark", "join", "query")
      val tfSel = terms.map(t =>
        s"CAST(len(list_filter(ws, x -> x = '$t')) AS INTEGER) AS tf_$t").mkString(",\n  ")
      val dfSel = terms.map(t =>
        s"COUNT(CASE WHEN tf_$t > 0 THEN 1 END) AS df_$t").mkString(",\n  ")
      val scoreSql = terms.map(t =>
        s"((n_docs - df_$t + 0.5) / (df_$t + 0.5)) * ((tf_$t * 2.2) / " +
          s"(tf_$t + 1.2 * (0.25 + 0.75 * (dl / (CAST(sdl AS DOUBLE) / n_docs)))))")
        .mkString("\n    + ")
      s"""WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
         |m AS (SELECT doc_id, CAST(len(ws) AS INTEGER) AS dl,
         |  $tfSel
         |FROM w),
         |g AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sdl,
         |  $dfSel
         |FROM m),
         |s AS (SELECT doc_id, dl, ${terms.map("tf_" + _).mkString(", ")},
         |  $scoreSql AS raw
         |FROM m CROSS JOIN g)
         |SELECT doc_id, dl, ${terms.map("tf_" + _).mkString(", ")},
         |  FLOOR((raw) * 1000000.0 + 0.5) / 1000000.0 AS bm25
         |FROM s WHERE raw > 0 ORDER BY raw DESC, doc_id LIMIT 10""".stripMargin
    }
  )
}
