package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Column helpers whose semantics are reproducible bit-for-bit in the
  * DuckDB oracle (driver correctness gate). Everything here is built
  * from codegen'd Catalyst built-ins — no Scala UDFs — so the whole
  * expression tree stays inside WholeStageCodegen and scales linearly
  * with input partitions.
  */
object PortableFuncs {

  /** Exact, order-independent sum of a double column: cast each value
    * to DECIMAL(18,6) (deterministic nearest-rounding of the same
    * doubles in any engine; 18 digits keeps Spark's long-backed
    * Decimal fast path — precision >18 falls into BigDecimal and
    * costs ~3× on the per-value cast), sum exactly (decimal addition
    * is associative — partition order can't change the result, unlike
    * a double sum; the sum buffer grows to (28,6) automatically), then
    * cast the one exact total back to double.
    * DuckDB: `CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)`.
    */
  def exactSum(c: Column): Column =
    sum(c.cast(org.apache.spark.sql.types.DecimalType(18, 6))).cast(DoubleType)

  /** SQL form of [[exactSum]] for the DuckDB oracle. */
  def exactSumSql(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,6))) AS DOUBLE)"

  /** [[exactSum]] rounded to `scale` decimals IN DECIMAL SPACE, then
    * cast to double. `round(exactSum(x), s)` rounded the DOUBLE cast,
    * and the engines' round(double) tie-breaks differ: Spark rounds
    * the shortest decimal repr (BigDecimal HALF_UP), DuckDB rounds the
    * binary value (multiply-floor), so an exact decimal half-tie like
    * 571963.825 diverges at the last cent (fuzz seed 202, q01
    * sum_disc_price). Rounding the exact decimal is HALF_UP /
    * half-away-from-zero in BOTH engines — no double is ever rounded.
    */
  def exactSumRound(c: Column, scale: Int): Column =
    round(sum(c.cast(org.apache.spark.sql.types.DecimalType(18, 6))), scale)
      .cast(DoubleType)

  /** SQL form of [[exactSumRound]] (DuckDB ROUND on DECIMAL is exact
    * half-away-from-zero, matching Spark's Decimal HALF_UP). */
  def exactSumRoundSql(x: String, scale: Int): String =
    s"CAST(ROUND(SUM(CAST($x AS DECIMAL(18,6))), $scale) AS DOUBLE)"

  /** Engine-identical round-half-up of a DOUBLE (for ratio columns
    * like exact-sum / count, where no exact decimal form exists):
    * floor(x·10^s + 0.5) / 10^s — the q47 convention. Both engines
    * evaluate the SAME IEEE ops on the same input double, so the
    * result is bit-identical by construction, immune to the engines'
    * round(double) tie-break differences. (Ties round toward +inf —
    * for negative inputs that differs from HALF_UP's away-from-zero,
    * but identically so in both engines.) */
  def portableRound(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    floor(c * lit(f) + lit(0.5)) / lit(f)
  }

  /** SQL form of [[portableRound]]. */
  def portableRoundSql(x: String, scale: Int): String = {
    val f = BigDecimal(10).pow(scale).toDouble
    s"FLOOR(($x) * $f + 0.5) / $f"
  }

  /** Deterministic 60-bit non-negative hash of a string, portable across
    * engines: first 15 hex chars of md5, parsed base-16.
    * DuckDB equivalent: `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`.
    */
  def portableHash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Normalize free text: lowercase, non-alphanumerics → space, collapse
    * runs of spaces, trim. DuckDB:
    * `trim(regexp_replace(regexp_replace(lower(x),'[^a-z0-9 ]',' ','g'),' +',' ','g'))`.
    */
  def normText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  /** Tokenize normalized text into words, dropping empties — ONE
    * native byte-scan pass via [[NormWordsExpression]] (the composed
    * regex/split/filter chain cost two regex passes plus an
    * interpreted lambda per token; semantics are identical, see the
    * expression's equivalence note).
    * DuckDB: `list_filter(string_split_regex(normText, ' +'), w -> w <> '')`.
    */
  def words(c: Column): Column = NormWordsExpression.normWords(c)

  /** The composed regex formulation of [[words]] — kept as the
    * executable specification the native kernel is property-tested
    * against. */
  def wordsComposed(c: Column): Column =
    filter(split(normText(c), " +"), w => w =!= "")

  /** 0-based codepoint offset of each [[words]] token in lower(text),
    * aligned index-for-index with the words array — the coordinate
    * column span-granular dedup carries so spans can report
    * (char_start, char_len) real curation cuts by. One native pass
    * via [[NormWordStartsExpression]] (same byte scan as the
    * tokenize). DuckDB restates it as cumulative separator/word
    * lengths over `lower(text)` — see the q91 oracle. */
  def wordStarts(c: Column): Column =
    NormWordStartsExpression.normWordStarts(c)

  /** Word n-gram shingles (space-joined) over a words-array column;
    * empty array when fewer than n words. ONE native pass via
    * [[WordShinglesExpression]] — the composed transform-lambda form
    * evaluated interpreted (n `element_at` + a `concat_ws` per
    * shingle) and re-ran any inlined input expression per element. */
  def shinglesFromWords(ws: Column, n: Int): Column =
    WordShinglesExpression.wordShingles(ws, n)

  /** First-occurrence-distinct shingles in one kernel pass — equals
    * `array_distinct(shinglesFromWords(ws, n))`. */
  def distinctShingles(ws: Column, n: Int): Column =
    WordShinglesExpression.wordShingles(ws, n, distinct = true)

  /** The composed formulation of [[shinglesFromWords]] — kept as the
    * executable specification the native kernel is property-tested
    * against. */
  def shinglesComposed(ws: Column, n: Int): Column =
    when(
      size(ws) >= n,
      transform(
        sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + k + 1)): _*))
    ).otherwise(array().cast("array<string>"))

  /** Longest repeated word-run length within a words array (ONE native
    * suffix-automaton pass, scan-side) — see [[LongestDupRunExpression]].
    * DuckDB states the same number via sorted-suffix adjacent-LCP. */
  def longestDupRun(ws: Column): Column =
    LongestDupRunExpression.longestDupRun(ws)

  /** Count non-overlapping occurrences of literal `pat` in `c` —
    * `(len(x) - len(replace(x, pat, ''))) / len(pat)` — same leftmost
    * non-overlapping semantics in Spark and DuckDB.
    */
  def countOccurrences(c: Column, pat: String): Column =
    ((length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(pat), ""))) / pat.length)
      .cast(LongType)

  /** Elementwise float→double cast (exact), so downstream arithmetic is
    * IEEE-double on both engines.
    */
  def toDoubleArray(c: Column): Column = transform(c, _.cast(DoubleType))

  /** Dot product of two double arrays via the native codegen'd
    * [[ArrayDot]] expression — same sequential accumulation order as a
    * scalar fold (bit-identical to DuckDB `list_dot_product` on
    * DOUBLE[]), but a tight primitive loop inside WholeStageCodegen
    * instead of an interpreted zip_with/aggregate lambda chain.
    */
  def dotProduct(a: Column, b: Column): Column = VectorExpressions.dot(a, b)

  /** L2 norm of a double array. */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity of two float-array columns: one fused pass
    * (dot + both norms) via [[ArrayCosine]]. */
  def cosine(a: Column, b: Column): Column =
    VectorExpressions.cosineFused(toDoubleArray(a), toDoubleArray(b))
}
