package graft.scale

import graft.{QueryModule, Tables => T}
import graft.Materialize.CoreOps
import graft.functions.PortableFuncs._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deduplication operators for LLM training-data pipelines (BASELINE
  * north star — no reference counterpart): exact, MinHash+LSH, SimHash,
  * n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design (100 TB of documents):
  *  - every method reduces to shuffle-by-short-key (hash / band value /
  *    LSH bucket), never an all-pairs cross join — candidate pairs come
  *    from equality self-joins on tiny keys, so the shuffle volume is
  *    O(docs × signature) not O(docs²);
  *  - signatures are computed with codegen'd built-ins (no UDFs), so
  *    they pipeline inside WholeStageCodegen over the scan;
  *  - banding parameters (16 hashes, 4 bands) give the standard
  *    S-curve: P(candidate) = 1-(1-j^4)^4 for Jaccard j.
  */
object Dedup extends QueryModule {

  val NumMinhashes = 16
  val NumBands = 4
  val ShingleSize = 4

  /** Minimum containing-doc count for a window to be a duplicated
    * span — ONE definition for the four span registrations'
    * `minDocs` argument and the oracle `HAVING` bounds. Lives here
    * with the other shared constants (not at its mid-file first-use
    * site) so an init-time reference can never observe the
    * pre-initialization 0L. */
  val SpanMinDocs = 2L

  /** Shared gate knobs — ONE definition each, interpolated into BOTH
    * the Spark registrations and the oracle SQL (the GateLmVocab
    * discipline): a knob edited in one place cannot drift between
    * engines, or between the queries that share it (q29/q95/q127 all
    * ride the same cosine gate; five contamination boards share the
    * eval-slice bound). */
  /** The gate boards' simhash near-dup radius (hamming bits) — ONE
    * definition for the Scala gate call sites (the shared pair core,
    * dedupRoi, dedupImpact's default) and [[simhashPairCte]]'s `<=`
    * bound, so the knob cannot drift between engines (the q162
    * shared-constant discipline). */
  val GateMaxDist = 5

  val EmbedNearDupMinCos = 0.3
  val EmbedNearDupMaxId = 300L
  val LshNearDupMinCos = 0.2
  val EvalMaxId = 25L
  val MinhashAuditTol = 0.45
  val RepeatedNgramsMinDf = 3L
  val BoilerplateMinShare = 0.3
  val BoilerplateMinLen = 5

  /** Exact dedup: group identical normalized content, keep lowest id.
    * At scale: shuffle on md5 (short key), never on the text itself. */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** doc_id → exploded distinct word-n-gram shingle. The words array is
    * materialized as a column first so the shingling lambda (interpreted,
    * no CSE) reads it instead of re-running the normalize/split regexes
    * per element — that inline form cost ~100 regex passes per doc. */
  def shingleTable(docs: DataFrame, n: Int = ShingleSize): DataFrame =
    Layout.widen(docs).select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"),
        explode(distinctShingles(col("ws"), n)).as("sh"))

  /** doc_id → words array for docs with at least one shingle. The
    * kernels take the WORDS array and shingle internally — shingling
    * as a Spark transform lambda re-evaluates the inlined words()
    * regex chain per element once projections collapse (45s/5000 docs
    * observed); here words() is referenced exactly once per operator. */
  private def wordArrays(docs: DataFrame): DataFrame =
    Layout.widen(docs).select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) >= ShingleSize)

  /** MinHash signature: for permutation i, min over shingles of
    * md5(i ++ '|' ++ shingle) — lexicographic min of a keyed hash is a
    * valid MinHash family and is reproducible in any engine with md5.
    *
    * Computed rowside by the native [[graft.functions.MinHashSig]]
    * expression (one fold per document, shingling included) — no row
    * expansion, no shuffle; at 100 TB signatures stream out of the
    * scan. Docs with no shingles (<n words) are excluded, matching the
    * exploded form. */
  def minhashSignature(docs: DataFrame): DataFrame = {
    import graft.functions.MinHashExpression.minhashSig
    wordArrays(docs)
      .select(col("doc_id"),
        minhashSig(col("ws"), ShingleSize, NumMinhashes).as("sig"))
  }

  /** LSH banding: signature → (band_id, band_hash) rows. Equal band_hash
    * ⇒ candidate pair. Bucket join on (b, bv) is an equality shuffle —
    * the scalable core of MinHash dedup.
    *
    * Band hashes come from ONE kernel call per document
    * ([[graft.functions.MinHashBands]]) fed through `posexplode` — a
    * generator evaluates its input once per row, whereas extracting 16
    * signature columns lets the optimizer inline (and re-run) the
    * signature expression per column (observed 16×: 2.7s → 43s). */
  def minhashBands(docs: DataFrame): DataFrame =
    minhashBandsFrom(wordArrays(docs))

  /** [[minhashBands]] from a words core — shared-core form. */
  private[scale] def minhashBandsFrom(wa: DataFrame): DataFrame = {
    import graft.functions.MinHashExpression.minhashBandHashes
    wa.select(col("doc_id"),
        posexplode(minhashBandHashes(col("ws"), ShingleSize, NumMinhashes, NumBands))
          .as(Seq("b", "bv")))
      .select(col("doc_id"), col("b"), col("bv"))
  }

  /** Near-duplicate candidate pairs via MinHash-LSH bucket self-join.
    * A band bucket is hot precisely when a large near-identical
    * template family shares its signature slice — the thing near-dup
    * dedup exists to find — so the d²/2 candidate pairs are the
    * operator's OWN output; [[Skew.boundedSelfPairs]] spreads their
    * generation across grid regions instead of funneling the family
    * into one task (identical result set by that operator's
    * contract). */
  def minhashPairs(docs: DataFrame): DataFrame = {
    val bands = minhashBands(docs)
    Skew.boundedSelfPairs(bands, Seq("b", "bv"), "doc_id")
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** q156: the LSH band sweep — the S-curve tuning board behind the
    * q26 banding choice: every (bands × rows-per-band) factorization
    * of the 16-component signature, with the candidate volume and
    * candidate quality that configuration would hand the dedup
    * pipeline. Per config: the theoretical S-curve midpoint
    * t ≈ (1/b)^(1/r) (the Jaccard at ~50% candidate probability —
    * the knob's calibrated meaning), the candidate pair count, the
    * mean signature-estimated Jaccard of those candidates, and the
    * weak-candidate count (estimate < ½ — the pairs a verifier pays
    * for and then discards). Wide bands (b=16, r=1) catch everything
    * and drown the verifier; one band of 16 rows admits only
    * near-identical signatures. q143 calibrates the SIGNAL; this
    * board prices the CONFIGURATION.
    *
    * Every threshold is IEEE-portable by construction: b and r are
    * powers of two, so (1/b)^(1/r) is an exact dyadic rational pushed
    * through a chain of exactly-rounded sqrts (the q149 argument).
    *
    * Scale design: ONE tokenize pass (checkpointed words core) feeds
    * every arm; signatures and band hashes are scan-side kernel
    * projections; each arm's candidates come from the q26
    * band-equality self-join (short keys), collapsed to distinct
    * pairs, matched against the signature table, and reduced to ONE
    * row — the corpus never moves more than the banding itself
    * requires. */
  def bandSweep(docs: DataFrame,
                bandConfigs: Seq[Int] = Seq(16, 8, 4, 2, 1)): DataFrame = {
    val wa = wordArrays(docs).coreCheckpoint()
    bandSweepFrom(wa, sigTableFrom(wa).coreCheckpoint(), bandConfigs)
  }

  /** The (doc_id, sig) MinHash signature table from a words core —
    * the scan-side kernel projection q156 and q103 both read; the
    * gate registry memoizes it ([[gateSigs]]) so a batch computes
    * signatures once, not once per consumer. */
  private[scale] def sigTableFrom(wa: DataFrame): DataFrame = {
    import graft.functions.MinHashExpression.minhashSig
    wa.select(col("doc_id"),
      minhashSig(col("ws"), ShingleSize, NumMinhashes).as("sig"))
  }

  /** [[bandSweep]] from pre-checkpointed words + signature cores. */
  private[scale] def bandSweepFrom(wa: DataFrame, sigs: DataFrame,
      bandConfigs: Seq[Int] = Seq(16, 8, 4, 2, 1)): DataFrame = {
    import graft.functions.MinHashExpression.minhashBandHashes
    def r6d(c: Column): Column = floor(c * 1000000d + 0.5d) / 1000000d
    val spark = wa.sparkSession
    // ONE config-tagged union through ONE bounded self-join replaces
    // the former five per-arm chains (r20): each arm paid its own
    // boundedSelfPairs — an input checkpoint, a per-key counts pass
    // and the join — plus two signature joins and an aggregate, ~7
    // driver-visible stage jobs per arm at sf0.1 where per-row work
    // is trivial. Keys are namespaced by the config (cfg, b, bv), so
    // the hot-key routing makes the IDENTICAL per-key decisions and
    // the per-config pair sets are unchanged; `cfgp` rides as payload
    // because the pair output drops its join keys. The literal meta
    // table (n_bands, rows_per_band, threshold) left-joins the
    // grouped counts so a config with ZERO candidate pairs — the
    // single-row fuzz profile — still publishes its n_pairs = 0 row
    // exactly as the former per-arm global aggregate did.
    // the b=16/r=1 arm is the family's sharpest hot-bucket surface
    // (single-component bands catch everything) — same bounded join
    val bandsAll = bandConfigs.map { b =>
      wa.select(col("doc_id"),
          posexplode(minhashBandHashes(col("ws"), ShingleSize, NumMinhashes, b))
            .as(Seq("b", "bv")))
        .select(lit(b).as("cfg"), lit(b).as("cfgp"), col("b"), col("bv"),
          col("doc_id"))
    }.reduce(_ unionByName _)
    val cand = Skew.boundedSelfPairs(bandsAll, Seq("cfg", "b", "bv"),
        "doc_id", payload = Seq("cfgp"))
      .select(col("cfgp_a").as("cfg"), col("doc_a"), col("doc_b"))
      .distinct()
    val matched = cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")),
        Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")),
        Seq("doc_b"))
      .withColumn("matches",
        size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, lit(1))), c => c.isNotNull)))
    val grouped = matched.groupBy(col("cfg"))
      .agg(count(lit(1)).as("pairs"),
        coalesce(sum(col("matches")), lit(0L)).as("sum_matches"),
        count(when(col("matches") * 2 < NumMinhashes, 1)).as("weak"))
    val meta = spark.createDataFrame(bandConfigs.map { b =>
      (b, NumMinhashes / b, bandThreshold(b, NumMinhashes / b))
    }).toDF("n_bands", "rows_per_band", "threshold")
    meta.join(broadcast(grouped), meta("n_bands") === grouped("cfg"), "left")
      .select(col("n_bands"), col("rows_per_band"), col("threshold"),
        coalesce(col("pairs"), lit(0L)).as("n_pairs"),
        when(coalesce(col("pairs"), lit(0L)) > 0L,
          r6d(col("sum_matches").cast("double")
            / (col("pairs") * NumMinhashes))).as("mean_est_jaccard"),
        coalesce(col("weak"), lit(0L)).as("n_weak"))
  }

  /** (1/b)^(1/r) for power-of-two r as an exact chain of sqrts,
    * r6-rounded — the same double in the plan and the oracle. */
  private[scale] def bandThreshold(b: Int, r: Int): Double = {
    var x = 1.0 / b
    var k = r
    while (k > 1) { x = math.sqrt(x); k /= 2 }
    math.floor(x * 1e6 + 0.5) / 1e6
  }

  /** Certify-the-sketch for MinHash — the q81/q99 audit contract
    * applied to the dedup sketch itself: for every LSH candidate pair
    * (band-sharing, the pairs the pipeline would actually act on),
    * the signature-agreement estimate of Jaccard (matching components
    * / numHashes — the estimator MinHash exists to provide) is put
    * next to the EXACT Jaccard of the uncapped distinct-shingle sets,
    * and the absolute error is gated. A drifting hash kernel, a
    * silently reordered signature, or a banding bug all surface here
    * as `within_tol = false` rows before they corrupt a dedup run.
    *
    * tol: k = 16 components ⇒ se(est) = sqrt(j(1-j)/16) ≤ 0.125;
    * band-sharing conditions the sample toward agreement, so the
    * error is one-sided-ish and bounded well inside 3·se. Measured
    * max |err| at sf0.001/0.01/0.1: 0.1106 / 0.1389 / 0.2222
    * (28 / 25 / 256 candidate pairs); tol = 0.45 keeps a ≥ 0.22
    * margin under the worst measurement (the q88 margin discipline).
    *
    * Scale design: ONE tokenize pass (the words table is checkpointed;
    * signatures and band hashes are scan-side kernel projections of
    * it); candidates come from the band-equality self-join (the q26
    * shape, short keys); the exact-Jaccard side never self-joins the
    * shingle table — each candidate pair routes doc_a's shingles
    * through an equality join on (doc_b, sh), so the audit's shuffle
    * is O(candidates × shingles/doc), bounded by the LSH output, not
    * O(shingle-df²). At 100 TB this audit runs on the same plan at
    * whatever candidate rate the banding yields. */
  def minhashAudit(docs: DataFrame, tol: Double = MinhashAuditTol): DataFrame = {
    val wa = wordArrays(docs).coreCheckpoint()
    minhashAuditFrom(wa, sigTableFrom(wa), tol)
  }

  /** [[minhashAudit]] from pre-checkpointed words + signature cores. */
  private[scale] def minhashAuditFrom(wa: DataFrame, sigs: DataFrame,
                                      tol: Double): DataFrame = {
    import graft.functions.MinHashExpression.minhashBandHashes
    val bands = wa.select(col("doc_id"),
      posexplode(minhashBandHashes(col("ws"), ShingleSize, NumMinhashes,
        NumBands)).as(Seq("b", "bv")))
    val cand = Skew.boundedSelfPairs(bands, Seq("b", "bv"), "doc_id")
      .distinct()
    val sh = wa.select(col("doc_id"),
      explode(distinctShingles(col("ws"), ShingleSize)).as("sh"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    val est = col("matches").cast("double") / lit(NumMinhashes)
    val exact = col("inter").cast("double") /
      (col("na") + col("nb") - col("inter"))
    // band-sharing ⇒ ≥ 1 shared min-shingle ⇒ inter ≥ 1: the inner
    // inter join keeps exactly one row per candidate pair (md5
    // collisions aside), so inter IS the candidate list with counts
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
      .withColumn("matches",
        size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, lit(1))), c => c.isNotNull)))
      .select(col("doc_a"), col("doc_b"), col("inter"),
        est.as("est"),
        portableRound(exact, 4).as("jaccard"),
        portableRound(abs(est - exact), 4).as("err"),
        (abs(est - exact) <= lit(tol)).as("within_tol"))
  }

  /** 60-bit SimHash over word occurrences (frequency-weighted): bit b is
    * the sign of Σ±1 over token-hash bit b. Near-dups then differ in
    * few bits (Hamming ≤ k via [[simhashPairs]]).
    *
    * One pass per document via the native [[graft.functions.SimHash60]]
    * expression — no word explode (100× row expansion), no shuffle: at
    * 100 TB this runs at scan speed as a pure projection. The
    * `size(ws) > 0` filter matches the exploded form's semantics
    * (a doc with no words produced no rows there). */
  def simhash(docs: DataFrame): DataFrame = {
    import graft.functions.SimHashExpression.simhash60
    Layout.widen(docs).select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) > 0)
      .select(col("doc_id"), simhash60(col("ws")).as("simhash"))
  }

  /** SimHash near-dup pairs within Hamming distance `maxDist`.
    * Candidate generation splits the 60-bit signature into `numChunks`
    * disjoint chunks and blocks on every (numChunks − maxDist)-chunk
    * combination: ≤ maxDist differing bits touch at most maxDist
    * chunks, so at least numChunks − maxDist chunks agree — one of the
    * C(numChunks, maxDist) combination tables holds the pair with its
    * FULL key equal. The blocking is COMPLETE for any
    * numChunks ≥ maxDist + 1 (Manku et al.'s multi-table scheme), and
    * candidates come from an equality self-join, never the n² cross
    * join.
    *
    * The default numChunks = maxDist + 1 is the classic single-chunk
    * parameterization (C(m+1, 1) = m+1 tables keyed on ~60/(m+1)
    * bits). Scale knob: simhash bits are corpus-biased (common words
    * push the same bits corpus-wide), so single-chunk bucket occupancy
    * grows LINEARLY with corpus size — at sf0.1 the hottest 10-bit
    * chunk bucket already holds 11% of the corpus. Raising numChunks
    * widens each table key (numChunks = maxDist + 2 ⇒ 2-chunk keys,
    * squaring per-bucket selectivity) at the cost of C(c, m) tables —
    * the occupancy/table-count trade a 100 TB run tunes. Whatever the
    * residual occupancy, the self-join runs through
    * [[Skew.boundedSelfPairs]], so a hot bucket (templated-page family
    * or low-entropy chunk) spreads across grid regions instead of
    * funneling d²/2 pairs into one task; results are identical to the
    * plain join by that operator's contract. */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3,
                   numChunks: Int = 0): DataFrame = {
    require(maxDist >= 1 && maxDist < 60,
      s"maxDist must be in [1, 59] for 60-bit signatures: $maxDist")
    val c = if (numChunks <= 0) maxDist + 1 else numChunks
    require(c >= maxDist + 1 && c <= 60,
      s"numChunks must be in [maxDist+1, 60]: $c")
    simhashCandidates(simhash(docs), maxDist, c)
      .filter(col("dist") <= maxDist)
  }

  /** Chunk geometry shared by [[simhashPairs]], [[chunkSweep]] and the
    * generated oracles — ONE definition of the disjoint (start, width)
    * bit layout and the complete (c − maxDist)-subset table list, so
    * the Spark plans and the SQL cannot drift. */
  private[scale] def chunkBounds(c: Int, ci: Int): (Int, Int) = {
    val baseW = 60 / c
    val rem = 60 % c
    (ci * baseW + math.min(ci, rem), baseW + (if (ci < rem) 1 else 0))
  }

  private[scale] def chunkSubsets(maxDist: Int, c: Int): Seq[Seq[Int]] =
    (0 until c).combinations(c - maxDist).map(_.toSeq).toSeq

  /** One struct per table: id + the subset's chunk values packed into
    * a single long (disjoint chunks total 60 bits, so any subset packs
    * losslessly). */
  private def chunkTableStructs(maxDist: Int, c: Int): Seq[Column] =
    chunkSubsets(maxDist, c).zipWithIndex.map { case (ss, t) =>
      val kv = ss.foldLeft(lit(0L)) { (acc, ci) =>
        val (start, width) = chunkBounds(c, ci)
        shiftleft(acc, width).bitwiseOR(
          shiftright(col("simhash"), start).bitwiseAND((1L << width) - 1L))
      }
      struct(lit(t).as("t"), kv.as("kv"))
    }

  /** The Manku multi-table blocking of a table carrying a 60-bit
    * `simhash` column: one (t, kv) row per complete
    * (c − maxDist)-chunk combination, all other columns passed
    * through. Shared by [[simhashCandidates]], [[chunkSweep]] and the
    * streaming [[graft.streaming.NearDupMaintenance]] (which blocks a
    * frozen index statically and the arrival stream scan-side — the
    * SAME geometry on both sides is what makes the stream-static join
    * complete). */
  private[graft] def blockedSignatures(sh: DataFrame, maxDist: Int,
                                       c: Int): DataFrame =
    sh.withColumn("tb", explode(array(chunkTableStructs(maxDist, c): _*)))
      .withColumn("t", col("tb.t")).withColumn("kv", col("tb.kv"))
      .drop("tb")

  /** The chunk-blocked DISTINCT candidate pairs (with their hamming
    * distance) of a (doc_id, simhash) table — the shared core of
    * [[simhashPairs]] (which filters to ≤ maxDist) and [[chunkSweep]]
    * (which prices the unfiltered candidate volume). */
  private def simhashCandidates(sh0: DataFrame, maxDist: Int,
                                c: Int): DataFrame = {
    // materialize the (doc_id, simhash) table — n rows, two longs —
    // NOT the c-times-exploded blocked table: the explode is cheap
    // bit arithmetic each consumer re-runs from the small checkpoint,
    // vs a c×n-row checkpoint write the operator would otherwise pay
    // up front
    val sh = sh0.coreCheckpoint()
    val blocked = blockedSignatures(sh, maxDist, c)
    Skew.boundedSelfPairs(blocked, Seq("t", "kv"), "doc_id",
        payload = Seq("simhash"), inputMaterialized = true)
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("simhash_a").bitwiseXOR(col("simhash_b"))).as("dist"))
      .distinct()
  }

  /** Deterministic doc_id-hash sample rate the q172 gate board sweeps
    * at (see [[chunkSweep]]'s sampleRate paragraph). */
  val ChunkSweepSampleRate = 0.25

  /** The sweep's geometry knobs — ONE definition for the Scala
    * defaults and the oracle's packed-key SQL generator (the q162
    * shared-constant discipline): editing either in one place keeps
    * the two engines sweeping the same frontier. */
  val ChunkSweepMaxDist = 3
  val ChunkSweepConfigs: Seq[Int] = Seq(4, 5, 6)

  /** q172: the chunk-count sweep — the tuning frontier behind the
    * [[simhashPairs]] numChunks knob, the q156 discipline applied to
    * the OTHER blocking family: for each numChunks ≥ maxDist + 1, the
    * table count C(c, c−m) (the row-replication bill), the bucket
    * occupancy the corpus actually produces (bucket count, max df),
    * the raw within-bucket pair emissions Σ df(df−1)/2 (the join cost
    * the q28 chain pays), the distinct candidate volume, and how many
    * candidates verify at ≤ maxDist (`n_true`, with the verify
    * precision `true_rate`). n_true is CONSTANT across arms — every
    * arm is a complete blocking, and the board showing that IS the
    * completeness certificate — while emissions fall as keys widen:
    * the exact occupancy-vs-tables trade a 100 TB run reads before
    * setting the knob (single-chunk bucket occupancy grows linearly
    * with the corpus — sf0.1 measures the hottest maxDist=5 10-bit
    * bucket at 11% of the corpus; multi-chunk keys square that
    * selectivity away). The gate board sweeps the DEFAULT maxDist=3
    * blocking (15-bit chunks, the Manku parameterization) — the same
    * frontier at a diagnostic price; a production run re-points it at
    * its own (maxDist, configs).
    *
    * `sampleRate < 1` prices the frontier on a deterministic
    * doc_id-hash sample (the [[Curation]] split uniform, so both
    * engines draw the SAME sample) — the way an occupancy probe
    * actually runs at 100 TB: candidate volume is quadratic in bucket
    * occupancy, so sweeping the full corpus would cost a multiple of
    * the production run it is meant to tune, while occupancy RATIOS,
    * the emissions ordering and the completeness certificate are all
    * scale-free reads off the sample. The gate board samples at
    * [[ChunkSweepSampleRate]]; [[DedupSpec]] property-tests the
    * full-corpus form.
    *
    * Scale design: ONE signature kernel pass (checkpointed) feeds all
    * arms; per arm the occupancy side is two stacked aggregates
    * (map-side partials swallow the hot bucket) and the candidate
    * side rides [[Skew.boundedSelfPairs]] — the same bounded routing
    * the production chain uses, so the sweep survives the exact skew
    * it exists to measure. */
  def chunkSweep(docs: DataFrame, maxDist: Int = ChunkSweepMaxDist,
                 configs: Seq[Int] = ChunkSweepConfigs,
                 sampleRate: Double = 1.0): DataFrame = {
    require(sampleRate > 0d && sampleRate <= 1d,
      s"sampleRate must be in (0, 1]: $sampleRate")
    def r6(cc: Column): Column = floor(cc * 1000000d + 0.5d) / 1000000d
    val base =
      if (sampleRate >= 1d) docs
      else docs.filter(
        graft.functions.PortableFuncs.portableHash60(
          col("doc_id").cast("string")).cast("double") /
          lit((1L << 60).toDouble) < lit(sampleRate))
    val sh = simhash(base).coreCheckpoint()
    val spark = docs.sparkSession
    configs.foreach(c => require(c >= maxDist + 1 && c <= 60,
      s"numChunks must be in [maxDist+1, 60]: $c"))
    // ONE config-tagged blocked projection feeds ONE counts pass, ONE
    // occupancy rollup and ONE bounded self-join for ALL arms (r20):
    // each arm used to pay its own counts checkpoint, occupancy
    // aggregate, bounded join, distinct and candidate aggregate —
    // ~10 driver-visible stage jobs per arm at sf0.1 where per-row
    // work is trivial. Keys are namespaced by the config (cfg, t,
    // kv), so the hot-key routing makes the IDENTICAL per-key
    // decisions and per-config candidate sets are unchanged; the
    // blocked union is still re-exploded from the small signature
    // checkpoint (cheap bit arithmetic), never written out wide. The
    // literal meta table left-joins both rollups so a config with an
    // EMPTY sampled corpus still publishes its row with the former
    // global-aggregate edge values (n_buckets/n_candidates/n_true 0,
    // sums null).
    val blockedAll = configs.map { c =>
      blockedSignatures(sh, maxDist, c)
        .select(lit(c).as("cfg"), lit(c).as("cfgp"), col("t"), col("kv"),
          col("doc_id"), col("simhash"))
    }.reduce(_ unionByName _)
    val cnts = blockedAll.groupBy(col("cfg"), col("t"), col("kv"))
      .agg(count(lit(1)).as("__df"))
      .coreCheckpoint()
    val occ = cnts.groupBy(col("cfg"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("__df")).as("n_rows"),
        max(col("__df")).as("max_df"),
        sum(expr("(__df * (__df - 1)) div 2")).as("emissions"))
    val stats = Skew.boundedSelfPairs(blockedAll, Seq("cfg", "t", "kv"),
        "doc_id", payload = Seq("simhash", "cfgp"), counts = Some(cnts),
        inputMaterialized = true)
      .select(col("cfgp_a").as("cfg"), col("doc_a"), col("doc_b"),
        bit_count(col("simhash_a").bitwiseXOR(col("simhash_b")))
          .as("dist"))
      .distinct()
      .groupBy(col("cfg"))
      .agg(count(lit(1)).as("n_candidates"),
        count(when(col("dist") <= maxDist, 1)).as("n_true"))
    val meta = spark.createDataFrame(configs.map(c =>
      (c, chunkSubsets(maxDist, c).size))).toDF("n_chunks", "n_tables")
    meta
      .join(broadcast(occ), meta("n_chunks") === occ("cfg"), "left")
      .drop("cfg")
      .join(broadcast(stats), meta("n_chunks") === stats("cfg"), "left")
      .drop("cfg")
      .select(col("n_chunks"), col("n_tables"),
        col("n_rows"), coalesce(col("n_buckets"), lit(0L)).as("n_buckets"),
        col("max_df"), col("emissions"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        when(coalesce(col("n_candidates"), lit(0L)) > 0,
          r6(col("n_true").cast("double") / col("n_candidates")))
          .as("true_rate"))
  }

  /** Connected components over a near-dup pair list — the step that
    * turns PAIRS into dedup CLUSTERS (keep one representative per
    * component). Iterative min-label propagation: every node adopts
    * the smallest label among itself and its neighbors until a
    * fixpoint; the component id is the smallest doc_id in the
    * component, so the result is deterministic.
    *
    * Scale design: each round is one equi-join (edges ⋈ labels, shuffle
    * by node) + a min-aggregate; lineage is truncated per round with
    * localCheckpoint so the plan doesn't grow with iterations. Rounds
    * needed = graph diameter; near-dup components are shallow (dozens
    * of docs), so a handful of rounds converges — for adversarially
    * long chains the alternating small-star/large-star variant bounds
    * rounds at O(log n). Convergence is detected by the monotone
    * label-sum invariant (labels only decrease), one cheap action per
    * round. Each round's checkpoint supersedes the last; dropped
    * rounds hold no live references, so Spark's ContextCleaner
    * reclaims their blocks as the driver GCs them.
    *
    * Adaptive small-graph fast path: near-dup edge lists are usually
    * a vanishing fraction of the corpus (56 pairs from 500 docs at
    * sf0.01), and an iterative distributed loop pays fixed job+shuffle
    * cost per round regardless of size. Like a broadcast-join
    * threshold, when the symmetrized edge list is at most
    * `driverMaxEdges` rows it is collected and solved with
    * union-find on the driver (O(E α(E)), milliseconds at the
    * threshold); larger graphs take the distributed loop. Both paths
    * produce identical labels (spec-checked against each other).
    * The default threshold (1M edges ≈ 16 MB of primitive pairs plus
    * the union-find map) is broadcast-threshold-conservative so the
    * fast path cannot OOM a small driver. Id columns must already be
    * integral (byte/short/int/long) — validated up front, because a
    * silent cast of e.g. string ids to null would corrupt every
    * component without an error.
    */
  /** Validate + cast + symmetrize a pair list into a distinct (a, b)
    * edge DataFrame with both orientations — the shared front door of
    * every graph op here. The integral-id require exists because a
    * silent cast would turn non-numeric ids into nulls and corrupt
    * every component/ballot/rank without an error; the null filter
    * drops genuinely-null endpoints (a null is not an edge). */
  private def requireIntegralIds(df: DataFrame, cols: Seq[String],
                                 op: String): Unit =
    for (c <- cols) {
      import org.apache.spark.sql.types.{ByteType, IntegerType, ShortType}
      val dt = df.schema(c).dataType
      val integral = dt == LongType || dt == IntegerType ||
        dt == ShortType || dt == ByteType
      require(integral,
        s"$op requires integral id columns; '$c' is ${dt.simpleString}. " +
          "Map ids to longs first (e.g. hash or dense-rank them) — a " +
          "silent cast would turn non-numeric ids into nulls.")
    }

  private def symEdges(pairs: DataFrame, aCol: String, bCol: String,
                       op: String): DataFrame = {
    requireIntegralIds(pairs, Seq(aCol, bCol), op)
    pairs
      .select(col(aCol).cast(LongType).as("a"), col(bCol).cast(LongType).as("b"))
      .unionByName(pairs
        .select(col(bCol).cast(LongType).as("a"), col(aCol).cast(LongType).as("b")))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .distinct()
  }

  def connectedComponents(pairs: DataFrame, aCol: String = "doc_a",
                          bCol: String = "doc_b", maxIter: Int = 25,
                          driverMaxEdges: Long = 1L << 20): DataFrame = {
    // checkpoint BEFORE the size probe: the count and every later read
    // (the union-find collect, or the per-round joins) then hit the
    // materialized table. Deferring the checkpoint past the probe was
    // TRIED (round 18) and reverted — it saves one write on the
    // union-find path but adds a full extra scan of the edge plan on
    // the iterative path (count on the unmaterialized plan, THEN the
    // checkpoint's own pass), and the sequential capture showed the
    // comps-heavy boards (q59/q95/q173) paying 2-3× for it.
    val edges = symEdges(pairs, aCol, bCol, "connectedComponents")
      .select(col("a").as("src"), col("b").as("dst"))
      .coreCheckpoint()
    val nEdges = edges.count()
    if (nEdges <= driverMaxEdges) return driverUnionFind(edges)
    var labels = edges.groupBy(col("src").as("node"))
      .agg(min(col("dst")).as("nbr"))
      .select(col("node"), least(col("node"), col("nbr")).as("label"))
      .coreCheckpoint()
    var prevSum = Long.MaxValue
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val next = edges.join(labels, edges("src") === labels("node"))
        .select(col("dst").as("node"), col("label"))
        .unionByName(labels)
        .groupBy(col("node")).agg(min(col("label")).as("label"))
        .coreCheckpoint()
      // coalesce: an empty pair list (nothing near-duplicate) must
      // converge to an empty result, not NPE on a null sum
      val s = next.agg(coalesce(sum(col("label")), lit(0L))).head().getLong(0)
      converged = s == prevSum
      prevSum = s
      labels = next
      iter += 1
    }
    // silent partial propagation would report one real component as
    // several clusters — fail loudly instead
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge within $maxIter rounds " +
          "(graph diameter exceeds the budget) — raise maxIter")
    labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Synchronous label-propagation communities over a near-dup pair
    * graph — the graph op one step past connected components: where CC
    * merges everything reachable, LPA splits a sprawling component
    * into densely-linked communities (a CC cluster chained through one
    * borderline pair stays two communities here).
    *
    * Determinism (cross-engine, oracle-checkable — unusual for LPA):
    *  - SYNCHRONOUS rounds with a FIXED iteration count (no "until
    *    stable", which depends on visit order and may oscillate);
    *  - integer label counts only — no doubles anywhere;
    *  - tie-break is total: adopt the label with the highest neighbor
    *    count, smallest label on ties (count DESC, label ASC);
    *  - a self-loop per node puts the node's own label in its ballot,
    *    so an isolated or evenly-split node keeps a stable label
    *    instead of flapping.
    *
    * Scale design: each round is one equi-join (edges ⋈ labels,
    * shuffle by node) + tally aggregate + per-node top-1 argmax
    * aggregate — the same shuffle-by-node shape as
    * [[connectedComponents]]'s min-label round, with a bounded round
    * count (`iters`, default 4 — community detection wants locality,
    * not diameter-length reach). */
  def labelPropagation(pairs: DataFrame, aCol: String = "doc_a",
                       bCol: String = "doc_b", iters: Int = 4): DataFrame =
    labelPropagationWeighted(
      pairs.select(col(aCol), col(bCol), lit(1L).as("__w")),
      "__w", aCol, bCol, iters)

  /** Weighted synchronous LPA: each neighbor's ballot counts `wCol`
    * votes instead of one, so community boundaries follow near-dup
    * STRENGTH (e.g. weight = maxDist + 1 − hamming) rather than mere
    * adjacency — a strong triangle outvotes two weak bridges even when
    * the degree count alone would not.
    *
    * Contracts (beyond [[labelPropagation]]'s fixed synchronous
    * rounds and (tally DESC, label ASC) tie-break):
    *  - weights must be integral AND ≥ 1 — the tally stays an
    *    associative integer sum (partition-order exact), and a zero
    *    or negative vote would silently unlink or invert an edge, so
    *    it raises at execution instead;
    *  - a pair listed multiple times (either orientation) collapses
    *    to its MAXIMUM weight — one edge, strongest evidence, never
    *    an accidental double vote; self-pairs in the input carry no
    *    edge, but their NODES stay in the result as singleton
    *    communities — the same node set [[connectedComponents]]
    *    reports for the same pair list (a divergent node set between
    *    the two graph ops would make their outputs un-joinable).
    *    Because a self-pair contributes no edge, its weight column is
    *    never inspected — the >= 1 guard protects the ballot tally,
    *    and self-pairs cast no ballots;
    *  - the self-ballot weighs the node's max incident weight: for a
    *    2-node component with edge weight w, round 1 is a (w vs w)
    *    tie broken to the smaller label — the same anti-oscillation
    *    anchor the unweighted form gets from its weight-1 self-loop
    *    (a FIXED self-weight of 1 would be outvoted by any heavy
    *    edge and the pair would swap labels forever, landing back on
    *    singletons after any even round count). With every weight 1
    *    this reduces exactly to [[labelPropagation]], which delegates
    *    here. */
  def labelPropagationWeighted(pairs: DataFrame, wCol: String,
                               aCol: String = "doc_a", bCol: String = "doc_b",
                               iters: Int = 4): DataFrame = {
    requireIntegralIds(pairs, Seq(aCol, bCol), "labelPropagationWeighted")
    locally {
      import org.apache.spark.sql.types.{ByteType, IntegerType, ShortType}
      val dt = pairs.schema(wCol).dataType
      require(dt == LongType || dt == IntegerType ||
        dt == ShortType || dt == ByteType,
        s"labelPropagationWeighted needs an integral weight column; " +
          s"'$wCol' is ${dt.simpleString} — integer votes keep the " +
          "tally partition-order exact")
    }
    // a zero, negative, or null vote silently unlinks or inverts the
    // edge — fail loudly at execution (codegen'd, no extra pass).
    // CaseWhen evaluates its else-branch lazily, so the error only
    // fires on rows that genuinely carry a bad weight. Deliberately NO
    // `isNotNull(w)` filter on this column: Catalyst would push that
    // predicate into upstream join conditions as isnotnull(CASE...),
    // where conjunct evaluation order is unspecified and the
    // raise_error could fire on candidate rows another conjunct was
    // about to reject (observed with the simhash blocked join).
    val wChecked = when(col(wCol) >= 1, col(wCol).cast(LongType))
      .otherwise(raise_error(concat(
        lit("labelPropagationWeighted: weights must be >= 1, got "),
        coalesce(col(wCol).cast("string"), lit("null")))))
    val sym = pairs
      .filter(col(aCol) =!= col(bCol))
      .select(col(aCol).cast(LongType).as("a"), col(bCol).cast(LongType).as("b"),
        wChecked.as("w"))
      .unionByName(pairs
        .filter(col(aCol) =!= col(bCol))
        .select(col(bCol).cast(LongType).as("a"), col(aCol).cast(LongType).as("b"),
          wChecked.as("w")))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .groupBy(col("a"), col("b")).agg(max(col("w")).as("w"))
    // self-loop weight = max incident weight (see contract above);
    // the node set comes from ALL input endpoints — a node appearing
    // only in self-pairs has no sym edge but must still emerge as a
    // singleton community (CC parity), with a nominal self-weight.
    // CC parity requires BOTH-endpoint null filtering: symEdges drops
    // a pair with one null endpoint entirely, so a per-column filter
    // here would keep its non-null node and diverge the node sets
    val bothNonNull = pairs
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
    val allNodes = bothNonNull.select(col(aCol).cast(LongType).as("a"))
      .unionByName(bothNonNull.select(col(bCol).cast(LongType).as("a")))
      .distinct()
    val selfLoops = allNodes
      .join(sym.groupBy(col("a")).agg(max(col("w")).as("w")), Seq("a"), "left")
      .select(col("a"), col("a").as("b"), coalesce(col("w"), lit(1L)).as("w"))
    // ONE materialization: edges feed every round's join, and without
    // the checkpoint Spark would re-derive the whole pair-generation
    // subtree once per round (no plan-level CSE across join inputs)
    val edges = sym.unionByName(selfLoops).coreCheckpoint()
    // seed labels from the checkpointed edges' self-loops (every node
    // has one) rather than the nodes subtree — avoids re-running pair
    // generation for the seed
    var labels = edges.filter(col("a") === col("b"))
      .select(col("a").as("node"), col("a").as("label"))
    // NO per-round checkpoint, unlike connectedComponents: there are
    // no mid-loop actions here (fixed iterations, one final action),
    // so per-round materialization would be 4 blocking passes of pure
    // overhead — the 4-deep nested plan executes in one pass and every
    // round's edge input is the same checkpointed scan
    for (_ <- 1 to iters) {
      // ballot tally + argmax fused into ONE aggregate, ONE exchange
      // per round: weighted_mode keeps a per-node (label → Σw) map as
      // its map-side partial, so the exchange carries the same
      // information the old groupBy(node,label).sum tally carried and
      // the second groupBy(node).max_by exchange disappears — over
      // `iters` rounds that removes `iters` shuffle barriers from the
      // critical path. Semantics (weight DESC, label ASC tie) are
      // spec-pinned equal to the two-step form, ties included.
      labels = edges
        .join(labels.withColumnRenamed("node", "src"), col("a") === col("src"))
        .groupBy(col("b").as("node"))
        .agg(graft.functions.WeightedMode.weightedMode(col("label"), col("w"))
          .as("label"))
    }
    labels.select(col("node").as("doc_id"), col("label").as("community_id"))
  }

  /** Deterministic PageRank over a pair graph — centrality in the
    * near-dup graph surfaces boilerplate hubs: documents near-dup to
    * MANY others score high, and at curation time "drop the top-rank
    * nodes first" removes the most-duplicated content with the fewest
    * deletions.
    *
    * PageRank is normally impossible to oracle-check across engines:
    * cross-partition DOUBLE sums are order-nondeterministic, so two
    * runs of the same engine can disagree in the last ulp, let alone
    * Spark vs DuckDB. This implementation is exact instead: ranks are
    * BIGINT micro-units (1e6 = rank 1.0), contributions use `div`
    * (truncating integer division — floor for these all-positive
    * values), and the damping step is `150000 + (85·Σcontrib) div 100`
    * in integers. Integer sums are associative, so partition order
    * cannot change the result, and a fixed iteration count replaces
    * convergence detection. Overflow headroom: Σcontrib ≤ n·1e6, so
    * 85·Σcontrib stays under 2⁶³ until n ≈ 2⁶³/(85·10⁶) ≈ 10¹¹
    * nodes — two orders beyond a 100 TB corpus's document count.
    *
    * Scale shape: one edges⋈ranks shuffle-by-node and one integer-sum
    * aggregate (map-side partials) per round, lineage truncated per
    * round — the same bounded-round discipline as [[labelPropagation]].
    */
  def pageRank(pairs: DataFrame, aCol: String = "doc_a",
               bCol: String = "doc_b", iters: Int = 4): DataFrame = {
    val sym = symEdges(pairs, aCol, bCol, "pageRank")
    val deg = sym.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
    // out-degree rides along with each edge so the contribution step
    // is a projection, not another join per round; ONE materialization
    // feeds all rounds (see labelPropagationWeighted for why the loop
    // itself is checkpoint-free: fixed rounds, single final action)
    val symDeg = sym.join(deg, col("a") === col("node"))
      .select(col("a"), col("b"), col("deg")).coreCheckpoint()
    var ranks = symDeg.select(col("a").as("node")).distinct()
      .select(col("node"), lit(1000000L).as("rank"))
    for (_ <- 1 to iters) {
      ranks = symDeg
        .join(ranks.withColumnRenamed("node", "src"), col("a") === col("src"))
        .select(col("b"), expr("rank div deg").as("contrib"))
        .groupBy(col("b").as("node"))
        .agg(sum(col("contrib")).as("contrib"))
        .select(col("node"),
          (lit(150000L) + expr("(85 * contrib) div 100")).as("rank"))
    }
    ranks.select(col("node").as("doc_id"), col("rank"))
  }

  /** Per-node triangle count and local clustering coefficient over a
    * pair graph — the density diagnostic for near-dup clusters: a
    * component whose nodes have high clustering is a genuine dup
    * cluster; one held together by low-clustering bridge nodes is
    * [[labelPropagation]] fodder (and the bridge nodes are exactly the
    * rows with `clustering` near 0 here).
    *
    * Scale design — DEGREE-ORDERED orientation: each undirected edge
    * is directed from its (degree, id)-smaller endpoint to the larger,
    * and wedges are enumerated only at the out-endpoint. Per-node
    * out-degree is then bounded by O(√m) on any graph, so the wedge
    * join's fan-out is O(m^1.5) total with no high-degree hot key —
    * enumerating wedges on raw ids instead would let one low-id
    * high-degree hub generate deg² candidates in a single task. The
    * triangle SET is orientation-invariant, so the oracle states the
    * same result from the simple id-ordered 3-way self-join. */
  def triangleStats(pairs: DataFrame, aCol: String = "doc_a",
                    bCol: String = "doc_b"): DataFrame = {
    val sym = symEdges(pairs, aCol, bCol, "triangleStats").coreCheckpoint()
    val deg = sym.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
    // oriented edge u→v iff (deg u, u) < (deg v, v); carry the target's
    // rank pair so the wedge-close side can re-derive the orientation
    val withDeg = sym
      .join(deg.select(col("node").as("a"), col("deg").as("adeg")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("bdeg")), "b")
    val oriented = withDeg
      .filter(struct(col("adeg"), col("a")) < struct(col("bdeg"), col("b")))
      .select(col("a").as("src"), col("b").as("dst"),
        col("bdeg").as("ddeg"))
      .coreCheckpoint()
    // wedge at src: two out-edges; close it with the oriented edge
    // between the targets (lo→hi in the same (deg, id) total order)
    val e1 = oriented.select(col("src"), col("dst").as("d1"), col("ddeg").as("g1"))
    val e2 = oriented.select(col("src"), col("dst").as("d2"), col("ddeg").as("g2"))
    val ordered = e1.join(e2, Seq("src"))
      .filter(struct(col("g1"), col("d1")) < struct(col("g2"), col("d2")))
      .select(col("src").as("x"), col("d1").as("lo"), col("d2").as("hi"))
    val tris = ordered.join(
      oriented.select(col("src").as("lo"), col("dst").as("hi")),
      Seq("lo", "hi"))
    val perNode = tris.select(explode(array(col("x"), col("lo"), col("hi"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node").as("doc_id"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("deg") >= 2,
          portableRound(lit(2.0) * coalesce(col("n_tri"), lit(0L)) /
            (col("deg") * (col("deg") - 1)), 4))
          .otherwise(lit(0.0)).as("clustering"))
  }

  /** Driver-side union-find over a (src, dst) edge DataFrame small
    * enough to collect (gated by the caller's threshold). Component id
    * is the smallest node id — identical semantics to the distributed
    * min-label loop. Edges are collected as primitive (Long, Long)
    * pairs (specialized Tuple2 — 16 bytes each, no GenericRow
    * overhead) and the union-find map is an open-addressed LongMap,
    * so the footprint at the 1M-edge threshold stays in the tens of
    * megabytes. */
  private def driverUnionFind(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val parent = scala.collection.mutable.LongMap.empty[Long]
    // iterative find + path compression: a chain graph at the threshold
    // would overflow the stack with the recursive form
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElseUpdate(r, r) != r) r = parent(r)
      var c = x
      while (c != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    edges.as[(Long, Long)].collect().foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      // smaller root wins, so every final root is its component's min id
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val rows = parent.keys.toSeq.map(x => (x, find(x)))
    spark.createDataset(rows).toDF("doc_id", "cluster_id")
  }

  /** Shingles shared by more than this many documents are dropped
    * before the q25 pair join: a shingle in `df` docs contributes
    * df·(df−1)/2 candidate pairs, so one boilerplate header shared by
    * 100k docs would alone emit 5×10⁹ pairs. Capping df bounds the
    * join output to O(corpus · cap) — the standard candidate-pruning
    * move (CCNet/Gopher-style dedup drops hot shingles the same way). */
  val MaxShingleDf = 64L

  /** n-gram Jaccard similarity over candidate pairs that share ≥1
    * NON-HOT shingle (equality join — no cross product; shingles with
    * document frequency > [[MaxShingleDf]] are excluded from BOTH the
    * intersection and the per-doc sizes, i.e. jaccard is computed over
    * the rare-shingle feature space). Recall tradeoff: a pair similar
    * ONLY through ultra-common shingles is missed — by construction
    * that pair is boilerplate, which is what near-dup detection exists
    * to ignore. The hot set is a tiny aggregate (same shape as the q76
    * hot-survivor set) anti-joined back, so Spark broadcasts it. */
  def ngramJaccard(docs: DataFrame, maxDf: Long = MaxShingleDf): DataFrame =
    // one tokenize pass: df aggregate + anti-join + pair join all read
    // this materialized table (ContextCleaner reclaims the blocks)
    ngramJaccardFrom(shingleTable(docs).coreCheckpoint(), maxDf)

  /** [[ngramJaccard]] from the checkpointed shingle core. */
  private[scale] def ngramJaccardFrom(sh0: DataFrame,
                                      maxDf: Long = MaxShingleDf): DataFrame = {
    val hot = sh0.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select(col("sh"))
    val sh = sh0.join(broadcast(hot), Seq("sh"), "left_anti")
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = sh.as("a"); val b = sh.as("b")
    val inter = a.join(b, col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("inter"),
        portableRound(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")), 4).as("jaccard"))
  }

  /** q143: cheap-vs-expensive dedup signal calibration — per SimHash
    * Hamming-distance bucket over the q28 candidate pairs, the exact
    * shingle-Jaccard distribution (mean/min/max): the table an
    * operator reads to set `maxDist` — "at distance d, how similar
    * are the pairs REALLY" — and the cross-signal sibling of the
    * q103 within-signal sketch audit. Jaccard uses q25's df-capped
    * shingle universe; a candidate pair sharing no (non-hot) shingle
    * scores 0 — the disagreement the calibration exists to expose.
    *
    * Scale design: the minhashAudit discipline — the exact side
    * routes shingles THROUGH the candidate list (two equi-joins on
    * doc ids + one pair-keyed count), never a shingle self-join, so
    * the exact work is O(candidate pairs × shingles/doc), not
    * O(corpus²). The rollup is ≤ maxDist+1 rows. Determinism:
    * per-pair jaccard is q25's rounded value; the bucket mean is the
    * exactSum decimal accumulator over those 4-decimal values with
    * one floor-r6'd division (the q131 bucket-mean discipline);
    * min/max of rounded doubles are order-free. */
  def signalCalibration(docs: DataFrame, maxDist: Int = 5,
                        maxDf: Long = MaxShingleDf): DataFrame =
    signalCalibrationFrom(simhashPairs(docs, maxDist),
      shingleTable(docs).coreCheckpoint(), maxDf)

  /** [[signalCalibration]] from precomputed pairs + the shingle core —
    * shared-core form for the gate registry. */
  private[scale] def signalCalibrationFrom(pairs: DataFrame, sh0: DataFrame,
                                           maxDf: Long = MaxShingleDf): DataFrame = {
    val hot = sh0.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select(col("sh"))
    val sh = sh0.join(broadcast(hot), Seq("sh"), "left_anti")
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val cand = pairs.select(col("doc_a"), col("doc_b"), col("dist"))
    val inter = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    cand
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")),
        Seq("doc_a"), "left")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")),
        Seq("doc_b"), "left")
      .select(col("dist"),
        coalesce(portableRound(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")), 4), lit(0.0)).as("j"))
      .groupBy(col("dist"))
      .agg(count(lit(1)).as("n_pairs"),
        (floor(exactSum(col("j")) / count(lit(1)) * 1000000d + 0.5d)
          / 1000000d).as("mean_jaccard"),
        min(col("j")).as("min_jaccard"),
        max(col("j")).as("max_jaccard"))
  }

  /** The end-to-end dedup verb a corpus pipeline actually runs:
    * near-dup pairs → connected components → ONE representative kept
    * per cluster → everything else dropped from the corpus. Composes
    * [[simhashPairs]], [[connectedComponents]] and
    * [[Curation.perGroupCap]] (k = 1, hash-ordered so the pick is
    * deterministic and retry-stable), then anti-joins the losers out —
    * the same left-anti shape as the reference's verified-filter
    * (`scripts/create_verified_csv.py:29-64`) applied to dedup.
    *
    * Scale design: every stage is an equality shuffle on short keys
    * (simhash chunks → node ids → cluster ids); the final anti-join
    * broadcasts when the loser set is small (the common case — dups
    * are a fraction of the corpus) and degrades to a shuffled anti
    * join otherwise. Docs that appear in no near-dup pair never enter
    * the component graph and survive untouched. */
  def dedupCorpus(docs: DataFrame, maxDist: Int = 3): DataFrame =
    dedupCorpusFrom(docs, connectedComponents(simhashPairs(docs, maxDist)))

  /** [[dedupCorpus]] from precomputed component labels — the form the
    * gate registry feeds from the shared component core so the
    * pair→component chain is built once per batch, not once per
    * consumer query. */
  def dedupCorpusFrom(docs: DataFrame, labels: DataFrame): DataFrame = {
    val reps = Curation.perGroupCap(labels, "cluster_id", "doc_id", k = 1)
      .select(col("doc_id"))
    val losers = labels.join(reps, Seq("doc_id"), "left_anti")
      .select(col("doc_id"))
    docs.join(losers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
  }

  /** Dedup impact report — what [[dedupCorpus]] actually removed, per
    * ingest source: docs and (estimated) tokens dropped, and the
    * removal rate. The number a pipeline owner reads after every
    * dedup run — a source suddenly losing 40% of its tokens is either
    * a mirror-heavy crawl (expected) or a collision bug (not), and
    * either way it is this report that raises the flag. Token
    * estimate is q35's chars/4.
    *
    * Scale design: one extra left join of the corpus against the kept
    * ids (broadcast when dups are few — the common case) and one
    * group-by-source with map-side partials on top of [[dedupCorpus]]'s
    * existing pair→component→representative chain. */
  def dedupImpact(docs: DataFrame, maxDist: Int = GateMaxDist): DataFrame =
    dedupImpactFrom(docs, dedupCorpus(docs, maxDist))

  /** [[dedupImpact]] from a precomputed kept-set ([[dedupCorpus]]
    * output) — shared-core form for the gate registry. */
  def dedupImpactFrom(docs: DataFrame, kept0: DataFrame): DataFrame = {
    val kept = kept0.select(col("doc_id")).withColumn("_k", lit(1))
    docs.select(col("doc_id"), col("source"),
        ceil(length(col("text")).cast("double") / 4d).cast("long").as("toks"))
      .join(kept, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("_k").isNull, 1)).as("n_removed"),
        sum(col("toks")).as("toks_total"),
        coalesce(sum(when(col("_k").isNull, col("toks"))), lit(0L))
          .as("toks_removed"),
        portableRound(count(when(col("_k").isNull, 1)).cast("double") /
          count(lit(1)), 4).as("removal_rate"))
  }

  /** Full-range embedding near-dup gate — the SCALE path that
    * [[embeddingNearDup]]'s bounded brute force stands in for: LSH
    * bucket equality self-join generates candidates over the WHOLE
    * table (no id cap, no cross product), then the exact cosine filter
    * keeps pairs at or above `minCos`. Recall is the LSH S-curve
    * (P(same bucket) = (1 − θ/π)^planes), traded for O(corpus) shuffle
    * volume of 8-bit keys — the standard contract of every production
    * near-dup gate. */
  def embeddingNearDupLsh(emb0: DataFrame, minCos: Double): DataFrame = {
    // sign-plane buckets are FEW (2^planes) and corpus-sized — the
    // sharpest instance of the hot-bucket self-join shape, so route
    // through the bounded grid (identical output by its contract);
    // zero-norm exclusion rides the keyed projection itself (one cast
    // per row — Similarity.bucketedVectorsNz)
    Skew.boundedSelfPairs(Similarity.bucketedVectorsNz(emb0), Seq("bucket"),
        "vec_id", payload = Seq("v", "nrm"))
      .select(col("doc_a").as("vec_a"), col("doc_b").as("vec_b"),
        (dotProduct(col("v_a"), col("v_b")) /
          (col("nrm_a") * col("nrm_b"))).as("cos"))
      .filter(col("cos") >= minCos)
      .select(col("vec_a"), col("vec_b"), portableRound(col("cos"), 4).as("cos"))
  }

  /** CELL-COMPOSED near-dup gate for CONCENTRATED embedding corpora —
    * the production answer where [[embeddingNearDupLsh]]'s fixed
    * sign-plane bucketing degenerates: when every vector sits in one
    * narrow cone (byte-histogram text embeddings: measured 494/500 of
    * the q173 slice in ONE bucket), the fixed-plane chain owes
    * corpus²/2 cosines — the bounded grid caps every TASK but the
    * total volume is the blocking's. This operator partitions the
    * space DATA-DEPENDENTLY first and buckets within partitions, the
    * SemDeDup/q95 composition the q173 scaladoc previously described
    * in prose:
    *  - `cell_id`: argmax-cosine over the first-[[Similarity.IvfCells]]
    *    seed centroids (q95's machinery — scan-side plan-constant
    *    kernel, zero joins);
    *  - `dbucket`: [[Similarity.diffPlaneBucket]] — sign planes
    *    pointed along seed DIFFERENCES, which keep splitting near the
    *    median inside an arbitrarily narrow cone;
    *  - `bucket`: the fixed sign-plane word, KEPT in the key — on
    *    spread corpora it still does the splitting, and it makes this
    *    chain's candidates a strict SUBSET of [[embeddingNearDupLsh]]'s
    *    (same fixed bucket ∧ more keys), the property the q173
    *    reconciliation spec pins.
    * The 8 diff planes are consumed as TWO BANDS of 4 (the MinHash-LSH
    * OR-construction, q26's discipline): a candidate pair must share
    * (cell, fixed bucket, EITHER band's 4-bit sign word). Banding is
    * what makes the recall usable on the near-identical stratum —
    * requiring all 8 data-dependent signs to agree kept only 26% of
    * the q173 referee's pairs (each plane splits near the MEDIAN of
    * the cone, so even a cos-0.999 pair straddles one with ~11%
    * probability); either-of-two-bands keeps 54-59% at ~6× the
    * candidate volume, still 19.8× under quadratic at sf0.1
    * (measured: 12.50M → 0.63M candidates, the q177 board prices it
    * in-gate). Exactly-once across bands: band 1 emits only pairs
    * whose band-0 words DIFFER.
    *
    * The exact cosine filter is unchanged, so reported pairs are true
    * near-dups by construction and blocking only costs recall. The
    * residual loss decomposes (measured, sf0.001): cross-CELL pairs
    * 34% (the SemDeDup contract's documented trade — the q95 referee
    * story) and cross-band pairs ~11% of the rest; the spec pins the
    * measured recall against the exhaustive q173 board on its audit
    * slice. At 100 TB the dials are nCells, nPlanes, the band count
    * (occupancy per group ~n/(cells·2^planes_per_band)) and the probe
    * count — [[embeddingNearDupCelled2From]] implements the top-2
    * probe (measured: recall 0.585 → 0.852 at sf0.001, 0.543 → 0.834
    * at sf0.1, at ~3.5× the candidate volume, still 5.6× under
    * quadratic); all are scan-side plan constants, so raising them
    * never changes the plan shape.
    *
    * `seeds0`: callers whose embedding table is an expensive kernel
    * (the media chain: features are a mapPartitions pass over payload
    * bytes — a filter cannot push through it) pass seeds computed from
    * a SOURCE-bounded scan so the seed read never pays a full feature
    * pass. */
  def embeddingNearDupCelled(emb: DataFrame, minCos: Double,
      seeds0: Option[Seq[(Long, Seq[Double])]] = None): DataFrame = {
    val seeds = seeds0.getOrElse(
      Similarity.seedCentroidList(Similarity.nonZeroNorm(emb),
        Similarity.IvfCells))
    // checkpoint ONCE here: both band joins (and their counts passes)
    // read the keyed table
    embeddingNearDupCelledFrom(
      celledKeyedVectors(emb, seeds).coreCheckpoint(),
      minCos, inputMaterialized = true)
  }

  /** The celled chain's keyed projection — ONE scan yields id, the
    * blocking keys and the vector/norm payload (the gate registry
    * memoizes exactly this table so q176/q177/q178 share it).
    * `cell2` (the SECOND-nearest seed, rank-2 of the same argmax
    * ordering) rides along for the multi-probe chain — one more
    * plan-constant kernel eval per row, negligible next to the
    * feature encode this scan already pays. */
  private[graft] def celledKeyedVectors(emb: DataFrame,
      seeds: Seq[(Long, Seq[Double])]): DataFrame = {
    // zero-norm vectors are EXCLUDED from the celled index: cosine is
    // undefined for them (the pair gate would divide by zero — fuzz
    // seed 101, an empty document's all-zero media embedding), and the
    // oracle's keyed CTE carries the same `nrm > 0` bound. Callers
    // must derive `seeds` from the same filtered set.
    // bucketedVectorsNz: the nrm > 0 bound rides behind the generator
    // barrier, so the filter cannot push below the projection and
    // re-inline a second float→double cast per row (r20 A/B)
    val base = Similarity.bucketedVectorsNz(emb)
    // Degenerate-corpus contract, mirroring the oracle CTE exactly:
    // with no formable diff plane the oracle's `db` CTE is empty and
    // `keyed` (an inner join against it) is EMPTY — every celled board
    // degenerates to no rows, identically in both engines. With one
    // usable seed, rank-2 does not exist and `cell2` is NULL (the
    // oracle's MAX(CASE WHEN rn = 2 ...) over one row).
    if (seeds.isEmpty ||
        Similarity.availableDiffPlanes(seeds).isEmpty)
      return base.filter(lit(false)).select(col("vec_id"),
        lit(null).cast("long").as("cell_id"),
        lit(null).cast("long").as("cell2"),
        lit(null).cast("long").as("dbucket"),
        col("bucket"), col("v"), col("nrm"))
    val cell2 =
      if (seeds.size < 2) lit(null).cast("long")
      else graft.functions.VectorExpressions.argMax2Cosine(col("v"), seeds)
    base.select(col("vec_id"),
      graft.functions.VectorExpressions.argMaxCosine(col("v"), seeds)
        .as("cell_id"),
      cell2.as("cell2"),
      Similarity.diffPlaneBucket(col("v"), seeds).as("dbucket"),
      col("bucket"), col("v"), col("nrm"))
  }

  /** The celled chain's band GEOMETRY — first-class plan constants,
    * ONE definition feeding the Spark kernels, the oracle SQL and the
    * q177/q182 pricing boards (the GateMaxDist discipline). The
    * diff-plane word's [[Similarity.NumPlanes]] bits are consumed as
    * `CelledBands` bands of `CelledBandBits` bits each (band j = bits
    * [j·bits, (j+1)·bits)); a candidate pair must agree on at least
    * one whole band (the MinHash-LSH OR-construction). The dial's
    * trade at the shipped point and its measured frontier live in the
    * [[embeddingNearDupCelled2From]] scaladoc; the frontier itself is
    * priced IN-GATE by [[celledBlockingBoard]]'s [[CelledGeometries]]
    * rows, so re-dialing is a constants change whose cost is already
    * a green gate row. */
  val CelledBands: Int = 2
  val CelledBandBits: Int = 4

  /** The band-geometry pricing sweep [[celledBlockingBoard]] carries:
    * every (nBands × bandBits) point whose blocking volume the dial's
    * owner reads before moving it. Every point consumes the FULL
    * [[Similarity.NumPlanes]]-bit plane budget (nBands · bandBits =
    * NumPlanes) so the priced volumes are like-for-like — a
    * fewer-planes point would look cheaper only because it ignores
    * bits. Shipped first; (1×8-bit) is the AND-construction extreme
    * (one whole-word band — lowest volume, lowest recall); the widest
    * point (8×1-bit) shows where the OR-construction saturates
    * near-quadratic on a concentrated corpus. */
  val CelledGeometries: Seq[(Int, Int)] =
    Seq((CelledBands, CelledBandBits), (1, 8), (4, 2), (8, 1))
  require(CelledGeometries.forall { case (nb, bb) =>
    nb * bb == graft.scale.Similarity.NumPlanes },
    "geometry sweep points must price the full plane budget")

  /** The celled chain's band words, derived from the diff-plane
    * bucket — scan-side bit arithmetic shared by the pair chain and
    * the pricing boards. Band j of the (nBands, bandBits) geometry is
    * `(dbucket >>> j·bandBits) & (2^bandBits − 1)`, column `db{j}`. */
  private[graft] def celledBands(keyed: DataFrame,
      nBands: Int = CelledBands, bandBits: Int = CelledBandBits): DataFrame = {
    require(nBands >= 1 && bandBits >= 1 &&
      nBands * bandBits <= Similarity.NumPlanes,
      s"band geometry ${nBands}x$bandBits exceeds ${Similarity.NumPlanes} planes")
    val mask = (1L << bandBits) - 1
    (0 until nBands).foldLeft(keyed) { (df, j) =>
      df.withColumn(s"db$j",
        shiftrightunsigned(col("dbucket"), j * bandBits)
          .bitwiseAND(lit(mask)))
    }
  }

  /** [[embeddingNearDupCelled]] from the keyed projection.
    * `inputMaterialized`: the caller's table is already a checkpoint
    * (the memoized gate core; the band words are trivial projections
    * of it) — skips the band joins' own barriers. `(nBands, bandBits)`
    * is the recall/volume dial ([[CelledBands]]/[[CelledBandBits]]
    * shipped): more, narrower bands raise recall toward the
    * OR-construction's ceiling at the candidate volumes the
    * [[celledBlockingBoard]] geometry rows price. */
  private[graft] def embeddingNearDupCelledFrom(keyed: DataFrame,
      minCos: Double, inputMaterialized: Boolean = false,
      nBands: Int = CelledBands, bandBits: Int = CelledBandBits): DataFrame = {
    val banded = celledBands(keyed, nBands, bandBits)
    def arm(pairs: DataFrame): DataFrame = pairs
      .select(col("doc_a").as("vec_a"), col("doc_b").as("vec_b"),
        (dotProduct(col("v_a"), col("v_b")) /
          (col("nrm_a") * col("nrm_b"))).as("cos"))
      .filter(col("cos") >= minCos)
      .select(col("vec_a"), col("vec_b"), portableRound(col("cos"), 4).as("cos"))
    // exactly-once across bands: band j emits only pairs whose EARLIER
    // band words all differ — a pair agreeing on band i < j was
    // emitted there (the 2-band special case: band 1 keeps db0-differs)
    (0 until nBands).map { j =>
      val earlier = (0 until j).map(i => s"db$i")
      val pairs = Skew.boundedSelfPairs(banded,
        Seq("cell_id", "bucket", s"db$j"), "vec_id",
        payload = Seq("v", "nrm") ++ earlier,
        inputMaterialized = inputMaterialized)
      arm(earlier.foldLeft(pairs) { (df, c) =>
        df.filter(col(s"${c}_a") =!= col(s"${c}_b")) })
    }.reduce(_.unionByName(_))
  }

  /** MULTI-PROBE variant of [[embeddingNearDupCelledFrom]] — the
    * recall dial the single-probe scaladoc names: each vector probes
    * its TOP-2 cells (`cell_id`, `cell2` — both scan-side plan-constant
    * kernels off the shared keyed projection), and a pair is a
    * candidate when the probe sets INTERSECT (∧ fixed bucket ∧ either
    * diff-plane band, unchanged). Single-probe candidates are a strict
    * subset (`cell_id` is always probed), so recall can only rise —
    * the spec pins the superset; measured it recovers most of the
    * cross-cell loss (the dominant term of the single-probe
    * decomposition): referee recall 0.585 → 0.852 at sf0.001,
    * 0.543 → 0.834 at sf0.1, at ~3.5× the candidate volume (2.24M vs
    * 0.63M at sf0.1), still 5.6× under quadratic — the q177 probe2
    * rows price it in-gate. The residual loss INVERTS the single-probe
    * decomposition (measured sf0.001: of 35 missed referee pairs, 29
    * are cross-BAND and only 6 cross-cell beyond top-2) — so the next
    * dial on this chain is band width/count (more, narrower bands of
    * the diff planes), not a third probe. That dial's frontier is
    * priced (sf0.1, oracle-side sweep over the same keyed table):
    * two 4-bit bands 0.834 recall @ 2.24M candidates, two 3-bit
    * 0.890 @ 3.08M, four 2-bit 0.962 @ 8.37M, eight 1-bit 0.963 @
    * 22.95M vs 12.50M quadratic — on a corpus THIS concentrated the
    * band dial saturates near-quadratic past ~0.9 recall, which is
    * the honest ceiling of any sign-plane OR-construction here; a
    * 100 TB operator picks the recall/volume point, the geometry is
    * a plan constant either way.
    *
    * Exactly-once without a distinct: the probe explode lands a pair
    * in every shared cell × matching band, so each arm keeps only
    *  - pairs whose join cell is the MINIMUM shared probe cell
    *    (computable row-side from the four carried probe columns —
    *    `least` over the matching combinations), and
    *  - band 1 only when the band-0 words differ (the single-probe
    *    rule).
    * Every qualifying pair therefore survives exactly one (cell, band)
    * region. The explode doubles the rows entering
    * [[Skew.boundedSelfPairs]]; hot-key routing and the emission grid
    * are per (cell, bucket, band-word) key, so the task bound is
    * unchanged. */
  private[graft] def embeddingNearDupCelled2From(keyed: DataFrame,
      minCos: Double, inputMaterialized: Boolean = false,
      nBands: Int = CelledBands, bandBits: Int = CelledBandBits): DataFrame = {
    val probed = celledBands(keyed, nBands, bandBits)
      .withColumn("pcell", explode(array(col("cell_id"), col("cell2"))))
      // a NULL probe cell (cell2 when rank-2 does not exist) must not
      // key a group: the oracle's px self-join never matches NULLs,
      // but boundedSelfPairs' groupBy would unify them
      .filter(col("pcell").isNotNull)
      // a payload copy of the join cell: boundedSelfPairs would see a
      // duplicate name if the key column itself rode as payload
      .withColumn("pc", col("pcell"))
    // min shared probe cell of the pair: `least` skips the nulls the
    // non-matching `when`s leave, so this is min over the shared set
    val sharedMin = least(
      when(col("cell_id_a") === col("cell_id_b"), col("cell_id_a")),
      when(col("cell_id_a") === col("cell2_b"), col("cell_id_a")),
      when(col("cell2_a") === col("cell_id_b"), col("cell2_a")),
      when(col("cell2_a") === col("cell2_b"), col("cell2_a")))
    def arm(pairs: DataFrame): DataFrame = pairs
      .filter(col("pc_a") === sharedMin)
      .select(col("doc_a").as("vec_a"), col("doc_b").as("vec_b"),
        (dotProduct(col("v_a"), col("v_b")) /
          (col("nrm_a") * col("nrm_b"))).as("cos"))
      .filter(col("cos") >= minCos)
      .select(col("vec_a"), col("vec_b"), portableRound(col("cos"), 4).as("cos"))
    // `pc` rides as payload: boundedSelfPairs emits only id + payload
    // columns, and both sides' values equal the join cell
    val payload = Seq("v", "nrm", "cell_id", "cell2", "pc")
    // exactly-once across bands: the earlier-bands-differ rule, same
    // as the single-probe chain (min-shared-cell handles the probe axis)
    (0 until nBands).map { j =>
      val earlier = (0 until j).map(i => s"db$i")
      val pairs = Skew.boundedSelfPairs(probed,
        Seq("pcell", "bucket", s"db$j"), "vec_id",
        payload = payload ++ earlier,
        inputMaterialized = inputMaterialized)
      arm(earlier.foldLeft(pairs) { (df, c) =>
        df.filter(col(s"${c}_a") =!= col(s"${c}_b")) })
    }.reduce(_.unionByName(_))
  }

  /** Blocking-volume pricing board for a celled keyed projection —
    * the q172 discipline (certify the knob inside the gate), shared by
    * the media (q177) and primary-embeddings (q182) corpora. Per
    * blocking scheme: group count, max group size, the candidate pair
    * volume Σ d(d−1)/2 a group-equality self-join owes, and the
    * quadratic worst case. Rows:
    *  - `lsh_bucket` — the fixed-plane key alone (what
    *    [[embeddingNearDupLsh]] pays);
    *  - `celled_band{j}` — the shipped geometry's per-band keys
    *    (cell, bucket, band word); the chain's total candidate volume
    *    is ≤ their sum (later bands subtract the all-agree overlap);
    *  - `probe2_band{j}` — the multi-probe explode's per-band volume
    *    (a pair counts once per shared (cell, band) region — exactly
    *    what the join owes before the exactly-once filter);
    *  - `bands_{n}x{b}bit` — the [[CelledGeometries]] sweep: ALL bands
    *    of each alternative geometry summed, the dial's in-gate price
    *    list (the recall side of each point is the referee specs'
    *    concern; volume is what this board certifies).
    * All exact integers — counts and integer division only.
    *
    * Scale design: every arm derives the corpus size n from its OWN
    * group sums — no extra count scan of the keyed core per arm. The
    * geometry sweep is ONE pass: a plan-constant explode tags each row
    * with (scheme, shift, mask, nBands) and a single two-level
    * aggregate prices every geometry — Σ|geometries| band words per
    * row beats |geometries| separate scans of a corpus-sized table. */
  def celledBlockingBoard(keyed: DataFrame): DataFrame = {
    val banded = celledBands(keyed)
    // q178's probe explode: each vector appears under BOTH its probed
    // cells, so the probe2 rows price the multi-probe join volume
    val probed = banded.withColumn("pcell",
      explode(array(col("cell_id"), col("cell2"))))
    // Un-exploded arms: Σd = n. Probe arms: every vector contributes
    // exactly two probe rows, so Σd = 2n and n = Σd DIV 2.
    def armFrom(src: DataFrame, nFromSum: String)(
        scheme: String, keys: Seq[String]): DataFrame =
      src.groupBy(keys.map(col): _*).agg(count(lit(1)).as("d"))
        .agg(count(lit(1)).as("n_groups"), max(col("d")).as("max_group"),
          sum(expr("d * (d - 1) DIV 2")).as("cand_pairs"),
          // coalesce: on an EMPTY keyed table (degenerate corpus) the
          // sum is NULL but n is genuinely 0 — the oracle derives
          // quad_pairs from COUNT(*), which is 0, never NULL
          coalesce(sum(col("d")), lit(0L)).as("sd"))
        .select(lit(scheme).as("scheme"), col("n_groups"), col("max_group"),
          col("cand_pairs"),
          expr(s"($nFromSum) * (($nFromSum) - 1) DIV 2").as("quad_pairs"))
    val arm = armFrom(banded, "sd") _
    val parm = armFrom(probed, "sd DIV 2") _
    // the geometry sweep: (scheme, shift, mask, nBands) rides as a
    // plan-constant struct array; one explode + one aggregate price
    // every geometry's every band. Σd per scheme = nBands · n.
    val geoms = CelledGeometries.flatMap { case (nb, bb) =>
      (0 until nb).map(j =>
        (s"bands_${nb}x${bb}bit", j * bb, (1L << bb) - 1, nb))
    }
    val geo = keyed
      .select(col("cell_id"), col("bucket"), col("dbucket"),
        explode(typedLit(geoms)).as("g"))
      .select(col("g._1").as("scheme"), col("g._4").as("nb"),
        col("g._2").as("sh"), col("cell_id"), col("bucket"),
        expr("shiftrightunsigned(dbucket, g._2)")
          .bitwiseAND(col("g._3")).as("w"))
      .groupBy(col("scheme"), col("nb"), col("sh"),
        col("cell_id"), col("bucket"), col("w"))
      .agg(count(lit(1)).as("d"))
      .groupBy(col("scheme"), col("nb"))
      .agg(count(lit(1)).as("n_groups"), max(col("d")).as("max_group"),
        sum(expr("d * (d - 1) DIV 2")).as("cand_pairs"),
        sum(col("d")).as("sd"))
      .select(col("scheme"), col("n_groups"), col("max_group"),
        col("cand_pairs"),
        expr("(sd DIV nb) * ((sd DIV nb) - 1) DIV 2").as("quad_pairs"))
    val bandArms = (0 until CelledBands).map(j =>
      arm(s"celled_band$j", Seq("cell_id", "bucket", s"db$j")))
    val probeArms = (0 until CelledBands).map(j =>
      parm(s"probe2_band$j", Seq("pcell", "bucket", s"db$j")))
    (Seq(arm("lsh_bucket", Seq("bucket"))) ++ bandArms ++ probeArms :+ geo)
      .reduce(_.unionByName(_))
  }

  /** The shipped band geometry's word definitions, derived in SQL from
    * the SAME constants as the Spark kernel
    * ([[CelledBands]]/[[CelledBandBits]]) — band j is
    * `(dbucket >> j·bits) & (2^bits − 1) AS db{j}`. */
  private[scale] def celledBandDefsSql: String =
    (0 until CelledBands).map { j =>
      s"(dbucket >> ${j * CelledBandBits}) & " +
        s"${(1L << CelledBandBits) - 1} AS db$j"
    }.mkString(",\n    ")

  /** The celled pair chain's band arms as a UNION ALL — band j joins
    * on its word with every EARLIER band differing (the Spark side's
    * exactly-once rule restated). Reads a `k2` CTE carrying
    * (vec_id, cell_id, bucket, db0…, v, nrm). */
  private[scale] def celledPairArmsSql: String =
    (0 until CelledBands).map { j =>
      val earlier = (0 until j)
        .map(i => s"AND x.db$i <> y.db$i").mkString(" ")
      s"""SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
         |    list_dot_product(x.v, y.v) / (x.nrm * y.nrm) AS cos
         |  FROM k2 x JOIN k2 y
         |    ON x.cell_id = y.cell_id AND x.bucket = y.bucket
         |    AND x.db$j = y.db$j $earlier AND x.vec_id < y.vec_id""".stripMargin
    }.mkString("\n  UNION ALL\n  ")

  /** `(x.db0 = y.db0 OR … )` — any-band agreement, for the probe-2
    * DISTINCT restatement. */
  private[scale] def anyBandEqSql: String =
    (0 until CelledBands).map(j => s"x.db$j = y.db$j")
      .mkString("(", " OR ", ")")

  /** The [[CelledGeometries]] sweep as a VALUES list —
    * (scheme, shift, mask, nBands) per band per geometry, the same
    * tuples the Spark board explodes. */
  private def celledGeomValuesSql: String =
    CelledGeometries.flatMap { case (nb, bb) =>
      (0 until nb).map(j =>
        s"('bands_${nb}x${bb}bit', ${j * bb}, ${(1L << bb) - 1}, $nb)")
    }.mkString(", ")

  /** [[celledBlockingBoard]] restated over a `keyed` CTE (the caller's
    * prefix supplies it): the fixed-bucket row, the shipped geometry's
    * per-band and probe-exploded rows, and the [[CelledGeometries]]
    * sweep — every scheme name, shift and mask interpolated from the
    * same constants as the Spark board. */
  private[scale] def celledBlockingBoardSql: String = {
    val bits = CelledBandBits
    val bandIdx = 0 until CelledBands
    def wordSql(j: Int): String =
      s"(dbucket >> ${j * bits}) & ${(1L << bits) - 1}"
    val cCtes = bandIdx.map(j =>
      s"""c$j AS (SELECT cell_id, bucket, ${wordSql(j)} AS k, COUNT(*) AS d
         |       FROM keyed GROUP BY 1, 2, 3)""".stripMargin).mkString(",\n")
    val pCtes = bandIdx.map(j =>
      s"""p$j AS (SELECT pcell, bucket, ${wordSql(j)} AS k, COUNT(*) AS d
         |       FROM px GROUP BY 1, 2, 3)""".stripMargin).mkString(",\n")
    val armSelects = (bandIdx.map(j => s"c$j" -> s"celled_band$j") ++
        bandIdx.map(j => s"p$j" -> s"probe2_band$j"))
      .map { case (cte, scheme) =>
        s"""SELECT '$scheme', COUNT(*), MAX(d),
           |  CAST(SUM(d*(d-1)//2) AS BIGINT), (SELECT n*(n-1)//2 FROM tot)
           |FROM $cte""".stripMargin
      }
    s"""one AS (SELECT bucket, COUNT(*) AS d FROM keyed GROUP BY 1),
       |$cCtes,
       |px AS (SELECT cell_id AS pcell, bucket, dbucket FROM keyed
       |       UNION ALL SELECT cell2, bucket, dbucket FROM keyed),
       |$pCtes,
       |geo AS (SELECT * FROM (VALUES $celledGeomValuesSql)
       |        g(scheme, sh, mask, nb)),
       |gg AS (SELECT g.scheme, g.nb, g.sh, k.cell_id, k.bucket,
       |    (k.dbucket >> g.sh) & g.mask AS w, COUNT(*) AS d
       |  FROM keyed k CROSS JOIN geo g GROUP BY 1, 2, 3, 4, 5, 6),
       |gb AS (SELECT scheme, CAST(COUNT(*) AS BIGINT) AS n_groups,
       |    MAX(d) AS max_group,
       |    CAST(SUM(d*(d-1)//2) AS BIGINT) AS cand_pairs,
       |    CAST((SUM(d)//nb) * ((SUM(d)//nb) - 1) // 2 AS BIGINT)
       |      AS quad_pairs
       |  FROM gg GROUP BY scheme, nb),
       |tot AS (SELECT COUNT(*) AS n FROM keyed)
       |SELECT 'lsh_bucket' AS scheme, COUNT(*) AS n_groups,
       |  MAX(d) AS max_group, CAST(SUM(d*(d-1)//2) AS BIGINT) AS cand_pairs,
       |  (SELECT n*(n-1)//2 FROM tot) AS quad_pairs FROM one
       |UNION ALL
       |${armSelects.mkString("\nUNION ALL\n")}
       |UNION ALL
       |SELECT scheme, n_groups, max_group, cand_pairs, quad_pairs
       |FROM gb""".stripMargin
  }

  /** The primary embeddings table's celled keyed CTE — the
    * spread-corpus twin of the media chain's keyed fragment
    * ([[Curation]]'s `mediaKeyedCteSql`), minus the byte-histogram
    * feature chain (the embeddings are read directly): fixed
    * sign-plane bucket from [[Similarity.bucketSql]], TOP-2
    * argmax-cosine cells over the first-[[Similarity.IvfCells]] seed
    * rows (rn ≤ 2 pivoted to cell_id/cell2), and the diff-plane bucket
    * whose planes are component-wise differences of seed pairs
    * (2p, 2p+1) — exact double subtractions of float32-cast values.
    * `where` bounds the scan (the q183 audit slice); seeds stay the
    * first IvfCells rows under any bound ≥ cells. Ends with the
    * `keyed` CTE (and leaves `bk` visible for referee arms). */
  private def embedKeyedCteSql(where: String = ""): String = {
    val nP = Similarity.NumPlanes
    val dim = Similarity.Dim
    s"""bk0 AS (SELECT vec_id,
       |    CAST(${Similarity.bucketSql} AS BIGINT) AS bucket,
       |    CAST(embedding AS DOUBLE[]) AS v,
       |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |      CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings $where),
       |bk AS (SELECT * FROM bk0 WHERE nrm > 0),
       |cents AS (SELECT vec_id AS cell_id, v AS cv, nrm AS cn FROM bk
       |          WHERE vec_id < ${Similarity.IvfCells}),
       |asg AS (SELECT vec_id,
       |    MAX(CASE WHEN rn = 1 THEN cell_id END) AS cell_id,
       |    MAX(CASE WHEN rn = 2 THEN cell_id END) AS cell2
       |  FROM (
       |    SELECT x.vec_id, c.cell_id,
       |      ROW_NUMBER() OVER (PARTITION BY x.vec_id
       |        ORDER BY list_dot_product(x.v, c.cv)/(x.nrm*c.cn) DESC,
       |          c.cell_id ASC) AS rn
       |    FROM bk x, cents c) WHERE rn <= 2 GROUP BY vec_id),
       |pld AS (SELECT pp.p, u.i, ca.cv[i] - cb.cv[i] AS dv
       |  FROM (SELECT unnest(range(0, $nP)) AS p) pp
       |  JOIN cents ca ON ca.cell_id = 2*pp.p
       |  JOIN cents cb ON cb.cell_id = 2*pp.p + 1,
       |  unnest(range(1, $dim + 1)) u(i)),
       |plv AS (SELECT p, list(dv ORDER BY i) AS pv FROM pld GROUP BY p),
       |db AS (SELECT x.vec_id,
       |    CAST(SUM(CASE WHEN list_dot_product(x.v, pl.pv) > 0
       |             THEN 1 << p ELSE 0 END) AS BIGINT) AS dbucket
       |  FROM bk x, plv pl GROUP BY 1),
       |keyed AS (SELECT bk.vec_id, asg.cell_id, asg.cell2, db.dbucket,
       |    bk.bucket, bk.v, bk.nrm
       |  FROM bk JOIN asg USING (vec_id) JOIN db USING (vec_id))""".stripMargin
  }

  /** Recall certification of the [[embeddingNearDupLsh]] gate against
    * the exact [[embeddingNearDup]] referee on the same bounded
    * sample — the audit those two docstrings promise, landed as a gate
    * query (q88 discipline: certify every approximate path you serve).
    * Per 0.2-wide cosine band of the TRUE pair set: true pairs, LSH
    * candidates recovered, recall. The banding is the point — LSH
    * bucket-collision probability is the S-curve
    * `(1 − θ/π)^planes`, so EXPECTED recall rises with cosine (on a
    * small band the binomial noise can still hand back a zero); a
    * profile far off the curve means the planes or the bucketing
    * broke, which a single aggregate recall number can hide. At the
    * fixture's 8 planes and θ ≈ 66° the curve sits near 2% — the
    * measured bands agree, which is the certification: the gate is
    * behaving exactly as its math says, and raising recall is a
    * NumPlanes/multi-probe dial (see [[Similarity.annLsh]]), not a
    * bug hunt.
    *
    * Scale shape: both sides run on the `maxId`-bounded audit sample
    * (the cost dial, O(10⁴)); the LSH side restricts INPUT, not
    * output, so its join stays bucket-equality even here. Every LSH
    * candidate passes the same exact-cosine filter as truth, so
    * candidates ⊆ truth and precision is 1 by construction — recall
    * is the only free number, which is why it's the one reported. */
  def nearDupRecall(emb: DataFrame, minCos: Double = EmbedNearDupMinCos,
                    maxId: Long = EmbedNearDupMaxId): DataFrame =
    recallBoardFrom(embeddingNearDup(emb, minCos, maxId),
      embeddingNearDupLsh(emb.filter(col("vec_id") < maxId), minCos))

  /** The recall rollup shared by the LSH (q127) and celled (q183)
    * certifications: true pairs left-joined to the gate's candidates,
    * banded by floor(cos·5) — candidates pass the same exact-cosine
    * filter as truth, so precision is 1 by construction and recall is
    * the only free number. */
  private def recallBoardFrom(truth: DataFrame, cand: DataFrame): DataFrame =
    truth.join(
        cand.select(col("vec_a"), col("vec_b"), lit(1).as("_hit")),
        Seq("vec_a", "vec_b"), "left")
      .groupBy(floor(col("cos") * 5).cast("int").as("cos_band"))
      .agg(count(lit(1)).as("n_true"), count(col("_hit")).as("n_cand"))
      .withColumn("recall",
        portableRound(col("n_cand").cast("double") / col("n_true"), 4))

  /** q183: recall certification of the CELLED chain on the SPREAD
    * corpus — [[embeddingNearDupCelled]]'s blocking over the primary
    * `embeddings` table against the exact [[embeddingNearDup]] referee
    * on the same bounded audit sample (the q127 discipline applied to
    * the q181 production path). The celled chain was built for
    * CONCENTRATED corpora (q176's media slice); THIS board certifies
    * the scaladoc's other claim — on a spread corpus the fixed bucket
    * still does the splitting and the data-dependent keys only narrow
    * it, so celled recall sits at or below the q127 LSH profile
    * (candidates here are a strict subset of the LSH gate's: same
    * fixed bucket ∧ more keys) while the q182 board prices how much
    * cheaper the blocking is.
    *
    * EXPECTED profile on this corpus (measured sf0.01, pinned by the
    * gate hash): near-ZERO at every band — the spread corpus's true
    * pairs all sit at low cosine (q29's max is ≈0.46; random
    * [[Similarity.Dim]]-d vectors have no near-identical stratum), and
    * at θ near 60-70° the 8-plane S-curve already reads ~1-2% for the
    * plain LSH gate (q127: 0.0096 at band 1), of which the celled keys
    * keep a subset (0 here). That is the method's honest contract, not
    * a defect: every sign-plane OR-construction serves the
    * NEAR-IDENTICAL stratum, where the S-curve is steep — the celled
    * chain's positive-recall certification lives on the media corpus
    * (q176/q178 vs the exhaustive q173 referee, 0.54-0.85 at
    * cos ≥ 0.999). A q183 board suddenly reading 0.5 at band 1 would
    * mean the geometry or the bucketing broke, exactly like q127.
    *
    * Scale shape: both sides run on the maxId-bounded audit sample;
    * the celled side keys a bounded keyed projection (seeds = the
    * first [[Similarity.IvfCells]] rows, inside every bound ≥ cells)
    * and joins through the bounded grid even here. */
  def celledNearDupRecall(emb: DataFrame,
                          minCos: Double = EmbedNearDupMinCos,
                          maxId: Long = EmbedNearDupMaxId): DataFrame = {
    val bounded = emb.filter(col("vec_id") < maxId)
    val keyed = celledKeyedVectors(bounded,
      Similarity.seedCentroidList(Similarity.nonZeroNorm(bounded),
        Similarity.IvfCells))
      .coreCheckpoint()
    recallBoardFrom(embeddingNearDup(emb, minCos, maxId),
      embeddingNearDupCelledFrom(keyed, minCos, inputMaterialized = true))
  }

  /** Semantic deduplication (SemDeDup, Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space coarsely, find
    * near-duplicate pairs ONLY within each cluster, connected-component
    * the within-cluster near-dup graph, and keep one representative per
    * component. Per vector: its cluster id and a `keep` verdict (the
    * component's lowest `vec_id` survives — deterministic, where the
    * paper keeps a random member; singletons always survive).
    *
    * Scale design — the clustering is exactly what makes SemDeDup a
    * corpus operator where [[embeddingNearDup]]'s all-pairs form is
    * not:
    *  - cluster assignment is a SCAN-SIDE projection — the seed
    *    centroid list ([[Similarity.seedCentroidList]], bounded driver
    *    data) rides as a plan constant inside the native
    *    `argmax_cosine` kernel; zero joins, zero shuffles to assign;
    *  - candidate pairs come from a cell-EQUALITY self-join, so pair
    *    volume is Σ cell² (the q69 bucket contract), never corpus²;
    *    at 100 TB raise `nCells` so per-cell occupancy stays bounded —
    *    the paper runs 50k clusters for exactly this reason;
    *  - components come from [[connectedComponents]] (bounded driver
    *    union-find under the edge threshold, distributed min-label
    *    propagation above it);
    *  - the verdict join is a left join against component labels —
    *    only near-dup members carry a label row, so the join's right
    *    side is duplicate-sized, not corpus-sized.
    *
    * The within-cluster restriction is the documented recall trade of
    * the method: a cross-cluster near-dup pair is invisible (the paper
    * accepts this; their fig. 2 measures the loss as negligible at
    * their cluster counts). The referee for that trade on a bounded
    * sample is [[embeddingNearDup]] (q29), same as the ANN family. */
  def semDedup(emb0: DataFrame, minCos: Double = EmbedNearDupMinCos,
               nCells: Int = Similarity.IvfCells): DataFrame = {
    val emb = Similarity.nonZeroNorm(emb0) // cosine-based board: zero-norm vectors are outside its universe (fuzz r19)
    val cents = Similarity.seedCentroidList(emb, nCells)
    // one scan yields id, cell, RAW FLOAT vector and norm (r21): the
    // kernels widen in-register — same doubles, half the pair-join
    // payload bytes, and no per-row cast allocation (the former
    // explode(array(cast)) barrier existed only for the cast)
    val assigned = Layout.widen(emb)
      .select(col("vec_id"), col("embedding").as("v"))
      .select(col("vec_id"),
        graft.functions.VectorExpressions.argMaxCosine(col("v"), cents)
          .as("cell_id"),
        col("v"), l2Norm(col("v")).as("nrm"))
    // cells are few (nCells) and corpus-sized — the within-cell pair
    // join takes the bounded grid route (identical output)
    val pairs = Skew.boundedSelfPairs(assigned, Seq("cell_id"), "vec_id",
        payload = Seq("v", "nrm"))
      .select(col("doc_a").as("vec_a"), col("doc_b").as("vec_b"),
        (dotProduct(col("v_a"), col("v_b")) /
          (col("nrm_a") * col("nrm_b"))).as("cos"))
      .filter(col("cos") >= minCos)
    val labels = connectedComponents(pairs, "vec_a", "vec_b")
    assigned.join(labels, assigned("vec_id") === labels("doc_id"), "left")
      .select(col("vec_id"), col("cell_id"),
        coalesce(col("cluster_id") === col("vec_id"), lit(true)).as("keep"))
  }

  /** Eval-contamination rolled up BY INGEST SOURCE — the operational
    * report behind [[decontaminate]]'s per-doc verdicts: when a
    * benchmark leaks into training data it usually leaks through ONE
    * pipeline (a crawl that indexed the benchmark site, a dataset that
    * embedded it), and this is the query that names it. Per corpus
    * source: docs checked, docs contaminated, total overlapping
    * shingles, and the contamination rate.
    *
    * Universe note: inherits q71's contract — docs too short to form a
    * shingle carry no verdict and are excluded from their source's
    * denominator (they cannot leak what they cannot contain).
    *
    * Scale design: the per-doc verdicts are the q71 plan unchanged
    * (broadcast eval shingles, one corpus pass); the source attach is
    * a doc_id equi-join and the rollup is a tiny group-by-source with
    * map-side partials. */
  def contaminationBySource(docs: DataFrame,
                            evalMaxId: Long = EvalMaxId): DataFrame =
    contaminationBySourceFrom(docs,
      shingleTable(docs).coreCheckpoint(), evalMaxId)

  /** [[contaminationBySource]] from the checkpointed shingle core. */
  private[scale] def contaminationBySourceFrom(docs: DataFrame, sh: DataFrame,
                                               evalMaxId: Long): DataFrame = {
    val per = decontaminateFrom(sh, evalMaxId)
    docs.select(col("doc_id"), col("source"))
      .join(per, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("contaminated"), 1)).as("n_contaminated"),
        coalesce(sum(col("n_overlap")), lit(0L)).as("n_overlap"),
        portableRound(count(when(col("contaminated"), 1)).cast("double") /
          count(lit(1)), 4).as("contamination_rate"))
  }

  /** Eval-contamination broken down BY EVAL SUITE — the other axis of
    * [[contaminationBySource]]: q101 names the pipeline a benchmark
    * leaked THROUGH, this names the benchmark that leaked. Suite = the
    * eval document's `source` (a held-out set is a union of benchmark
    * suites; here each eval source plays one suite). Per suite: eval
    * docs and distinct eval shingles (the suite's own size), corpus
    * docs hit, total overlapping shingle instances, and the hit rate
    * over q71's corpus universe (docs with ≥ 1 shingle). A corpus
    * shingle matching two suites counts in both — per-suite verdicts
    * are independent contamination checks, not a partition.
    *
    * Scale design: suite-tagged eval shingles are still only
    * benchmark-sized — broadcast, exactly like q71; the corpus side is
    * ONE pass over the same checkpointed shingle stream (inner
    * broadcast join this time — non-hits carry no suite and are only
    * needed for the universe denominator, a one-row stat crossJoined
    * back). Rollups group by (suite, doc) then suite with map-side
    * partials; zero-hit suites re-enter via the left join from the
    * suite-catalog side, so a clean suite reports 0 instead of
    * vanishing. */
  def decontaminateBySuite(docs: DataFrame, evalMaxId: Long = EvalMaxId): DataFrame =
    decontaminateBySuiteFrom(docs, shingleTable(docs).coreCheckpoint(),
      evalMaxId)

  /** [[decontaminateBySuite]] from the checkpointed shingle core. */
  private[scale] def decontaminateBySuiteFrom(docs: DataFrame, sh: DataFrame,
                                              evalMaxId: Long): DataFrame = {
    val suites = docs.filter(col("doc_id") < evalMaxId)
      .select(col("doc_id"), col("source").as("suite"))
    val ev = sh.filter(col("doc_id") < evalMaxId)
      .join(broadcast(suites), Seq("doc_id"))
      .select(col("suite"), col("sh")).distinct()
    // every rollup side here is suite-cardinality (dozens of rows at
    // any corpus size) — broadcast, or the planner SMJs tiny tables
    val suiteStats = suites.groupBy(col("suite"))
      .agg(count(lit(1)).as("n_eval_docs"))
      .join(broadcast(
        ev.groupBy(col("suite")).agg(count(lit(1)).as("n_eval_shingles"))),
        Seq("suite"), "left")
    val corpus = sh.filter(col("doc_id") >= evalMaxId)
    val hits = corpus.join(broadcast(ev), Seq("sh"))
      .groupBy(col("suite"), col("doc_id"))
      .agg(count(lit(1)).as("n_overlap"))
      .groupBy(col("suite"))
      .agg(count(lit(1)).as("n_docs_hit"), sum(col("n_overlap")).as("n_overlap"))
    val universe = corpus.agg(
      countDistinct(col("doc_id")).as("n_corpus_docs"))
    suiteStats.join(broadcast(hits), Seq("suite"), "left").crossJoin(universe)
      .select(col("suite"), col("n_eval_docs"),
        coalesce(col("n_eval_shingles"), lit(0L)).as("n_eval_shingles"),
        coalesce(col("n_docs_hit"), lit(0L)).as("n_docs_hit"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        // an empty post-eval corpus (fuzz tiny profile) has no
        // defined hit rate: NULL, the value DuckDB's double/0 yields
        when(col("n_corpus_docs") > 0, portableRound(
          coalesce(col("n_docs_hit"), lit(0L)).cast("double") /
            col("n_corpus_docs"), 4)).as("hit_rate"))
  }

  /** The full contamination MATRIX — (eval suite × ingest source)
    * cells completing [[contaminationBySource]] (q101: which pipeline)
    * and [[decontaminateBySuite]] (q102: which benchmark): the
    * actionable unit is the PAIR — "suite X leaked through source Y"
    * is what a curation run actually deletes. Sparse: only cells with
    * at least one hit appear (at 100 TB the dense matrix is almost
    * entirely zeros). Per cell: corpus docs hit and total overlapping
    * shingle instances.
    *
    * Scale design: identical to q102 up to the per-(suite, doc)
    * rollup; the corpus source attaches by doc_id equi-join and the
    * final aggregate is keyed by (suite, source) — both map-side
    * partial. */
  def contaminationMatrix(docs: DataFrame, evalMaxId: Long = EvalMaxId): DataFrame =
    contaminationMatrixFrom(docs, shingleTable(docs).coreCheckpoint(),
      evalMaxId)

  /** [[contaminationMatrix]] from the checkpointed shingle core. */
  private[scale] def contaminationMatrixFrom(docs: DataFrame, sh: DataFrame,
                                             evalMaxId: Long): DataFrame = {
    val suites = docs.filter(col("doc_id") < evalMaxId)
      .select(col("doc_id"), col("source").as("suite"))
    val ev = sh.filter(col("doc_id") < evalMaxId)
      .join(broadcast(suites), Seq("doc_id"))
      .select(col("suite"), col("sh")).distinct()
    sh.filter(col("doc_id") >= evalMaxId)
      .join(broadcast(ev), Seq("sh"))
      .groupBy(col("suite"), col("doc_id"))
      .agg(count(lit(1)).as("n_overlap"))
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("suite"), col("source"))
      .agg(count(lit(1)).as("n_docs_hit"),
        sum(col("n_overlap")).as("n_overlap"))
  }

  /** Benchmark decontamination — the n-gram–overlap check every
    * training-data pipeline runs against its eval sets (the GPT-3 /
    * Gopher "13-gram collision" rule, here on the word-shingle
    * granularity the rest of this module uses): flag any corpus
    * document sharing at least one shingle with the held-out eval
    * set, and report the overlap fraction for threshold tuning.
    *
    * Scale design: the eval side is DISTINCT shingles of a small
    * benchmark set — broadcast everywhere; the corpus side streams
    * its shingles through ONE left broadcast join + ONE aggregate, so
    * the whole check is a single pass over the corpus shingle stream
    * with map-side partials. The shingle table is checkpointed once
    * (eval and corpus branches both read it; without a barrier the
    * tokenize chain — the dominant cost — would run twice). At 100 TB
    * the eval shingle set is still only benchmark-sized (millions of
    * rows, megabytes hashed) — the broadcast holds. */
  def decontaminate(docs: DataFrame, evalMaxId: Long = EvalMaxId): DataFrame =
    decontaminateFrom(shingleTable(docs).coreCheckpoint(), evalMaxId)

  /** [[decontaminate]] from the checkpointed shingle core. */
  private[scale] def decontaminateFrom(sh: DataFrame,
                                       evalMaxId: Long): DataFrame = {
    val ev = sh.filter(col("doc_id") < evalMaxId)
      .select(col("sh")).distinct()
      .withColumn("_hit", lit(1))
    val corpus = sh.filter(col("doc_id") >= evalMaxId)
    corpus.join(broadcast(ev), Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"), count(col("_hit")).as("n_overlap"))
      .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
        portableRound(col("n_overlap").cast("double") / col("n_shingles"), 4)
          .as("overlap_frac"),
        (col("n_overlap") >= 1).as("contaminated"))
  }

  /** [[decontaminate]] at benchmark-SUITE scale. The exact form
    * broadcasts the whole eval shingle set to every task, which stops
    * fitting once "the eval set" is dozens of benchmarks × millions of
    * shingles; the standard fix is the q50 pattern
    * ([[Sketches.bloomPrefilteredJoin]]): a driver-built Bloom filter
    * over the eval shingles (bits ~ 1.2 MB per million shingles at 1%
    * fpp — broadcast-sized long after the shingle SET isn't) rides to
    * every task, and only corpus shingles the filter admits (true
    * overlaps + fpp of the rest) enter the exact-confirm join, which
    * runs as a SHUFFLE semi-join precisely because this variant exists
    * for the regime where the eval side can't broadcast.
    *
    * The sketch passes only false POSITIVES and the exact semi-join
    * removes them; per-doc shingle totals come from the unfiltered
    * corpus side — so the result is IDENTICAL to [[decontaminate]],
    * which is exactly what the oracle asserts (same SQL as q71). */
  def decontaminateBloom(docs: DataFrame, evalMaxId: Long = EvalMaxId,
                         fpp: Double = 0.01): DataFrame =
    decontaminateBloomFrom(shingleTable(docs).coreCheckpoint(),
      evalMaxId, fpp)

  /** [[decontaminateBloom]] from the checkpointed shingle core. */
  private[scale] def decontaminateBloomFrom(sh: DataFrame, evalMaxId: Long,
                                            fpp: Double): DataFrame = {
    val ev = sh.filter(col("doc_id") < evalMaxId)
      .select(col("sh")).distinct()
    val bloom = Sketches.keyBloom(ev, "sh", math.max(ev.count(), 1L), fpp)
    val bloomBc = sh.sparkSession.sparkContext.broadcast(bloom)
    val corpus = sh.filter(col("doc_id") >= evalMaxId)
    val cand = corpus.filter(r =>
      bloomBc.value.mightContainString(r.getString(r.fieldIndex("sh"))))
    val hits = cand.join(ev.hint("shuffle_hash"), Seq("sh"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap0"))
    corpus.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_overlap0"), lit(0L)).as("n_overlap"))
      .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
        portableRound(col("n_overlap").cast("double") / col("n_shingles"), 4)
          .as("overlap_frac"),
        (col("n_overlap") >= 1).as("contaminated"))
  }

  /** Incremental dedup — the shape a production corpus pipeline runs
    * per ingest batch: drop ARRIVING documents that near-duplicate the
    * EXISTING corpus, without recomputing corpus-wide pairs. The
    * arriving batch's MinHash bands semi-join the corpus band index;
    * any band collision marks the newcomer a duplicate and the
    * left-anti join drops it.
    *
    * Scale design: both sides reduce to (band, hash) short keys; the
    * corpus side is exactly the banded index a production deployment
    * PERSISTS (bucketed by (b, bv) via [[Layout.saveBucketed]], the
    * semi-join is then shuffle-free on the corpus side and only the
    * batch moves). New docs too short to shingle have no bands and
    * pass through — same contract as the batch pair generator. */
  def incrementalDedup(newDocs: DataFrame, corpus: DataFrame): DataFrame = {
    val dupIds = minhashBands(newDocs)
      .join(minhashBands(corpus), Seq("b", "bv"), "left_semi")
      .select(col("doc_id")).distinct()
    newDocs.join(dupIds, Seq("doc_id"), "left_anti")
  }

  /** Same-table form of [[incrementalDedup]]: when batch and corpus
    * live in one table split by an id boundary, the band index is
    * computed in ONE tokenize pass (checkpointed) and sliced — the
    * general form would run the dominant minhash/tokenize chain once
    * per side. Results are identical (spec-checked). */
  def incrementalDedupAt(docs: DataFrame, boundary: Long): DataFrame =
    incrementalDedupAtFrom(docs, minhashBands(docs).coreCheckpoint(),
      boundary)

  /** [[incrementalDedupAt]] from the checkpointed band core. */
  private[scale] def incrementalDedupAtFrom(docs: DataFrame, bands: DataFrame,
                                            boundary: Long): DataFrame = {
    val dupIds = bands.filter(col("doc_id") >= boundary)
      .join(bands.filter(col("doc_id") < boundary), Seq("b", "bv"), "left_semi")
      .select(col("doc_id")).distinct()
    docs.filter(col("doc_id") >= boundary)
      .join(dupIds, Seq("doc_id"), "left_anti")
  }

  /** The id boundary the incremental boards split at: docs below it
    * are the FROZEN corpus/index, docs at or above are the new batch.
    * ONE definition feeds the q77 and q174 Spark plans and their
    * oracles (the shared-constant discipline). */
  val IncrementalBoundary = 400L

  /** q174: incremental NEAR-dup maintenance — the board a nightly
    * ingest reads before merging a new batch into a deduped corpus:
    * for every NEW document (id ≥ boundary), does it near-duplicate
    * the FROZEN corpus (id < boundary), how many frozen docs it hits,
    * and which frozen CLUSTER it joins (the min-id label of the
    * matched docs' components over frozen-frozen pairs only — the
    * clusters the frozen index actually published; `n_clusters > 1`
    * flags a bridge doc that would merge existing clusters). q77 is
    * this board's EXACT-dedup sibling; this one closes the near-dup
    * gap: new docs against a frozen simhash index.
    *
    * The frozen-artifact contract: `pairs` is the full-corpus
    * [[simhashPairs]] list (the q28 chain — in the gate registry, the
    * memoized pair core). Because a simhash is per-document, the
    * frozen side's pairs and the cross-boundary matches are exact
    * row subsets of that list — so the board reconciles against the
    * published q28 chain BY CONSTRUCTION, and a batch run reuses the
    * core instead of re-running the kernel ([[DedupSpec]] reconciles
    * the subset claim independently with a spec-local union-find).
    *
    * Scale design: two scan-side filters of the pair core, one
    * bounded component pass over the frozen half (near-dup components
    * are shallow; [[connectedComponents]]' round budget), one
    * broadcast-sized label attach, one doc-keyed rollup. The
    * expensive kernel/join work is the pair core's, paid once per
    * batch and shared with ten other boards. */
  def incrementalNearDup(docs: DataFrame, pairs: DataFrame,
                         boundary: Long = IncrementalBoundary,
                         frozenComps: Option[DataFrame] = None): DataFrame = {
    // pairs carry doc_a < doc_b, and the boundary splits ids, so a
    // cross pair is ALWAYS (frozen doc_a, new doc_b)
    val cross = pairs.filter(col("doc_a") < boundary && col("doc_b") >= boundary)
    val frozenPairs = pairs.filter(col("doc_b") < boundary)
    val comps = frozenComps.getOrElse(connectedComponents(frozenPairs))
    val m = cross
      .join(comps.select(col("doc_id").as("doc_a"), col("cluster_id")),
        Seq("doc_a"), "left")
      // a frozen doc in no frozen-frozen pair is its own singleton
      // cluster — same labeling q59 publishes for isolated nodes
      .select(col("doc_b").as("doc_id"),
        coalesce(col("cluster_id"), col("doc_a")).as("cl"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nm"),
        countDistinct(col("cl")).as("nc"),
        min(col("cl")).as("cluster"))
    docs.filter(col("doc_id") >= boundary).select(col("doc_id"))
      .join(m, Seq("doc_id"), "left")
      .select(col("doc_id"), col("nm").isNotNull.as("matched"),
        coalesce(col("nm"), lit(0L)).as("n_matches"),
        coalesce(col("nc"), lit(0L)).as("n_clusters"),
        col("cluster"))
  }

  /** q184: incremental near-dup maintenance for the CELLED embedding
    * chain — [[incrementalNearDup]]'s contract (q174) transplanted
    * from the simhash index to the index a 100 TB CLIP-dedup pipeline
    * would actually freeze: for every NEW vector (id ≥ boundary), does
    * it near-duplicate the FROZEN corpus under the celled blocking,
    * how many frozen vectors it hits, and which frozen CLUSTER it
    * joins (min-id labels over frozen-frozen pairs ONLY — the clusters
    * the frozen index published; a new vector must not see clusters
    * merged by other arrivals).
    *
    * The frozen-artifact contract: `pairs` is the PUBLISHED
    * full-corpus celled board ([[embeddingNearDupCelledFrom]] — the
    * q176 memoized core). The celled keys are per-row scan-side
    * projections against plan-constant seeds (the first
    * [[Similarity.IvfCells]] rows, all below any boundary ≥ cells), so
    * the frozen side's keys cannot shift as arrivals land, and the
    * cross and frozen-frozen pair sets are exact ROW SUBSETS of that
    * list — the board reconciles against the published chain by
    * construction ([[DedupSpec]] re-proves it with an independent
    * union-find, the q174 discipline).
    *
    * Scale design: identical to q174 — two scan-side filters of the
    * pair core, one bounded component pass over the frozen half, one
    * broadcast-sized label attach, one vec-keyed rollup; the
    * expensive key/join work is the pair core's, paid once per batch
    * and shared with the q176/q177/q178 consumers. */
  def incrementalNearDupCelled(keyed: DataFrame, pairs: DataFrame,
      boundary: Long = IncrementalBoundary): DataFrame =
    incrementalNearDup(
      keyed.select(col("vec_id").as("doc_id")),
      pairs.select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")),
      boundary)
      .withColumnRenamed("doc_id", "vec_id")

  /** q175: the cluster-registry update — what the batch DID to the
    * dedup registry, per document: the label the frozen index
    * published (`old_cluster`, null for new docs), the label a full
    * recompute assigns (`new_cluster`), and the classification a
    * maintenance job acts on:
    *  - `stable`    — frozen doc, label unchanged;
    *  - `relabeled` — frozen doc whose cluster a bridge doc MERGED
    *    with a lower-min cluster (labels are component min-ids, and
    *    new ids sit above the boundary, so a frozen label can only
    *    ever change to another frozen doc's id — the board proves the
    *    merge direction by construction);
    *  - `joined`        — new doc matching the frozen corpus (q174's
    *    matched set, same pair subset);
    *  - `new_cluster`   — new doc pairing only with other new docs;
    *  - `new_singleton` — new doc in no pair at all.
    * q174 answers "what does this new doc hit"; THIS board answers
    * the registry owner's follow-up — "which labels must I rewrite
    * after the merge" — and reconciles the incremental view against
    * the full recompute in one artifact (every `relabeled` row is
    * exactly the cost of not having run the full recompute).
    *
    * Scale design: both component tables are memoized cores (the full
    * one is q59's), the cross-match set is a scan-side filter of the
    * pair core, and the board itself is three left joins from the
    * id spine — no new heavy work beyond what the registry already
    * paid. */
  def registryUpdate(docs: DataFrame, pairs: DataFrame,
                     fullComps: DataFrame, frozenComps: DataFrame,
                     boundary: Long = IncrementalBoundary): DataFrame = {
    val joinedIds = pairs
      .filter(col("doc_a") < boundary && col("doc_b") >= boundary)
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("__joined", lit(true))
    val frozen = col("doc_id") < boundary
    val oldLbl = coalesce(col("old0"), col("doc_id"))
    val newLbl = coalesce(col("new0"), col("doc_id"))
    docs.select(col("doc_id"))
      .join(frozenComps.select(col("doc_id"), col("cluster_id").as("old0")),
        Seq("doc_id"), "left")
      .join(fullComps.select(col("doc_id"), col("cluster_id").as("new0")),
        Seq("doc_id"), "left")
      .join(joinedIds, Seq("doc_id"), "left")
      .select(col("doc_id"), (!frozen).as("is_new"),
        when(frozen, oldLbl).as("old_cluster"),
        newLbl.as("new_cluster"),
        when(frozen, when(oldLbl === newLbl, "stable").otherwise("relabeled"))
          .otherwise(when(col("__joined"), "joined")
            .when(col("new0").isNull, "new_singleton")
            .otherwise("new_cluster")).as("status"))
  }

  /** Globally-repeated n-gram exposure — the memorization-risk signal
    * (the "dedup repeated substrings" concern of Lee et al. 2022 at
    * shingle granularity): per document, how many of its distinct
    * shingles occur in MORE than `threshold` documents corpus-wide,
    * as a count, a fraction, and a flag. Catches boilerplate that
    * pairwise near-dup misses: a license header shared by 10k
    * otherwise-unrelated docs never forms a near-dup pair, but every
    * copy is a memorization risk.
    *
    * Scale design: the shingle table streams once into a (shingle)
    * hash-aggregate with map-side partials; the >threshold survivor
    * set is tiny BY CONSTRUCTION (only cross-doc-repeated shingles
    * survive — boilerplate vocabulary, not corpus volume), so the
    * join-back broadcasts. The checkpoint stops the tokenize chain
    * re-running for the two consumers. */
  def repeatedNgrams(docs: DataFrame, threshold: Long = RepeatedNgramsMinDf): DataFrame =
    repeatedNgramsFrom(shingleTable(docs).coreCheckpoint(), threshold)

  /** [[repeatedNgrams]] from the checkpointed shingle core. */
  private[scale] def repeatedNgramsFrom(sh: DataFrame,
                                        threshold: Long): DataFrame = {
    // shingleTable emits DISTINCT (doc, shingle): count = containing docs
    val hot = sh.groupBy(col("sh")).agg(count(lit(1)).as("c"))
      .filter(col("c") > threshold)
      .select(col("sh"), lit(1).as("_hot"))
    sh.join(broadcast(hot), Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"), count(col("_hot")).as("n_hot"))
      .select(col("doc_id"), col("n_shingles"), col("n_hot"),
        portableRound(col("n_hot").cast("double") / col("n_shingles"), 4).as("hot_frac"),
        (col("n_hot") > 0).as("flagged"))
  }

  /** Cross-source contamination matrix: for every unordered pair of
    * sources, how many near-dup document pairs span them. The
    * acquisition-time dashboard: two crawls with a hot cell here
    * overlap heavily, and knowing that BEFORE paying for a full
    * corpus dedup (or before double-counting a source in a mixture)
    * is the point. The diagonal (src, src) counts within-source
    * duplication.
    *
    * Scale shape: the pair list is the small side (near-dup pairs are
    * a vanishing fraction of docs²); the two doc_id→source lookups
    * shuffle the PAIRS by doc_id, never documents by pair, and the
    * matrix aggregate is at most |sources|² rows — map-side partials
    * collapse it early. */
  def sourceContamination(docs: DataFrame, maxDist: Int = 3): DataFrame =
    sourceContaminationFrom(docs, simhashPairs(docs, maxDist))

  /** [[sourceContamination]] from a precomputed pair graph —
    * shared-core form for the gate registry. */
  def sourceContaminationFrom(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val src = docs.select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
      // unordered source pair: (min, max) so A↔B and B↔A land together
      .select(least(col("sa"), col("sb")).as("src_a"),
        greatest(col("sa"), col("sb")).as("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** One-row duplication-graph health report — the graph companion to
    * q78's corpus report: how many documents participate in near-dup
    * pairs, how dense the pair graph is, how clustered (total
    * triangles, mean local clustering), and how concentrated (max
    * degree). Reading it: n_nodes/corpus = the duplication footprint;
    * high mean_clustering = tight dup clusters (safe to keep-one);
    * high max_deg with low clustering = a boilerplate hub spraying
    * weak edges (PageRank's target). All counts are integer
    * aggregates of [[triangleStats]]'s output, so the one row is
    * hash-exact; the clustering mean crosses partitions through
    * [[exactSum]]'s decimal accumulator (a plain double avg() would
    * be partition-order nondeterministic). */
  def graphSummary(docs: DataFrame, maxDist: Int = 3): DataFrame =
    graphSummaryFrom(simhashPairs(docs, maxDist))

  /** [[graphSummary]] from a precomputed pair graph — shared-core
    * form for the gate registry. */
  def graphSummaryFrom(pairs: DataFrame): DataFrame = {
    val stats = triangleStats(pairs)
    stats.agg(
      count(lit(1)).as("n_nodes"),
      // every edge contributes 2 degree units, every triangle 3
      // participations — integer div keeps the counts exact past 2^53
      expr("sum(deg) div 2").as("n_edges"),
      expr("sum(n_tri) div 3").as("n_triangles"),
      max(col("deg")).as("max_deg"),
      portableRound(exactSum(col("clustering")) / count(lit(1)), 4)
        .as("mean_clustering"))
  }

  /** Substring-level duplicated-SPAN detection — the span-granular
    * dedup modality of Lee et al. 2022 ("Deduplicating Training Data
    * Makes Language Models Better"): instead of flagging whole
    * documents ([[repeatedNgrams]]) or pairing them ([[ngramJaccard]]),
    * emit the actual duplicated word INTERVALS per document, as
    * (doc_id, span_start, span_len) with the number of duplicated
    * windows each span merged and `max_df` — the widest sharing of
    * any window in the span (how many DISTINCT documents carry it).
    * `max_df` is the attribution signal curation acts on: a span at
    * df 10 000 is corpus boilerplate to cut everywhere, a span at
    * df 2 is a single duplication to keep-one. A span is a maximal
    * run of n-word windows whose fingerprint occurs in at least
    * `minDocs` DISTINCT documents; overlapping and word-adjacent
    * duplicated windows merge into one interval (gaps-and-islands
    * with break at pos > prev + n). Within-doc-only repetition is
    * deliberately not flagged — cross-document duplication is the
    * memorization risk; the within-doc signal is [[repeatedNgrams]]'
    * territory.
    *
    * Fingerprints are md5 per window (portable to the oracle engine);
    * a Rabin-Karp rolling hash would shave the O(n) per-window rehash
    * but is not expressible as a shared cross-engine semantic, and the
    * md5 stays inside one codegen'd projection over the scan.
    *
    * Scale design — NO PAIR JOIN ANYWHERE: unlike every pairwise
    * dedup op here, span detection never enumerates (doc, doc)
    * candidates, so there is no quadratic blow-up to df-cap — a
    * boilerplate window shared by 100k documents costs exactly its
    * 100k window rows, not 5·10⁹ pairs. The shape is: one tokenize
    * pass, a df-aggregate shuffled by the 16-byte fingerprint with
    * map-side partials, a join back on the same key (one df row per
    * fingerprint — no fan-out; the shared by-h exchange is reused,
    * see the inline note), and a per-document sort for the interval
    * merge whose partition data is bounded by document length. Every
    * shuffle key is short and every stage is linear in corpus
    * windows. */
  /** Positional window fingerprints (doc_id, pos, h) — the shared base
    * table of the span-granular ops ([[dupSpans]], [[spanPairs]]): one
    * n-word window per position, fingerprinted md5 (portable to the
    * oracle engine). ws materialized first so the shingle kernel reads
    * it once (see shingleTable). */
  private def windowTable(docs: DataFrame, n: Int): DataFrame =
    Layout.widen(docs)
      .select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) >= n)
      .select(col("doc_id"),
        posexplode(shinglesFromWords(col("ws"), n)).as(Seq("pos", "sh")))
      .select(col("doc_id"), col("pos").cast(LongType).as("pos"),
        md5(col("sh")).as("h"))

  /** [[windowTable]] plus each window's CHARACTER interval — `cs` =
    * char start of the window's first word, `ce` = char end (exclusive)
    * of its last word, both 0-based codepoint offsets into
    * `lower(text)` (see [[graft.functions.NormWordStartsExpression]]).
    * The offsets array is a projection of the SAME tokenize pass (one
    * extra kernel scan, no new shuffle): both coordinate columns are
    * computed before the explode's output is projected, so the
    * per-window rows carry two extra longs and nothing else. Both
    * `cs` and `ce` are strictly increasing in `pos`, which is what
    * lets the islands merge aggregate them with plain min/max. */
  private def windowTableChar(docs: DataFrame, n: Int): DataFrame =
    Layout.widen(docs)
      .select(col("doc_id"), words(col("text")).as("ws"),
        wordStarts(col("text")).as("st"))
      .filter(size(col("ws")) >= n)
      .select(col("doc_id"), col("ws"), col("st"),
        posexplode(shinglesFromWords(col("ws"), n)).as(Seq("pos", "sh")))
      .select(col("doc_id"), col("pos").cast(LongType).as("pos"),
        md5(col("sh")).as("h"),
        element_at(col("st"), col("pos") + 1).as("cs"),
        (element_at(col("st"), col("pos") + lit(n)) +
          length(element_at(col("ws"), col("pos") + lit(n)))
            .cast(LongType)).as("ce"))

  def dupSpans(docs: DataFrame, n: Int = ShingleSize,
               minDocs: Long = SpanMinDocs, charCoords: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 1, s"window size must be >= 1: $n")
    require(minDocs >= 2, s"minDocs must be >= 2 (a span duplicated in " +
      s"fewer than 2 documents is not a duplicate): $minDocs")
    // NO checkpoint on the window table, unlike the shingleTable
    // consumers: both readers below (the df aggregate and the
    // semi-join's streamed side) exchange this table by the SAME key
    // h, so ReuseExchange dedupes the tokenize subtree at the shuffle
    // — a checkpoint would only add a blocking materialization pass
    // (A/B'd: ~1.34 s with the checkpoint vs ~1.19 s without, at
    // sf0.1; the audit spec pins the ReusedExchange)
    val win = if (charCoords) windowTableChar(docs, n) else windowTable(docs, n)
    // inner join (not semi) so each position carries its window's df —
    // dup has exactly ONE row per h, so this cannot fan out, and the
    // per-span MAX(df) below is the attribution signal
    val dfAll = win.groupBy(col("h"))
      .agg(count_distinct(col("doc_id")).as("df"))
    dupSpansFrom(win, dfAll, n, minDocs, charCoords)
  }

  /** [[dupSpans]] from a precomputed window table (char coords
    * included) and its unfiltered per-fingerprint df table — the
    * shared-core form: all four span boards (q87/q90/q91/q92) read
    * ONE tokenize pass and ONE df aggregate; the word-coordinate
    * variants simply never project the char columns. */
  private[scale] def dupSpansFrom(win: DataFrame, dfAll: DataFrame, n: Int,
                                  minDocs: Long,
                                  charCoords: Boolean): DataFrame = {
    val dup = dfAll.filter(col("df") >= minDocs)
    val hitCols = Seq(col("doc_id"), col("pos"), col("df")) ++
      (if (charCoords) Seq(col("cs"), col("ce")) else Nil)
    val hits = win.join(dup, Seq("h")).select(hitCols: _*)
    mergeSpans(hits, n, charCoords = charCoords)
  }

  /** Shared gaps-and-islands tail of the span ops: merge duplicated
    * window hits (keys..., pos, df) into maximal (keys..., span_start,
    * span_len, n_windows, max_df) intervals, one partition per key
    * tuple — per document for [[dupSpans]]/[[incrementalDupSpans]],
    * per (doc_a, doc_b) for [[spanPairs]]. Windows at pos and prev
    * overlap or touch iff pos <= prev + n (a window covers words
    * [pos, pos+n-1]); both window functions share one (keys, pos)
    * sort. */
  private def mergeSpans(hits: DataFrame, n: Int,
                         keys: Seq[String] = Seq("doc_id"),
                         charCoords: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyCols = keys.map(col)
    val byKey = Window.partitionBy(keyCols: _*).orderBy(col("pos"))
    // char interval of a merged span: cs and ce are strictly
    // increasing in pos (word starts/ends only move right), so the
    // span's char extent is exactly [min(cs), max(ce)) — the same
    // min/max aggregation the word coordinates use, no extra pass
    val aggs = Seq(min(col("pos")).as("span_start"),
      (max(col("pos")) - min(col("pos")) + n).as("span_len"),
      count(lit(1)).as("n_windows"),
      max(col("df")).as("max_df")) ++
      (if (charCoords) Seq(min(col("cs")).as("char_start"),
        (max(col("ce")) - min(col("cs"))).as("char_len"))
      else Nil)
    val outCols = Seq(col("span_start"), col("span_len"),
      col("n_windows"), col("max_df")) ++
      (if (charCoords) Seq(col("char_start"), col("char_len")) else Nil)
    hits
      .withColumn("prev", lag(col("pos"), 1).over(byKey))
      .withColumn("brk",
        when(col("prev").isNull || col("pos") > col("prev") + n, 1L)
          .otherwise(0L))
      .withColumn("grp", sum(col("brk")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(keyCols :+ col("grp"): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(keyCols ++ outCols: _*)
  }

  /** Persistable span index of a corpus: one (h, df) row per window
    * fingerprint — the aggregate [[incrementalDupSpans]] consults so
    * arriving batches never re-tokenize the corpus. Disjoint doc-id
    * sets make df additive, so the index folds batch-over-batch with
    * [[spanIndexMerge]] (the [[incrementalDedup]] band-index
    * discipline at span granularity). Bounded by DISTINCT window
    * fingerprints, not corpus size. */
  def spanIndex(corpus: DataFrame, n: Int = ShingleSize): DataFrame =
    windowTable(corpus, n).groupBy(col("h"))
      .agg(count_distinct(col("doc_id")).as("df"))

  /** Fold a processed batch's windows into the span index: same-key
    * df counts ADD because batch doc-ids are disjoint from everything
    * already indexed (the caller's contract, as in
    * [[incrementalDedup]]). */
  def spanIndexMerge(index: DataFrame, batch: DataFrame,
                     n: Int = ShingleSize): DataFrame =
    index.unionByName(spanIndex(batch, n))
      .groupBy(col("h")).agg(sum(col("df")).as("df"))

  /** Incremental [[dupSpans]]: duplicated-span detection for an
    * ARRIVING batch against a persisted [[spanIndex]], without
    * re-tokenizing the indexed corpus. A batch window's document
    * frequency is its batch-local distinct count plus the index's df
    * for the same fingerprint (additive by the disjointness
    * contract); batch docs whose windows reach `minDocs` get the
    * same islands merge as the batch path — so for identical data,
    * incremental output EQUALS `dupSpans(corpus ∪ batch)` restricted
    * to the batch's doc_ids (spec-pinned both for one batch and for
    * a folded two-batch stream). Corpus docs whose spans newly
    * became duplicated by this batch are deliberately not re-emitted
    * — the reporting direction is new-data-vs-index, exactly
    * [[incrementalDedup]]'s.
    *
    * Scale shape: only the batch tokenizes (O(batch windows)); the
    * index join is by the 16-byte fingerprint with one row per h on
    * the index side (no fan-out), and the islands merge sorts only
    * batch documents. */
  def incrementalDupSpans(batch: DataFrame, index: DataFrame,
                          n: Int = ShingleSize,
                          minDocs: Long = SpanMinDocs,
                          charCoords: Boolean = false): DataFrame = {
    require(n >= 1, s"window size must be >= 1: $n")
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
    // char coordinates compose exactly as in [[dupSpans]]: the index
    // is char-agnostic (h, df), so only the batch's windows — the only
    // ones tokenized here — need to carry their (cs, ce) intervals
    val win = if (charCoords) windowTableChar(batch, n)
      else windowTable(batch, n)
    val dfB = win.groupBy(col("h"))
      .agg(count_distinct(col("doc_id")).as("df_b"))
    val tot = dfB
      .join(index.select(col("h"), col("df").as("df_c")), Seq("h"), "left")
      .select(col("h"),
        (col("df_b") + coalesce(col("df_c"), lit(0L))).as("df"))
      .filter(col("df") >= minDocs)
    val hitCols = Seq(col("doc_id"), col("pos"), col("df")) ++
      (if (charCoords) Seq(col("cs"), col("ce")) else Nil)
    val hits = win.join(tot, Seq("h")).select(hitCols: _*)
    mergeSpans(hits, n, charCoords = charCoords)
  }

  /** Hot-window cap for [[spanPairs]]: windows shared by more than
    * this many distinct documents are corpus boilerplate — their
    * document set is not a provenance signal (it is "everyone"), and
    * pairing them is the quadratic blow-up every pair-generating op
    * here refuses. [[dupSpans]]' `max_df` already attributes them
    * per-document with no pairing at all. */
  val SpanPairDfCap = 16L

  /** Cross-document span ATTRIBUTION pairs — the provenance companion
    * to [[dupSpans]]: not "where is this document duplicated" but
    * "which documents share this span". One row per (doc_a, doc_b,
    * shared maximal span), with the span interval in doc_a's word
    * coordinates, the number of shared window fingerprints it merged,
    * and `max_df` (how widely the widest window in the span is shared
    * corpus-wide). Curation reads it as a provenance edge list: a
    * contiguous 200-word span shared by exactly 2 documents is a
    * copy-paste event (keep one side); many small spans at df near the
    * cap are template fragments.
    *
    * Semantics, precisely: a window participates iff its fingerprint
    * occurs in [minDocs, dfCap] DISTINCT documents; per (document,
    * fingerprint) the FIRST occurrence position represents it
    * (within-doc repetition is [[repeatedNgrams]]/q89 territory, same
    * discipline as [[dupSpans]]); a pair's shared windows merge into
    * maximal spans by the q87 gaps-and-islands recurrence over doc_a's
    * positions (doc_b may carry the same content at different — even
    * non-contiguous — offsets; doc_a, the lower id, is the canonical
    * coordinate system).
    *
    * Scale design: the ONLY pair-generating step is the self-join of
    * the first-occurrence table on fingerprints that already passed
    * the `df <= dfCap` filter, so a fingerprint fans out to at most
    * C(dfCap, 2) = 120 pairs — bounded O(windows · dfCap) total,
    * never O(df²) on a hot key (the [[ngramJaccard]] df-cap
    * discipline, enforced at span granularity). Everything upstream
    * of that join is [[dupSpans]]' linear shape: one tokenize pass,
    * a df aggregate by fingerprint with map-side partials, a
    * first-occurrence aggregate on the same key. */
  def spanPairs(docs: DataFrame, n: Int = ShingleSize,
                minDocs: Long = SpanMinDocs, dfCap: Long = SpanPairDfCap,
                charCoords: Boolean = false): DataFrame = {
    require(n >= 1, s"window size must be >= 1: $n")
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
    require(dfCap >= minDocs, s"dfCap $dfCap < minDocs $minDocs")
    val win = if (charCoords) windowTableChar(docs, n) else windowTable(docs, n)
    val dfAll = win.groupBy(col("h"))
      .agg(count_distinct(col("doc_id")).as("df"))
    spanPairsFrom(win, dfAll, n, minDocs, dfCap, charCoords)
  }

  /** [[spanPairs]] from the shared window + df cores (see
    * [[dupSpansFrom]]). */
  private[scale] def spanPairsFrom(win: DataFrame, dfAll: DataFrame, n: Int,
                                   minDocs: Long, dfCap: Long,
                                   charCoords: Boolean): DataFrame = {
    val dup = dfAll.filter(col("df") >= minDocs && col("df") <= dfCap)
    // first occurrence per (doc, fingerprint); df rides along (one df
    // row per h, so max() is just a carrier, not a choice). cs/ce are
    // strictly increasing in pos, so min() selects the SAME window the
    // min(pos) does — the char interval of the first occurrence.
    val occAggs = Seq(min(col("pos")).as("pos"), max(col("df")).as("df")) ++
      (if (charCoords) Seq(min(col("cs")).as("cs"), min(col("ce")).as("ce"))
      else Nil)
    val occ = win.join(dup, Seq("h"))
      .groupBy(col("doc_id"), col("h"))
      .agg(occAggs.head, occAggs.tail: _*)
    // char coordinates report doc_a's text — the canonical (lower-id)
    // coordinate system, same as pos; doc_b may carry the shared
    // content at arbitrary, even non-contiguous, offsets
    val pairCols = Seq(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
      col("a.pos").as("pos"), col("a.df").as("df")) ++
      (if (charCoords) Seq(col("a.cs").as("cs"), col("a.ce").as("ce")) else Nil)
    val pairs = occ.as("a").join(occ.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(pairCols: _*)
    mergeSpans(pairs, n, keys = Seq("doc_a", "doc_b"), charCoords = charCoords)
  }

  /** Embedding-cosine near-dup pairs above `minCos`, bounded to ids
    * below `maxId` — the EXACT referee of the near-dup family.
    *
    * Role at 100 TB: ground truth over a bounded audit sample, never a
    * corpus pass. The production path is [[embeddingNearDupLsh]] (q69):
    * identical output contract, but candidates come only from shared
    * LSH buckets, so pair volume is Σ bucket² instead of corpus² and
    * the join is a bucket-equality shuffle, not a nested loop. THIS
    * form measures that form's recall — [[nearDupRecall]] (q127) runs
    * both on the same `maxId`-bounded sample and reports recall per
    * cosine band (the q88 pattern). `maxId` is the audit-cost dial
    * and must stay O(10⁴): the plan contains a genuine pair join on
    * purpose, which is exactly what makes it a trustworthy referee —
    * and the reason the gate role, not the corpus pass, is its job. */
  def embeddingNearDup(emb0: DataFrame, minCos: Double, maxId: Long): DataFrame = {
    val emb = Similarity.nonZeroNorm(emb0) // cosine-based board: zero-norm vectors are outside its universe (fuzz r19)
    // raw float32 pair scoring (r21): kernels widen in-register
    val e = emb.filter(col("vec_id") < maxId)
      .select(col("vec_id"), col("embedding").as("v"))
    val withNorm = e.select(col("vec_id"), col("v"), l2Norm(col("v")).as("nrm"))
    val a = withNorm.as("a"); val b = withNorm.as("b")
    a.join(b, col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (dotProduct(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cos"))
      .filter(col("cos") >= minCos)
      .select(col("vec_a"), col("vec_b"), portableRound(col("cos"), 4).as("cos"))
  }

  /** q120: duplicate-cluster size histogram — how big the mirrors are.
    * The number a dedup planner reads next to q112's removal rates:
    * a corpus of pairs (size-2 clusters) dedups cheaply; a handful of
    * thousand-document boilerplate clusters calls for the span path
    * (q87) instead. Universe = documents in at least one near-dup
    * pair (q59's node set); sizes come from the SAME connected
    * components q59 publishes, so the two boards reconcile by
    * construction. Both rollups run over the cluster table (≤ nodes
    * rows), never the corpus.
    */
  def clusterSizes(docs: DataFrame, maxDist: Int = 5): DataFrame =
    clusterSizesFrom(connectedComponents(simhashPairs(docs, maxDist = maxDist)))

  /** [[clusterSizes]] from precomputed component labels — shared-core
    * form for the gate registry (q120 reads the SAME components q59
    * publishes, by construction AND by plan). */
  def clusterSizesFrom(labels: DataFrame): DataFrame =
    labels
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))

  /** q134: corpus-level LINE dedup — the C4/RefinedWeb boilerplate
    * pass: any line occurring at least `minDupCount` times across the
    * corpus (navigation chrome, cookie banners, boilerplate headers)
    * is dropped from every document. Per doc: the line count, how many
    * line occurrences were dropped, and the md5 of the cleaned text
    * (order-preserving reassembly) — the fingerprint a downstream
    * exact-dedup pass runs on.
    *
    * Scale design: the line-frequency aggregate and the per-doc
    * regroup are inherent keyed shuffles (map-side partials make the
    * aggregate skew-safe — a hot line collapses to one row per task
    * before the exchange). The line↔count ATTACH is the skew case:
    * the line-frequency distribution is exactly Zipfian, and at 100×
    * the most common boilerplate line (or the empty line) is a single
    * join key funneling ~n_docs rows into one task if attached with a
    * plain shuffle join. The bound is code, not AQE luck: a
    * Misra-Gries sketch (the q96 machinery) nominates every line
    * whose count COULD exceed n/(capacity+1) — the MG retention
    * guarantee — their exact counts come from the counts table via a
    * capacity-bounded broadcast join, and those lines attach their
    * counts map-side (broadcast hash join, no line-keyed exchange).
    * Only the residual tail — every key provably ≤ n/(capacity+1)
    * occurrences — rides the shuffle join, so no single key can
    * exceed 1/(capacity+1) of the stream in one task. The line
    * vocabulary itself is corpus-scale and NOT broadcastable; only
    * the ≤ capacity nominated heavies are.
    *
    * The reassembly sorts WITHIN each doc's collected lines
    * (array_sort over (pos, line) structs — bounded by the doc's own
    * line count), never a global order. Determinism: the heavy/light
    * split changes JOIN ROUTING only (each line value takes exactly
    * one path and gets the same corpus-wide count either way);
    * collect_list order is partition-dependent but array_sort by
    * position canonicalizes it; md5 over the joined text is exact in
    * both engines.
    */
  def lineDedup(docs0: DataFrame, minDupCount: Long = 2L,
                heavyCapacity: Int = 4096): DataFrame =
    // the line table feeds the sketch, the counts AND the reassembly —
    // barriered (the gate registry passes the memoized shared core
    // instead, already checkpointed). Standalone callers don't read
    // the line table's `source` column, so project it away BEFORE the
    // checkpoint — no dead data in the materialized blocks.
    lineDedupFrom(lineTable(docs0).select(col("doc_id"), col("pos"),
      col("line")).coreCheckpoint(), minDupCount, heavyCapacity)

  /** The exploded (source, doc_id, pos, line) table — the shared input
    * of the line family (q134 drop pass, q163 boilerplate board,
    * q166's line arm); memoized once per batch as `gateLines`. */
  private[scale] def lineTable(docs0: DataFrame): DataFrame = {
    val docs = Layout.widen(docs0)
    // source rides along when the input carries it (the gate corpus
    // does); doc-only callers get a constant — the q134 consumer
    // never reads it
    val src = if (docs.columns.contains("source")) col("source")
              else lit("").as("source")
    docs.select(src.as("source"), col("doc_id"),
      posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
  }

  /** [[lineDedup]] from a (pre-checkpointed) line table. */
  private[scale] def lineDedupFrom(lines0: DataFrame, minDupCount: Long = 2L,
                                   heavyCapacity: Int = 4096): DataFrame = {
    val lines = lines0.select(col("doc_id"), col("pos"), col("line"))
    val counts = lines.groupBy(col("line")).agg(count(lit(1)).as("cnt"))
    // every line with count > n/(heavyCapacity+1) is in the sketch
    // (MG retention); over-nomination of light lines is harmless —
    // they just ride the broadcast path too
    val cands = lines
      .agg(graft.functions.FreqSketch.misraGries(col("line"), heavyCapacity)
        .as("cand"))
      .select(explode(col("cand")).as("line"))
    val heavyCounts = counts.join(broadcast(cands), Seq("line"))
    val lightCounts = counts.join(broadcast(cands), Seq("line"), "left_anti")
    val annotated = lines.join(broadcast(cands), Seq("line"), "left_anti")
      .join(lightCounts, Seq("line"))
      .unionByName(lines.join(broadcast(heavyCounts), Seq("line")))
    annotated
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        count(when(col("cnt") >= minDupCount, 1)).as("n_dropped"),
        md5(concat_ws("\n",
          transform(
            array_sort(collect_list(
              when(col("cnt") < minDupCount,
                struct(col("pos"), col("line"))))),
            x => x.getField("line")))).as("clean_md5"))
  }

  /** q163: per-source boilerplate board — the trafilatura-style
    * line-classification read: a line is BOILERPLATE within its source
    * when it appears in at least `minShare` of that source's documents
    * (navigation chrome, cookie banners, footers — the text that
    * repeats across pages of one site but not across sites) and is at
    * least `minLen` chars (so empty/trivial lines don't count). Per
    * source: doc count, line-occurrence volume, how many distinct
    * lines are boilerplate, their occurrence and character mass, and
    * the char share a strip pass would remove — the table that decides
    * WHICH source needs the line-strip before tokens are spent on it
    * (q134 is the corpus-wide drop pass; this localizes the signal to
    * the source that generates it).
    *
    * Scale design: ONE corpus scan and NO hot-key funnel anywhere —
    * the first aggregate is keyed by (source, line, doc_id) (all
    * three columns, so a line shared by every doc spreads across
    * tasks; its per-doc occurrence count collapses map-side), the
    * second rolls the already-distinct triples to (source, line)
    * carrying occ = Σk and df = row count with map-side partials.
    * Deliberately NOT `countDistinct`, whose one-distinct plan
    * exchanges raw rows on the (source, line) group key alone and
    * would funnel the hot line's whole occurrence stream into one
    * task. The per-source doc counts are an n_sources-bounded
    * broadcast, and the rollup is one aggregate onto ≤ n_sources
    * rows. */
  def boilerplateBySource(docs0: DataFrame, minShare: Double = BoilerplateMinShare,
                          minLen: Int = BoilerplateMinLen): DataFrame = {
    val docs = Layout.widen(docs0)
    boilerplateFrom(lineTable(docs),
      docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs")),
      minShare, minLen)
  }

  /** [[boilerplateBySource]] from the shared line table + per-source
    * doc counts — shared-core form for the gate registry. */
  private[scale] def boilerplateFrom(lines: DataFrame, perSource: DataFrame,
                                     minShare: Double,
                                     minLen: Int): DataFrame = {
    def r6(c: Column): Column = floor(c * 1000000d + 0.5d) / 1000000d
    val perLine = lines
      .select(col("source"), col("doc_id"), col("line"))
      .groupBy(col("source"), col("line"), col("doc_id"))
      .agg(count(lit(1)).as("k"))
      .groupBy(col("source"), col("line"))
      .agg(sum(col("k")).as("occ"), count(lit(1)).as("df"))
    perLine
      .join(broadcast(perSource), Seq("source"))
      .select(col("source"),
        (col("df") >= ceil(lit(minShare) * col("n_docs")) &&
          length(col("line")) >= minLen).as("is_b"),
        col("occ"),
        (col("occ") * length(col("line")).cast("long")).as("chars"))
      .groupBy(col("source"))
      .agg(sum(col("occ")).as("n_lines"),
        count(when(col("is_b"), 1)).as("boiler_lines"),
        coalesce(sum(when(col("is_b"), col("occ"))), lit(0L)).as("boiler_occ"),
        sum(col("chars")).as("chars_total"),
        coalesce(sum(when(col("is_b"), col("chars"))), lit(0L))
          .as("chars_boiler"))
      .join(broadcast(perSource), Seq("source"))
      .select(col("source"), col("n_docs"), col("n_lines"),
        col("boiler_lines"), col("boiler_occ"), col("chars_total"),
        col("chars_boiler"),
        when(col("chars_total") > 0,
          r6(col("chars_boiler").cast("double") / col("chars_total")))
          .as("boiler_share"))
  }

  /** q166: dedup ROI board — the three dedup methods the engine ships
    * priced on ONE comparable axis so the curator knows where dedup
    * budget goes BEFORE running the expensive pass: `exact` (md5
    * whole-doc groups — q24's policy), `near_dup` (simhash connected
    * components, least-ID representative kept — the component-label
    * convention q59/q120 publish; q68's production kept-set picks the
    * min-HASH member instead, so the two kept SETS differ on ties of
    * policy, while the REMOVED COUNTS here are identical — one doc
    * survives per component either way) and `line` (every occurrence
    * of a corpus-duplicated line drops — q134's policy). Per method: documents affected, removable token mass
    * (the q35 `ceil(chars/4)` estimate — doc-level for the whole-doc
    * methods, line-level for the line method) and the share of corpus
    * tokens. q112 prices the near-dup method alone in depth; this
    * board ranks the three against each other.
    *
    * Scale design: rides the SHARED simhash component core (the
    * near-dup chain is paid once per batch); everything else is
    * corpus-pass aggregates — the exact arm is one md5-keyed hash
    * aggregate, the near arm is one doc_id equi-join plus a 1-row
    * aggregate (removed = members whose id ≠ their component label —
    * the least-id convention makes the representative test scan-side,
    * no per-cluster window or second join), the line arm reuses
    * q163's stacked-aggregate shape (no one-distinct funnel) and its
    * token mass comes from the line-count table ALONE, never a rejoin
    * to the corpus. The affected-docs join for the line arm is keyed
    * by line with ≤ n_docs rows per key (distinct pairs); at 100× the
    * q134 MG heavy-line broadcast is the documented mitigation. */
  def dedupRoi(docs0: DataFrame, minDupCount: Long = 2L): DataFrame = {
    val docs = Layout.widen(docs0)
    dedupRoiFrom(docs,
      connectedComponents(simhashPairs(docs, maxDist = GateMaxDist)),
      lineTable(docs), minDupCount)
  }

  /** [[dedupRoi]] from precomputed near-dup components and the shared
    * line table — shared-core form for the gate registry (reads the
    * SAME components as q59/q68/q120/q135 and the SAME line table as
    * q134/q163). */
  private[scale] def dedupRoiFrom(docs0: DataFrame, comps: DataFrame,
                                  lineTab: DataFrame,
                                  minDupCount: Long = 2L): DataFrame = {
    def r6(c: Column): Column = floor(c * 1000000d + 0.5d) / 1000000d
    val docs = Layout.widen(docs0)
    // (doc_id, fp, toks) feeds the total, exact and near arms
    val base = docs.select(col("doc_id"), md5(col("text")).as("fp"),
      ceil(length(col("text")).cast("double") / 4d).cast("long").as("toks"))
      .coreCheckpoint()
    val total = base.agg(sum(col("toks")).as("tot"))
    val exact = base.groupBy(col("fp"))
      .agg(count(lit(1)).as("cnt"), min(col("toks")).as("t"))
      .filter(col("cnt") > 1)
      .agg(coalesce(sum(col("cnt") - 1), lit(0L)).as("n_docs"),
        coalesce(sum((col("cnt") - 1) * col("t")), lit(0L)).as("toks_removed"))
    val near = comps
      .join(base.select(col("doc_id"), col("toks")), Seq("doc_id"))
      .agg(count(when(col("doc_id") =!= col("cluster_id"), 1)).as("n_docs"),
        coalesce(sum(when(col("doc_id") =!= col("cluster_id"), col("toks"))),
          lit(0L)).as("toks_removed"))
    val pairs = lineTab
      .select(col("doc_id"), col("line"))
      .groupBy(col("line"), col("doc_id")).agg(count(lit(1)).as("k"))
    val dupLines = pairs.groupBy(col("line"))
      .agg(sum(col("k")).as("cnt"))
      .filter(col("cnt") >= minDupCount)
      .coreCheckpoint() // feeds the token mass AND the affected-doc join
    val lineToks = dupLines
      .agg(coalesce(sum(col("cnt") *
        ceil(length(col("line")).cast("double") / 4d).cast("long")),
        lit(0L)).as("toks_removed"))
    val lineDocs = pairs.join(dupLines.select(col("line")), Seq("line"))
      .select(col("doc_id")).distinct()
      .agg(count(lit(1)).as("n_docs"))
    def shape(df: DataFrame, name: String): DataFrame =
      df.crossJoin(broadcast(total))
        .select(lit(name).as("method"), col("n_docs"), col("toks_removed"),
          r6(col("toks_removed").cast("double") / col("tot")).as("share"))
    shape(exact, "exact")
      .unionByName(shape(near, "near_dup"))
      .unionByName(shape(lineDocs.crossJoin(lineToks), "line"))
  }

  /** q169: per-source survival ledger — the end-of-pipeline table a
    * curation owner sends to the mixture meeting: for every ingest
    * source, how many documents and tokens enter, how many the
    * per-row curation battery drops (q70's keep flag), how many the
    * near-dup kept-set drops among gate survivors (q68's production
    * policy — the min-hash representative survives), and what
    * actually remains to train on, with the kept-token share. q150
    * reads stage-by-stage survival corpus-wide; this attributes the
    * final outcome per source, which is what moves mixture weights.
    *
    * Attribution is sequential: a doc failing the gate counts as
    * `gate` even when it is also a near-duplicate (the cheap per-row
    * battery runs first in a real pipeline; dedup never sees the doc).
    *
    * Scale design: two doc_id equi-joins (unique keys) over scan-side
    * projections, one source-keyed aggregate with map-side partials —
    * the expensive inputs (the gate's tokenize chain, the component
    * kept-set) are the SAME shared cores the q70/q68 boards publish. */
  def survivalLedger(docs0: DataFrame, gate: DataFrame,
                     kept: DataFrame): DataFrame = {
    def r6(c: Column): Column = floor(c * 1000000d + 0.5d) / 1000000d
    val base = Layout.widen(docs0).select(col("doc_id"), col("source"),
      ceil(length(col("text")).cast("double") / 4d).cast("long").as("toks"))
    base
      .join(gate.select(col("doc_id"), col("keep")), Seq("doc_id"))
      .join(kept.select(col("doc_id"), lit(1).as("in_kept")),
        Seq("doc_id"), "left")
      .select(col("source"), col("toks"),
        when(!col("keep"), lit("gate"))
          .when(col("in_kept").isNull, lit("dup"))
          .otherwise(lit("kept")).as("status"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_toks"),
        count(when(col("status") === "gate", 1)).as("gate_docs"),
        coalesce(sum(when(col("status") === "gate", col("toks"))), lit(0L))
          .as("gate_toks"),
        count(when(col("status") === "dup", 1)).as("dup_docs"),
        coalesce(sum(when(col("status") === "dup", col("toks"))), lit(0L))
          .as("dup_toks"),
        count(when(col("status") === "kept", 1)).as("kept_docs"),
        coalesce(sum(when(col("status") === "kept", col("toks"))), lit(0L))
          .as("kept_toks"))
      .withColumn("kept_share",
        when(col("n_toks") > 0,
          r6(col("kept_toks").cast("double") / col("n_toks"))))
  }

  /** q135: quality-aware dedup representatives — per near-dup cluster
    * (q59's components), the member the curator SHOULD keep: highest
    * q34 quality, doc_id ASC ties. The production kept-set
    * ([[dedupCorpus]]) keeps the min-id member; this board reports
    * what the quality-aware policy keeps instead and flags every
    * cluster where the two differ — "how much quality does the cheap
    * policy leave on the table", the report that decides whether the
    * extra quality join is worth shipping.
    *
    * Scale design: one doc_id equi-join (components × quality, both
    * corpus-keyed), then ONE hash-aggregate per cluster — the argmax
    * rides `max(struct(quality, -doc_id))` (field-lexicographic max =
    * quality DESC, doc_id ASC), so ties are total, partials are
    * map-side, and no per-cluster window sorts the membership. */
  def bestRep(comps: DataFrame, scored: DataFrame): DataFrame =
    comps.join(scored.select(col("doc_id"), col("quality")), Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        min(col("doc_id")).as("min_id"),
        max(struct(col("quality"), (-col("doc_id")).as("negid"))).as("m"))
      .select(col("cluster_id"), col("n_members"),
        (-col("m.negid")).cast("long").as("rep_id"),
        col("m.quality").as("rep_quality"), col("min_id"),
        ((-col("m.negid")) =!= col("min_id")).as("rep_differs"))

  /** q146: split-leakage audit — near-duplicate pairs whose endpoints
    * landed in DIFFERENT splits of the q140 assignment: every such
    * pair is an eval leak (a test document with a near-copy in train
    * inflates the benchmark — the split-hygiene failure the
    * contamination family (q71/q93) checks against EXTERNAL eval
    * suites, here turned on the pipeline's OWN held-out split). Per
    * unordered split combination: pair count and the closest distance;
    * the release read is "off-diagonal rows must be empty" — [[clusterSplit]]
    * (q147) is the assignment that makes them so by construction.
    *
    * Scale design: ZERO joins — the q140 assignment is a pure function
    * of the id (consistent hashing), so both endpoints' splits are
    * scan-side projections over the shared pair core, followed by one
    * hash aggregate onto ≤ (k·(k+1)/2) split-combination rows. */
  def splitLeakage(pairs: DataFrame,
                   splits: Seq[(String, Double)] = Curation.DefaultSplits): DataFrame = {
    val sa = Curation.splitExpr(col("doc_a"), splits)
    val sb = Curation.splitExpr(col("doc_b"), splits)
    pairs
      .select(least(sa, sb).as("split_a"), greatest(sa, sb).as("split_b"),
        col("dist"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"), min(col("dist")).as("min_dist"))
  }

  /** q160: cross-source near-dup matrix — who is mirroring whom: the
    * near-dup pair graph rolled up by (source, source), with the pair
    * count, closest distance, mean distance and each cell's share of
    * all near-dup pairs. A heavy OFF-diagonal cell names a pair of
    * ingest sources republishing each other's content (the crawl-two-
    * mirrors failure); a heavy diagonal cell names the source that
    * duplicates itself. This is the table that decides WHERE dedup
    * budget goes — q112 prices the corpus-wide impact, this localizes
    * it to source pairs.
    *
    * Scale design: rides the shared simhash pair core (never all
    * pairs); two doc_id equi-joins attach sources (unique keys — no
    * skew), the matrix aggregate is keyed by at most n_sources² cells
    * with map-side partials, and the share denominator is the
    * documented 1-row broadcast cross join. The cell key is
    * (least, greatest) so the undirected matrix never double-counts. */
  def sourcePairMatrix(pairs: DataFrame, docs: DataFrame): DataFrame = {
    def r6(c: Column): Column = floor(c * 1000000d + 0.5d) / 1000000d
    val src = docs.select(col("doc_id"), col("source"))
    val cells = pairs
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")),
        Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")),
        Seq("doc_b"))
      .groupBy(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"), min(col("dist")).as("min_dist"),
        sum(col("dist")).as("sum_dist"))
    val total = cells.agg(sum(col("n_pairs")).as("total"))
    cells.crossJoin(broadcast(total))
      .select(col("source_a"), col("source_b"), col("n_pairs"),
        col("min_dist"),
        r6(col("sum_dist").cast("double") / col("n_pairs")).as("mean_dist"),
        r6(col("n_pairs").cast("double") / col("total")).as("share"))
  }

  /** q147: cluster-coherent split — the q146 fix: a document inherits
    * the split of its near-dup component's representative (q59's
    * min-id label) instead of its own hash, so every component lands
    * WHOLE in one split and cross-split near-dup leakage is zero by
    * construction (DedupSpec certifies it on the gate fixture).
    * Singletons — the corpus bulk — have no component row and keep the
    * plain q140 assignment (rep = self), preserving consistent
    * hashing's minimal-churn property: re-running with a grown corpus
    * only moves documents whose component membership changed.
    *
    * Scale design: one left equi-join of ids against the component
    * table (both sides hash-partitioned on doc_id; the component table
    * holds only docs that appear in some near-dup pair — a small
    * fraction of the corpus), then a scan-side split projection from
    * the rep id. No skew: doc_id is unique on both sides. */
  def clusterSplit(docs: DataFrame, comps: DataFrame,
                   splits: Seq[(String, Double)] = Curation.DefaultSplits): DataFrame =
    docs.select(col("doc_id"))
      .join(comps, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("rep_id"))
      .withColumn("split", Curation.splitExpr(col("rep_id"), splits))

  // ---- driver-gate query registry ----

  /** Batch-start core warmups ([[graft.SparkEntry.coreWarmups]]):
    * heavy-first thunks a concurrent batch front-loads so these
    * builds start at t=0 at cluster width instead of whenever the
    * first consumer query gets a thread. Forcing a memo cell is
    * idempotent and result-neutral — it is the exact build the first
    * consumer would trigger anyway. */
  private[graft] def coreWarmups(s: SparkSession,
                                 d: String): Seq[(String, () => Unit)] = Seq(
    "dedup:pairs" -> (() => { gatePairs(s, d); () }),
    "dedup:comps" -> (() => { gateComps(s, d); () }),
    "dedup:sigs" -> (() => { gateSigs(s, d); () }),
    "dedup:bands" -> (() => { gateBands(s, d); () }),
    "dedup:shingles" -> (() => { gateShingles(s, d); () }),
    "dedup:span-df" -> (() => { gateSpanDf(s, d); () }),
    "dedup:lines" -> (() => { gateLines(s, d); () }),
    "dedup:kept" -> (() => { gateKept(s, d); () }),
    "dedup:keyed" -> (() => { gateEmbedKeyed(s, d); () }),
    // the frozen-half component labels q174 and q175 both read —
    // built off the pair core, so it chains behind dedup:pairs and
    // otherwise lands on the batch tail
    "dedup:fcomps" -> (() => { gateFrozenComps(s, d); () }))

  /** Shared gate cores ([[graft.Shared]]): the maxDist=5 simhash pair
    * graph feeds TEN boards (q28/q59/q80/q82–q86/q68/q112/q120), its
    * connected components four of them, and the kept-set two — a
    * batch run builds each ONCE and every consumer reads the
    * checkpointed core. Results are unchanged (same rows); only the
    * per-consumer rebuild of the dominant chain is gone. */
  private def gatePairs(s: SparkSession, d: String): DataFrame =
    graft.Shared.memo(s, s"dedup:simhash-pairs5:$d")(
      simhashPairs(T.documents(s, d), maxDist = GateMaxDist))

  private def gateComps(s: SparkSession, d: String): DataFrame =
    graft.Shared.memo(s, s"dedup:simhash-comps5:$d")(
      connectedComponents(gatePairs(s, d)))

  /** The primary embeddings table's celled keyed projection — the
    * spread-corpus twin of the media chain's `mm:keyed` core, read by
    * q181's pair join and q182's pricing rollups (one scan + plan-
    * constant key kernels, checkpointed once a batch). */
  private def gateEmbedKeyed(s: SparkSession, d: String): DataFrame =
    graft.Shared.memo(s, s"dedup:embed-keyed:$d") {
      val emb = T.embeddings(s, d)
      // seeds from the norm-filtered set — the oracle's `cents` reads
      // the keyed CTE's `bk`, which carries the same `nrm > 0` bound
      celledKeyedVectors(emb,
        Similarity.seedCentroidList(Similarity.nonZeroNorm(emb),
          Similarity.IvfCells))
    }

  /** Components over the FROZEN half of the pair graph (the labels the
    * frozen index published) — shared by q174 and q175. */
  private def gateFrozenComps(s: SparkSession, d: String): DataFrame =
    graft.Shared.memo(s, s"dedup:frozen-comps5:$IncrementalBoundary:$d")(
      connectedComponents(
        gatePairs(s, d).filter(col("doc_b") < IncrementalBoundary)))

  private def gateKept(s: SparkSession, d: String): DataFrame =
    graft.Shared.memo(s, s"dedup:kept5:$d")(
      dedupCorpusFrom(T.documents(s, d), gateComps(s, d)))

  /** The memoized exploded-line table (source, doc_id, pos, line) —
    * one corpus text-split pass per batch for the whole line family. */
  private def gateLines(s: SparkSession, d: String): DataFrame =
    graft.Shared.memo(s, s"dedup:lines:$d")(lineTable(T.documents(s, d)))

  /** Shared shingle core: ONE tokenize + distinct-shingle pass feeds
    * the whole n-gram family (q25 Jaccard, q71/q93 decontamination,
    * q76 repeated n-grams, q101/q102/q111 contamination rollups). */
  private def gateShingles(s: SparkSession, d: String): DataFrame =
    graft.Shared.memo(s, s"dedup:shingles4:$d")(
      shingleTable(T.documents(s, d)))

  /** Shared words core: ONE tokenize pass feeds the whole MinHash
    * family — the band table (q26), the band sweep's five arms (q156)
    * and the sketch audit (q103) each used to tokenize the corpus for
    * themselves (the round-13 ANN-clique finding: three of the
    * batch's slowest boards serialized on redundant core builds). */
  private def gateWa(s: SparkSession, d: String): DataFrame =
    graft.Shared.memo(s, s"dedup:words:$d")(
      wordArrays(T.documents(s, d)))

  /** Shared MinHash signature table (q156 + q103) over [[gateWa]]. */
  private def gateSigs(s: SparkSession, d: String): DataFrame =
    graft.Shared.memo(s, s"dedup:sigs:$d")(sigTableFrom(gateWa(s, d)))

  /** Shared MinHash band core: one kernel pass over [[gateWa]] feeds
    * the band board (q26) and the incremental-dedup gate (q77). */
  private def gateBands(s: SparkSession, d: String): DataFrame =
    graft.Shared.memo(s, s"dedup:bands:$d")(
      minhashBandsFrom(gateWa(s, d)))

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q120_cluster_sizes" -> ((s, d) => clusterSizesFrom(gateComps(s, d))),
    // C4-style corpus line dedup: per-doc boilerplate-drop fingerprint
    // the line family (q134/q163/q166's line arm) reads ONE memoized
    // exploded-line table per batch
    "q134_line_dedup" -> ((s, d) => lineDedupFrom(gateLines(s, d))),
    // per-source boilerplate-line mass (skew-safe dual aggregate)
    "q163_boilerplate" -> ((s, d) => boilerplateFrom(gateLines(s, d),
      T.documents(s, d).groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs")), minShare = BoilerplateMinShare, minLen = BoilerplateMinLen)),
    // the three dedup methods priced on removable token mass
    // (rides the shared component core + the shared line table)
    "q166_dedup_roi" -> ((s, d) =>
      dedupRoiFrom(T.documents(s, d), gateComps(s, d), gateLines(s, d))),
    // the per-source gate/dup/kept attribution ledger (q70's flags ×
    // q68's kept set, both from shared cores)
    "q169_survival_ledger" -> ((s, d) => survivalLedger(T.documents(s, d),
      TextAnalysis.gateCuration(s, d), gateKept(s, d))),
    // quality-aware representative per q59 cluster vs the min-id policy
    "q135_best_rep" -> ((s, d) =>
      bestRep(gateComps(s, d), TextAnalysis.gateScored(s, d))),
    // near-dup pairs crossing the q140 split boundary (eval leakage)
    "q146_split_leakage" -> ((s, d) => splitLeakage(gatePairs(s, d))),
    // the fix: components inherit their representative's split
    "q147_cluster_split" -> ((s, d) =>
      clusterSplit(T.documents(s, d), gateComps(s, d))),
    "q24_dedup_exact" -> ((s, d) => exactDedup(T.documents(s, d))),
    "q25_ngram_jaccard" -> ((s, d) =>
      ngramJaccardFrom(gateShingles(s, d))),
    "q26_minhash_bands" -> ((s, d) => gateBands(s, d)),
    // the S-curve board behind the q26 banding choice
    "q156_band_sweep" -> ((s, d) =>
      bandSweepFrom(gateWa(s, d), gateSigs(s, d))),
    // the numChunks tuning frontier for the simhash blocking (q156's
    // sibling board): occupancy, emissions and verify precision per
    // table-count configuration; n_true constant = completeness
    "q172_chunk_sweep" -> ((s, d) =>
      chunkSweep(T.documents(s, d), sampleRate = ChunkSweepSampleRate)),
    // who mirrors whom: the pair graph rolled up by source pair
    "q160_source_matrix" -> ((s, d) =>
      sourcePairMatrix(gatePairs(s, d), T.documents(s, d))),
    "q27_simhash" -> ((s, d) => simhash(T.documents(s, d))),
    // pigeonhole-blocked pair generation (6 chunks ⇒ complete for
    // dist ≤ 5); the oracle states the same result as an exact O(n²)
    // hamming join — tractable at sf0.01, which is exactly what makes
    // it a full correctness check of the blocked plan
    "q28_simhash_pairs" -> ((s, d) => gatePairs(s, d)),
    // pairs → clusters: components of the simhash near-dup graph
    "q59_dedup_clusters" -> ((s, d) => gateComps(s, d)),
    // pairs → communities: synchronous LPA over the same pair graph
    "q80_label_prop" -> ((s, d) => labelPropagation(gatePairs(s, d))),
    // pairs → per-node triangle count + local clustering coefficient
    "q82_triangle_stats" -> ((s, d) => triangleStats(gatePairs(s, d))),
    // pairs → integer-exact PageRank centrality (boilerplate hubs)
    "q83_pagerank" -> ((s, d) => pageRank(gatePairs(s, d))),
    // pairs × sources → which sources near-duplicate each other
    "q84_source_contamination" -> ((s, d) =>
      sourceContaminationFrom(T.documents(s, d), gatePairs(s, d))),
    // strength-weighted communities: closer pairs vote harder
    "q85_weighted_lp" -> ((s, d) =>
      labelPropagationWeighted(
        gatePairs(s, d).withColumn("w", lit(6) - col("dist")), "w")),
    // one-row dup-graph health dashboard (graph twin of q78)
    "q86_graph_summary" -> ((s, d) => graphSummaryFrom(gatePairs(s, d))),
    "q29_embed_neardup" -> ((s, d) => embeddingNearDup(T.embeddings(s, d), EmbedNearDupMinCos, EmbedNearDupMaxId)),
    // the composed end-to-end verb: pairs → clusters → keep one → drop
    "q68_dedup_corpus" -> ((s, d) => gateKept(s, d)),
    // what dedup removed, per source (docs + estimated tokens + rate)
    "q112_dedup_impact" -> ((s, d) =>
      dedupImpactFrom(T.documents(s, d), gateKept(s, d))),
    // full-range LSH near-dup gate (no id cap): the scale path q29 demos
    "q69_neardup_lsh" -> ((s, d) => embeddingNearDupLsh(T.embeddings(s, d), LshNearDupMinCos)),
    // recall-by-cos-band certification of the q69 gate vs the q29 referee
    "q127_neardup_recall" -> ((s, d) => nearDupRecall(T.embeddings(s, d))),
    // the celled chain on the SPREAD corpus (q176's operator over the
    // primary embeddings table): candidates a strict subset of q69's
    // — the scaladoc's "the fixed bucket still splits" claim certified
    // where it was only prose before; q182 prices the blocking and
    // q183 certifies the recall point vs the exact q29 referee
    "q181_embed_neardup_celled" -> ((s, d) =>
      embeddingNearDupCelledFrom(gateEmbedKeyed(s, d), LshNearDupMinCos,
        inputMaterialized = true)),
    "q182_embed_celled_blocking" -> ((s, d) =>
      celledBlockingBoard(gateEmbedKeyed(s, d))),
    "q183_embed_celled_recall" -> ((s, d) =>
      celledNearDupRecall(T.embeddings(s, d))),
    // cheap-vs-expensive signal calibration: exact Jaccard stats per
    // simhash distance bucket — rides the pair + shingle cores
    "q143_signal_calibration" -> ((s, d) =>
      signalCalibrationFrom(gatePairs(s, d), gateShingles(s, d))),
    // SemDeDup: cluster-bounded semantic near-dup pruning, one
    // representative (lowest vec_id) per within-cluster component
    "q95_semdedup" -> ((s, d) => semDedup(T.embeddings(s, d))),
    // eval-set n-gram decontamination over the documents corpus
    "q71_decontaminate" -> ((s, d) =>
      decontaminateFrom(gateShingles(s, d), evalMaxId = EvalMaxId)),
    // benchmark-suite decontamination: Bloom prefilter + exact shuffle
    // confirm; result asserted identical to the exact q71 form
    "q93_decontaminate_bloom" -> ((s, d) =>
      decontaminateBloomFrom(gateShingles(s, d), evalMaxId = EvalMaxId, fpp = 0.01)),
    // which ingest source leaks eval data: q71 rolled up by source
    "q101_contamination_by_source" -> ((s, d) =>
      contaminationBySourceFrom(T.documents(s, d), gateShingles(s, d),
        evalMaxId = EvalMaxId)),
    // which eval suite leaked: per-suite contamination breakdown
    "q102_decontaminate_by_suite" -> ((s, d) =>
      decontaminateBySuiteFrom(T.documents(s, d), gateShingles(s, d),
        evalMaxId = EvalMaxId)),
    // the sparse (suite × source) leak matrix — the actionable pair
    "q111_contamination_matrix" -> ((s, d) =>
      contaminationMatrixFrom(T.documents(s, d), gateShingles(s, d),
        evalMaxId = EvalMaxId)),
    // certify-the-sketch for MinHash: signature-agreement estimate vs
    // exact Jaccard on every LSH candidate pair, error gated
    "q103_minhash_audit" -> ((s, d) =>
      minhashAuditFrom(gateWa(s, d), gateSigs(s, d), tol = MinhashAuditTol)),
    // memorization risk: shingles shared across >3 documents
    "q76_repeated_ngrams" -> ((s, d) =>
      repeatedNgramsFrom(gateShingles(s, d), threshold = RepeatedNgramsMinDf)),
    // incremental ingest: batch (id >= 400) deduped against corpus (< 400)
    "q77_incremental_dedup" -> ((s, d) =>
      incrementalDedupAtFrom(T.documents(s, d), gateBands(s, d),
        boundary = IncrementalBoundary)
        .select(col("doc_id"), col("lang"))),
    // incremental NEAR-dup: new batch vs the frozen simhash index,
    // riding the memoized full-corpus pair core
    "q174_incremental_neardup" -> ((s, d) =>
      incrementalNearDup(T.documents(s, d), gatePairs(s, d),
        frozenComps = Some(gateFrozenComps(s, d)))),
    // the registry-update classification: frozen labels vs the full
    // recompute, all from memoized cores
    "q175_registry_update" -> ((s, d) =>
      registryUpdate(T.documents(s, d), gatePairs(s, d),
        gateComps(s, d), gateFrozenComps(s, d))),
    // substring-level dedup: maximal duplicated word-spans per
    // document. All four span boards read the SAME shared window +
    // df cores (one tokenize pass, one df aggregate per batch); the
    // word-coordinate forms just never project the char columns
    "q87_dup_spans" -> ((s, d) =>
      dupSpansFrom(gateSpanWin(s, d), gateSpanDf(s, d), ShingleSize,
        minDocs = SpanMinDocs, charCoords = false)),
    // span provenance: which document PAIRS share each maximal span
    "q90_span_pairs" -> ((s, d) =>
      spanPairsFrom(gateSpanWin(s, d), gateSpanDf(s, d), ShingleSize,
        minDocs = SpanMinDocs, dfCap = SpanPairDfCap, charCoords = false)),
    // q87/q90 with CHARACTER coordinates: spans additionally report
    // (char_start, char_len) — 0-based codepoint offsets into
    // lower(text) — from the same tokenize pass (no new shuffle)
    "q91_char_spans" -> ((s, d) =>
      dupSpansFrom(gateSpanWin(s, d), gateSpanDf(s, d), ShingleSize,
        minDocs = SpanMinDocs, charCoords = true)),
    "q92_char_span_pairs" -> ((s, d) =>
      spanPairsFrom(gateSpanWin(s, d), gateSpanDf(s, d), ShingleSize,
        minDocs = SpanMinDocs, dfCap = SpanPairDfCap, charCoords = true))
  )

  /** Shared span cores: the char-coordinate window table (a superset
    * of the word one) and its unfiltered per-fingerprint df counts. */
  private def gateSpanWin(s: SparkSession, d: String): DataFrame =
    graft.Shared.memo(s, s"dedup:span-win4:$d")(
      windowTableChar(T.documents(s, d), ShingleSize))

  private def gateSpanDf(s: SparkSession, d: String): DataFrame =
    graft.Shared.memo(s, s"dedup:span-df4:$d")(
      gateSpanWin(s, d).groupBy(col("h"))
        .agg(count_distinct(col("doc_id")).as("df")))

  private val normSql =
    "list_filter(string_split_regex(trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')), ' +'), w -> w <> '')"

  /** The span/shingle families' oracle-side window geometry — GENERATED
    * from [[ShingleSize]] (the GateMaxDist shared-constant discipline):
    * the [[ShingleSize]]-word concat, the 1-indexed window-start range
    * bound (len − (n−2) exclusive ⇒ len − n + 1 windows), and the
    * min-length guard. A literal `4` here and a [[ShingleSize]] there
    * is exactly the drift the discipline exists to prevent. */
  private val spanConcatSql: String =
    (0 until ShingleSize)
      .map(k => if (k == 0) "ws[i]" else s"ws[i+$k]")
      .mkString(" || ' ' || ")
  private val spanIdxRangeSql: String =
    s"unnest(range(1, len(ws)-${ShingleSize - 2}))"
  private val spanLenGuardSql: String = s"len(ws) >= $ShingleSize"

  private val shingleCte =
    s"""ws AS (SELECT doc_id, $normSql AS ws FROM documents),
       |idx AS (SELECT doc_id, ws, $spanIdxRangeSql AS i
       |        FROM ws WHERE $spanLenGuardSql),
       |sh AS (SELECT DISTINCT doc_id,
       |         $spanConcatSql AS sh
       |       FROM idx)""".stripMargin

  /** Shared tokenize→simhash→blocked-pair CTE chain (Hamming ≤ 5) for
    * every oracle that starts from the near-dup pair graph — one
    * definition keeps the six graph oracles in lockstep with each
    * other and with the Spark-side [[simhashPairs]]. */
  /** Shared closure CTEs over `p` (the [[simhashPairCte]] pair list):
    * undirected edges, transitive reach, and the LEAST-labeled
    * component per node (`cl(doc_id, cluster_id)`) — q59's clustering,
    * reused verbatim by q120 so the two boards cannot drift. */
  private val ccClosureCte =
    """e AS (SELECT doc_a AS a, doc_b AS b FROM p
      |      UNION SELECT doc_b, doc_a FROM p),
      |reach(a, b) AS (SELECT a, b FROM e
      |  UNION SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a),
      |cl AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
      |       FROM reach GROUP BY a)""".stripMargin

  /** The tokenize→simhash chain (`sh(doc_id, simhash)`) over any
    * (doc_id, text) relation — shared by [[simhashPairCte]] and the
    * q172 sweep oracle (which points it at a hash-sampled CTE). */
  private[scale] def simhashCteOver(table: String): String =
    s"""sw AS (
       |  SELECT doc_id, unnest(list_filter(string_split_regex(trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')), ' +'), x -> x <> '')) AS w
       |  FROM $table),
       |h AS (SELECT doc_id, CAST('0x' || substr(md5(w),1,15) AS BIGINT) AS h FROM sw),
       |bits AS (
       |  SELECT doc_id, b,
       |    SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
       |  FROM h, range(0, 60) t(b) GROUP BY doc_id, b),
       |sh AS (SELECT doc_id,
       |  CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS BIGINT) AS simhash
       |  FROM bits GROUP BY doc_id)""".stripMargin

  private[scale] val simhashCte = simhashCteOver("documents")

  private[scale] val simhashPairCte =
    s"""$simhashCte,
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS dist
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.simhash, b.simhash)) <= $GateMaxDist)""".stripMargin

  /** The q172 oracle: the same chunk geometry (via [[chunkBounds]] /
    * [[chunkSubsets]]) restated as packed-key bit arithmetic, one
    * blocked table + occupancy rollup + distinct-candidate count per
    * configuration. */
  private lazy val chunkSweepSql: String = {
    val maxDist = ChunkSweepMaxDist
    val configs = ChunkSweepConfigs
    def kvSql(c: Int, ss: Seq[Int]): String =
      ss.foldLeft("CAST(0 AS BIGINT)") { (acc, ci) =>
        val (start, width) = chunkBounds(c, ci)
        s"((($acc) << $width) | ((simhash >> $start) & ${(1L << width) - 1}))"
      }
    val blocks = configs.map { c =>
      val packs = chunkSubsets(maxDist, c).zipWithIndex.map { case (ss, t) =>
        s"struct_pack(t := $t, kv := ${kvSql(c, ss)})"
      }.mkString(",\n|    ")
      s"""b$c AS (SELECT doc_id, simhash, u.t AS t, u.kv AS kv FROM sh,
         |  LATERAL unnest([$packs]) AS l$c(u)),
         |o$c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
         |  CAST(SUM(df) AS BIGINT) AS n_rows,
         |  CAST(MAX(df) AS BIGINT) AS max_df,
         |  CAST(SUM((df * (df - 1)) // 2) AS BIGINT) AS emissions
         |  FROM (SELECT t, kv, COUNT(*) AS df FROM b$c GROUP BY 1, 2)),
         |c$c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
         |  CAST(COUNT(CASE WHEN dist <= $maxDist THEN 1 END) AS BIGINT)
         |    AS n_true
         |  FROM (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
         |      bit_count(xor(a.simhash, b.simhash)) AS dist
         |    FROM b$c a JOIN b$c b
         |      ON a.t = b.t AND a.kv = b.kv AND a.doc_id < b.doc_id))"""
        .stripMargin
    }
    val unions = configs.map { c =>
      val nt = chunkSubsets(maxDist, c).size
      s"""SELECT $c AS n_chunks, $nt AS n_tables, n_rows, n_buckets, max_df,
         |  emissions, n_candidates, n_true,
         |  CASE WHEN n_candidates > 0 THEN FLOOR(CAST(n_true AS DOUBLE)
         |    / n_candidates * 1000000 + 0.5) / 1000000 END AS true_rate
         |FROM o$c, c$c""".stripMargin
    }
    s"""WITH dsamp AS (SELECT doc_id, text FROM documents
       |  WHERE ${Curation.splitUSql("doc_id")} < $ChunkSweepSampleRate),
       |${simhashCteOver("dsamp")},
       |${blocks.mkString(",\n")}
       |${unions.mkString("\nUNION ALL\n")}""".stripMargin
  }

  private val sigSelect = (0 until NumMinhashes)
    .map(i => s"MIN(md5('$i|' || sh)) AS m$i").mkString(", ")

  private val bandCase = (0 until NumBands).map { b =>
    val parts = (0 until NumMinhashes / NumBands).map(k => s"m${b * (NumMinhashes / NumBands) + k}")
    s"WHEN ${b} THEN md5(${parts.mkString(" || ")})"
  }.mkString(" ")

  private val matchSum = (0 until NumMinhashes)
    .map(i => s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END")
    .mkString(" + ")

  /** [[bandCase]] generalized to any band count dividing the
    * signature — band j hashes components j·r … j·r+r−1. */
  private def bandCaseFor(nb: Int): String = {
    val r = NumMinhashes / nb
    (0 until nb).map { j =>
      val parts = (0 until r).map(k => s"m${j * r + k}")
      s"WHEN $j THEN md5(${parts.mkString(" || ")})"
    }.mkString(" ")
  }

  /** The q156 oracle: one banding + candidate + match-count block per
    * configuration, built by the same loop as the Spark arms. */
  private lazy val bandSweepSql: String = {
    val configs = Seq(16, 8, 4, 2, 1)
    val blocks = configs.map { b =>
      s"""band$b AS (SELECT doc_id, CASE b ${bandCaseFor(b)} END AS bv, b
         |  FROM sig, range(0, $b) t(b)),
         |cand$b AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM band$b a JOIN band$b b
         |    ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id),
         |m$b AS (SELECT ($matchSum) AS matches
         |  FROM cand$b c JOIN sig a ON a.doc_id = c.doc_a
         |  JOIN sig b ON b.doc_id = c.doc_b),
         |s$b AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(COALESCE(SUM(matches), 0) AS BIGINT) AS sum_matches,
         |  CAST(COUNT(CASE WHEN matches * 2 < $NumMinhashes THEN 1 END)
         |    AS BIGINT) AS n_weak
         |  FROM m$b)""".stripMargin
    }
    val unions = configs.map { b =>
      val r = NumMinhashes / b
      s"""SELECT $b AS n_bands, $r AS rows_per_band,
         |  CAST(${bandThreshold(b, r)} AS DOUBLE) AS threshold, n_pairs,
         |  CASE WHEN n_pairs > 0 THEN
         |    FLOOR(CAST(sum_matches AS DOUBLE) / (n_pairs * $NumMinhashes)
         |      * 1000000 + 0.5) / 1000000 END AS mean_est_jaccard,
         |  n_weak
         |FROM s$b""".stripMargin
    }
    s"""WITH $shingleCte,
       |sig AS (SELECT doc_id, $sigSelect FROM sh GROUP BY doc_id),
       |${blocks.mkString(",\n")}
       |${unions.mkString("\nUNION ALL\n")}""".stripMargin
  }

  override val oracle: Map[String, String] = Map(
    "q24_dedup_exact" ->
      """SELECT md5(text) AS fp, CAST(MIN(doc_id) AS BIGINT) AS keep_id,
        |  COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "q25_ngram_jaccard" ->
      s"""WITH $shingleCte,
         |shf AS (SELECT * FROM sh WHERE sh NOT IN (
         |  SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) > $MaxShingleDf)),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM shf GROUP BY doc_id),
         |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
         |       FROM shf a JOIN shf b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2)
         |SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter,
         |  FLOOR((CAST(inter AS DOUBLE)/(sa.n + sb.n - inter)) * 10000.0 + 0.5) / 10000.0 AS jaccard
         |FROM pr
         |JOIN sz sa ON sa.doc_id = doc_a
         |JOIN sz sb ON sb.doc_id = doc_b""".stripMargin,
    "q156_band_sweep" -> bandSweepSql,
    "q172_chunk_sweep" -> chunkSweepSql,
    // the shared pair CTE with sources attached; (least, greatest)
    // folds the matrix undirected, share over the 1-row total
    "q160_source_matrix" ->
      s"""WITH $simhashPairCte,
         |j AS (SELECT LEAST(da.source, db.source) AS source_a,
         |             GREATEST(da.source, db.source) AS source_b, dist
         |  FROM p JOIN documents da ON da.doc_id = p.doc_a
         |  JOIN documents db ON db.doc_id = p.doc_b),
         |g AS (SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(MIN(dist) AS INTEGER) AS min_dist,
         |  CAST(SUM(dist) AS BIGINT) AS sum_dist
         |  FROM j GROUP BY 1, 2),
         |t AS (SELECT CAST(SUM(n_pairs) AS BIGINT) AS total FROM g)
         |SELECT source_a, source_b, n_pairs, min_dist,
         |  FLOOR(CAST(sum_dist AS DOUBLE) / n_pairs * 1000000 + 0.5)
         |    / 1000000 AS mean_dist,
         |  FLOOR(CAST(n_pairs AS DOUBLE) / total * 1000000 + 0.5) / 1000000
         |    AS share
         |FROM g, t""".stripMargin,
    "q26_minhash_bands" ->
      s"""WITH $shingleCte,
         |sig AS (SELECT doc_id, $sigSelect FROM sh GROUP BY doc_id)
         |SELECT doc_id, CAST(b AS INTEGER) AS b,
         |  CASE b $bandCase END AS bv
         |FROM sig, range(0, $NumBands) t(b)""".stripMargin,
    "q27_simhash" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')), ' +'), x -> x <> '')) AS w
        |  FROM documents),
        |h AS (SELECT doc_id, CAST('0x' || substr(md5(w),1,15) AS BIGINT) AS h FROM w),
        |bits AS (
        |  SELECT doc_id, b,
        |    SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM h, range(0, 60) t(b) GROUP BY doc_id, b)
        |SELECT doc_id,
        |  CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS BIGINT) AS simhash
        |FROM bits GROUP BY doc_id""".stripMargin,
    "q28_simhash_pairs" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ',  'g'),' +',' ','g')), ' +'), x -> x <> '')) AS w
        |  FROM documents),
        |h AS (SELECT doc_id, CAST('0x' || substr(md5(w),1,15) AS BIGINT) AS h FROM w),
        |bits AS (
        |  SELECT doc_id, b,
        |    SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM h, range(0, 60) t(b) GROUP BY doc_id, b),
        |sh AS (SELECT doc_id,
        |  CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS BIGINT) AS simhash
        |  FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS dist
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 5""".stripMargin,
    "q59_dedup_clusters" ->
      s"""WITH RECURSIVE $simhashPairCte,
         |$ccClosureCte
         |SELECT doc_id, cluster_id FROM cl""".stripMargin,
    // both endpoints' splits re-derived scan-side from the pair list
    // (the same md5-high-60-bits uniform and threshold CASE as q140)
    "q146_split_leakage" -> {
      val ca = Curation.splitCaseSql("ua")
      val cb = Curation.splitCaseSql("ub")
      s"""WITH $simhashPairCte,
         |s AS (SELECT ${Curation.splitUSql("doc_a")} AS ua,
         |             ${Curation.splitUSql("doc_b")} AS ub, dist FROM p),
         |a AS (SELECT $ca AS sa, $cb AS sb, dist FROM s)
         |SELECT LEAST(sa, sb) AS split_a, GREATEST(sa, sb) AS split_b,
         |  COUNT(*) AS n_pairs, CAST(MIN(dist) AS INTEGER) AS min_dist
         |FROM a GROUP BY 1, 2""".stripMargin
    },
    // q59's components; members take the rep's q140 split, singletons
    // their own (COALESCE to self)
    "q147_cluster_split" ->
      s"""WITH RECURSIVE $simhashPairCte,
         |$ccClosureCte,
         |r AS (SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS rep_id
         |      FROM documents d LEFT JOIN cl USING (doc_id)),
         |uu AS (SELECT doc_id, rep_id,
         |       ${Curation.splitUSql("rep_id")} AS u FROM r)
         |SELECT doc_id, CAST(rep_id AS BIGINT) AS rep_id,
         |  ${Curation.splitCaseSql("u")} AS split
         |FROM uu""".stripMargin,
    // the q28 pair chain × q25's df-capped shingle universe, exact
    // Jaccard routed through the candidate pairs; bucket mean on the
    // DECIMAL(18,6) exact sum with one floor-r6'd division (shingle
    // CTEs renamed — `sh` is the simhash table in the shared chain)
    "q143_signal_calibration" ->
      s"""WITH $simhashPairCte,
         |wsx AS (SELECT doc_id, $normSql AS ws FROM documents),
         |sidx AS (SELECT doc_id, ws, $spanIdxRangeSql AS i
         |         FROM wsx WHERE $spanLenGuardSql),
         |shg AS (SELECT DISTINCT doc_id,
         |          $spanConcatSql AS g
         |        FROM sidx),
         |shf AS (SELECT * FROM shg WHERE g NOT IN (
         |  SELECT g FROM shg GROUP BY g HAVING COUNT(*) > $MaxShingleDf)),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM shf GROUP BY doc_id),
         |itr AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS inter
         |        FROM p JOIN shf a ON a.doc_id = p.doc_a
         |               JOIN shf b ON b.doc_id = p.doc_b AND b.g = a.g
         |        GROUP BY 1, 2),
         |pj AS (SELECT p.dist,
         |    COALESCE(FLOOR((CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter)) * 10000.0 + 0.5) / 10000.0,
         |      0.0) AS j
         |  FROM p
         |  LEFT JOIN itr i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
         |  LEFT JOIN sz sa ON sa.doc_id = p.doc_a
         |  LEFT JOIN sz sb ON sb.doc_id = p.doc_b)
         |SELECT CAST(dist AS INTEGER) AS dist, COUNT(*) AS n_pairs,
         |  FLOOR(CAST(SUM(CAST(j AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
         |    * 1000000 + 0.5) / 1000000 AS mean_jaccard,
         |  MIN(j) AS min_jaccard, MAX(j) AS max_jaccard
         |FROM pj GROUP BY dist""".stripMargin,
    // line table → corpus line counts → filtered order-preserving
    // reassembly; the outer COALESCE guards the all-dropped doc
    // (DuckDB: a FILTER'd list over zero rows is NULL, and
    // array_to_string of an empty list is ALSO NULL — Spark's
    // concat_ws over an empty array is '')
    "q134_line_dedup" ->
      """WITH d AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
        |l AS (SELECT doc_id, i, ls[i] AS ln
        |      FROM d, unnest(range(1, len(ls) + 1)) t(i)),
        |c AS (SELECT ln, COUNT(*) AS cnt FROM l GROUP BY ln),
        |j AS (SELECT l.doc_id, l.i, l.ln, c.cnt FROM l JOIN c USING (ln))
        |SELECT doc_id, COUNT(*) AS n_lines,
        |  COUNT(CASE WHEN cnt >= 2 THEN 1 END) AS n_dropped,
        |  md5(COALESCE(array_to_string(
        |    list(ln ORDER BY i) FILTER (WHERE cnt < 2),
        |    chr(10)), '')) AS clean_md5
        |FROM j GROUP BY doc_id""".stripMargin,
    // q70's keep (the shared curation CTEs) × q68's min-hash kept set
    // (the same reps/losers fragment), attributed sequentially and
    // rolled up per source
    "q169_survival_ledger" ->
      s"""WITH RECURSIVE $simhashPairCte,
         |e AS (SELECT doc_a AS a, doc_b AS b FROM p
         |      UNION SELECT doc_b, doc_a FROM p),
         |reach(a, b) AS (SELECT a, b FROM e
         |  UNION SELECT rr.a, e2.b FROM reach rr JOIN e e2 ON rr.b = e2.a),
         |lab AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
         |        FROM reach GROUP BY a),
         |reps AS (SELECT doc_id FROM (
         |    SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY cluster_id
         |      ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,15) AS BIGINT) ASC,
         |        doc_id ASC) AS rn
         |    FROM lab) WHERE rn = 1),
         |losers AS (SELECT doc_id FROM lab
         |           WHERE doc_id NOT IN (SELECT doc_id FROM reps)),
         |${TextAnalysis.curationCtes},
         |gate AS (${TextAnalysis.curationSelect}),
         |base AS (SELECT d.doc_id, d.source,
         |    CAST(CEIL(CAST(len(d.text) AS DOUBLE) / 4) AS BIGINT) AS toks,
         |    ga.keep,
         |    d.doc_id IN (SELECT doc_id FROM losers) AS is_loser
         |  FROM documents d JOIN gate ga ON d.doc_id = ga.doc_id),
         |lst AS (SELECT source, toks,
         |    CASE WHEN NOT keep THEN 'gate'
         |         WHEN is_loser THEN 'dup' ELSE 'kept' END AS status
         |  FROM base)
         |SELECT source,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(toks) AS BIGINT) AS n_toks,
         |  CAST(COUNT(CASE WHEN status = 'gate' THEN 1 END) AS BIGINT)
         |    AS gate_docs,
         |  CAST(COALESCE(SUM(CASE WHEN status = 'gate' THEN toks END), 0)
         |    AS BIGINT) AS gate_toks,
         |  CAST(COUNT(CASE WHEN status = 'dup' THEN 1 END) AS BIGINT)
         |    AS dup_docs,
         |  CAST(COALESCE(SUM(CASE WHEN status = 'dup' THEN toks END), 0)
         |    AS BIGINT) AS dup_toks,
         |  CAST(COUNT(CASE WHEN status = 'kept' THEN 1 END) AS BIGINT)
         |    AS kept_docs,
         |  CAST(COALESCE(SUM(CASE WHEN status = 'kept' THEN toks END), 0)
         |    AS BIGINT) AS kept_toks,
         |  CASE WHEN SUM(toks) > 0 THEN
         |    FLOOR(CAST(COALESCE(SUM(CASE WHEN status = 'kept' THEN toks END),
         |      0) AS DOUBLE) / SUM(toks) * 1000000.0 + 0.5) / 1000000.0
         |  END AS kept_share
         |FROM lst GROUP BY source""".stripMargin,
    // three dedup methods on one axis: exact md5 groups, the recursive
    // CC closure (same cl as q59/q120/q135), line counts; token proxy
    // = ceil(chars/4) everywhere
    "q166_dedup_roi" ->
      s"""WITH RECURSIVE $simhashPairCte,
         |$ccClosureCte,
         |tk AS (SELECT doc_id, md5(text) AS fp,
         |         CAST(CEIL(CAST(len(text) AS DOUBLE) / 4) AS BIGINT) AS toks
         |       FROM documents),
         |tot AS (SELECT CAST(SUM(toks) AS BIGINT) AS tot FROM tk),
         |ex AS (SELECT fp, COUNT(*) AS cnt, MIN(toks) AS t FROM tk
         |       GROUP BY 1 HAVING COUNT(*) > 1),
         |exa AS (SELECT CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT) AS n_docs,
         |  CAST(COALESCE(SUM((cnt - 1) * t), 0) AS BIGINT) AS toks_removed
         |  FROM ex),
         |nra AS (SELECT
         |  CAST(COUNT(CASE WHEN cl.doc_id <> cl.cluster_id THEN 1 END)
         |    AS BIGINT) AS n_docs,
         |  CAST(COALESCE(SUM(CASE WHEN cl.doc_id <> cl.cluster_id
         |    THEN tk.toks END), 0) AS BIGINT) AS toks_removed
         |  FROM cl JOIN tk ON cl.doc_id = tk.doc_id),
         |l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line
         |      FROM documents),
         |t1 AS (SELECT line, doc_id FROM l GROUP BY 1, 2),
         |t2 AS (SELECT line, COUNT(*) AS cnt FROM l GROUP BY 1
         |       HAVING COUNT(*) >= 2),
         |lt AS (SELECT CAST(COALESCE(SUM(cnt *
         |    CAST(CEIL(CAST(len(line) AS DOUBLE) / 4) AS BIGINT)), 0)
         |    AS BIGINT) AS toks_removed FROM t2),
         |ld AS (SELECT CAST(COUNT(DISTINCT t1.doc_id) AS BIGINT) AS n_docs
         |       FROM t1 JOIN t2 USING (line)),
         |u AS (SELECT 'exact' AS method, n_docs, toks_removed FROM exa
         |  UNION ALL SELECT 'near_dup', n_docs, toks_removed FROM nra
         |  UNION ALL SELECT 'line', ld.n_docs, lt.toks_removed FROM ld, lt)
         |SELECT method, n_docs, toks_removed,
         |  FLOOR(CAST(toks_removed AS DOUBLE) / tot * 1000000.0 + 0.5)
         |    / 1000000.0 AS share
         |FROM u, tot""".stripMargin,
    // boilerplate thresholds interpolated from the shared knobs
    "q163_boilerplate" ->
      s"""WITH l AS (SELECT source, doc_id,
        |        unnest(string_split(text, chr(10))) AS line FROM documents),
        |pl AS (SELECT source, line, CAST(COUNT(*) AS BIGINT) AS occ,
        |         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        |       FROM l GROUP BY 1, 2),
        |ds AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        |       FROM documents GROUP BY 1),
        |f AS (SELECT pl.source,
        |        (pl.df >= CEIL($BoilerplateMinShare * ds.n_docs) AND len(pl.line) >= $BoilerplateMinLen) AS is_b,
        |        pl.occ, CAST(pl.occ * len(pl.line) AS BIGINT) AS chars
        |      FROM pl JOIN ds USING (source)),
        |g AS (SELECT source,
        |        CAST(SUM(occ) AS BIGINT) AS n_lines,
        |        CAST(COUNT(CASE WHEN is_b THEN 1 END) AS BIGINT)
        |          AS boiler_lines,
        |        CAST(COALESCE(SUM(CASE WHEN is_b THEN occ END), 0) AS BIGINT)
        |          AS boiler_occ,
        |        CAST(SUM(chars) AS BIGINT) AS chars_total,
        |        CAST(COALESCE(SUM(CASE WHEN is_b THEN chars END), 0) AS BIGINT)
        |          AS chars_boiler
        |      FROM f GROUP BY 1)
        |SELECT g.source, ds.n_docs, g.n_lines, g.boiler_lines, g.boiler_occ,
        |  g.chars_total, g.chars_boiler,
        |  CASE WHEN g.chars_total > 0 THEN
        |    FLOOR(CAST(g.chars_boiler AS DOUBLE) / g.chars_total
        |      * 1000000.0 + 0.5) / 1000000.0 END AS boiler_share
        |FROM g JOIN ds USING (source)""".stripMargin,
    // q59's components × q34's quality; the per-cluster argmax is the
    // rn=1 row of (quality DESC, doc_id ASC)
    "q135_best_rep" ->
      s"""WITH RECURSIVE $simhashPairCte,
         |$ccClosureCte,
         |qw AS (SELECT doc_id, text, $normSql AS ws FROM documents),
         |qm AS (SELECT doc_id,
         |  CAST(len(ws) AS INTEGER) AS n_words,
         |  GREATEST(len(ws), 1) AS nw,
         |  GREATEST(len(text), 1) AS nc,
         |  len(list_filter(ws, x -> list_contains(${TextAnalysis.stopListSql}, x))) AS stop_hits,
         |  len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct
         |FROM qw),
         |q AS (SELECT doc_id, ${TextAnalysis.qualitySql} AS quality FROM qm),
         |j AS (SELECT cl.cluster_id, cl.doc_id, q.quality
         |      FROM cl JOIN q USING (doc_id)),
         |r AS (SELECT cluster_id, doc_id, quality,
         |  ROW_NUMBER() OVER (PARTITION BY cluster_id
         |    ORDER BY quality DESC, doc_id ASC) AS rn FROM j),
         |g AS (SELECT cluster_id, COUNT(*) AS n_members,
         |      MIN(doc_id) AS min_id FROM j GROUP BY 1)
         |SELECT g.cluster_id, g.n_members, r.doc_id AS rep_id,
         |  r.quality AS rep_quality, g.min_id,
         |  (r.doc_id <> g.min_id) AS rep_differs
         |FROM g JOIN r ON r.cluster_id = g.cluster_id AND r.rn = 1""".stripMargin,
    "q120_cluster_sizes" ->
      s"""WITH RECURSIVE $simhashPairCte,
         |$ccClosureCte,
         |s AS (SELECT cluster_id, COUNT(*) AS sz FROM cl GROUP BY 1)
         |SELECT sz AS cluster_size, COUNT(*) AS n_clusters
         |FROM s GROUP BY 1""".stripMargin,
    "q80_label_prop" ->
      s"""WITH RECURSIVE $simhashPairCte,
        |nodes AS (SELECT DISTINCT node FROM (
        |  SELECT doc_a AS node FROM p UNION ALL SELECT doc_b FROM p)),
        |e AS (SELECT DISTINCT a, b FROM (
        |  SELECT doc_a AS a, doc_b AS b FROM p
        |  UNION ALL SELECT doc_b, doc_a FROM p
        |  UNION ALL SELECT node, node FROM nodes)),
        |lp(it, node, label) AS (
        |  SELECT 0, node, node FROM nodes
        |  UNION ALL
        |  SELECT it + 1, node, label FROM (
        |    SELECT it, node, label,
        |      ROW_NUMBER() OVER (PARTITION BY it, node
        |                         ORDER BY c DESC, label ASC) AS rn
        |    FROM (SELECT l.it AS it, e.b AS node, l.label AS label,
        |            COUNT(*) AS c
        |          FROM lp l JOIN e ON l.node = e.a
        |          WHERE l.it < 4
        |          GROUP BY l.it, e.b, l.label))
        |  WHERE rn = 1)
        |SELECT CAST(node AS BIGINT) AS doc_id,
        |  CAST(label AS BIGINT) AS community_id
        |FROM lp WHERE it = 4""".stripMargin,
    "q86_graph_summary" ->
      s"""WITH $simhashPairCte,
        |sym AS (SELECT DISTINCT a, b FROM (
        |  SELECT doc_a AS a, doc_b AS b FROM p
        |  UNION ALL SELECT doc_b, doc_a FROM p)),
        |deg AS (SELECT a AS node, COUNT(*) AS deg FROM sym GROUP BY a),
        |tri AS (SELECT e1.doc_a AS x, e1.doc_b AS y, e2.doc_b AS z
        |        FROM p e1 JOIN p e2 ON e2.doc_a = e1.doc_b
        |        JOIN p e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
        |tn AS (SELECT node, COUNT(*) AS n_tri FROM (
        |    SELECT x AS node FROM tri
        |    UNION ALL SELECT y FROM tri
        |    UNION ALL SELECT z FROM tri)
        |  GROUP BY node),
        |st AS (SELECT d.node, d.deg, COALESCE(t.n_tri, 0) AS n_tri,
        |    CASE WHEN d.deg >= 2
        |      THEN FLOOR((CAST(2 AS DOUBLE) * COALESCE(t.n_tri, 0)
        |                 / (d.deg * (d.deg - 1))) * 10000.0 + 0.5) / 10000.0
        |      ELSE CAST(0 AS DOUBLE) END AS clustering
        |  FROM deg d LEFT JOIN tn t ON t.node = d.node)
        |SELECT COUNT(*) AS n_nodes,
        |  CAST(SUM(deg) // 2 AS BIGINT) AS n_edges,
        |  CAST(SUM(n_tri) // 3 AS BIGINT) AS n_triangles,
        |  MAX(deg) AS max_deg,
        |  FLOOR((CAST(SUM(CAST(clustering AS DECIMAL(18,6))) AS DOUBLE)
        |        / COUNT(*)) * 10000.0 + 0.5) / 10000.0 AS mean_clustering
        |FROM st""".stripMargin,
    // same recurrence as q80 with SUM(weight) ballots, weight = 6−dist
    "q85_weighted_lp" ->
      s"""WITH RECURSIVE $simhashPairCte,
        |pw AS (SELECT doc_a, doc_b, 6 - dist AS w FROM p),
        |symw AS (SELECT a, b, MAX(w) AS w FROM (
        |  SELECT doc_a AS a, doc_b AS b, w FROM pw
        |  UNION ALL SELECT doc_b, doc_a, w FROM pw) GROUP BY a, b),
        |nodes AS (SELECT a AS node, MAX(w) AS mw FROM symw GROUP BY a),
        |e AS (SELECT a, b, w FROM symw
        |      UNION ALL SELECT node, node, mw FROM nodes),
        |lp(it, node, label) AS (
        |  SELECT 0, node, node FROM nodes
        |  UNION ALL
        |  SELECT it + 1, node, label FROM (
        |    SELECT it, node, label,
        |      ROW_NUMBER() OVER (PARTITION BY it, node
        |                         ORDER BY c DESC, label ASC) AS rn
        |    FROM (SELECT l.it AS it, e.b AS node, l.label AS label,
        |            SUM(e.w) AS c
        |          FROM lp l JOIN e ON l.node = e.a
        |          WHERE l.it < 4
        |          GROUP BY l.it, e.b, l.label))
        |  WHERE rn = 1)
        |SELECT CAST(node AS BIGINT) AS doc_id,
        |  CAST(label AS BIGINT) AS community_id
        |FROM lp WHERE it = 4""".stripMargin,
    "q84_source_contamination" ->
      s"""WITH $simhashPairCte
        |SELECT LEAST(da.source, db.source) AS src_a,
        |  GREATEST(da.source, db.source) AS src_b,
        |  COUNT(*) AS n_pairs
        |FROM p
        |JOIN documents da ON da.doc_id = p.doc_a
        |JOIN documents db ON db.doc_id = p.doc_b
        |GROUP BY 1, 2""".stripMargin,
    // integer micro-unit arithmetic makes PageRank cross-engine exact:
    // BIGINT ranks, truncating div, associative integer sums — the
    // outer CAST collapses DuckDB's HUGEINT SUM back to BIGINT
    "q83_pagerank" ->
      s"""WITH RECURSIVE $simhashPairCte,
        |sym AS (SELECT DISTINCT a, b FROM (
        |  SELECT doc_a AS a, doc_b AS b FROM p
        |  UNION ALL SELECT doc_b, doc_a FROM p)),
        |deg AS (SELECT a AS node, COUNT(*) AS deg FROM sym GROUP BY a),
        |pr(it, node, rank) AS (
        |  SELECT 0, node, CAST(1000000 AS BIGINT) FROM deg
        |  UNION ALL
        |  SELECT it + 1, node,
        |    CAST(150000 + (85 * contrib) // 100 AS BIGINT) FROM (
        |    SELECT r.it AS it, s.b AS node, SUM(r.rank // d.deg) AS contrib
        |    FROM pr r JOIN sym s ON r.node = s.a JOIN deg d ON d.node = r.node
        |    WHERE r.it < 4
        |    GROUP BY r.it, s.b))
        |SELECT CAST(node AS BIGINT) AS doc_id, rank
        |FROM pr WHERE it = 4""".stripMargin,
    // id-ordered 3-way self-join enumerates each triangle once; the
    // Spark side's degree-ordered orientation yields the same set
    "q82_triangle_stats" ->
      s"""WITH $simhashPairCte,
        |sym AS (SELECT DISTINCT a, b FROM (
        |  SELECT doc_a AS a, doc_b AS b FROM p
        |  UNION ALL SELECT doc_b, doc_a FROM p)),
        |deg AS (SELECT a AS node, COUNT(*) AS deg FROM sym GROUP BY a),
        |tri AS (SELECT e1.doc_a AS x, e1.doc_b AS y, e2.doc_b AS z
        |        FROM p e1 JOIN p e2 ON e2.doc_a = e1.doc_b
        |        JOIN p e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
        |tn AS (SELECT node, COUNT(*) AS n_tri FROM (
        |    SELECT x AS node FROM tri
        |    UNION ALL SELECT y FROM tri
        |    UNION ALL SELECT z FROM tri)
        |  GROUP BY node)
        |SELECT d.node AS doc_id, d.deg AS deg,
        |  CAST(COALESCE(t.n_tri, 0) AS BIGINT) AS n_tri,
        |  CASE WHEN d.deg >= 2
        |    THEN FLOOR((CAST(2 AS DOUBLE) * COALESCE(t.n_tri, 0)
        |               / (d.deg * (d.deg - 1))) * 10000.0 + 0.5) / 10000.0
        |    ELSE CAST(0 AS DOUBLE) END AS clustering
        |FROM deg d LEFT JOIN tn t ON t.node = d.node""".stripMargin,
    "q77_incremental_dedup" ->
      s"""WITH $shingleCte,
         |sig AS (SELECT doc_id, $sigSelect FROM sh GROUP BY doc_id),
         |bands AS (SELECT doc_id, CAST(b AS INTEGER) AS b,
         |  CASE b $bandCase END AS bv
         |  FROM sig, range(0, $NumBands) t(b)),
         |dup AS (SELECT DISTINCT n.doc_id FROM bands n JOIN bands c
         |        ON n.b = c.b AND n.bv = c.bv
         |        AND n.doc_id >= $IncrementalBoundary
         |        AND c.doc_id < $IncrementalBoundary)
         |SELECT doc_id, lang FROM documents
         |WHERE doc_id >= $IncrementalBoundary
         |  AND doc_id NOT IN (SELECT doc_id FROM dup)""".stripMargin,
    // incremental near-dup: frozen-frozen pairs close into the q59
    // clustering, cross-boundary pairs attach the frozen labels, all
    // from the SAME shared pair CTE as the other graph oracles
    "q174_incremental_neardup" ->
      s"""WITH RECURSIVE $simhashPairCte,
         |fp AS (SELECT doc_a, doc_b FROM p
         |       WHERE doc_b < $IncrementalBoundary),
         |e AS (SELECT doc_a AS a, doc_b AS b FROM fp
         |      UNION SELECT doc_b, doc_a FROM fp),
         |reach(a, b) AS (SELECT a, b FROM e
         |  UNION SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a),
         |cl AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
         |       FROM reach GROUP BY a),
         |cm AS (SELECT doc_a, doc_b FROM p
         |       WHERE doc_a < $IncrementalBoundary
         |         AND doc_b >= $IncrementalBoundary),
         |m AS (SELECT cm.doc_b AS doc_id,
         |        CAST(COUNT(*) AS BIGINT) AS n_matches,
         |        CAST(COUNT(DISTINCT COALESCE(cl.cluster_id, cm.doc_a))
         |          AS BIGINT) AS n_clusters,
         |        MIN(COALESCE(cl.cluster_id, cm.doc_a)) AS cluster
         |      FROM cm LEFT JOIN cl ON cl.doc_id = cm.doc_a GROUP BY 1)
         |SELECT d.doc_id, m.doc_id IS NOT NULL AS matched,
         |  COALESCE(m.n_matches, 0) AS n_matches,
         |  COALESCE(m.n_clusters, 0) AS n_clusters, m.cluster
         |FROM documents d LEFT JOIN m USING (doc_id)
         |WHERE d.doc_id >= $IncrementalBoundary""".stripMargin,
    // registry update: BOTH closures (frozen-only and full) from the
    // shared pair CTE, then the per-doc classification
    "q175_registry_update" ->
      s"""WITH RECURSIVE $simhashPairCte,
         |fp AS (SELECT doc_a, doc_b FROM p
         |       WHERE doc_b < $IncrementalBoundary),
         |e AS (SELECT doc_a AS a, doc_b AS b FROM fp
         |      UNION SELECT doc_b, doc_a FROM fp),
         |reach(a, b) AS (SELECT a, b FROM e
         |  UNION SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a),
         |cl AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
         |       FROM reach GROUP BY a),
         |ef AS (SELECT doc_a AS a, doc_b AS b FROM p
         |       UNION SELECT doc_b, doc_a FROM p),
         |reachf(a, b) AS (SELECT a, b FROM ef
         |  UNION SELECT r.a, x.b FROM reachf r JOIN ef x ON r.b = x.a),
         |clf AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
         |        FROM reachf GROUP BY a),
         |cn AS (SELECT DISTINCT doc_b AS doc_id FROM p
         |       WHERE doc_a < $IncrementalBoundary
         |         AND doc_b >= $IncrementalBoundary)
         |SELECT d.doc_id,
         |  d.doc_id >= $IncrementalBoundary AS is_new,
         |  CASE WHEN d.doc_id < $IncrementalBoundary
         |       THEN COALESCE(cl.cluster_id, d.doc_id) END AS old_cluster,
         |  COALESCE(clf.cluster_id, d.doc_id) AS new_cluster,
         |  CASE WHEN d.doc_id < $IncrementalBoundary THEN
         |    CASE WHEN COALESCE(cl.cluster_id, d.doc_id)
         |              = COALESCE(clf.cluster_id, d.doc_id)
         |         THEN 'stable' ELSE 'relabeled' END
         |  ELSE CASE WHEN cn.doc_id IS NOT NULL THEN 'joined'
         |            WHEN clf.cluster_id IS NULL THEN 'new_singleton'
         |            ELSE 'new_cluster' END END AS status
         |FROM documents d
         |LEFT JOIN cl ON cl.doc_id = d.doc_id
         |LEFT JOIN clf ON clf.doc_id = d.doc_id
         |LEFT JOIN cn ON cn.doc_id = d.doc_id""".stripMargin,
    "q76_repeated_ngrams" ->
      s"""WITH $shingleCte,
         |cnt AS (SELECT sh AS g, COUNT(*) AS c FROM sh GROUP BY sh),
         |hot AS (SELECT g FROM cnt WHERE c > $RepeatedNgramsMinDf),
         |st AS (SELECT s.doc_id, COUNT(*) AS n_shingles, COUNT(h.g) AS n_hot
         |       FROM sh s LEFT JOIN hot h ON h.g = s.sh
         |       GROUP BY s.doc_id)
         |SELECT doc_id, n_shingles, n_hot,
         |  FLOOR((CAST(n_hot AS DOUBLE) / n_shingles) * 10000.0 + 0.5) / 10000.0 AS hot_frac,
         |  (n_hot > 0) AS flagged
         |FROM st""".stripMargin,
    // q71's CTEs verbatim, rolled up by the corpus doc's source
    "q101_contamination_by_source" ->
      s"""WITH $shingleCte,
         |ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id < $EvalMaxId),
         |corpus AS (SELECT doc_id, sh FROM sh WHERE doc_id >= $EvalMaxId),
         |st AS (SELECT c.doc_id, COUNT(*) AS n_shingles,
         |         COUNT(e.sh) AS n_overlap
         |       FROM corpus c LEFT JOIN ev e ON e.sh = c.sh
         |       GROUP BY c.doc_id)
         |SELECT d.source, COUNT(*) AS n_docs,
         |  COUNT(CASE WHEN st.n_overlap >= 1 THEN 1 END) AS n_contaminated,
         |  CAST(SUM(st.n_overlap) AS BIGINT) AS n_overlap,
         |  FLOOR((CAST(COUNT(CASE WHEN st.n_overlap >= 1 THEN 1 END) AS DOUBLE)
         |        / COUNT(*)) * 10000.0 + 0.5) / 10000.0 AS contamination_rate
         |FROM st JOIN documents d USING (doc_id)
         |GROUP BY d.source""".stripMargin,
    // MinHash audit: q26's sig/band CTEs + candidate pair join; est is
    // matches/16 (exact in binary), exact Jaccard over uncapped
    // shingle sets; identical IEEE trees both engines
    "q103_minhash_audit" ->
      s"""WITH $shingleCte,
         |sig AS (SELECT doc_id, $sigSelect FROM sh GROUP BY doc_id),
         |bands AS (SELECT doc_id, b, CASE b $bandCase END AS bv
         |          FROM sig, range(0, $NumBands) t(b)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM bands a JOIN bands b
         |         ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |i AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
         |      FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a
         |      JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
         |      GROUP BY c.doc_a, c.doc_b),
         |m AS (SELECT i.doc_a, i.doc_b, i.inter, sa.n AS na, sb.n AS nb,
         |        ($matchSum) AS matches
         |      FROM i JOIN sz sa ON sa.doc_id = i.doc_a
         |      JOIN sz sb ON sb.doc_id = i.doc_b
         |      JOIN sig a ON a.doc_id = i.doc_a
         |      JOIN sig b ON b.doc_id = i.doc_b)
         |SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter,
         |  CAST(matches AS DOUBLE) / 16 AS est,
         |  FLOOR((CAST(inter AS DOUBLE) / (na + nb - inter)) * 10000.0 + 0.5) / 10000.0 AS jaccard,
         |  FLOOR((ABS(CAST(matches AS DOUBLE) / 16
         |        - CAST(inter AS DOUBLE) / (na + nb - inter))) * 10000.0 + 0.5) / 10000.0 AS err,
         |  (ABS(CAST(matches AS DOUBLE) / 16
         |       - CAST(inter AS DOUBLE) / (na + nb - inter)) <= $MinhashAuditTol)
         |    AS within_tol
         |FROM m""".stripMargin,
    // q102's CTEs up to the per-(suite, doc) rollup, then the corpus
    // source attach and the (suite, source) cell aggregate
    "q111_contamination_matrix" ->
      s"""WITH $shingleCte,
         |suites AS (SELECT doc_id, source AS suite FROM documents
         |           WHERE doc_id < $EvalMaxId),
         |ev AS (SELECT DISTINCT u.suite, s.sh
         |       FROM sh s JOIN suites u USING (doc_id)),
         |corpus AS (SELECT doc_id, sh FROM sh WHERE doc_id >= $EvalMaxId),
         |hits AS (SELECT suite, doc_id, COUNT(*) AS n_overlap
         |         FROM corpus c JOIN ev e ON e.sh = c.sh
         |         GROUP BY suite, doc_id)
         |SELECT h.suite, d.source, COUNT(*) AS n_docs_hit,
         |  CAST(SUM(h.n_overlap) AS BIGINT) AS n_overlap
         |FROM hits h JOIN documents d USING (doc_id)
         |GROUP BY h.suite, d.source""".stripMargin,
    // q71's shingle CTEs with the eval side tagged by its doc's source
    // (= suite); zero-hit suites re-enter via the catalog left join
    "q102_decontaminate_by_suite" ->
      s"""WITH $shingleCte,
         |suites AS (SELECT doc_id, source AS suite FROM documents
         |           WHERE doc_id < $EvalMaxId),
         |ev AS (SELECT DISTINCT u.suite, s.sh
         |       FROM sh s JOIN suites u USING (doc_id)),
         |sst AS (SELECT u.suite, COUNT(*) AS n_eval_docs FROM suites u
         |        GROUP BY u.suite),
         |est AS (SELECT suite, COUNT(*) AS n_eval_shingles FROM ev
         |        GROUP BY suite),
         |corpus AS (SELECT doc_id, sh FROM sh WHERE doc_id >= $EvalMaxId),
         |uni AS (SELECT COUNT(DISTINCT doc_id) AS n_corpus_docs FROM corpus),
         |hits AS (SELECT suite, doc_id, COUNT(*) AS n_overlap
         |         FROM corpus c JOIN ev e ON e.sh = c.sh
         |         GROUP BY suite, doc_id),
         |per AS (SELECT suite, COUNT(*) AS n_docs_hit,
         |          CAST(SUM(n_overlap) AS BIGINT) AS n_overlap
         |        FROM hits GROUP BY suite)
         |SELECT sst.suite, sst.n_eval_docs,
         |  COALESCE(est.n_eval_shingles, 0) AS n_eval_shingles,
         |  COALESCE(per.n_docs_hit, 0) AS n_docs_hit,
         |  COALESCE(per.n_overlap, 0) AS n_overlap,
         |  ${portableRoundSql(
              "CAST(COALESCE(per.n_docs_hit, 0) AS DOUBLE) / uni.n_corpus_docs",
              4)} AS hit_rate
         |FROM sst LEFT JOIN est USING (suite)
         |LEFT JOIN per USING (suite), uni""".stripMargin,
    "q71_decontaminate" ->
      s"""WITH $shingleCte,
         |ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id < $EvalMaxId),
         |corpus AS (SELECT doc_id, sh FROM sh WHERE doc_id >= $EvalMaxId),
         |st AS (SELECT c.doc_id, COUNT(*) AS n_shingles,
         |         COUNT(e.sh) AS n_overlap
         |       FROM corpus c LEFT JOIN ev e ON e.sh = c.sh
         |       GROUP BY c.doc_id)
         |SELECT doc_id, n_shingles, n_overlap,
         |  FLOOR((CAST(n_overlap AS DOUBLE) / n_shingles) * 10000.0 + 0.5) / 10000.0 AS overlap_frac,
         |  (n_overlap >= 1) AS contaminated
         |FROM st""".stripMargin,
    // the Bloom path's contract IS equality with the exact form: the
    // sketch only passes false positives and the exact confirm removes
    // them, so the oracle restates q71 verbatim
    "q93_decontaminate_bloom" ->
      s"""WITH $shingleCte,
         |ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id < $EvalMaxId),
         |corpus AS (SELECT doc_id, sh FROM sh WHERE doc_id >= $EvalMaxId),
         |st AS (SELECT c.doc_id, COUNT(*) AS n_shingles,
         |         COUNT(e.sh) AS n_overlap
         |       FROM corpus c LEFT JOIN ev e ON e.sh = c.sh
         |       GROUP BY c.doc_id)
         |SELECT doc_id, n_shingles, n_overlap,
         |  FLOOR((CAST(n_overlap AS DOUBLE) / n_shingles) * 10000.0 + 0.5) / 10000.0 AS overlap_frac,
         |  (n_overlap >= 1) AS contaminated
         |FROM st""".stripMargin,
    "q68_dedup_corpus" ->
      s"""WITH RECURSIVE $simhashPairCte,
        |e AS (SELECT doc_a AS a, doc_b AS b FROM p
        |      UNION SELECT doc_b, doc_a FROM p),
        |reach(a, b) AS (SELECT a, b FROM e
        |  UNION SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a),
        |lab AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
        |        FROM reach GROUP BY a),
        |reps AS (SELECT doc_id FROM (
        |    SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY cluster_id
        |      ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,15) AS BIGINT) ASC,
        |        doc_id ASC) AS rn
        |    FROM lab) WHERE rn = 1),
        |losers AS (SELECT doc_id FROM lab
        |           WHERE doc_id NOT IN (SELECT doc_id FROM reps))
        |SELECT doc_id, lang, source FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin,
    // q68's loser set rolled up by source with q35's token estimate
    "q112_dedup_impact" ->
      s"""WITH RECURSIVE $simhashPairCte,
        |e AS (SELECT doc_a AS a, doc_b AS b FROM p
        |      UNION SELECT doc_b, doc_a FROM p),
        |reach(a, b) AS (SELECT a, b FROM e
        |  UNION SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a),
        |lab AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
        |        FROM reach GROUP BY a),
        |reps AS (SELECT doc_id FROM (
        |    SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY cluster_id
        |      ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,15) AS BIGINT) ASC,
        |        doc_id ASC) AS rn
        |    FROM lab) WHERE rn = 1),
        |losers AS (SELECT doc_id FROM lab
        |           WHERE doc_id NOT IN (SELECT doc_id FROM reps)),
        |t AS (SELECT doc_id, source,
        |        CAST(CEIL(CAST(len(text) AS DOUBLE)/4) AS BIGINT) AS toks,
        |        (doc_id IN (SELECT doc_id FROM losers)) AS removed
        |      FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        |  COUNT(CASE WHEN removed THEN 1 END) AS n_removed,
        |  CAST(SUM(toks) AS BIGINT) AS toks_total,
        |  CAST(COALESCE(SUM(CASE WHEN removed THEN toks END), 0) AS BIGINT)
        |    AS toks_removed,
        |  FLOOR((CAST(COUNT(CASE WHEN removed THEN 1 END) AS DOUBLE)
        |    / COUNT(*)) * 10000.0 + 0.5) / 10000.0 AS removal_rate
        |FROM t GROUP BY source""".stripMargin,
    // q29's exact truth and q69's bucket-candidate join, both cut to
    // the same id-bounded sample, banded by floor(cos·5) — identical
    // double trees both sides, so band edges agree bit-for-bit
    "q127_neardup_recall" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |    CAST(${Similarity.bucketSql} AS BIGINT) AS bucket
         |  FROM embeddings WHERE vec_id < $EmbedNearDupMaxId
         |    AND list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0),
         |n AS (SELECT vec_id, v, bucket,
         |    sqrt(list_dot_product(v, v)) AS nrm FROM e),
         |truth AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    FLOOR((list_dot_product(a.v, b.v) / (a.nrm * b.nrm)) * 10000.0 + 0.5) / 10000.0 AS cos
         |  FROM n a JOIN n b ON a.vec_id < b.vec_id
         |  WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= $EmbedNearDupMinCos),
         |cand AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
         |  FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= $EmbedNearDupMinCos),
         |j AS (SELECT t.cos, (c.vec_a IS NOT NULL) AS hit
         |  FROM truth t LEFT JOIN cand c
         |    ON t.vec_a = c.vec_a AND t.vec_b = c.vec_b)
         |SELECT CAST(FLOOR(cos * 5) AS INTEGER) AS cos_band,
         |  COUNT(*) AS n_true,
         |  COUNT(CASE WHEN hit THEN 1 END) AS n_cand,
         |  FLOOR((CAST(COUNT(CASE WHEN hit THEN 1 END) AS DOUBLE)
         |    / COUNT(*)) * 10000.0 + 0.5) / 10000.0 AS recall
         |FROM j GROUP BY 1""".stripMargin,
    "q69_neardup_lsh" ->
      s"""WITH b AS (
         |  SELECT vec_id, CAST(${Similarity.bucketSql} AS BIGINT) AS bucket,
         |    CAST(embedding AS DOUBLE[]) AS v,
         |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
         |  FROM embeddings
         |  WHERE list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0),
         |pr AS (
         |  SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
         |    list_dot_product(a.v, c.v) / (a.nrm * c.nrm) AS cos
         |  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id)
         |SELECT vec_a, vec_b, FLOOR((cos) * 10000.0 + 0.5) / 10000.0 AS cos
         |FROM pr WHERE cos >= $LshNearDupMinCos""".stripMargin,
    // the celled chain on the spread corpus: the embeddings keyed CTE
    // + the same generated band arms as the q176 oracle
    "q181_embed_neardup_celled" ->
      s"""WITH ${embedKeyedCteSql()},
         |k2 AS (SELECT vec_id, cell_id, bucket,
         |    $celledBandDefsSql, v, nrm FROM keyed),
         |pr AS (
         |  $celledPairArmsSql)
         |SELECT vec_a, vec_b, FLOOR((cos) * 10000.0 + 0.5) / 10000.0 AS cos
         |FROM pr WHERE cos >= $LshNearDupMinCos""".stripMargin,
    // the blocking-volume board over the same keyed CTE — the shared
    // generated body (schemes, shifts, masks all from the constants)
    "q182_embed_celled_blocking" ->
      (s"WITH ${embedKeyedCteSql()},\n" + celledBlockingBoardSql),
    // celled-vs-exact recall on the bounded audit slice: the q127
    // rollup with the candidate CTE swapped for the celled band arms
    "q183_embed_celled_recall" ->
      s"""WITH ${embedKeyedCteSql(s"WHERE vec_id < $EmbedNearDupMaxId")},
         |k2 AS (SELECT vec_id, cell_id, bucket,
         |    $celledBandDefsSql, v, nrm FROM keyed),
         |cand0 AS (
         |  $celledPairArmsSql),
         |cand AS (SELECT vec_a, vec_b FROM cand0
         |         WHERE cos >= $EmbedNearDupMinCos),
         |truth AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    FLOOR((list_dot_product(a.v, b.v) / (a.nrm * b.nrm)) * 10000.0 + 0.5) / 10000.0 AS cos
         |  FROM bk a JOIN bk b ON a.vec_id < b.vec_id
         |  WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= $EmbedNearDupMinCos),
         |j AS (SELECT t.cos, (c.vec_a IS NOT NULL) AS hit
         |  FROM truth t LEFT JOIN cand c
         |    ON t.vec_a = c.vec_a AND t.vec_b = c.vec_b)
         |SELECT CAST(FLOOR(cos * 5) AS INTEGER) AS cos_band,
         |  COUNT(*) AS n_true,
         |  COUNT(CASE WHEN hit THEN 1 END) AS n_cand,
         |  FLOOR((CAST(COUNT(CASE WHEN hit THEN 1 END) AS DOUBLE)
         |    / COUNT(*)) * 10000.0 + 0.5) / 10000.0 AS recall
         |FROM j GROUP BY 1""".stripMargin,
    // SemDeDup restated: q38's argmax-cosine cell assignment, q69's
    // within-key pair join, q59's recursive min-label closure, then
    // keep = (component min == own id), TRUE off the pair graph
    "q95_semdedup" ->
      s"""WITH RECURSIVE v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |v AS (SELECT * FROM v0 WHERE list_dot_product(v, v) > 0),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v),
         |cents AS (SELECT vec_id AS cell_id, v AS cv, nrm AS cn
         |          FROM n WHERE vec_id < ${Similarity.IvfCells}),
         |assign AS (
         |  SELECT vec_id, cell_id FROM (
         |    SELECT a.vec_id, c.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
         |        ORDER BY list_dot_product(a.v, c.cv)/(a.nrm*c.cn) DESC, c.cell_id ASC) AS rn
         |    FROM n a, cents c) WHERE rn <= 1),
         |p AS (
         |  SELECT ax.vec_id AS a, ay.vec_id AS b
         |  FROM assign ax JOIN assign ay
         |    ON ax.cell_id = ay.cell_id AND ax.vec_id < ay.vec_id
         |  JOIN n x ON x.vec_id = ax.vec_id
         |  JOIN n y ON y.vec_id = ay.vec_id
         |  WHERE list_dot_product(x.v, y.v)/(x.nrm*y.nrm) >= $EmbedNearDupMinCos),
         |e AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
         |reach(a, b) AS (SELECT a, b FROM e
         |  UNION SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a),
         |lab AS (SELECT a AS vec_id, LEAST(a, MIN(b)) AS cl
         |        FROM reach GROUP BY a)
         |SELECT s.vec_id, s.cell_id, COALESCE(l.cl = s.vec_id, TRUE) AS keep
         |FROM assign s LEFT JOIN lab l ON l.vec_id = s.vec_id""".stripMargin,
    // same window/merge recurrence: positional 4-word window md5s,
    // HAVING >= 2 distinct docs, LAG/SUM gaps-and-islands merge
    "q87_dup_spans" ->
      s"""WITH ws AS (SELECT doc_id, $normSql AS ws FROM documents),
         |idx AS (SELECT doc_id, ws, $spanIdxRangeSql AS i
         |        FROM ws WHERE $spanLenGuardSql),
         |win AS (SELECT doc_id, i - 1 AS pos,
         |    md5($spanConcatSql) AS h
         |  FROM idx),
         |dup AS (SELECT h, COUNT(DISTINCT doc_id) AS df FROM win
         |        GROUP BY h HAVING COUNT(DISTINCT doc_id) >= $SpanMinDocs),
         |hits AS (SELECT w.doc_id, w.pos, d.df FROM win w
         |         JOIN dup d ON d.h = w.h),
         |brk AS (SELECT doc_id, pos, df,
         |    CASE WHEN LAG(pos) OVER w IS NULL
         |           OR pos > LAG(pos) OVER w + $ShingleSize THEN 1 ELSE 0 END AS b
         |  FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
         |grp AS (SELECT doc_id, pos, df,
         |    SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
         |                 ROWS UNBOUNDED PRECEDING) AS g
         |  FROM brk)
         |SELECT doc_id, MIN(pos) AS span_start,
         |  MAX(pos) - MIN(pos) + $ShingleSize AS span_len,
         |  COUNT(*) AS n_windows,
         |  MAX(df) AS max_df
         |FROM grp GROUP BY doc_id, g""".stripMargin,
    // same window recurrence as q87, restricted to df <= 16 windows,
    // paired via first-occurrence-per-(doc,h) self-join, then the
    // LAG/SUM islands merge per (doc_a, doc_b) in doc_a coordinates
    "q90_span_pairs" ->
      s"""WITH ws AS (SELECT doc_id, $normSql AS ws FROM documents),
         |idx AS (SELECT doc_id, ws, $spanIdxRangeSql AS i
         |        FROM ws WHERE $spanLenGuardSql),
         |win AS (SELECT doc_id, i - 1 AS pos,
         |    md5($spanConcatSql) AS h
         |  FROM idx),
         |dup AS (SELECT h, COUNT(DISTINCT doc_id) AS df FROM win
         |        GROUP BY h HAVING COUNT(DISTINCT doc_id) >= $SpanMinDocs
         |                      AND COUNT(DISTINCT doc_id) <= $SpanPairDfCap),
         |occ AS (SELECT w.doc_id, w.h, MIN(w.pos) AS pos, MAX(d.df) AS df
         |        FROM win w JOIN dup d ON d.h = w.h GROUP BY w.doc_id, w.h),
         |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.pos AS pos_a, a.df
         |  FROM occ a JOIN occ b ON a.h = b.h AND a.doc_id < b.doc_id),
         |brk AS (SELECT doc_a, doc_b, pos_a, df,
         |    CASE WHEN LAG(pos_a) OVER w IS NULL
         |           OR pos_a > LAG(pos_a) OVER w + $ShingleSize THEN 1 ELSE 0 END AS b
         |  FROM pr WINDOW w AS (PARTITION BY doc_a, doc_b ORDER BY pos_a)),
         |grp AS (SELECT doc_a, doc_b, pos_a, df,
         |    SUM(b) OVER (PARTITION BY doc_a, doc_b ORDER BY pos_a
         |                 ROWS UNBOUNDED PRECEDING) AS g
         |  FROM brk)
         |SELECT doc_a, doc_b, MIN(pos_a) AS span_start,
         |  MAX(pos_a) - MIN(pos_a) + $ShingleSize AS span_len,
         |  COUNT(*) AS n_windows, MAX(df) AS max_df
         |FROM grp GROUP BY doc_a, doc_b, g""".stripMargin,
    // q87 plus character coordinates. The offsets CTE restates the
    // norm_word_starts kernel as SQL over the SAME lower(text): word
    // list = maximal [a-z0-9] runs (regexp_extract_all), separator
    // list = the complementary split (string_split_regex) — sl[i] is
    // the separator BEFORE word i, so word i's char start is
    // cum(len(sep) ≤ i) + cum(len(word) < i). All lengths are
    // codepoint counts in both engines (DuckDB length(), Spark
    // UTF8String.numChars). SUMs cast to BIGINT (HUGEINT otherwise).
    "q91_char_spans" ->
      s"""WITH ws AS (SELECT doc_id, $normSql AS ws FROM documents),
         |lows AS (SELECT doc_id, lower(text) AS lt FROM documents),
         |lists AS (SELECT doc_id,
         |    regexp_extract_all(lt, '[a-z0-9]+') AS wl,
         |    string_split_regex(lt, '[a-z0-9]+') AS sl FROM lows),
         |wpos AS (SELECT doc_id, wl, sl, unnest(range(1, len(wl)+1)) AS i
         |         FROM lists),
         |lens AS (SELECT doc_id, i, length(wl[i]) AS wlen,
         |         length(sl[i]) AS slen FROM wpos),
         |offs AS (SELECT doc_id, i - 1 AS widx, wlen,
         |    CAST(SUM(slen) OVER (PARTITION BY doc_id ORDER BY i
         |           ROWS UNBOUNDED PRECEDING)
         |       + COALESCE(SUM(wlen) OVER (PARTITION BY doc_id ORDER BY i
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cs
         |  FROM lens),
         |idx AS (SELECT doc_id, ws, $spanIdxRangeSql AS i
         |        FROM ws WHERE $spanLenGuardSql),
         |win AS (SELECT doc_id, i - 1 AS pos,
         |    md5($spanConcatSql) AS h
         |  FROM idx),
         |winc AS (SELECT w.doc_id, w.pos, w.h, o1.cs AS cs,
         |    o2.cs + o2.wlen AS ce
         |  FROM win w
         |  JOIN offs o1 ON o1.doc_id = w.doc_id AND o1.widx = w.pos
         |  JOIN offs o2 ON o2.doc_id = w.doc_id AND o2.widx = w.pos + ${ShingleSize - 1}),
         |dup AS (SELECT h, COUNT(DISTINCT doc_id) AS df FROM win
         |        GROUP BY h HAVING COUNT(DISTINCT doc_id) >= $SpanMinDocs),
         |hits AS (SELECT w.doc_id, w.pos, w.cs, w.ce, d.df FROM winc w
         |         JOIN dup d ON d.h = w.h),
         |brk AS (SELECT doc_id, pos, cs, ce, df,
         |    CASE WHEN LAG(pos) OVER w IS NULL
         |           OR pos > LAG(pos) OVER w + $ShingleSize THEN 1 ELSE 0 END AS b
         |  FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
         |grp AS (SELECT doc_id, pos, cs, ce, df,
         |    SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
         |                 ROWS UNBOUNDED PRECEDING) AS g
         |  FROM brk)
         |SELECT doc_id, MIN(pos) AS span_start,
         |  MAX(pos) - MIN(pos) + $ShingleSize AS span_len,
         |  COUNT(*) AS n_windows, MAX(df) AS max_df,
         |  MIN(cs) AS char_start, MAX(ce) - MIN(cs) AS char_len
         |FROM grp GROUP BY doc_id, g""".stripMargin,
    // q90 plus character coordinates in doc_a's text (the canonical
    // pair coordinate system), same offsets CTE as q91; cs/ce are
    // strictly increasing in pos so MIN() picks the first-occurrence
    // window's char interval, exactly like MIN(pos)
    "q92_char_span_pairs" ->
      s"""WITH ws AS (SELECT doc_id, $normSql AS ws FROM documents),
         |lows AS (SELECT doc_id, lower(text) AS lt FROM documents),
         |lists AS (SELECT doc_id,
         |    regexp_extract_all(lt, '[a-z0-9]+') AS wl,
         |    string_split_regex(lt, '[a-z0-9]+') AS sl FROM lows),
         |wpos AS (SELECT doc_id, wl, sl, unnest(range(1, len(wl)+1)) AS i
         |         FROM lists),
         |lens AS (SELECT doc_id, i, length(wl[i]) AS wlen,
         |         length(sl[i]) AS slen FROM wpos),
         |offs AS (SELECT doc_id, i - 1 AS widx, wlen,
         |    CAST(SUM(slen) OVER (PARTITION BY doc_id ORDER BY i
         |           ROWS UNBOUNDED PRECEDING)
         |       + COALESCE(SUM(wlen) OVER (PARTITION BY doc_id ORDER BY i
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cs
         |  FROM lens),
         |idx AS (SELECT doc_id, ws, $spanIdxRangeSql AS i
         |        FROM ws WHERE $spanLenGuardSql),
         |win AS (SELECT doc_id, i - 1 AS pos,
         |    md5($spanConcatSql) AS h
         |  FROM idx),
         |winc AS (SELECT w.doc_id, w.pos, w.h, o1.cs AS cs,
         |    o2.cs + o2.wlen AS ce
         |  FROM win w
         |  JOIN offs o1 ON o1.doc_id = w.doc_id AND o1.widx = w.pos
         |  JOIN offs o2 ON o2.doc_id = w.doc_id AND o2.widx = w.pos + ${ShingleSize - 1}),
         |dup AS (SELECT h, COUNT(DISTINCT doc_id) AS df FROM win
         |        GROUP BY h HAVING COUNT(DISTINCT doc_id) >= $SpanMinDocs
         |                      AND COUNT(DISTINCT doc_id) <= $SpanPairDfCap),
         |occ AS (SELECT w.doc_id, w.h, MIN(w.pos) AS pos, MAX(d.df) AS df,
         |          MIN(w.cs) AS cs, MIN(w.ce) AS ce
         |        FROM winc w JOIN dup d ON d.h = w.h GROUP BY w.doc_id, w.h),
         |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.pos AS pos_a, a.df, a.cs, a.ce
         |  FROM occ a JOIN occ b ON a.h = b.h AND a.doc_id < b.doc_id),
         |brk AS (SELECT doc_a, doc_b, pos_a, df, cs, ce,
         |    CASE WHEN LAG(pos_a) OVER w IS NULL
         |           OR pos_a > LAG(pos_a) OVER w + $ShingleSize THEN 1 ELSE 0 END AS b
         |  FROM pr WINDOW w AS (PARTITION BY doc_a, doc_b ORDER BY pos_a)),
         |grp AS (SELECT doc_a, doc_b, pos_a, df, cs, ce,
         |    SUM(b) OVER (PARTITION BY doc_a, doc_b ORDER BY pos_a
         |                 ROWS UNBOUNDED PRECEDING) AS g
         |  FROM brk)
         |SELECT doc_a, doc_b, MIN(pos_a) AS span_start,
         |  MAX(pos_a) - MIN(pos_a) + $ShingleSize AS span_len,
         |  COUNT(*) AS n_windows, MAX(df) AS max_df,
         |  MIN(cs) AS char_start, MAX(ce) - MIN(cs) AS char_len
         |FROM grp GROUP BY doc_a, doc_b, g""".stripMargin,
    "q29_embed_neardup" ->
      s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  FLOOR((list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
        |    / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
        |     * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))) * 10000.0 + 0.5) / 10000.0 AS cos
        |FROM embeddings a JOIN embeddings b
        |  ON a.vec_id < b.vec_id AND a.vec_id < $EmbedNearDupMaxId
        |  AND b.vec_id < $EmbedNearDupMaxId
        |  AND list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])) > 0
        |  AND list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) > 0
        |WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
        |    / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
        |     * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) >= $EmbedNearDupMinCos""".stripMargin
  )
}
