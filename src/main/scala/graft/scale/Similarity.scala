package graft.scale

import graft.{QueryModule, Tables => T}
import graft.Materialize.CoreOps
import graft.functions.PortableFuncs._
import graft.functions.TopKAgg
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (BASELINE north star —
  * no reference counterpart): brute-force cosine top-k as the exact
  * baseline, random-hyperplane LSH bucketing as the 100 TB scale path.
  *
  * Scale design:
  *  - brute-force kNN broadcasts the (small) query set and makes ONE
  *    pass over the corpus — a BroadcastNestedLoopJoin followed by a
  *    bounded per-query top-k aggregate (map-side partial heaps); the
  *    corpus is never shuffled by vector, only O(k · tasks · queries)
  *    candidate rows move;
  *  - LSH bucketing reduces candidate generation to an equality
  *    shuffle on a 16-bit bucket id — O(corpus) shuffle volume of
  *    short keys instead of O(corpus²) pairs;
  *  - hyperplanes are deterministic (md5-derived), embedded as plan
  *    literals, so the same buckets come out of any engine — the
  *    DuckDB oracle re-derives them from the same literals.
  */
object Similarity extends QueryModule {

  val Dim = 64
  val NumPlanes = 8
  val TopK = 5

  /** The gate boards' query-slice bound (vec_id < GateQueries) — ONE
    * definition for every brute/ANN arm's Scala default and the seven
    * oracle restatements (the shared-constant discipline): the
    * audit-cost dial cannot drift between engines or between the arms
    * whose recall is compared against the same truth. */
  val GateQueries = 8L

  /** Deterministic pseudo-random hyperplanes: component (p,d) is
    * hash60("p_d") - 2^59 (zero-mean uniform), exactly reproducible
    * from md5 in any engine; embedded below as literals in both the
    * Spark plan and the oracle SQL.
    */
  val planes: Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until NumPlanes).map { p =>
      (0 until Dim).map { d =>
        val hex = md.digest(s"${p}_${d}".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 15)
        (java.lang.Long.parseLong(hex, 16) - (1L << 59)).toDouble
      }
    }
  }

  private def planeLit(p: Int): Column =
    array(planes(p).map(lit): _*)

  /** The fixed sign-plane word of double-vector column `v` — the
    * scan-side expression [[lshBuckets]]/[[bucketedVectors]] inline;
    * also exposed for streaming arrivals, whose keyed projection must
    * be built without the widen/repartition step (a streaming source
    * has no scan estimate and `.rdd` is illegal on it). */
  private[graft] def fixedPlaneBucket(v: Column): Column =
    (0 until NumPlanes).map { p =>
      when(dotProduct(v, planeLit(p)) > 0d, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)

  /** vec_id + 8-bit LSH bucket: bit p = sign(v · plane_p). */
  def lshBuckets(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      fixedPlaneBucket(toDoubleArray(col("embedding"))).as("bucket"))

  /** (vec_id, bucket, FLOAT vector, norm) in ONE scan — bucket and
    * norm are projections of the same embedding read, so no join-back
    * to the source is ever needed (the former
    * `lshBuckets(emb).join(emb, "vec_id")` shape scanned the table
    * twice and paid a self-join shuffle for the privilege).
    *
    * `v` carries the RAW float32 column (r21): every downstream dot /
    * norm / argmax kernel widens float elements in-register
    * (bit-identical to the former cast-then-compute plan, float→double
    * widening being exact), so the per-row 64-element double-array
    * allocation is gone and every exchange / checkpoint that ships the
    * payload moves half the bytes — the guide's narrower-types lever
    * on the ANN/dedup hot path. */
  def bucketedVectors(emb: DataFrame): DataFrame =
    Layout.widen(emb)
      .select(col("vec_id"), fixedPlaneBucket(col("embedding")).as("bucket"),
        col("embedding").as("v"))
      .withColumn("nrm", l2Norm(col("v")))

  /** [[bucketedVectors]] restricted to the nonzero-norm universe. The
    * r19/r20 explode(array(cast)) generator barrier is GONE with the
    * cast itself (r21 float-reading kernels): there is no per-row
    * array allocation left to protect, and the worst the pushed
    * `nrm > 0` filter can now do is re-run the 64-fma norm loop below
    * the projection — arithmetic, not allocation. */
  private[graft] def bucketedVectorsNz(emb: DataFrame): DataFrame =
    Layout.widen(emb)
      .select(col("vec_id"), fixedPlaneBucket(col("embedding")).as("bucket"),
        col("embedding").as("v"), l2Norm(col("embedding")).as("nrm"))
      .filter(col("nrm") > 0d)

  /** DATA-DEPENDENT sign planes for concentrated corpora: plane `p`
    * points along the DIFFERENCE of seed vectors 2p and 2p+1 (the same
    * first-k seed list the IVF/SemDeDup cells run on), and the bucket
    * is the usual sign word. Why this repairs the one-bucket collapse:
    * byte-histogram-style embeddings all sit in one narrow cone, so
    * every FIXED pseudo-random plane sees the whole corpus on one side
    * ([[planes]] measured 494/500 of the media slice in ONE bucket) —
    * but for L2-normalized vectors sign(v·(c_a − c_b)) is EXACTLY
    * "closer to c_a than to c_b", a comparison between two in-cone
    * anchors, so each plane splits the cone itself near its median
    * regardless of how narrow it is. Deterministic and
    * oracle-restatable: the seeds are rows of the table (the
    * [[seedCents]] contract), the differences are exact double
    * subtractions of float32-cast values, and the dot is the same
    * sequential fold as `list_dot_product`.
    *
    * Scale: the seed list is bounded driver data (2·nPlanes × [[Dim]]
    * doubles at ANY corpus size) and the bucket is a scan-side
    * projection — zero joins, zero shuffles, exactly like the fixed
    * [[bucketedVectors]] word. nPlanes is the occupancy dial: each
    * extra plane halves the expected group size on concentrated data. */
  /** The diff planes `seeds` can actually form: plane p exists only
    * when BOTH seed ids 2p and 2p+1 are present — exactly the rows
    * the oracle's `pld` CTE's inner joins keep. On a degenerate
    * corpus missing a partner the plane simply contributes no bit,
    * identically in both engines (fuzz round 19: the old contiguity
    * require crashed the whole celled chain on the tiny profile). */
  private[graft] def availableDiffPlanes(seeds: Seq[(Long, Seq[Double])],
      nPlanes: Int = NumPlanes): Seq[(Int, Seq[Double])] = {
    val m = seeds.toMap
    (0 until nPlanes).flatMap { p =>
      for (a <- m.get(2L * p); b <- m.get(2L * p + 1))
        yield p -> a.zip(b).map { case (x, y) => x - y }
    }
  }

  private[graft] def diffPlaneBucket(v: Column,
      seeds: Seq[(Long, Seq[Double])], nPlanes: Int = NumPlanes): Column =
    availableDiffPlanes(seeds, nPlanes).map { case (p, diff) =>
      when(dotProduct(v, array(diff.map(lit): _*)) > 0d, lit(1L << p))
        .otherwise(0L)
    }.reduceOption(_ + _).getOrElse(lit(0L))

  /** Exact brute-force cosine top-k: queries (vec_id < nQueries) against
    * the whole corpus. The query side is broadcast; corpus scanned once.
    *
    * Role at 100 TB: the recall referee, not the serving path. Serving
    * is [[annIvf]]/[[annPq]]/[[annLsh]]; THIS form exists to measure
    * their recall ([[annRecall]], q88) over a bounded query sample —
    * [[knnBruteSampled]] (q126) is the same scoring pass with the
    * sample STRATIFIED across LSH buckets instead of an id prefix.
    * `nQueries` is the audit-cost dial: cost is one full corpus
    * scan with O(k · nQueries) exchange volume regardless of corpus
    * size (bounded top-k partials), so a few hundred sampled queries
    * are affordable even at 100 TB — but it is linear-per-query by
    * construction and must never be the per-request path.
    *
    * Scale shape: top-k selection is a bounded [[graft.functions.TopKAgg]]
    * aggregate, not a `row_number` window — the window form shuffles
    * every scored row (corpus × queries) into Q partitions and sorts
    * each; the aggregate's map-side partials cap the exchange at k rows
    * per task per query, so shuffle volume is independent of corpus
    * size. Ordering (cos DESC, c_id ASC tiebreak, ranked before the
    * display rounding) is pinned equal to the window form by spec. */
  def knnBrute(emb0: DataFrame, nQueries: Long = GateQueries, k: Int = TopK): DataFrame = {
    val emb = nonZeroNorm(emb0) // cosine-based board: zero-norm vectors are outside its universe (fuzz r19)
    // raw float32 vectors end-to-end (r21): the pair-scoring loop
    // widens in-register — same doubles, half the broadcast bytes
    val corpus = Layout.widen(emb).select(col("vec_id").as("c_id"),
      col("embedding").as("cv"))
      .withColumn("cn", l2Norm(col("cv")))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      .withColumn("qn", l2Norm(col("qv")))
    corpus.join(broadcast(queries), col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (dotProduct(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
      .groupBy(col("q_id"))
      .agg(TopKAgg.topK(col("cos"), col("c_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.id").as("c_id"),
        portableRound(col("col.score"), 4).as("cos"),
        (col("pos") + 1).as("rank"))
  }

  /** Exact brute-force top-k over a STRATIFIED query sample — the
    * productionized form of [[knnBrute]]'s audit: instead of an id
    * prefix, queries are the `perBucket` lowest vec_ids of every
    * occupied LSH bucket, so the sample covers every populated region
    * of the space (a prefix sample can land entirely inside one dense
    * region and certify nothing about the rest). This is the recall
    * referee you actually run at 100 TB: query count is bounded by
    * `perBucket · 2^NumPlanes` — a property of the index geometry, not
    * the corpus size.
    *
    * Scale shape: the sample selection is a bounded
    * [[graft.functions.TopKAgg]] aggregate per bucket (map-side
    * partials cap the exchange at perBucket rows per task per bucket —
    * never a corpus shuffle by bucket), the chosen ids broadcast back
    * as a semi-filter, and the scoring pass is [[knnBrute]]'s: corpus
    * scanned once, queries broadcast, bounded top-k aggregate. */
  def knnBruteSampled(emb0: DataFrame, perBucket: Int = 1,
                      k: Int = TopK): DataFrame = {
    // zero-norm exclusion rides the keyed projection (one cast per
    // scan — bucketedVectorsNz); bv is read three times below
    val bv = bucketedVectorsNz(emb0)
    val qIds = bv.groupBy(col("bucket"))
      .agg(TopKAgg.topK(negate(col("vec_id").cast("double")),
        col("vec_id"), perBucket).as("qs"))
      .select(explode(col("qs")).as("q"))
      .select(col("q.id").as("q_id"))
    val queries = bv.join(broadcast(qIds), col("vec_id") === col("q_id"))
      .select(col("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    bv.select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
      .join(broadcast(queries), col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (dotProduct(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
      .groupBy(col("q_id"))
      .agg(TopKAgg.topK(col("cos"), col("c_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.id").as("c_id"),
        portableRound(col("col.score"), 4).as("cos"),
        (col("pos") + 1).as("rank"))
  }

  /** ANN via LSH: candidates = corpus vectors in any bucket within
    * Hamming distance `maxFlips` of the query's bucket (multi-probe
    * LSH, Lv et al. 2007); then exact cosine re-rank, top-k per query.
    *
    * `maxFlips = 0` is classic single-table LSH — one bucket per
    * query. On near-uniform data that configuration has near-zero
    * recall BY MATH, not by bug: measured on this corpus the true
    * top-5 neighbors sit at cos ≈ 0.33 (θ ≈ 71°), so
    * P(8 planes all agree) ≈ (1 − θ/π)⁸ ≈ 2% per neighbor — which is
    * exactly what the q88 recall audit shows. Multi-probe is the
    * standard fix: probing all buckets within `maxFlips` sign-bit
    * flips multiplies P(candidate) by the binomial tail without
    * touching the index layout.
    *
    * Scale shape: the probe set is built QUERY-SIDE — each query
    * explodes into Σ C(planes, ≤maxFlips) probe buckets (93 of 256
    * at maxFlips = 3) and the corpus joins by bucket EQUALITY, so the
    * corpus is never replicated and no cross product forms; a corpus
    * vector's bucket matches at most one probe value per query, so
    * candidates never duplicate. The probe fraction
    * Σ C(p, ≤r) / 2^p is the recall/cost dial: at 100 TB raise
    * NumPlanes so the probed fraction stays small while per-bucket
    * occupancy stays bounded — the dial is independent of this plan
    * shape. */
  def annLsh(emb0: DataFrame, nQueries: Long = 50L, k: Int = 3,
             maxFlips: Int = 0): DataFrame = {
    require(maxFlips >= 0 && maxFlips <= NumPlanes,
      s"maxFlips must be in [0, $NumPlanes]: $maxFlips")
    // masks built as Σ C(planes, ≤maxFlips) combinations directly —
    // enumerating and filtering all 2^planes longs would cost the
    // driver 2^p work (and 1L << 64 wraps to 1, silently degrading to
    // single-probe) at exactly the plane counts the scale note above
    // says to raise
    val masks: Seq[Long] = (0 to maxFlips).flatMap(k =>
      (0 until NumPlanes).combinations(k)
        .map(_.foldLeft(0L)((m, b) => m | (1L << b))))
    // zero-norm exclusion rides the keyed projection itself (one cast
    // per row — see bucketedVectorsNz; was nonZeroNorm + a second cast)
    val withBucket = bucketedVectorsNz(emb0)
    val q = withBucket.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("bucket"),
        col("v").as("qv"), col("nrm").as("qn"))
      .withColumn("probe",
        explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)))
      .drop("bucket")
    val c = withBucket.select(col("vec_id").as("c_id"), col("bucket"),
      col("v").as("cv"), col("nrm").as("cn"))
    // candidate volume is probed-fraction × corpus per query — a corpus
    // term, so top-k is the bounded aggregate (map-side partials), not
    // a window sort of the whole candidate stream (see [[knnBrute]])
    c.join(broadcast(q), col("bucket") === col("probe"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (dotProduct(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
      .groupBy(col("q_id"))
      .agg(TopKAgg.topK(col("cos"), col("c_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.id").as("c_id"),
        portableRound(col("col.score"), 4).as("cos"), (col("pos") + 1).as("rank"))
  }

  val IvfCells = 16
  val IvfProbes = 2

  /** IVF (inverted-file) ANN — the other classic scale path besides
    * LSH: partition the corpus into cells around coarse centroids,
    * search only the closest `nProbes` cells per query.
    *
    * Centroids are the first `IvfCells` vectors (deterministic, so the
    * oracle re-derives them); assignment is argmax cosine. The
    * centroid set is tiny → broadcast everywhere; the corpus is
    * shuffled ONCE by cell id at index-build time, and each query
    * probes `nProbes` cells — at 100 TB the per-query work drops by
    * ~cells/probes versus brute force while the index build stays one
    * broadcast join + shuffle. */
  /** Trained IVF coarse centroids: [[PqKmeansIters]] spherical-k-means
    * iterations (assign by argmax cosine — the exact [[ivfCells]]
    * contract — lowest-cell tie-break; centroid = fixed-point
    * micro-unit mean, cosine being scale-invariant the un-normalized
    * mean is the spherical update) over the same bounded driver-side
    * sample as [[pqTrainedCents]], seeded by the first `nCells`
    * vectors. Kept EXPERIMENTAL — deliberately NOT wired into the
    * production [[ivfCells]]/[[annIvf]]: the round-9 A/B measured
    * recall@5 vs the first-16 seed at sf0.001/0.01/0.1 as
    * 0.925→0.875, 0.925→0.75, 1.0→0.8 — training LOWERS recall at
    * the fixed 2-probe budget on this corpus, even though the
    * spherical objective itself improves (spec-pinned). On
    * near-uniform data the cells are near-balanced either way; what
    * training does is re-shard the corpus around better centroids,
    * and the re-sharded 2-probe slice simply covers a different — not
    * richer — candidate set, so index-quality gains don't convert to
    * fixed-budget recall. A production tuning would raise nProbes
    * alongside training; here the seed's higher recall at the same
    * probe cost wins, and the oracle stays free of a ~30-line
    * spherical-k-means CTE chain in q38/q88. Revisit if a future
    * corpus shows IVF recall sagging. */
  def ivfTrainedCents(emb: DataFrame, nCells: Int = IvfCells): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val idSample = sampleVectors(emb)
    requireSeedContiguous(idSample, nCells, "IVF centroid")
    val sample: Array[Array[Double]] = idSample.map(_._2)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val seed = sample.take(nCells)
    val trained = (1 to PqKmeansIters).foldLeft(seed) { (cb, _) =>
      val members = Array.fill(cb.length)(List.empty[Array[Double]])
      sample.foreach { v =>
        var bestK = 0; var bestC = cos(v, cb(0)); var k = 1
        while (k < cb.length) {
          val c = cos(v, cb(k))
          if (c > bestC) { bestC = c; bestK = k }
          k += 1
        }
        members(bestK) ::= v
      }
      Array.tabulate(cb.length) { k =>
        val ms = members(k)
        if (ms.isEmpty) cb(k) else fixedPointMean(ms, cb(k).length)
      }
    }
    trained.zipWithIndex.map { case (cv, id) => (id.toLong, cv) }
      .toSeq.toDF("cell_id", "cv")
  }

  def ivfCells(emb: DataFrame, nCells: Int = IvfCells): DataFrame =
    // seeds from the nonzero-norm universe only (every sibling path's
    // contract — a zero-norm seed poisons the argmax scan with NaN);
    // assignment keeps the full universe the caller passed
    ivfCellsWith(emb, seedCents(nonZeroNorm(emb), nCells))

  /** The bounded (cell_id, centroid) list collected to the driver —
    * nCells × [[Dim]] doubles (~8 KB at the default 16) at ANY corpus
    * size, the same bounded-driver-data discipline as
    * [[sampleVectors]]. Cell numbering carries the rows' own ids, so
    * a centroid set with holes stays hole-for-hole identical to the
    * oracle's. */
  private def collectCents(cents: DataFrame): Seq[(Long, Seq[Double])] =
    cents.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1).toSeq

  /** The bounded seed-centroid list as driver data (nCells × [[Dim]]
    * doubles at ANY corpus size) — for sibling modules that assign
    * cluster ids with the scan-side `argmax_cosine` kernel without
    * re-deriving the centroid contract ([[Dedup.semDedup]]). */
  private[graft] def seedCentroidList(emb: DataFrame,
                                      nCells: Int): Seq[(Long, Seq[Double])] =
    collectCents(seedCents(emb, nCells))

  private[graft] def ivfCellsWith(emb: DataFrame, cents: DataFrame): DataFrame =
    // argmax as a SCAN-SIDE PROJECTION: the centroid list is bounded
    // driver data, so it rides as a plan constant inside the native
    // argmax_cosine kernel (strict-> ascending scan = the same
    // lowest-cell tie-break as max_by over (cos, -cell_id)). The
    // former broadcast-join + groupBy(vec_id) aggregate re-shuffled
    // the WHOLE corpus (vec_id is unique — map-side partials reduce
    // nothing) to compute a value each row determines alone.
    Layout.widen(emb)
      .select(col("vec_id"),
        graft.functions.VectorExpressions.argMaxCosine(
          col("embedding"), collectCents(cents)).as("cell_id"))

  /** ANN via IVF: per query, probe the `nProbes` closest cells and
    * exact-rank the candidates. */
  def annIvf(emb0: DataFrame, nQueries: Long = GateQueries, k: Int = TopK,
             nCells: Int = IvfCells, nProbes: Int = IvfProbes): DataFrame = {
    val emb = nonZeroNorm(emb0) // cosine-based board: zero-norm vectors are outside its universe (fuzz r19)
    annIvfWith(emb, seedCents(emb, nCells), nQueries, k, nProbes)
  }

  private[graft] def annIvfWith(emb: DataFrame, centsDf: DataFrame,
                                nQueries: Long = GateQueries, k: Int = TopK,
                                nProbes: Int = IvfProbes): DataFrame = {
    val local = collectCents(centsDf)
    // raw float32 vectors (r21): the kernels widen in-register, so the
    // former explode(array(cast)) barrier — which existed only to pay
    // the double cast once — is gone along with the cast
    val vecs = emb.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", l2Norm(col("v")))
    // ONE scan produces id, cell assignment, vector and norm — the
    // former shape joined the corpus BACK onto its own cell assignment
    // by vec_id: two full-corpus exchanges (the assignment aggregate +
    // the self-join) to attach a column the row itself determines.
    val corpus = Layout.widen(emb)
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"))
      .select(col("c_id"),
        graft.functions.VectorExpressions.argMaxCosine(col("cv"), local)
          .as("cell_id"),
        col("cv"), l2Norm(col("cv")).as("cn"))
    val cents = centsDf.select(col("cell_id"), col("cv").as("centv"))
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("cell_id").asc)
    val probes = vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      .join(broadcast(cents))
      .select(col("q_id"), col("qv"), col("qn"), col("cell_id"),
        (dotProduct(col("qv"), col("centv")) /
          (col("qn") * l2Norm(col("centv")))).as("cos"))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nProbes)
      .select(col("q_id"), col("qv"), col("qn"), col("cell_id"))
    annIvfFromParts(corpus, probes, k)
  }

  /** The IVF candidate-rank tail from a prebuilt assigned corpus and
    * probe table — probed-cell occupancy is ~corpus × probes/cells per
    * query (a corpus term), so the final rank is the bounded top-k
    * aggregate (a probe-selection window upstream is fine: its input
    * is the constant nCells rows per query). Factored out so
    * [[ivfProbeSweepFrom]] can run every probe setting against ONE
    * checkpointed corpus assignment instead of rebuilding the scan
    * per arm. */
  private def annIvfFromParts(corpus: DataFrame, probes: DataFrame,
                              k: Int): DataFrame =
    corpus.join(broadcast(probes), Seq("cell_id"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (dotProduct(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
      .groupBy(col("q_id"))
      .agg(TopKAgg.topK(col("cos"), col("c_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.id").as("c_id"),
        portableRound(col("col.score"), 4).as("cos"), (col("pos") + 1).as("rank"))

  /** Int8 scalar quantization audit: per vector, the symmetric scale
    * (127/max|x|) and the exact reconstruction SSE after
    * quantize(round-half-up)→dequantize. The compression step a 100 TB
    * embedding store runs before ANN indexing, with its error budget
    * measured in the same pass.
    *
    * Determinism notes (cross-engine hash-match):
    *  - round-half-up is written `floor(x·s + 0.5)` — identical IEEE
    *    semantics in Spark and DuckDB, unlike `round()` half-ties;
    *  - the error fold is a left-to-right array fold in both engines,
    *    so double addition order is identical;
    *  - `mx` is materialized through a generator barrier: a plain
    *    projected column would be re-inlined into the error lambda by
    *    CollapseProject and re-fold the whole array per element
    *    (interpreted HOFs have no CSE).
    */
  def quantizeStats(emb: DataFrame): DataFrame = {
    val v = toDoubleArray(col("embedding"))
    Layout.widen(emb)
      .select(col("vec_id"),
        explode(array(struct(v.as("v"),
          array_max(transform(v, abs(_))).as("mx")))).as("s"))
      .select(col("vec_id"), col("s.v").as("v"), col("s.mx").as("mx"))
      .filter(col("mx") > 0d)
      .withColumn("scale", lit(127.0) / col("mx"))
      .select(col("vec_id"), col("mx"), col("scale"),
        aggregate(col("v"), lit(0.0), (acc, x) => {
          val recon = floor(x * col("scale") + 0.5d) / col("scale")
          acc + (x - recon) * (x - recon)
        }).as("sse"))
  }

  /** 16 subspaces of 4 dims × 32 codes = 1.25 bits/dim of code rate
    * (10 B per vector vs 512 B raw — still 51×). The former
    * 8×8-dim×16-code geometry (0.5 bits/dim) capped PQ-ADC recall@5
    * at ~0.2 on this near-uniform corpus NO MATTER how good the
    * codebook was (training moved it only 0.15 → 0.20): quantization
    * resolution, not centroid placement, was binding. Subspace count
    * and codebook size scale the rate at identical assignment-flop
    * cost (corpus × codes × dim); with the trained codebook and exact
    * re-ranking ([[PqRefine]]) measured recall@5 is 0.75–0.90
    * across SFs (see [[PqMinRecall]]). */
  val PqSubspaces = 16
  val PqSubDim = Dim / PqSubspaces
  val PqCodebook = 32

  /** Product quantization: split each 64-dim vector into
    * [[PqSubspaces]] sub-vectors, code each against a
    * [[PqCodebook]]-entry per-subspace codebook (argmin L2,
    * lowest-code tie-break), and
    * report the compressed code string plus exact reconstruction SSE.
    * PQ is the standard 100 TB embedding compression (64 doubles →
    * 16 five-bit codes here); the codebook is TRAINED — [[PqKmeansIters]]
    * deterministic Lloyd iterations seeded by the first
    * [[PqCodebook]] corpus vectors' sub-vectors ([[pqTrainedCents]])
    * — and the oracle re-derives the whole training from the same
    * seed.
    *
    * Scale shape: after driver-side training the book is ~16 KB of
    * DRIVER data, so code assignment is a pure scan-side projection —
    * the native [[graft.functions.PqAssignExpression]] carries the
    * book as a plan constant and emits all [[PqSubspaces]] (d, k)
    * pairs per vector in one codegen loop. The former shape (explode
    * into sub-vectors, broadcast-join the book, per-(vec, m) min_by
    * aggregate) paid a corpus × [[PqSubspaces]] row EXCHANGE to
    * recombine values that never left the row. */
  private def pqSubvecs(v: Column): Column =
    array((0 until PqSubspaces).map(m => slice(v, m * PqSubDim + 1, PqSubDim)): _*)

  /** K-means training sample bound and fixed Lloyd iteration count for
    * the PQ codebook. The sample is `vec_id < PqTrainSample` — bounded
    * and deterministic, which is BOTH the oracle requirement and the
    * 100 TB practice (PQ codebooks train on a small sample — FAISS
    * defaults to ~10⁵ vectors — never the corpus; training cost stays
    * O(sample × codebook × iters) while assignment streams the corpus
    * once against the broadcast result). */
  val PqTrainSample = 512L
  val PqKmeansIters = 3
  private val PqMicro = 1000000.0

  /** The bounded driver-side training sample, shared by BOTH trainers
    * ([[pqTrainedCents]], [[ivfTrainedCents]]): the first
    * [[PqTrainSample]] vectors, collected and id-sorted — a fixed
    * [[PqTrainSample]] × [[Dim]] doubles (~256 KB) at any corpus
    * size. */
  private def sampleVectors(emb: DataFrame): Array[(Long, Array[Double])] =
    emb.filter(col("vec_id") < PqTrainSample)
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)

  /** Contiguity guard for the EXPERIMENTAL trained-cents paths
    * ([[ivfTrainedCents]]), which still number cells by ARRAY POSITION
    * in the sorted sample with no rank-numbered oracle restatement to
    * match. The GATE paths no longer need it: the PQ codebook numbers
    * codes by rank of vec_id on BOTH sides (Scala seed position ==
    * oracle `ROW_NUMBER() OVER (ORDER BY vec_id) - 1`), and IVF cells
    * are keyed by the seed rows' raw vec_ids relationally — both are
    * hole-safe (fuzz round 19). */
  private def requireSeedContiguous(sample: Array[(Long, Array[Double])],
                                    k: Int, what: String): Unit = {
    val ids = sample.take(k).map(_._1)
    require(ids.length == k &&
      ids.zipWithIndex.forall { case (id, i) => id == i.toLong },
      s"$what seed requires contiguous vec_ids 0..${k - 1} in the training " +
        s"sample, got [${ids.mkString(",")}]: the oracle numbers seeds by " +
        "vec_id, so a non-contiguous corpus would train a divergent codebook")
  }

  /** The q83 fixed-point mean both trainers' Lloyd updates use — THE
    * oracle-parity contract: each component rounds half-up to integer
    * MICRO-units (`floor(x·10⁶ + 0.5)`, identical IEEE semantics both
    * engines), sums as a long (associative — iteration order cannot
    * move a bit), and divides back once as `sum.toDouble /
    * (count.toDouble · 10⁶)`, the exact expression tree the oracle
    * states. A change here must change [[pqTrainSql]] in lockstep. */
  private def fixedPointMean(ms: List[Array[Double]], dim: Int): Array[Double] =
    Array.tabulate(dim) { i =>
      var s = 0L
      ms.foreach(v => s += math.floor(v(i) * PqMicro + 0.5).toLong)
      s.toDouble / (ms.size.toDouble * PqMicro)
    }

  /** (cell_id, cv): the first-`nCells` seed centroids the production
    * IVF path runs on (see [[ivfTrainedCents]] for why the seed beats
    * the trained book at the fixed probe budget). */
  /** `emb` restricted to rows whose embedding has a nonzero L2 norm —
    * the celled near-dup chain's eligibility bound (a zero-norm vector
    * has no direction; the oracle keyed CTEs carry `nrm > 0`). */
  private[graft] def nonZeroNorm(emb: DataFrame): DataFrame =
    // float-reading norm (r21): same IEEE value, no cast allocation
    emb.filter(l2Norm(col("embedding")) > lit(0d))

  private def seedCents(emb: DataFrame, nCells: Int): DataFrame =
    emb.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell_id"),
        toDoubleArray(col("embedding")).as("cv"))

  /** The TRAINED per-subspace codebook: [[PqKmeansIters]] Lloyd
    * iterations seeded by the first-[[PqCodebook]] sub-vectors (the
    * former codebook — the seed is what makes the oracle able to
    * restate the whole computation). Fixed iteration count, fixed
    * seed, fixed-point means → bit-identical codebooks on every run
    * and both engines. Training the codebook roughly doubled measured
    * PQ-ADC recall@5 vs the raw first-16 seed (see [[PqMinRecall]]).
    *
    * Training runs ON THE DRIVER over the collected sample — the
    * FAISS-standard production shape (codebooks train on a small
    * sample, never the corpus; the corpus only ever sees the finished
    * book as a broadcast) and the same bounded-driver-work discipline
    * as [[Dedup]]'s driverUnionFind: the sample is a FIXED
    * [[PqTrainSample]] × [[Dim]] doubles (~256 KB) regardless of
    * corpus size. A distributed Lloyd chain was A/B'd first: 3
    * iterations × 4 shuffles of 512 rows = ~12 sequential stage waves
    * of pure scheduler floor per consumer, measuring q61 at ~6 s and
    * q88 at ~12 s at sf0.001 vs ~0.5/2 s with driver-side training —
    * the data never justified a cluster job.
    *
    * Determinism, engine-portably: the argmin assignment folds squared
    * L2 left-to-right in index order (bit-identical to the oracle's
    * `list_reduce(list_transform(...))` and to [[pqDist]]'s codegen
    * loop) with strict lowest-code tie-break; the centroid mean is the
    * q83 fixed-point recipe — each component rounds half-up to integer
    * MICRO-units (`floor(x·10⁶ + 0.5)`, identical IEEE semantics both
    * engines), sums as a long (associative — iteration order cannot
    * move a bit), and divides back once as `sum.toDouble /
    * (count.toDouble · 10⁶)`, the exact expression tree the oracle
    * states. A code with no members keeps its previous centroid. */
  def pqTrainedCents(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val book = pqTrainBook(emb)
    // iterate the book's ACTUAL shape: a corpus with holes below
    // PqCodebook trains fewer than PqCodebook rank-numbered codes
    val rows = for { m <- book.indices; k <- book(m).indices }
      yield (k, m, book(m)(k).toArray)
    rows.toDF("k", "m", "cv")
  }

  /** The trained book as the driver-side nested structure the scan
    * expressions embed: `book(m)(k)` = centroid k of subspace m. Same
    * training as [[pqTrainedCents]] (that DF is this book re-shaped);
    * Seq-of-Seq so the embedding expressions compare structurally. */
  private def pqTrainBook(emb: DataFrame): Seq[Seq[Seq[Double]]] =
    pqTrainBookFrom(sampleVectors(emb))

  /** Residual training sample for [[annIvfPq]]: the same bounded
    * sample with each vector replaced by `v − cent(cell(v))` — cell
    * assignment by the exact [[ivfCellsWith]] contract (argmax cosine
    * over the first-`nCells` seed, lowest-cell tie-break), subtraction
    * exact IEEE. Ids are preserved, so the seed-contiguity contract
    * carries over to the residual book unchanged. */
  private def residualSample(emb: DataFrame,
                             nCells: Int): Array[(Long, Array[Double])] = {
    val sample = sampleVectors(emb)
    // coarse cents = sampled rows with vec_id < nCells (takeWhile over
    // the id-sorted sample), the EXACT set the oracle's
    // `WHERE vec_id < nCells` picks — on a corpus with holes take(n)
    // would grab ids ≥ nCells the oracle never sees. The positional
    // ascending scan below tie-breaks by ascending id, same as the
    // oracle's `ORDER BY ... cell_id ASC`; contiguity is NOT required.
    require(sample.nonEmpty, "IVF-PQ: empty training sample")
    val cents: Array[Array[Double]] =
      sample.takeWhile(_._1 < nCells).map(_._2)
    require(cents.nonEmpty,
      s"IVF-PQ coarse seed: no sampled vec_id < $nCells")
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    sample.map { case (id, v) =>
      var bestK = 0
      var bestC = dot(v, cents(0)) / (math.sqrt(dot(v, v)) * math.sqrt(dot(cents(0), cents(0))))
      var k = 1
      while (k < cents.length) {
        val c = dot(v, cents(k)) / (math.sqrt(dot(v, v)) * math.sqrt(dot(cents(k), cents(k))))
        if (c > bestC) { bestC = c; bestK = k }
        k += 1
      }
      (id, Array.tabulate(v.length)(i => v(i) - cents(bestK)(i)))
    }
  }

  private def pqTrainBookFrom(
      sample: Array[(Long, Array[Double])]): Seq[Seq[Seq[Double]]] = {
    // seed set = sampled vec_ids < PqCodebook (takeWhile below), codes
    // numbered by RANK of vec_id within that set — the oracle's cb0
    // numbers by the same rank (ROW_NUMBER OVER ORDER BY vec_id), so a
    // corpus with holes below PqCodebook trains the IDENTICAL book on
    // both sides; contiguity is no longer required (fuzz tiny profile).
    require(sample.exists(_._1 < PqCodebook),
      s"PQ codebook: no sampled vec_id < $PqCodebook to seed from")
    def slice(v: Array[Double], m: Int): Array[Double] =
      java.util.Arrays.copyOfRange(v, m * PqSubDim, (m + 1) * PqSubDim)
    def sqL2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    (0 until PqSubspaces).map { m =>
      val svs = sample.map { case (_, v) => slice(v, m) }
      val seed = sample.takeWhile(_._1 < PqCodebook).map { case (_, v) => slice(v, m) }
      val trained = (1 to PqKmeansIters).foldLeft(seed) { (cb, _) =>
        // assign: strict `<` while scanning codes in ascending order
        // = argmin with lowest-code tie-break
        val members = Array.fill(cb.length)(List.empty[Array[Double]])
        svs.foreach { sv =>
          var bestK = 0; var bestD = sqL2(sv, cb(0)); var k = 1
          while (k < cb.length) {
            val d = sqL2(sv, cb(k))
            if (d < bestD) { bestD = d; bestK = k }
            k += 1
          }
          members(bestK) ::= sv
        }
        Array.tabulate(cb.length) { k =>
          val ms = members(k)
          if (ms.isEmpty) cb(k) else fixedPointMean(ms, PqSubDim)
        }
      }
      trained.map(_.toSeq).toSeq
    }
  }

  /** The whole-vector assignment column: array over subspaces of
    * struct(d, k) — one native-expression evaluation per row, zero
    * exchanges (see [[graft.functions.PqAssignExpression]]). */
  private def pqAssignCol(book: Seq[Seq[Seq[Double]]]): Column =
    graft.functions.VectorExpressions.pqAssign(
      toDoubleArray(col("embedding")), book)

  /** (vec_id, m, k, d): per-subspace argmin code assignment against
    * the trained codebook — a scan-side posexplode of the assignment
    * array, no join or aggregate anywhere. */
  def pqAssignments(emb: DataFrame): DataFrame =
    Layout.widen(emb)
      .select(col("vec_id"), posexplode(pqAssignCol(pqTrainBook(emb))).as(Seq("m", "b")))
      .select(col("vec_id"), col("m"), col("b.k").as("k"), col("b.d").as("d"))

  def pqCodes(emb: DataFrame): DataFrame = {
    val book = pqTrainBook(emb)
    // generator barrier (see quantizeStats): codes and sse both read
    // the assignment array; a plain projection would be re-inlined by
    // CollapseProject and run the argmin twice per row
    Layout.widen(emb)
      .select(col("vec_id"), explode(array(pqAssignCol(book))).as("a"))
      .select(col("vec_id"),
        concat_ws("-", transform(col("a"), x => x.getField("k").cast("string")))
          .as("codes"),
        // ascending-m fold — same addition order as the former sorted
        // per-vector rollup, so the SSE doubles are bit-identical
        aggregate(transform(col("a"), x => x.getField("d")), lit(0.0),
          (a, x) => a + x).as("sse"))
  }

  /** ADC shortlist width as a multiple of k — the standard PQ
    * re-ranking refinement factor (Jégou et al. 2011's IVFADC+R):
    * the quantized scan nominates `refine × k` candidates, the exact
    * re-rank orders them. Recall@k of the final result equals the
    * ADC's recall@(refine·k), which is far higher than its recall@k —
    * the quantizer only has to get the neighbor into the top-40, not
    * the top-5.
    *
    * 8 (up from 4 in round 10): the round-9 config measured recall@5
    * 0.575 at sf0.1 — one benign corpus re-cut from the 0.5 gate.
    * Refine sweep (recall@5 at sf0.001/0.01/0.1): 4 → .875/.825/.575,
    * 6 → .875/.875/.700, 8 → .900/.900/.750, 12 → 1.0/.925/.850.
    * 8 clears the bar by ≥0.25 at every SF; the cost is the shortlist
    * width (40 vs 20 rows per query through the broadcast re-rank) —
    * unmeasurable against run noise at every SF, because re-rank cost
    * is refine×k×nQueries vector fetches, not a corpus term. */
  val PqRefine = 8

  /** PQ-ADC approximate nearest neighbors with exact re-ranking, the
    * production two-stage shape: (1) each query builds a tiny
    * (subspace × code) lookup table of squared distances to every
    * codebook entry, and a corpus vector's approximate distance is
    * just [[PqSubspaces]] table lookups summed — the corpus EMBEDDINGS
    * are never touched, only their code assignments; (2) the top
    * `refine × k` ADC candidates are re-ranked by exact cosine,
    * touching only those `refine × k × nQueries` raw vectors. This is
    * the memory-bound ANN shape at 100 TB: stage 1 scans the code
    * index (nibbles) at O(corpus × subspaces) lookups with the LUT and
    * codebook broadcast; stage 2's vector fetches are a broadcast-size
    * semi-join against the full-fidelity store.
    *
    * Determinism: the per-subspace ADC terms are summed by an
    * ascending-m lookup fold (fixed addition order); both rankings
    * tie-break by c_id. */
  def annPq(emb0: DataFrame, nQueries: Long = GateQueries, k: Int = TopK,
            refine: Int = PqRefine): DataFrame = {
    val emb = nonZeroNorm(emb0) // cosine-based board: zero-norm vectors are outside its universe (fuzz r19)
    // ONE driver-trained book feeds both sides as plan constants —
    // the corpus code assignment and the per-query distance LUTs
    val book = pqTrainBook(emb)
    val codes = Layout.widen(emb)
      .select(col("vec_id").as("c_id"),
        transform(pqAssignCol(book), x => x.getField("k")).as("cks"))
    // lut[m][code] = squared L2 from query sub-vector m to centroid
    // `code` — one row per query, built in the same scan that reads
    // the query vectors (the book is a literal, so no join, and the
    // per-term doubles are the same ArraySquaredL2 folds as before)
    val bookLit = typedLit(book)
    val lut = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"),
        transform(pqSubvecs(toDoubleArray(col("embedding"))), (sv, m) =>
          transform(element_at(bookLit, m + lit(1)), cv =>
            graft.functions.VectorExpressions.squaredL2(sv, cv))).as("lut"))
    // ADC scan: corpus codes × broadcast query LUTs; adist is an
    // ascending-m lookup fold — the identical operand sequence to the
    // former join-then-regroup shape, which shuffled corpus × queries
    // rows through a groupBy(q_id, c_id) exchange just to re-collect
    // terms that were born on the same row
    val approx = codes.crossJoin(broadcast(lut))
      .select(col("q_id"), col("c_id"),
        aggregate(zip_with(col("cks"), col("lut"),
          (ck, lm) => element_at(lm, ck + lit(1))),
          lit(0.0), (a, x) => a + x).as("adist"))
    // the ADC scan emits one adist row per corpus code per query — the
    // corpus term of the PQ path — so shortlist selection is the
    // bounded aggregate on NEGATED distance ((-adist DESC, c_id ASC)
    // ≡ (adist ASC, c_id ASC), ties included: equal distances negate
    // to equal doubles and fall through to the id tiebreak)
    val shortlist = approx.filter(col("q_id") =!= col("c_id"))
      .groupBy(col("q_id"))
      .agg(TopKAgg.topK(-col("adist"), col("c_id"), k * refine).as("top"))
      .select(col("q_id"), explode(col("top.id")).as("c_id"))
    // exact re-rank: only shortlist vectors are read at full fidelity
    // (raw float32 — the dot kernel widens in-register, r21)
    val vecs = emb.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", l2Norm(col("v")))
    val qv = vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val rw = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id").asc)
    vecs.select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
      .join(broadcast(shortlist), "c_id")
      .join(broadcast(qv), "q_id")
      .select(col("q_id"), col("c_id"),
        (dotProduct(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
      .withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), portableRound(col("cos"), 4).as("cos"), col("rank"))
  }

  /** IVF-PQ: the composed production index (FAISS IVFADC, Jégou et
    * al. 2011) — coarse IVF cells partition the corpus, and product
    * quantization encodes each vector's RESIDUAL from its cell
    * centroid (residuals are tighter-clustered than raw vectors, so
    * the same code rate quantizes finer). Search probes `nProbes`
    * cells; within each probed cell the query builds a LUT from ITS
    * residual against that cell (q − centroid_c), ADC-scores the
    * cell's members by code lookups alone, and the global shortlist is
    * exact-re-ranked. This is [[annIvf]]'s candidate bound times
    * [[annPq]]'s memory bound in one plan — at 100 TB the scan touches
    * probes/cells of the CODE index (bytes per vector) and raw vectors
    * only for the `refine·k` shortlist.
    *
    * Scale shape: cell assignment + residual + code assignment are ONE
    * corpus scan (centroids and the trained residual book both ride as
    * plan constants — zero joins, zero shuffles to index); probes are
    * query-side (nQueries × nProbes rows, broadcast); ADC candidates
    * are corpus × probes/cells rows, so the shortlist is the bounded
    * top-k aggregate on negated distance; the re-rank is the q61
    * broadcast semi-join.
    *
    * Determinism: the residual book trains on the bounded sample's
    * residuals with the same fixed-point Lloyd as [[pqTrainedCents]];
    * residual subtraction is exact IEEE; every fold (assignment
    * argmin, LUT terms, ADC sum) keeps the q61-proven operand order;
    * both rankings tie-break by c_id.
    *
    * Measured recall@5 vs brute truth at sf0.001/0.01/0.1:
    * 0.925/0.925/0.825 at the composed-index shortlist factor
    * [[IvfPqRefine]] = 16 (see that constant for the probes-vs-refine
    * sweep: probe count was NOT the binding dial on this deliberately
    * NEAR-UNIFORM corpus — ANN's worst case, see [[annLsh]]'s
    * recall-by-math note). The spec floors recall at ≥ 0.5 on a
    * clustered corpus with real neighbor structure. */
  def annIvfPq(emb0: DataFrame, nQueries: Long = GateQueries, k: Int = TopK,
               nCells: Int = IvfCells, nProbes: Int = IvfProbes,
               refine: Int = IvfPqRefine): DataFrame = {
    val emb = nonZeroNorm(emb0) // cosine-based board: zero-norm vectors are outside its universe (fuzz r19)
    val cents = seedCentroidList(emb, nCells)
    // cells are keyed by the seed rows' vec_ids everywhere downstream
    // (map-literal centroid lookup, relational probe join) — holes
    // below nCells are fine; only an EMPTY seed set has no meaning
    require(cents.nonEmpty, s"IVF-PQ: no seed rows with vec_id < $nCells")
    val book = pqTrainBookFrom(residualSample(emb, nCells))
    ivfPqSearch(ivfPqCodes(emb, cents, book), emb, cents, book,
      nQueries, k, nProbes, refine)
  }

  /** The composed index's corpus code table: ONE scan → cell
    * (plan-constant argmax), residual (plan-constant centroid lookup),
    * residual codes (plan-constant book). The struct barrier keeps
    * cell from re-evaluating in the residual lookup (the annIvf
    * generator-barrier discipline). */
  private def ivfPqCodes(emb: DataFrame, cents: Seq[(Long, Seq[Double])],
                         book: Seq[Seq[Seq[Double]]]): DataFrame = {
    // centroid lookup keyed by CELL ID (map literal), not array
    // position: cell ids are the seed rows' vec_ids, and a corpus with
    // a hole below IvfCells (fuzz tiny profile) makes position ≠ id —
    // the positional element_at silently subtracted the WRONG centroid
    val centMap = typedLit(cents.toMap)
    Layout.widen(emb)
      .select(col("vec_id").as("c_id"),
        explode(array(struct(
          toDoubleArray(col("embedding")).as("v"),
          graft.functions.VectorExpressions.argMaxCosine(
            toDoubleArray(col("embedding")), cents).as("cell_id")))).as("s"))
      .select(col("c_id"), col("s.cell_id").as("cell_id"),
        transform(graft.functions.VectorExpressions.pqAssign(
          zip_with(col("s.v"),
            element_at(centMap, col("s.cell_id")),
            (a, b) => a - b),
          book), x => x.getField("k")).as("cks"))
  }

  /** The composed index's search stages over an EXISTING code table
    * (freshly scanned in [[annIvfPq]], persisted in
    * [[annIvfPqFromIndex]]): probe window → per-(query, probed cell)
    * residual LUT broadcast → ADC fold → bounded top-k shortlist →
    * exact re-rank against the raw vectors. */
  private def ivfPqSearch(codes: DataFrame, emb: DataFrame,
                          cents: Seq[(Long, Seq[Double])],
                          book: Seq[Seq[Seq[Double]]],
                          nQueries: Long, k: Int, nProbes: Int,
                          refine: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bookLit = typedLit(book)
    // the centroid relation comes from the driver list (bounded), so
    // the search works identically whether the seed rows are still in
    // `emb` or the index was built in another session
    val centsDf = cents.toDF("cell_id", "centv")
    val vecs = emb.select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("cell_id").asc)
    val probes = vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      .join(broadcast(centsDf))
      .select(col("q_id"), col("qv"), col("cell_id"), col("centv"),
        (dotProduct(col("qv"), col("centv")) /
          (col("qn") * l2Norm(col("centv")))).as("cos"))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nProbes)
      .select(col("q_id"), col("cell_id"),
        zip_with(col("qv"), col("centv"), (a, b) => a - b).as("qres"))
      .select(col("q_id"), col("cell_id"),
        transform(pqSubvecs(col("qres")), (sv, m) =>
          transform(element_at(bookLit, m + lit(1)), cv =>
            graft.functions.VectorExpressions.squaredL2(sv, cv))).as("lut"))
    // ADC within probed cells only: adist = ascending-m lookup fold
    val approx = codes.join(broadcast(probes), Seq("cell_id"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        aggregate(zip_with(col("cks"), col("lut"),
          (ck, lm) => element_at(lm, ck + lit(1))),
          lit(0.0), (a, x) => a + x).as("adist"))
    val shortlist = approx
      .groupBy(col("q_id"))
      .agg(TopKAgg.topK(-col("adist"), col("c_id"), k * refine).as("top"))
      .select(col("q_id"), explode(col("top.id")).as("c_id"))
    val qv = vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val rw = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id").asc)
    vecs.select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
      .join(broadcast(shortlist), "c_id")
      .join(broadcast(qv), "q_id")
      .select(col("q_id"), col("c_id"),
        (dotProduct(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
      .withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), portableRound(col("cos"), 4).as("cos"), col("rank"))
  }

  /** Persist the composed index: `dir/cents` + `dir/book` (the bounded
    * driver metadata the search rebuilds its plan constants from) and
    * `dir/codes` PARTITIONED BY cell_id — the on-disk layout IS the
    * IVF promise: a probe set prunes to its cells' directories and the
    * unprobed corpus is never even listed. Build once, serve many —
    * the lifecycle [[graft.streaming.IndexMaintenance]] monitors
    * (drift → rebuild flag) close over this pair. */
  def buildIvfPqIndex(emb0: DataFrame, dir: String,
                      nCells: Int = IvfCells): Unit = {
    val emb = nonZeroNorm(emb0) // cosine-based board: zero-norm vectors are outside its universe (fuzz r19)
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = seedCentroidList(emb, nCells)
    require(cents.nonEmpty, s"IVF-PQ: no seed rows with vec_id < $nCells")
    val book = pqTrainBookFrom(residualSample(emb, nCells))
    cents.toDF("cell_id", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/cents")
    (for { m <- 0 until PqSubspaces; kk <- 0 until PqCodebook }
      yield (m, kk, book(m)(kk)))
      .toDF("m", "k", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/book")
    ivfPqCodes(emb, cents, book)
      .repartition(col("cell_id"))
      .write.mode("overwrite").partitionBy("cell_id")
      .parquet(s"$dir/codes")
  }

  /** Search a PERSISTED index ([[buildIvfPqIndex]]) — same result as
    * [[annIvfPq]] by construction (identical metadata → identical plan
    * constants), without re-assigning the corpus: the probe set is
    * derived ON THE DRIVER (centroids are driver metadata and the
    * query vectors are a bounded collect), so the codes scan carries a
    * STATIC `cell_id IN (...)` partition filter and only probed cells'
    * directories are read — at 100 TB that is probes/cells of the
    * code index touched per query batch, the serving contract the
    * composed index exists for. The driver-side probe ranking uses the
    * same dot/norm/divide operand order as the probe window and the
    * same (cos DESC, cell ASC) tie-break, so pruning can never drop a
    * cell the plan-side probes would pick. */
  def annIvfPqFromIndex(spark: SparkSession, dir: String, emb0: DataFrame,
                        nQueries: Long = GateQueries, k: Int = TopK,
                        nProbes: Int = IvfProbes,
                        refine: Int = IvfPqRefine): DataFrame = {
    val emb = nonZeroNorm(emb0) // cosine-based board: zero-norm vectors are outside its universe (fuzz r19)
    val cents = spark.read.parquet(s"$dir/cents").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    val bookRows = spark.read.parquet(s"$dir/book").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2))).toMap
    val book: Seq[Seq[Seq[Double]]] = (0 until PqSubspaces).map(m =>
      (0 until PqCodebook).map(kk => bookRows((m, kk))))
    def dot(a: Seq[Double], b: Seq[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val qvecs = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), toDoubleArray(col("embedding"))).collect()
      .map(r => r.getSeq[Double](1))
    val probedCells: Seq[Long] = qvecs.flatMap { v =>
      val qn = math.sqrt(dot(v, v))
      cents.map { case (cid, cv) =>
        (cid, dot(v, cv) / (qn * math.sqrt(dot(cv, cv)))) }
        .sortBy { case (cid, c) => (-c, cid) }.take(nProbes).map(_._1)
    }.distinct.sorted
    val codes = spark.read.parquet(s"$dir/codes")
      .filter(col("cell_id").isin(probedCells: _*))
      .select(col("c_id"), col("cell_id").cast("long").as("cell_id"),
        col("cks"))
    ivfPqSearch(codes, emb, cents, book, nQueries, k, nProbes, refine)
  }

  /** Multi-probe radius the recall audit certifies LSH at — see
    * [[annLsh]]: single-probe (maxFlips 0) measures recall 0.0 on
    * this corpus, so auditing it would certify nothing. */
  val LshProbeFlips = 3

  /** Minimum certified recall@5 per ANN method — set with margin
    * under the values measured at sf0.001, sf0.01 AND sf0.1
    * (near-uniform embeddings): multi-probe LSH (r=3) 0.4–0.6, IVF
    * (2/16 probes) 0.925–1.0, PQ 0.75–0.90 (refine 8 — the round-10
    * sweep recorded at [[PqRefine]] lifted the sf0.1 margin over this
    * bar from 0.075 to 0.25). PQ's bar rose 0.1 →
    * 0.5 in round 9 when the path became production-shaped: a TRAINED
    * codebook ([[pqTrainedCents]] — deterministic Lloyd over a fixed
    * sample), 16×4-dim subspaces (1 bit/dim; the old 8×8-dim geometry
    * capped ADC recall ~0.2 regardless of codebook quality), and ADC
    * shortlist + exact re-rank ([[PqRefine]] — the step that lifts
    * final recall to the ADC's recall@20). The audit certifies the
    * index DOESN'T DEGRADE: a code change that halves a method's
    * recall flips `recall_ok` and the driver gate goes red, same
    * contract as q81's HLL tolerance. */
  val LshMinRecall = 0.3
  val IvfMinRecall = 0.55
  val PqMinRecall = 0.5

  /** The composed index's ADC shortlist factor — WIDER than plain
    * PQ's [[PqRefine]] on purpose: a probes/refine sweep at sf0.1
    * measured recall@5 FLAT at 0.5 across nProbes 2/4/8/16 but
    * 0.5 → 0.825 → 1.0 at refine 8/16/32 — on this near-uniform
    * corpus the residual quantizer scrambles within-candidate order,
    * so the recall dial is the shortlist width, not the probe count.
    * 16 costs only refine×k×nQueries re-rank fetches (not a corpus
    * term); measured ladder at 16: 0.925/0.925/0.825. */
  val IvfPqRefine = 16

  /** IVF-PQ's certification floor: measured recall@5 is
    * 0.925/0.925/0.825 at sf0.001/0.01/0.1 with [[IvfPqRefine]] = 16,
    * so the bar sits 0.325 under the worst measurement (the LSH-arm
    * margin discipline). */
  val IvfPqMinRecall = 0.5

  /** Recall-audit gate for the three ANN paths — certifies index
    * QUALITY the way [[Sketches.hllAudit]] certifies sketch accuracy:
    * each method's top-k against the exact [[knnBrute]] ground truth
    * on the same queries, one row per method with the measured
    * recall@k and a `recall_ok` boolean against the thresholds above.
    * A hash mismatch on this query means "index quality moved", not
    * "wrong answer" — the recall VALUES are deterministic (every
    * ranking here tie-breaks on c_id, and hit counts are integers),
    * so reruns are stable and the gate is hash-checkable.
    *
    * Scale note: ground truth is the expensive arm (brute force over
    * the corpus for `nQueries` probes) — like the HLL audit's exact
    * arm, run it on a sampled query set to certify the index, never
    * corpus-wide. The three ANN arms are the production paths at
    * their production shapes; truth is checkpointed so the corpus
    * scan behind it runs once, and each hit count is a broadcast-size
    * semi-join (nQueries × k rows) against an ANN result. */
  def annRecall(emb: DataFrame, nQueries: Long = GateQueries, k: Int = TopK): DataFrame =
    annRecallFrom(knnBrute(emb, nQueries, k), Seq(
      ("lsh_mp", annLsh(emb, nQueries, k, LshProbeFlips), LshMinRecall),
      ("ivf", annIvf(emb, nQueries, k), IvfMinRecall),
      ("pq", annPq(emb, nQueries, k), PqMinRecall),
      ("ivfpq", annIvfPq(emb, nQueries, k), IvfPqMinRecall),
      ("jl", annJl(emb, nQueries, k), JlMinRecall),
      ("ivf_jl", annIvfJl(emb, nQueries, k), IvfJlMinRecall)))

  /** [[annRecall]] from precomputed truth and arm result tables — the
    * shared-core form the gate registry feeds: q88's truth IS q30's
    * output and four of its five arms ARE q38/q61/q100/q118's outputs,
    * so a batch run builds each chain once and the recall audit is
    * reduced to its semi-join hit counts over k·nQueries-row tables.
    * Each `arms` entry is (method, top-k table, min-recall gate). */
  def annRecallFrom(truthFull: DataFrame,
                    arms: Seq[(String, DataFrame, Double)]): DataFrame = {
    val spark = truthFull.sparkSession
    val truth = truthFull
      .select(col("q_id"), col("c_id")).coreCheckpoint()
    // ONE tagged union + ONE semi-join + ONE grouped count replace the
    // former per-arm join→agg→crossJoin chain (r20): six arms cost six
    // broadcast semi-joins and twelve 1-row aggregates as separate AQE
    // stage jobs on q88's tail — at sf0.1 a query's wall is dominated
    // by its driver-visible stage count, not per-row work — where the
    // fused shape pays one join and one aggregate regardless of arm
    // count. Per-arm rows, values and types are unchanged (check.py
    // sorts rows, so row order is free); the literal arm table anchors
    // the board so an arm with ZERO hits — or zero result rows on a
    // degenerate corpus — still publishes its n_hits = 0 row exactly
    // as the per-arm count() did.
    val tagged = arms.map { case (m, ann, _) =>
      ann.select(lit(m).as("method"), col("q_id"), col("c_id"))
    }.reduce(_ unionByName _)
    val hitCounts = tagged
      .join(truth, Seq("q_id", "c_id"), "left_semi")
      .groupBy(col("method")).agg(count(lit(1)).as("hits"))
    val armMeta = spark.createDataFrame(
      arms.map { case (m, _, r) => (m, r) }).toDF("method", "min_recall")
    armMeta.join(broadcast(hitCounts), Seq("method"), "left")
      .crossJoin(truth.agg(count(lit(1)).as("n_truth")))
      .select(col("method"), col("n_truth"),
        coalesce(col("hits"), lit(0L)).as("n_hits"),
        // n_truth = 0 (single-vector corpus: no neighbor pairs) has
        // no defined recall: NULL, the value DuckDB's double/0
        // yields; the lazy CaseWhen keeps ANSI division from
        // throwing. portableRound: engine-identical tie-break.
        // recall_ok compares the ROUNDED value so both engines test
        // the same 4-decimal number.
        when(col("n_truth") > 0, portableRound(
          coalesce(col("hits"), lit(0L)).cast("double") / col("n_truth"), 4))
          .as("recall"),
        col("min_recall"))
      .withColumn("recall_ok", col("recall") >= col("min_recall"))
      .drop("min_recall")
  }

  /** q158: leave-one-out kNN label accuracy — the embedding-quality
    * eval a representation owner runs before trusting the space for
    * anything else: for each query vector, the majority label of its
    * k exact nearest neighbours (self excluded) against its own label,
    * rolled up per true label. Uniformly low accuracy means the space
    * carries no label signal; ONE low label pocket means that class
    * is entangled — the per-class read that decides where to spend
    * labeling or re-embedding budget. The vote is deterministic:
    * (count DESC, label ASC), so ties never flap the board.
    *
    * Scale design: neighbours come from [[knnBrute]]'s broadcast-query
    * corpus pass (nQueries bounded — an eval sample, never corpus²);
    * everything after runs on nQueries × k rows: one equi-join to
    * attach neighbour labels, a grouped vote count, a max_by argmax
    * (map-side partials), one more join for the true label, and a
    * per-label rollup. */
  def knnLabelAccuracy(emb: DataFrame, nQueries: Long = 64L,
                       k: Int = TopK): DataFrame = {
    val labels = emb.select(col("vec_id"), col("label"))
    val votes = knnBrute(emb, nQueries, k)
      .join(labels.select(col("vec_id").as("c_id"),
        col("label").as("n_label")), Seq("c_id"))
      .groupBy(col("q_id"), col("n_label")).agg(count(lit(1)).as("cnt"))
    val pred = votes.groupBy(col("q_id"))
      .agg(max_by(col("n_label"),
        struct(col("cnt"), (-col("n_label")).as("tb"))).as("pred_label"))
    pred
      .join(labels.select(col("vec_id").as("q_id"),
        col("label").as("true_label")), Seq("q_id"))
      .groupBy(col("true_label"))
      .agg(count(lit(1)).as("n_queries"),
        count(when(col("pred_label") === col("true_label"), 1))
          .as("n_correct"))
      .withColumn("accuracy",
        portableRound(col("n_correct").cast("double") / col("n_queries"), 4))
  }

  /** q155: the IVF nprobe sweep — recall vs scan cost at every probe
    * fan-out, the tuning curve an ANN operator reads to place the
    * recall/latency knee before fixing `nProbes` in production: per
    * probe count (1, 2, 4, 8), recall@k against the exact brute truth
    * on the same queries, the candidate count the arm actually
    * exact-ranks, and that count as a fraction of the full corpus
    * scan a brute query would pay. q88 certifies the CHOSEN setting;
    * this board shows the whole frontier the choice was made on.
    *
    * Scale design: truth is [[knnBrute]] (one corpus pass), built once
    * and checkpointed; each arm is the production [[annIvf]] chain at
    * its probe setting. The scan cost is NOT measured by re-running
    * the join — it is computed from the cell OCCUPANCY table (nCells
    * rows) joined to the probe ranking (nQueries × maxProbes rows):
    * candidates = Σ occupancy(probed cells) − 1 per query, exact
    * because the query's own cell is always probe #1 (assignment and
    * probe ranking share the same argmax-cosine criterion and
    * tie-break). Everything after the arms is 1-row aggregates. */
  def ivfProbeSweep(emb: DataFrame, probesList: Seq[Int] = Seq(1, 2, 4, 8),
                    nQueries: Long = GateQueries, k: Int = TopK,
                    nCells: Int = IvfCells): DataFrame =
    ivfProbeSweepFrom(knnBrute(emb, nQueries, k), emb, probesList,
      nQueries, k, nCells)

  /** [[ivfProbeSweep]] from a precomputed brute-truth table — the
    * shared-core form the gate registry feeds (q155's truth IS q30's
    * output, same as q88's). */
  private[graft] def ivfProbeSweepFrom(truthFull: DataFrame, emb0: DataFrame,
                                       probesList: Seq[Int] = Seq(1, 2, 4, 8),
                                       nQueries: Long = GateQueries, k: Int = TopK,
                                       nCells: Int = IvfCells): DataFrame = {
    val emb = nonZeroNorm(emb0) // cosine-based board: zero-norm vectors are outside its universe (fuzz r19)
    val truth = truthFull
      .select(col("q_id"), col("c_id")).coreCheckpoint()
    val centsDf = seedCents(emb, nCells)
    val local = collectCents(centsDf)
    // ONE assigned-corpus scan shared by every arm — four annIvf arms
    // each rebuilding the argmax-assignment scan was the whole cost of
    // this board's first cut
    // raw float32 corpus payload (r21): halves the checkpointed bytes
    // every arm re-reads; kernels widen in-register (same doubles)
    val corpus = Layout.widen(emb)
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"))
      .select(col("c_id"),
        graft.functions.VectorExpressions.argMaxCosine(col("cv"), local)
          .as("cell_id"),
        col("cv"), l2Norm(col("cv")).as("cn"))
      .coreCheckpoint()
    val occ = corpus.groupBy(col("cell_id")).agg(count(lit(1)).as("occ"))
    val cents = centsDf.select(col("cell_id"), col("cv").as("centv"))
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("cell_id").asc)
    val probes = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      .withColumn("qn", l2Norm(col("qv")))
      .join(broadcast(cents))
      .select(col("q_id"), col("qv"), col("qn"), col("cell_id"),
        (dotProduct(col("qv"), col("centv")) /
          (col("qn") * l2Norm(col("centv")))).as("cos"))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= probesList.max)
      .join(broadcast(occ), Seq("cell_id"))
      .coreCheckpoint() // nQueries × maxProbes rows
    val nVecs = emb.agg(count(lit(1)).as("n_vecs"))
    val spark = emb.sparkSession
    // ONE scored candidate pass + ONE per-(arm, query) top-k + ONE
    // truth semi-join + ONE occupancy rollup replace the former four
    // per-arm chains (r20): each arm re-joined the checkpointed corpus
    // against its probe slice, re-ranked, re-counted hits and re-read
    // the occupancy — ~10 driver-visible stage jobs per arm at sf0.1
    // where per-row work is trivial (q155 profiled at 45 jobs). A
    // candidate's probe rank `rn` decides which arms see it (rn ≤ p —
    // candidate sets nest), so exploding each scored row to its
    // eligible arms and grouping by (arm, query) computes the SAME
    // per-arm top-k (same scores, same c_id tie-break) in one
    // aggregate; the literal arm table anchors arms with zero rows on
    // degenerate corpora, and the null/zero edge behavior matches the
    // former global aggregates (nulls on empty probe/truth sides,
    // null scan_frac when the denominator is 0).
    val armsLit = typedLit(probesList)
    val scored = corpus.join(broadcast(probes), Seq("cell_id"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), col("rn"),
        (dotProduct(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
      .select(col("q_id"), col("c_id"), col("cos"),
        explode(filter(armsLit, p => p >= col("rn"))).as("p"))
    val hitsByArm = scored
      .groupBy(col("p"), col("q_id"))
      .agg(TopKAgg.topK(col("cos"), col("c_id"), k).as("top"))
      .select(col("p"), col("q_id"), explode(col("top.id")).as("c_id"))
      .join(truth, Seq("q_id", "c_id"), "left_semi")
      .groupBy(col("p")).agg(count(lit(1)).as("hits"))
    val costByArm = probes
      .select(col("q_id"), col("occ"),
        explode(filter(armsLit, p => p >= col("rn"))).as("p"))
      .groupBy(col("p"))
      .agg((sum(col("occ")) - countDistinct(col("q_id"))).as("n_candidates"),
        countDistinct(col("q_id")).as("n_q"))
    val meta = spark.createDataFrame(probesList.map(Tuple1(_)))
      .toDF("n_probes")
    meta
      .join(broadcast(hitsByArm), meta("n_probes") === hitsByArm("p"), "left")
      .drop("p")
      .join(broadcast(costByArm), meta("n_probes") === costByArm("p"), "left")
      .drop("p")
      .crossJoin(truth.agg(count(lit(1)).as("n_truth")))
      .crossJoin(broadcast(nVecs))
      .select(col("n_probes"), col("n_truth"),
        coalesce(col("hits"), lit(0L)).as("n_hits"),
        // zero denominators (single-vector corpus: no truth pairs,
        // n_vecs-1 = 0) yield NULL — the value DuckDB's double/0
        // already produces; the lazy CaseWhen keeps ANSI division
        // from throwing (fuzz tiny profile)
        when(col("n_truth") > 0, portableRound(
          coalesce(col("hits"), lit(0L)).cast("double") / col("n_truth"), 4))
          .as("recall"),
        col("n_candidates"),
        when(coalesce(col("n_q"), lit(0L)) * (col("n_vecs") - 1) > 0,
          portableRound(col("n_candidates").cast("double") /
            (col("n_q") * (col("n_vecs") - 1)), 4)).as("scan_frac"))
  }

  /** IVF index health — the BATCH staleness report whose streaming
    * twin is [[graft.streaming.IndexMaintenance.maintainIvf]]: per
    * cell, the member count and the mean member→centroid cosine, with
    * a `rebuild` flag when the mean drops below `minMeanCos`. A cell
    * whose members no longer resemble its centroid stops pruning the
    * search space — this is the query an index operator schedules
    * nightly to decide when to retrain.
    *
    * Scale design: assignment is the scan-side `argmax_cosine` plan
    * constant (q38 contract, zero joins); the member cosine is a pure
    * projection against the SAME bounded centroid list riding as an
    * array literal (`element_at` by cell id — no join to a centroid
    * table); the rollup is one aggregate keyed by nCells values.
    * Determinism: the mean rides [[exactSum]]'s decimal accumulator —
    * a plain double sum would drift with partition order; the rebuild
    * flag is computed from the same exact expression both engines. */
  def ivfHealth(emb0: DataFrame, nCells: Int = IvfCells,
                minMeanCos: Double = 0.25): DataFrame = {
    val emb = nonZeroNorm(emb0) // cosine-based board: zero-norm vectors are outside its universe (fuzz r19)
    val cents = seedCentroidList(emb, nCells)
    val cvs = typedLit(cents.map(_._2))
    val cns = typedLit(cents.map { case (_, c) =>
      math.sqrt(c.map(x => x * x).sum) })
    val idx = (col("cell_id") + 1).cast("int")
    val assigned = Layout.widen(emb)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("cell_id",
        graft.functions.VectorExpressions.argMaxCosine(col("v"), cents))
      .withColumn("cos", dotProduct(col("v"), element_at(cvs, idx)) /
        (l2Norm(col("v")) * element_at(cns, idx)))
    val mean = exactSum(col("cos")) / count(lit(1))
    assigned.groupBy(col("cell_id"))
      .agg(count(lit(1)).as("n_members"),
        portableRound(mean, 4).as("mean_cos"),
        (mean < lit(minMeanCos)).as("rebuild"))
  }

  /** PQ codebook health — the BATCH retrain signal whose streaming
    * twin is [[graft.streaming.IndexMaintenance.maintainPq]]: per
    * subspace, the corpus-mean squared reconstruction error of the
    * assigned code, flagged when it exceeds `errThreshold`. A subspace
    * whose codes no longer fit the data inflates every ADC distance
    * that rides it ([[annPq]]/[[annIvfPq]]) — this is the query that
    * says WHICH sixteenth of the codebook to retrain.
    *
    * Scale design: assignment + per-subspace distance come from the
    * same one-pass `pq_assign` kernel as q51 (book = plan constant,
    * zero joins); the explode is corpus × [[PqSubspaces]] rows that
    * map-side partials collapse straight back to [[PqSubspaces]]
    * groups. The mean rides [[exactSum]]'s decimal accumulator and
    * the flag repeats the exact expression, same as [[ivfHealth]]. */
  def pqHealth(emb: DataFrame, errThreshold: Double = 0.015): DataFrame = {
    val book = pqTrainBook(emb)
    val mean = exactSum(col("a").getField("d")) / count(lit(1))
    Layout.widen(emb)
      .select(col("vec_id"), posexplode(pqAssignCol(book)).as(Seq("m", "a")))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_vecs"),
        portableRound(mean, 4).as("mean_err"),
        (mean > lit(errThreshold)).as("retrain"))
  }

  // ---- Johnson–Lindenstrauss sign projection (q115/q116) ----

  /** Output dimensionality of the JL projection. */
  val JlDims = 8

  /** Deterministic ±1 sign matrix for the JL projection: sign (k, d) =
    * +1 iff hash60("jl_k_d") is even — the same md5 derivation family
    * as [[planes]], embedded as literals in both the Spark plan and
    * the oracle SQL (Achlioptas 2003: ±1 entries satisfy the JL lemma
    * with the same guarantees as Gaussian projections).
    */
  val jlSigns: Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until JlDims).map { k =>
      (0 until Dim).map { d =>
        val hex = md.digest(s"jl_${k}_${d}".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 15)
        if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
      }
    }
  }

  private def jlSignLit(k: Int): Column = array(jlSigns(k).map(lit): _*)

  /** q115: project each embedding to [[JlDims]] dimensions — one row
    * per (vec_id, output dim k) with y = v · sign_k (the 1/√m JL
    * scaling is deferred to consumers; with it, pairwise distances are
    * preserved within (1±ε)).
    *
    * Scale design: the projection is the shuffle-bytes reducer that
    * runs BEFORE any vector shuffle — 8 doubles leave the scan instead
    * of 64 floats. The sign matrix rides the plan as literal arrays
    * (512 doubles — [[planes]] discipline) and each output dim is one
    * codegen'd [[graft.functions.VectorExpressions.dot]] kernel, so
    * the whole query is a parquet scan + projection + generate: zero
    * joins, zero hash shuffles at ANY corpus size.
    */
  def jlProject(emb: DataFrame, dims: Int = JlDims): DataFrame = {
    require(dims >= 1 && dims <= JlDims, s"dims must be in [1, $JlDims]: $dims")
    // float-reading sign dots (r21): same doubles, no cast allocation
    val v = col("embedding")
    val ys = array((0 until dims).map(k => dotProduct(v, jlSignLit(k))): _*)
    Layout.widen(emb)
      .select(col("vec_id"), posexplode(ys).as(Seq("k", "y")))
  }

  /** q116: certify-the-sketch for the JL projection (the q81/q99/q103
    * contract): per vector, distortion = (|y|²/m) / |v|² — the
    * projected estimate of the squared norm over the true squared norm
    * (E[distortion] = 1 for ±1 signs) — and one corpus row gating the
    * exactSum mean inside [lo, hi]. min/max ride along so a failing
    * gate names the damage. Same zero-join scan shape as [[jlProject]];
    * |y|² is the dot kernel over the 8 projections, the division is
    * single (m·|v|² scales by a power of two — exact), so every double
    * is bit-identical to the oracle's restatement.
    */
  /** q116 gate bounds — chosen INSIDE the measured sf0.001/0.01/0.1
    * mean range so the flag discriminates (q106/q108 discipline). */
  val JlAuditLo = 0.85
  val JlAuditHi = 1.15

  def jlAudit(emb: DataFrame, dims: Int = JlDims,
              lo: Double = JlAuditLo, hi: Double = JlAuditHi): DataFrame = {
    // float-reading dots (r21): same doubles, no cast allocation
    val v = col("embedding")
    val perVec = Layout.widen(emb)
      .select(col("vec_id"), v.as("v"))
      .withColumn("dv", dotProduct(col("v"), col("v")))
      .filter(col("dv") > 0d)
      .withColumn("ys",
        array((0 until dims).map(k => dotProduct(col("v"), jlSignLit(k))): _*))
      .withColumn("distortion",
        dotProduct(col("ys"), col("ys")) / (lit(dims.toDouble) * col("dv")))
    perVec
      .agg(
        count(lit(1)).as("n_vecs"),
        portableRound(exactSum(col("distortion")) / count(lit(1)), 4)
          .as("mean_distortion"),
        portableRound(min(col("distortion")), 4).as("min_distortion"),
        portableRound(max(col("distortion")), 4).as("max_distortion"))
      .withColumn("ok",
        col("mean_distortion") >= lo && col("mean_distortion") <= hi)
  }

  /** Shortlist width multiplier for [[annJl]] (shortlist = refine·k).
    * Swept at 8/16/24/32/48 across the three SFs: recall@5 rises
    * 0.25→0.75 (sf0.001), 0.225→0.825 (sf0.01), 0.15→0.425 (sf0.1).
    * An m=8 projection of a NEAR-UNIFORM corpus separates cos ≈ 0.33
    * neighbors from the bulk only weakly (the same math that zeroes
    * single-probe LSH here), so the shortlist must be wide; refine is
    * the recall/cost dial exactly as probe count is for LSH, and only
    * moves the (tiny) shortlist joins — the candidate scan cost is
    * refine-independent. */
  val JlRefine = 48

  /** q88 gate floor for the jl arm — margin discipline: ≥ 0.2 under
    * the worst measured recall (0.425 at sf0.1; 0.75/0.825 below). */
  val JlMinRecall = 0.2

  /** q118: ANN via the JL projection — the fourth index family on the
    * board (hash buckets / cells / codes / RANDOM PROJECTIONS): the
    * candidate scan ranks by cosine in the 8-dim projected space
    * (8 multiply-adds per candidate instead of 64, and an 8-double
    * vector in flight instead of 64 floats), keeps a bounded
    * refine·k shortlist per query, and re-ranks only the shortlist at
    * full fidelity. JL preserves angles in expectation, so the true
    * neighbors sit near the top of the projected ranking and survive
    * the shortlist cut — certified by the q88 `jl` arm.
    *
    * Scale shape: projections are scan-side sign-literal dots (q115
    * kernel — zero joins to build the "index"); the candidate pass is
    * the same broadcast-queries × corpus-scan + bounded top-k
    * aggregate as [[knnBrute]], at 1/8 the arithmetic and exchange
    * width; the exact pass touches refine·k·nQueries raw vectors.
    */
  def annJl(emb0: DataFrame, nQueries: Long = GateQueries, k: Int = TopK,
            refine: Int = JlRefine): DataFrame = {
    val emb = nonZeroNorm(emb0) // cosine-based board: zero-norm vectors are outside its universe (fuzz r19)
    def proj(c: Column): Column =
      array((0 until JlDims).map(kk => dotProduct(c, jlSignLit(kk))): _*)
    val corpus = Layout.widen(emb)
      .select(col("vec_id").as("c_id"),
        proj(col("embedding")).as("cy"))
      .withColumn("cn", l2Norm(col("cy")))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"),
        proj(col("embedding")).as("qy"))
      .withColumn("qn", l2Norm(col("qy")))
    val shortlist = corpus.join(broadcast(queries), col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (dotProduct(col("qy"), col("cy")) / (col("qn") * col("cn"))).as("pcos"))
      .groupBy(col("q_id"))
      .agg(TopKAgg.topK(col("pcos"), col("c_id"), k * refine).as("top"))
      .select(col("q_id"), explode(col("top.id")).as("c_id"))
    // raw float32 exact re-rank (r21): dot kernel widens in-register
    val vecs = emb.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", l2Norm(col("v")))
    val qv = vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val rw = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id").asc)
    vecs.select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
      .join(broadcast(shortlist), "c_id")
      .join(broadcast(qv), "q_id")
      .select(col("q_id"), col("c_id"),
        (dotProduct(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
      .withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), portableRound(col("cos"), 4).as("cos"), col("rank"))
  }

  /** Probe width for [[annIvfJl]] — twice plain IVF's [[IvfProbes]]:
    * the projected-space cell ranking is noisier (an m=8 projection
    * separates near-orthogonal centroids only weakly — the same
    * near-uniform-corpus math that makes [[JlRefine]] wide), so the
    * composed index buys its recall back with extra probed cells
    * instead of extra assignment arithmetic. Swept 1/2/3/4 at all
    * three SFs: recall@5 ladders 0.15→0.35 (sf0.001), 0.25→0.50
    * (sf0.01), 0.30→0.525 (sf0.1); 4 of 16 cells still prunes 75% of
    * the candidate scan. */
  val IvfJlProbes = 4

  /** q88 gate floor for the ivf_jl arm — margin discipline: 0.2 under
    * the worst measured recall (0.35 at sf0.001; 0.50/0.525 above). */
  val IvfJlMinRecall = 0.15

  /** q128: IVF whose COARSE QUANTIZER lives in JL-projected space —
    * the composition of the q38 cell machinery with the q115
    * projection, and the index-build cost reducer of the family: cell
    * assignment per corpus row costs O(m·D) sign-dots + O(cells·m)
    * argmax instead of q38's O(cells·D) — at production cell counts
    * (√N ≈ 3×10⁴ cells for 10⁹ vectors) that is a ~D/m = 8× cut of
    * the dominant index-build term, and re-assignment after a
    * centroid refresh streams 8-double projections instead of
    * 64-float raws. Candidate scoring inside probed cells stays
    * full-fidelity exact (the q38 contract), so only WHICH cells are
    * probed is approximate — certified by the q88 `ivf_jl` arm.
    *
    * Scale shape: projected centroids are a bounded driver list
    * (nCells × [[JlDims]] doubles) computed with the SAME scan-side
    * kernel as the corpus projection (bit-identical by construction);
    * assignment is the scan-side `argmax_cosine` plan constant (zero
    * joins to build the index); the candidate pass is the annIvf
    * broadcast-probes × cell-join + bounded top-k aggregate. */
  def annIvfJl(emb0: DataFrame, nQueries: Long = GateQueries, k: Int = TopK,
               nCells: Int = IvfCells, nProbes: Int = IvfJlProbes): DataFrame = {
    val emb = nonZeroNorm(emb0) // cosine-based board: zero-norm vectors are outside its universe (fuzz r19)
    val spark = emb.sparkSession
    import spark.implicits._
    def proj(c: Column): Column =
      array((0 until JlDims).map(kk => dotProduct(c, jlSignLit(kk))): _*)
    // bounded driver data: nCells × JlDims doubles at ANY corpus size,
    // numbered by the rows' own vec_ids (hole-for-hole the oracle's)
    val projCents: Seq[(Long, Seq[Double])] =
      emb.filter(col("vec_id") < nCells)
        .select(col("vec_id"), proj(col("embedding")).as("cy"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
        .sortBy(_._1).toSeq
    val centsDf = projCents.toDF("cell_id", "centy")
    // ONE widened scan: raw float32 vector + norm for exact scoring,
    // projected cell assignment as a scan-side plan constant (the
    // former explode(array(cast)) barrier went with the cast — r21
    // float-reading kernels)
    val corpus = Layout.widen(emb)
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"))
      .select(col("c_id"),
        graft.functions.VectorExpressions.argMaxCosine(proj(col("cv")), projCents)
          .as("cell_id"),
        col("cv"), l2Norm(col("cv")).as("cn"))
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      .select(col("q_id"), col("qv"), l2Norm(col("qv")).as("qn"),
        proj(col("qv")).as("qy"))
      .withColumn("qyn", l2Norm(col("qy")))
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("cell_id").asc)
    // probe selection window input: nCells rows per query, constant
    val probes = q.join(broadcast(centsDf))
      .select(col("q_id"), col("qv"), col("qn"), col("cell_id"),
        (dotProduct(col("qy"), col("centy")) /
          (col("qyn") * l2Norm(col("centy")))).as("cos"))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nProbes)
      .select(col("q_id"), col("qv"), col("qn"), col("cell_id"))
    corpus.join(broadcast(probes), Seq("cell_id"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (dotProduct(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
      .groupBy(col("q_id"))
      .agg(TopKAgg.topK(col("cos"), col("c_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.id").as("c_id"),
        portableRound(col("col.score"), 4).as("cos"), (col("pos") + 1).as("rank"))
  }

  // ---- driver-gate query registry ----

  /** q165: embedding-table health board — the input-validation pass
    * that runs BEFORE any ANN index build (q106/q108/q116 audit the
    * derived indexes; this audits the raw table they're built from).
    * One row: vector count, duplicate-id count, dimension range and a
    * consistency flag (a mixed-dim table breaks every codebook), zero
    * vectors (cosine is undefined on them — the ANN family divides by
    * the norm), non-finite vectors (one NaN poisons a centroid mean),
    * and the norm distribution (min/max/mean) that decides whether
    * vectors need normalizing before an inner-product index.
    *
    * Determinism: per-row norm = IEEE sqrt of the sequential-order dot
    * product (bit-identical to DuckDB `list_dot_product`), r6-rounded
    * scan-side; the mean rides the exactSum decimal accumulator so
    * partition order can't change it. Non-finite rows are excluded
    * from the norm stats (NaN would poison min/max in engine-specific
    * ways) and counted instead.
    *
    * Scale design: ONE scan, all signals scan-side projections, one
    * 1-row aggregate with map-side partials; the only non-partial
    * piece is the exact distinct-id count (keyed by the unique id —
    * no hot key by construction). */
  def embeddingHealth(emb: DataFrame): DataFrame = {
    def r6(c: Column): Column = floor(c * 1000000d + 0.5d) / 1000000d
    val v = toDoubleArray(col("embedding"))
    val bad = exists(v, x => isnan(x) ||
      x === Double.PositiveInfinity || x === Double.NegativeInfinity)
    val m = emb.select(col("vec_id"),
      size(col("embedding")).as("dims"),
      bad.as("bad"),
      (dotProduct(v, v) === 0d).as("is_zero"),
      when(!bad, r6(l2Norm(v))).as("nrm6"))
    m.agg(
        count(lit(1)).as("n_vecs"),
        countDistinct(col("vec_id")).as("n_ids"),
        min(col("dims")).as("min_dims"),
        max(col("dims")).as("max_dims"),
        count(when(col("is_zero"), 1)).as("n_zero"),
        count(when(col("bad"), 1)).as("n_nonfinite"),
        min(col("nrm6")).as("min_norm"),
        max(col("nrm6")).as("max_norm"),
        exactSum(col("nrm6")).as("snrm"))
      .select(col("n_vecs"),
        (col("n_vecs") - col("n_ids")).as("n_dup_ids"),
        col("min_dims"), col("max_dims"),
        (col("min_dims") === col("max_dims")).as("dim_consistent"),
        col("n_zero"), col("n_nonfinite"),
        col("min_norm"), col("max_norm"),
        when(col("n_vecs") > col("n_nonfinite"),
          r6(col("snrm") / (col("n_vecs") - col("n_nonfinite"))))
          .as("mean_norm"))
  }

  /** Shared ANN gate cores ([[graft.Shared]]): q88's truth table IS
    * q30's output and four of its five arms ARE q38/q61/q100/q118's
    * outputs (same (nQueries=8, k=5) shape) — a batch run builds each
    * chain once; the recall audit and the arm boards read the same
    * checkpointed k·nQueries-row tables. The lsh_mp arm has no gate
    * twin (q32 runs a different (50, 3, 0-flip) shape) and builds
    * inside q88 as before. */
  private def gateBrute(s: SparkSession, d: String): DataFrame =
    graft.Shared.memo(s, s"sim:brute-8x5:$d")(knnBrute(T.embeddings(s, d)))
  private def gateIvf(s: SparkSession, d: String): DataFrame =
    graft.Shared.memo(s, s"sim:ivf-8x5:$d")(annIvf(T.embeddings(s, d)))
  private def gatePq(s: SparkSession, d: String): DataFrame =
    graft.Shared.memo(s, s"sim:pq-8x5:$d")(annPq(T.embeddings(s, d)))
  private def gateIvfPq(s: SparkSession, d: String): DataFrame =
    graft.Shared.memo(s, s"sim:ivfpq-8x5:$d")(annIvfPq(T.embeddings(s, d)))
  private def gateJl(s: SparkSession, d: String): DataFrame =
    graft.Shared.memo(s, s"sim:jl-8x5:$d")(annJl(T.embeddings(s, d)))
  private def gateIvfJl(s: SparkSession, d: String): DataFrame =
    graft.Shared.memo(s, s"sim:ivfjl-8x5:$d")(annIvfJl(T.embeddings(s, d)))

  /** Batch-start core warmups (the [[graft.scale.Dedup.coreWarmups]]
    * contract) — the brute truth is q88's critical path and goes
    * first. */
  private[graft] def coreWarmups(s: SparkSession,
                                 d: String): Seq[(String, () => Unit)] = Seq(
    "sim:brute" -> (() => { gateBrute(s, d); () }),
    "sim:ivf" -> (() => { gateIvf(s, d); () }),
    "sim:pq" -> (() => { gatePq(s, d); () }),
    "sim:ivfpq" -> (() => { gateIvfPq(s, d); () }),
    "sim:jl" -> (() => { gateJl(s, d); () }),
    "sim:ivfjl" -> (() => { gateIvfJl(s, d); () }))

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_knn_brute" -> ((s, d) => gateBrute(s, d)),
    // the stratified-sample form of the q30 audit: one query per
    // occupied LSH bucket, exact top-k for each
    "q126_knn_sampled" -> ((s, d) => knnBruteSampled(T.embeddings(s, d))),
    "q31_lsh_buckets" -> ((s, d) => lshBuckets(T.embeddings(s, d))),
    "q32_ann_lsh" -> ((s, d) => annLsh(T.embeddings(s, d))),
    "q38_ann_ivf" -> ((s, d) => gateIvf(s, d)),
    "q47_quantize_err" -> ((s, d) => quantizeStats(T.embeddings(s, d))),
    "q51_pq_codes" -> ((s, d) => pqCodes(T.embeddings(s, d))),
    "q61_ann_pq" -> ((s, d) => gatePq(s, d)),
    // recall@k certification of all six ANN paths vs brute truth —
    // truth and five arms come from the shared cores above
    "q88_ann_recall" -> ((s, d) => annRecallFrom(gateBrute(s, d), Seq(
      ("lsh_mp", annLsh(T.embeddings(s, d), GateQueries, TopK, LshProbeFlips),
        LshMinRecall),
      ("ivf", gateIvf(s, d), IvfMinRecall),
      ("pq", gatePq(s, d), PqMinRecall),
      ("ivfpq", gateIvfPq(s, d), IvfPqMinRecall),
      ("jl", gateJl(s, d), JlMinRecall),
      ("ivf_jl", gateIvfJl(s, d), IvfJlMinRecall)))),
    // the composed production index: IVF cells × residual PQ (IVFADC)
    "q100_ann_ivfpq" -> ((s, d) => gateIvfPq(s, d)),
    // per-cell index staleness report (batch twin of maintainIvf)
    "q106_ivf_health" -> ((s, d) => ivfHealth(T.embeddings(s, d))),
    // raw-table validation before any index build (1-row board)
    "q165_embedding_health" -> ((s, d) => embeddingHealth(T.embeddings(s, d))),
    // per-subspace codebook retrain signal (batch twin of maintainPq)
    "q108_pq_health" -> ((s, d) => pqHealth(T.embeddings(s, d))),
    // JL sign projection: the pre-shuffle dimensionality reducer
    "q115_jl_project" -> ((s, d) => jlProject(T.embeddings(s, d))),
    // distortion gate certifying the projection preserves norms
    "q116_jl_audit" -> ((s, d) => jlAudit(T.embeddings(s, d))),
    // ANN via projected-space shortlist + exact re-rank
    "q118_ann_jl" -> ((s, d) => gateJl(s, d)),
    // IVF with its coarse quantizer in JL-projected space
    "q128_ann_ivfjl" -> ((s, d) => gateIvfJl(s, d)),
    // the recall/cost frontier behind q38's nProbes choice
    "q155_probe_sweep" -> ((s, d) =>
      ivfProbeSweepFrom(gateBrute(s, d), T.embeddings(s, d))),
    // leave-one-out kNN majority-vote label accuracy per class
    "q158_knn_labels" -> ((s, d) => knnLabelAccuracy(T.embeddings(s, d)))
  )

  /** DuckDB literal list for plane p, identical doubles to the plan. */
  private def planeSql(p: Int): String =
    planes(p).map(v => f"$v%.1f").mkString("[", ", ", "]")

  /** DuckDB literal list for JL sign row k (±1.0 doubles). */
  private def jlSignSql(k: Int): String =
    jlSigns(k).map(v => f"$v%.1f").mkString("[", ", ", "]")

  /** DuckDB restatement of the JL projection of double-list column
    * `vcol`: the [[JlDims]]-element list of sign-literal dots. */
  private def jlProjListSql(vcol: String): String =
    (0 until JlDims).map(k => s"list_dot_product($vcol, ${jlSignSql(k)})")
      .mkString("[", ",\n|     ", "]")

  private[scale] val bucketSql: String = (0 until NumPlanes).map { p =>
    s"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), ${planeSql(p)}) > 0 THEN ${1L << p} ELSE 0 END)"
  }.mkString(" + ")

  /** The q155 oracle: the q38 IVF chain with the probe rank KEPT, one
    * top-k + hit/candidate block per probe setting, all against the
    * q30 brute truth — built by the same loop as the Spark arms so the
    * probe list cannot drift between the two. */
  private lazy val probeSweepSql: String = {
    val ps = Seq(1, 2, 4, 8)
    val blocks = ps.map { p =>
      s"""top$p AS (SELECT q_id, c_id FROM (
         |    SELECT p.q_id, t.vec_id AS c_id,
         |      ROW_NUMBER() OVER (PARTITION BY p.q_id
         |        ORDER BY list_dot_product(qn.v, t.v) / (qn.nrm * t.nrm) DESC,
         |          t.vec_id ASC) AS rk
         |    FROM (SELECT q_id, cell_id FROM probes WHERE rn <= $p) p
         |    JOIN assign a ON a.cell_id = p.cell_id
         |    JOIN n t ON t.vec_id = a.vec_id
         |    JOIN n qn ON qn.vec_id = p.q_id
         |    WHERE t.vec_id <> p.q_id) WHERE rk <= $TopK),
         |s$p AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hits
         |        FROM top$p JOIN bt USING (q_id, c_id)),
         |c$p AS (SELECT CAST(SUM(o.occ) AS BIGINT)
         |            - CAST(COUNT(DISTINCT p.q_id) AS BIGINT) AS n_candidates,
         |          CAST(COUNT(DISTINCT p.q_id) AS BIGINT) AS n_q
         |        FROM probes p JOIN occ o USING (cell_id) WHERE p.rn <= $p)""".stripMargin
    }
    val unions = ps.map { p =>
      s"""SELECT $p AS n_probes, t.n_truth, s.n_hits,
         |  ${portableRoundSql("CAST(s.n_hits AS DOUBLE) / t.n_truth", 4)}
         |    AS recall,
         |  c.n_candidates,
         |  ${portableRoundSql(
             "CAST(c.n_candidates AS DOUBLE) / (c.n_q * (nv.n_vecs - 1))", 4)}
         |    AS scan_frac
         |FROM s$p s, tt t, c$p c, nv""".stripMargin
    }
    s"""WITH v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |v AS (SELECT * FROM v0 WHERE list_dot_product(v, v) > 0),
       |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v),
       |cents AS (SELECT vec_id AS cell_id, v AS cv, nrm AS cn FROM n WHERE vec_id < $IvfCells),
       |assign AS (
       |  SELECT vec_id, cell_id FROM (
       |    SELECT a.vec_id, c.cell_id,
       |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |        ORDER BY list_dot_product(a.v, c.cv)/(a.nrm*c.cn) DESC, c.cell_id ASC) AS rn
       |    FROM n a, cents c) WHERE rn <= 1),
       |occ AS (SELECT cell_id, CAST(COUNT(*) AS BIGINT) AS occ
       |        FROM assign GROUP BY 1),
       |probes AS (
       |  SELECT q_id, cell_id, rn FROM (
       |    SELECT q.vec_id AS q_id, c.cell_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_dot_product(q.v, c.cv)/(q.nrm*c.cn) DESC, c.cell_id ASC) AS rn
       |    FROM n q, cents c WHERE q.vec_id < $GateQueries) WHERE rn <= ${ps.max}),
       |bt AS (SELECT q_id, c_id FROM (
       |    SELECT q.vec_id AS q_id, t.vec_id AS c_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_dot_product(q.v, t.v)/(q.nrm*t.nrm) DESC, t.vec_id ASC) AS rk
       |    FROM n q JOIN n t ON q.vec_id < $GateQueries AND t.vec_id <> q.vec_id) WHERE rk <= $TopK),
       |tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM bt),
       |nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs FROM v),
       |${blocks.mkString(",\n")}
       |${unions.mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** Shared oracle fragment restating [[pqTrainedCents]]'s k-means:
    * assumes a CTE `v AS (SELECT vec_id, CAST(embedding AS DOUBLE[])
    * AS v FROM embeddings)` is in scope, emits CTEs ending with
    * `cb$PqKmeansIters` = the trained (k, m, cv) codebook. The
    * centroid mean is the same fixed-point expression tree as the
    * Spark side — BIGINT micro-unit sums (associative, order-proof)
    * divided once in double space — so the codebooks are
    * bit-identical. Ends with a trailing comma: splice before the
    * next CTE. */
  private def pqSliceSql(src: String) =
    s"$src[m*$PqSubDim+1 : m*$PqSubDim+$PqSubDim]"
  private val pqDistSql: String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, ${PqSubDim + 1}),
       |        i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))),
       |      (a, b) -> a + b)""".stripMargin
  private def pqTrainSql: String = pqTrainSqlFrom("v")

  /** [[pqTrainSql]] with a parameterized source CTE (same shape: a
    * `(vec_id, v)` double-list relation) — `annIvfPq`'s oracle trains
    * the book on the RESIDUAL vector table instead of the raw one.
    * `sfx` suffixes every emitted CTE name so two train chains (raw +
    * residual) can coexist in one WITH (the q88 four-arm audit). */
  private def pqTrainSqlFrom(src: String, sfx: String = ""): String = {
    val head =
      s"""ts$sfx AS (SELECT vec_id, m, ${pqSliceSql("v")} AS sv
         |  FROM $src, range(0, $PqSubspaces) t(m) WHERE vec_id < $PqTrainSample),
         |cb0$sfx AS (SELECT
         |    CAST(ROW_NUMBER() OVER (PARTITION BY m ORDER BY vec_id) - 1
         |      AS INTEGER) AS k,
         |    m, ${pqSliceSql("v")} AS cv
         |  FROM $src, range(0, $PqSubspaces) t(m) WHERE vec_id < $PqCodebook),
         |""".stripMargin
    val iters = (1 to PqKmeansIters).map { it =>
      s"""asg$it$sfx AS (SELECT m, sv, k FROM (
         |    SELECT s.m, s.sv, c.k,
         |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
         |        ORDER BY $pqDistSql ASC, c.k ASC) AS rn
         |    FROM ts$sfx s JOIN cb${it - 1}$sfx c USING (m)) WHERE rn = 1),
         |comp$it$sfx AS (SELECT m, k, i,
         |    CAST(SUM(CAST(floor(sv[i]*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         |      / (CAST(COUNT(*) AS DOUBLE) * 1000000.0) AS x
         |  FROM asg$it$sfx, range(1, ${PqSubDim + 1}) t(i) GROUP BY m, k, i),
         |mv$it$sfx AS (SELECT m, k, list(x ORDER BY i) AS cv FROM comp$it$sfx GROUP BY m, k),
         |cb$it$sfx AS (SELECT g.k, g.m, COALESCE(n.cv, g.cv) AS cv
         |  FROM cb${it - 1}$sfx g LEFT JOIN mv$it$sfx n ON n.m = g.m AND n.k = g.k),
         |""".stripMargin
    }.mkString
    head + iters
  }

  override val oracle: Map[String, String] = Map(
    // q38's assign CTE keeping the winning cosine; mean rides the
    // exact decimal accumulator, flag repeats the same expression
    "q106_ivf_health" ->
      s"""WITH v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |v AS (SELECT * FROM v0 WHERE list_dot_product(v, v) > 0),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v),
         |cents AS (SELECT vec_id AS cell_id, v AS cv, nrm AS cn FROM n WHERE vec_id < $IvfCells),
         |a AS (SELECT vec_id, cell_id, cos FROM (
         |    SELECT a.vec_id, c.cell_id,
         |      list_dot_product(a.v, c.cv)/(a.nrm*c.cn) AS cos,
         |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
         |        ORDER BY list_dot_product(a.v, c.cv)/(a.nrm*c.cn) DESC,
         |          c.cell_id ASC) AS rn
         |    FROM n a, cents c) WHERE rn <= 1)
         |SELECT cell_id, COUNT(*) AS n_members,
         |  ${portableRoundSql(exactSumSql("cos") + " / COUNT(*)", 4)} AS mean_cos,
         |  (${exactSumSql("cos")} / COUNT(*) < 0.25) AS rebuild
         |FROM a GROUP BY cell_id""".stripMargin,
    // raw-table health: norms via the same list_dot_product/sqrt
    // pipeline, mean over the DECIMAL(18,6) exact accumulator
    "q165_embedding_health" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |m AS (SELECT vec_id, CAST(len(v) AS INTEGER) AS dims,
        |  len(list_filter(v, x -> isnan(x) OR isinf(x))) > 0 AS bad,
        |  list_dot_product(v, v) = 0.0 AS is_zero,
        |  CASE WHEN NOT (len(list_filter(v, x -> isnan(x) OR isinf(x))) > 0)
        |    THEN FLOOR(sqrt(list_dot_product(v, v)) * 1000000.0 + 0.5)
        |         / 1000000.0 END AS nrm6
        |FROM e)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |  CAST(COUNT(*) - COUNT(DISTINCT vec_id) AS BIGINT) AS n_dup_ids,
        |  MIN(dims) AS min_dims, MAX(dims) AS max_dims,
        |  (MIN(dims) = MAX(dims)) AS dim_consistent,
        |  CAST(COUNT(CASE WHEN is_zero THEN 1 END) AS BIGINT) AS n_zero,
        |  CAST(COUNT(CASE WHEN bad THEN 1 END) AS BIGINT) AS n_nonfinite,
        |  MIN(nrm6) AS min_norm, MAX(nrm6) AS max_norm,
        |  CASE WHEN COUNT(*) > COUNT(CASE WHEN bad THEN 1 END) THEN
        |    FLOOR(CAST(SUM(CAST(nrm6 AS DECIMAL(18,6))) AS DOUBLE)
        |      / (COUNT(*) - COUNT(CASE WHEN bad THEN 1 END))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS mean_norm
        |FROM m""".stripMargin,
    "q30_knn_brute" ->
      s"""WITH c0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c AS (SELECT * FROM c0 WHERE list_dot_product(v, v) > 0),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM c),
         |pairs AS (
         |  SELECT q.vec_id AS q_id, t.vec_id AS c_id,
         |    list_dot_product(q.v, t.v) / (q.nrm * t.nrm) AS cos
         |  FROM n q JOIN n t ON q.vec_id < $GateQueries AND t.vec_id <> q.vec_id),
         |ranked AS (
         |  SELECT q_id, c_id, cos,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS INTEGER) AS rank
         |  FROM pairs)
         |SELECT q_id, c_id, FLOOR((cos) * 10000.0 + 0.5) / 10000.0 AS cos, rank
         |FROM ranked WHERE rank <= $TopK""".stripMargin,
    // q30's brute scoring, with the query set restated as the
    // per-bucket min-id pick (ROW_NUMBER rn=1 ↔ the bounded top-k
    // aggregate on the Spark side)
    "q126_knn_sampled" ->
      s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |    CAST($bucketSql AS BIGINT) AS bucket FROM embeddings
         |  WHERE list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0),
         |n AS (SELECT vec_id, v, bucket,
         |    sqrt(list_dot_product(v, v)) AS nrm FROM c),
         |q AS (SELECT vec_id, v, nrm FROM (
         |    SELECT vec_id, v, nrm, ROW_NUMBER() OVER (PARTITION BY bucket
         |      ORDER BY vec_id ASC) AS rn FROM n) WHERE rn <= 1),
         |pairs AS (
         |  SELECT q.vec_id AS q_id, t.vec_id AS c_id,
         |    list_dot_product(q.v, t.v) / (q.nrm * t.nrm) AS cos
         |  FROM q JOIN n t ON t.vec_id <> q.vec_id),
         |ranked AS (
         |  SELECT q_id, c_id, cos,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS INTEGER) AS rank
         |  FROM pairs)
         |SELECT q_id, c_id, FLOOR((cos) * 10000.0 + 0.5) / 10000.0 AS cos, rank
         |FROM ranked WHERE rank <= $TopK""".stripMargin,
    "q31_lsh_buckets" ->
      s"SELECT vec_id, CAST($bucketSql AS BIGINT) AS bucket FROM embeddings",
    "q155_probe_sweep" -> probeSweepSql,
    // q30's brute scoring at 64 queries; the majority vote restated as
    // a (cnt DESC, label ASC) ROW_NUMBER — the same deterministic
    // tie-break as the Spark max_by struct ordering
    "q158_knn_labels" ->
      s"""WITH c0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c AS (SELECT * FROM c0 WHERE list_dot_product(v, v) > 0),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM c),
         |pairs AS (
         |  SELECT q.vec_id AS q_id, t.vec_id AS c_id,
         |    list_dot_product(q.v, t.v) / (q.nrm * t.nrm) AS cos
         |  FROM n q JOIN n t ON q.vec_id < 64 AND t.vec_id <> q.vec_id),
         |ranked AS (SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id,
         |      ROW_NUMBER() OVER (PARTITION BY q_id
         |        ORDER BY cos DESC, c_id ASC) AS rk
         |    FROM pairs) WHERE rk <= $TopK),
         |votes AS (SELECT r.q_id, l.label AS n_label, COUNT(*) AS cnt
         |  FROM ranked r JOIN embeddings l ON l.vec_id = r.c_id
         |  GROUP BY 1, 2),
         |pred AS (SELECT q_id, n_label AS pred_label FROM (
         |    SELECT q_id, n_label,
         |      ROW_NUMBER() OVER (PARTITION BY q_id
         |        ORDER BY cnt DESC, n_label ASC) AS rn
         |    FROM votes) WHERE rn = 1),
         |j AS (SELECT p.pred_label, e.label AS true_label
         |  FROM pred p JOIN embeddings e ON e.vec_id = p.q_id)
         |SELECT true_label, CAST(COUNT(*) AS BIGINT) AS n_queries,
         |  CAST(COUNT(CASE WHEN pred_label = true_label THEN 1 END)
         |    AS BIGINT) AS n_correct,
         |  FLOOR((CAST(COUNT(CASE WHEN pred_label = true_label THEN 1 END)
         |    AS DOUBLE) / COUNT(*)) * 10000.0 + 0.5) / 10000.0 AS accuracy
         |FROM j GROUP BY true_label""".stripMargin,
    "q38_ann_ivf" ->
      s"""WITH v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |v AS (SELECT * FROM v0 WHERE list_dot_product(v, v) > 0),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v),
         |cents AS (SELECT vec_id AS cell_id, v AS cv, nrm AS cn FROM n WHERE vec_id < $IvfCells),
         |assign AS (
         |  SELECT vec_id, cell_id FROM (
         |    SELECT a.vec_id, c.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
         |        ORDER BY list_dot_product(a.v, c.cv)/(a.nrm*c.cn) DESC, c.cell_id ASC) AS rn
         |    FROM n a, cents c) WHERE rn <= 1),
         |probes AS (
         |  SELECT q_id, cell_id FROM (
         |    SELECT q.vec_id AS q_id, c.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY list_dot_product(q.v, c.cv)/(q.nrm*c.cn) DESC, c.cell_id ASC) AS rn
         |    FROM n q, cents c WHERE q.vec_id < $GateQueries) WHERE rn <= $IvfProbes),
         |pairs AS (
         |  SELECT p.q_id, t.vec_id AS c_id,
         |    list_dot_product(qn.v, t.v) / (qn.nrm * t.nrm) AS cos
         |  FROM probes p
         |  JOIN assign a ON a.cell_id = p.cell_id
         |  JOIN n t ON t.vec_id = a.vec_id
         |  JOIN n qn ON qn.vec_id = p.q_id
         |  WHERE t.vec_id <> p.q_id),
         |ranked AS (SELECT q_id, c_id, cos,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY cos DESC, c_id ASC) AS INTEGER) AS rank FROM pairs)
         |SELECT q_id, c_id, FLOOR((cos) * 10000.0 + 0.5) / 10000.0 AS cos, rank
         |FROM ranked WHERE rank <= $TopK""".stripMargin,
    "q61_ann_pq" ->
      s"""WITH v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |v AS (SELECT * FROM v0 WHERE list_dot_product(v, v) > 0),
         |sub AS (SELECT vec_id, m, v[m*$PqSubDim+1 : m*$PqSubDim+$PqSubDim] AS sv
         |        FROM v, range(0, $PqSubspaces) t(m)),
         |$pqTrainSql
         |cents AS (SELECT k, m, cv FROM cb$PqKmeansIters),
         |d AS (SELECT s.vec_id, s.m, c.k,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(1, ${PqSubDim + 1}),
         |        i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))),
         |      (a, b) -> a + b) AS d
         |  FROM sub s JOIN cents c USING (m)),
         |assign AS (SELECT vec_id AS c_id, m, k AS code FROM (
         |    SELECT vec_id, m, k, d,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d ASC, k ASC) AS rn
         |    FROM d) WHERE rn = 1),
         |lut AS (SELECT vec_id AS q_id, m, k AS code, d AS qd
         |  FROM d WHERE vec_id < $GateQueries),
         |approx AS (
         |  SELECT a.c_id, l.q_id,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(l.qd ORDER BY l.m)),
         |      (x, y) -> x + y) AS adist
         |  FROM assign a JOIN lut l USING (m, code)
         |  GROUP BY a.c_id, l.q_id),
         |short AS (SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id, ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY adist ASC, c_id ASC) AS rn
         |    FROM approx WHERE q_id <> c_id)
         |  WHERE rn <= ${TopK * PqRefine}),
         |nn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v),
         |rer AS (SELECT s.q_id, s.c_id,
         |    list_dot_product(q.v, t.v) / (q.nrm * t.nrm) AS cos
         |  FROM short s
         |  JOIN nn q ON q.vec_id = s.q_id
         |  JOIN nn t ON t.vec_id = s.c_id),
         |ranked AS (SELECT q_id, c_id, cos,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY cos DESC, c_id ASC) AS INTEGER) AS rank
         |  FROM rer)
         |SELECT q_id, c_id, FLOOR((cos) * 10000.0 + 0.5) / 10000.0 AS cos, rank
         |FROM ranked WHERE rank <= $TopK""".stripMargin,
    "q118_ann_jl" ->
      s"""WITH v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |v AS (SELECT * FROM v0 WHERE list_dot_product(v, v) > 0),
         |p AS (SELECT vec_id, ${jlProjListSql("v")} AS y FROM v),
         |pn AS (SELECT vec_id, y, sqrt(list_dot_product(y, y)) AS yn FROM p),
         |ap AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         |    list_dot_product(q.y, c.y) / (q.yn * c.yn) AS pcos
         |  FROM pn q JOIN pn c ON q.vec_id < $GateQueries AND c.vec_id <> q.vec_id),
         |sl AS (SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id, ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY pcos DESC, c_id ASC) AS rn FROM ap)
         |  WHERE rn <= ${TopK * JlRefine}),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v),
         |ex AS (SELECT s.q_id, s.c_id,
         |    list_dot_product(q.v, t.v) / (q.nrm * t.nrm) AS cos
         |  FROM sl s JOIN n q ON q.vec_id = s.q_id JOIN n t ON t.vec_id = s.c_id)
         |SELECT q_id, c_id, FLOOR((cos) * 10000.0 + 0.5) / 10000.0 AS cos, rank FROM (
         |  SELECT q_id, c_id, cos,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS INTEGER) AS rank
         |  FROM ex) WHERE rank <= $TopK""".stripMargin,
    // q38's cell machinery with assignment/probing restated over the
    // q118 projection CTEs; exact scoring stays on the raw vectors
    "q128_ann_ivfjl" ->
      s"""WITH v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |v AS (SELECT * FROM v0 WHERE list_dot_product(v, v) > 0),
         |p AS (SELECT vec_id, ${jlProjListSql("v")} AS y FROM v),
         |pn AS (SELECT vec_id, y, sqrt(list_dot_product(y, y)) AS yn FROM p),
         |cents AS (SELECT vec_id AS cell_id, y AS cy, yn AS cn FROM pn WHERE vec_id < $IvfCells),
         |assign AS (
         |  SELECT vec_id, cell_id FROM (
         |    SELECT a.vec_id, c.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
         |        ORDER BY list_dot_product(a.y, c.cy)/(a.yn*c.cn) DESC, c.cell_id ASC) AS rn
         |    FROM pn a, cents c) WHERE rn <= 1),
         |probes AS (
         |  SELECT q_id, cell_id FROM (
         |    SELECT q.vec_id AS q_id, c.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY list_dot_product(q.y, c.cy)/(q.yn*c.cn) DESC, c.cell_id ASC) AS rn
         |    FROM pn q, cents c WHERE q.vec_id < $GateQueries) WHERE rn <= $IvfJlProbes),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v),
         |pairs AS (
         |  SELECT p.q_id, t.vec_id AS c_id,
         |    list_dot_product(qn.v, t.v) / (qn.nrm * t.nrm) AS cos
         |  FROM probes p
         |  JOIN assign a ON a.cell_id = p.cell_id
         |  JOIN n t ON t.vec_id = a.vec_id
         |  JOIN n qn ON qn.vec_id = p.q_id
         |  WHERE t.vec_id <> p.q_id),
         |ranked AS (SELECT q_id, c_id, cos,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY cos DESC, c_id ASC) AS INTEGER) AS rank FROM pairs)
         |SELECT q_id, c_id, FLOOR((cos) * 10000.0 + 0.5) / 10000.0 AS cos, rank
         |FROM ranked WHERE rank <= $TopK""".stripMargin,
    "q115_jl_project" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |s(k, s) AS (VALUES ${(0 until JlDims).map(k => s"($k, ${jlSignSql(k)})").mkString(",\n|  ")})
         |SELECT v.vec_id, s.k, list_dot_product(v.v, s.s) AS y
         |FROM v, s""".stripMargin,
    "q116_jl_audit" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |p AS (SELECT vec_id, v, list_dot_product(v, v) AS dv FROM v),
         |y AS (SELECT vec_id, dv,
         |    ${jlProjListSql("v")} AS ys
         |  FROM p WHERE dv > 0),
         |d AS (SELECT vec_id,
         |    list_dot_product(ys, ys) / (${JlDims.toDouble} * dv) AS distortion
         |  FROM y),
         |m AS (SELECT COUNT(*) AS n_vecs,
         |    ${portableRoundSql(exactSumSql("distortion") + " / COUNT(*)", 4)} AS mean_distortion,
         |    FLOOR((MIN(distortion)) * 10000.0 + 0.5) / 10000.0 AS min_distortion,
         |    FLOOR((MAX(distortion)) * 10000.0 + 0.5) / 10000.0 AS max_distortion
         |  FROM d)
         |SELECT n_vecs, mean_distortion, min_distortion, max_distortion,
         |  (mean_distortion >= $JlAuditLo AND mean_distortion <= $JlAuditHi) AS ok
         |FROM m""".stripMargin,
    // q51's train + assign CTEs rolled up by subspace; mean rides the
    // exact decimal accumulator, flag repeats the expression
    "q108_pq_health" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |sub AS (SELECT vec_id, m, v[m*$PqSubDim+1 : m*$PqSubDim+$PqSubDim] AS sv
         |        FROM v, range(0, $PqSubspaces) t(m)),
         |$pqTrainSql
         |cents AS (SELECT k, m, cv FROM cb$PqKmeansIters),
         |d AS (SELECT s.vec_id, s.m, c.k,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(1, ${PqSubDim + 1}),
         |        i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))),
         |      (a, b) -> a + b) AS d
         |  FROM sub s JOIN cents c USING (m)),
         |best AS (SELECT vec_id, m, k, d FROM (
         |    SELECT vec_id, m, k, d,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d ASC, k ASC) AS rn
         |    FROM d) WHERE rn = 1)
         |SELECT CAST(m AS INTEGER) AS m, COUNT(*) AS n_vecs,
         |  ${portableRoundSql(exactSumSql("d") + " / COUNT(*)", 4)} AS mean_err,
         |  (${exactSumSql("d")} / COUNT(*) > 0.015) AS retrain
         |FROM best GROUP BY m""".stripMargin,
    "q51_pq_codes" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |sub AS (SELECT vec_id, m, v[m*$PqSubDim+1 : m*$PqSubDim+$PqSubDim] AS sv
         |        FROM v, range(0, $PqSubspaces) t(m)),
         |$pqTrainSql
         |cents AS (SELECT k, m, cv FROM cb$PqKmeansIters),
         |d AS (SELECT s.vec_id, s.m, c.k,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(1, ${PqSubDim + 1}),
         |        i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))),
         |      (a, b) -> a + b) AS d
         |  FROM sub s JOIN cents c USING (m)),
         |best AS (SELECT vec_id, m, k, d FROM (
         |    SELECT vec_id, m, k, d,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d ASC, k ASC) AS rn
         |    FROM d) WHERE rn = 1)
         |SELECT vec_id,
         |  string_agg(CAST(k AS VARCHAR), '-' ORDER BY m) AS codes,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(d ORDER BY m)),
         |    (a, b) -> a + b) AS sse
         |FROM best GROUP BY vec_id""".stripMargin,
    "q47_quantize_err" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |m AS (SELECT vec_id, v,
        |  list_max(list_transform(v, x -> abs(x))) AS mx FROM v)
        |SELECT vec_id, mx, 127.0/mx AS scale,
        |  list_reduce(
        |    list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(v, x ->
        |        (x - floor(x*(127.0/mx) + 0.5)/(127.0/mx))
        |        * (x - floor(x*(127.0/mx) + 0.5)/(127.0/mx)))),
        |    (a, b) -> a + b) AS sse
        |FROM m WHERE mx > 0""".stripMargin,
    // IVF-PQ restated: q38's cells/assign, residuals as a vector
    // table, the SAME train chain sourced from residuals
    // (pqTrainSqlFrom), q61's code/LUT/ADC machinery with the LUT
    // keyed by (query, probed cell), q61's shortlist + exact re-rank
    "q100_ann_ivfpq" ->
      s"""WITH v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |v AS (SELECT * FROM v0 WHERE list_dot_product(v, v) > 0),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v),
         |cents AS (SELECT vec_id AS cell_id, v AS cv, nrm AS cn
         |          FROM n WHERE vec_id < $IvfCells),
         |assign AS (
         |  SELECT vec_id, cell_id FROM (
         |    SELECT a.vec_id, c.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
         |        ORDER BY list_dot_product(a.v, c.cv)/(a.nrm*c.cn) DESC, c.cell_id ASC) AS rn
         |    FROM n a, cents c) WHERE rn <= 1),
         |rv AS (SELECT a.vec_id,
         |    list_transform(range(1, ${Dim + 1}), i -> x.v[i] - c.cv[i]) AS v
         |  FROM assign a JOIN n x ON x.vec_id = a.vec_id
         |  JOIN cents c ON c.cell_id = a.cell_id),
         |${pqTrainSqlFrom("rv")}
         |bk AS (SELECT k, m, cv FROM cb$PqKmeansIters),
         |rsub AS (SELECT vec_id, m, ${pqSliceSql("v")} AS sv
         |         FROM rv, range(0, $PqSubspaces) t(m)),
         |d AS (SELECT s.vec_id, s.m, c.k, $pqDistSql AS d
         |  FROM rsub s JOIN bk c USING (m)),
         |casg AS (SELECT vec_id AS c_id, m, k AS code FROM (
         |    SELECT vec_id, m, k,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d ASC, k ASC) AS rn
         |    FROM d) WHERE rn = 1),
         |probes AS (SELECT q_id, cell_id FROM (
         |    SELECT q.vec_id AS q_id, c.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY list_dot_product(q.v, c.cv)/(q.nrm*c.cn) DESC, c.cell_id ASC) AS rn
         |    FROM n q, cents c WHERE q.vec_id < $GateQueries) WHERE rn <= $IvfProbes),
         |qres AS (SELECT p.q_id, p.cell_id,
         |    list_transform(range(1, ${Dim + 1}), i -> q.v[i] - c.cv[i]) AS v
         |  FROM probes p JOIN n q ON q.vec_id = p.q_id
         |  JOIN cents c ON c.cell_id = p.cell_id),
         |qsub AS (SELECT q_id, cell_id, m, ${pqSliceSql("v")} AS sv
         |         FROM qres, range(0, $PqSubspaces) t(m)),
         |lut AS (SELECT s.q_id, s.cell_id, s.m, c.k AS code, $pqDistSql AS qd
         |  FROM qsub s JOIN bk c USING (m)),
         |approx AS (SELECT a.c_id, l.q_id,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(l.qd ORDER BY l.m)),
         |      (x, y) -> x + y) AS adist
         |  FROM casg a
         |  JOIN assign av ON av.vec_id = a.c_id
         |  JOIN lut l ON l.cell_id = av.cell_id AND l.m = a.m AND l.code = a.code
         |  WHERE l.q_id <> a.c_id
         |  GROUP BY a.c_id, l.q_id),
         |short AS (SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id, ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY adist ASC, c_id ASC) AS rn
         |    FROM approx)
         |  WHERE rn <= ${TopK * IvfPqRefine}),
         |rer AS (SELECT s.q_id, s.c_id,
         |    list_dot_product(q.v, t.v) / (q.nrm * t.nrm) AS cos
         |  FROM short s
         |  JOIN n q ON q.vec_id = s.q_id
         |  JOIN n t ON t.vec_id = s.c_id),
         |ranked AS (SELECT q_id, c_id, cos,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY cos DESC, c_id ASC) AS INTEGER) AS rank
         |  FROM rer)
         |SELECT q_id, c_id, FLOOR((cos) * 10000.0 + 0.5) / 10000.0 AS cos, rank
         |FROM ranked WHERE rank <= $TopK""".stripMargin,
    // the four ANN chains above composed into one audit: brute truth,
    // each method's top-k at the same (nQueries=8, k=5) shape, recall
    // per method with its certification threshold. A hash mismatch
    // here means "index quality moved", not "wrong answer".
    "q88_ann_recall" ->
      s"""WITH v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |v AS (SELECT * FROM v0 WHERE list_dot_product(v, v) > 0),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v),
         |tpairs AS (
         |  SELECT q.vec_id AS q_id, t.vec_id AS c_id,
         |    list_dot_product(q.v, t.v) / (q.nrm * t.nrm) AS cos
         |  FROM n q JOIN n t ON q.vec_id < $GateQueries AND t.vec_id <> q.vec_id),
         |truth AS (SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id, ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY cos DESC, c_id ASC) AS rn FROM tpairs)
         |  WHERE rn <= $TopK),
         |tcount AS (SELECT COUNT(*) AS n FROM truth),
         |bk AS (SELECT vec_id, CAST($bucketSql AS BIGINT) AS bucket FROM embeddings
         |  WHERE list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0),
         |lpairs AS (
         |  SELECT q.vec_id AS q_id, t.vec_id AS c_id,
         |    list_dot_product(qn.v, cn.v) / (qn.nrm * cn.nrm) AS cos
         |  FROM bk q JOIN bk t
         |    ON bit_count(xor(q.bucket, t.bucket)) <= $LshProbeFlips
         |  JOIN n qn ON qn.vec_id = q.vec_id
         |  JOIN n cn ON cn.vec_id = t.vec_id
         |  WHERE q.vec_id < $GateQueries AND t.vec_id <> q.vec_id),
         |lsh AS (SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id, ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY cos DESC, c_id ASC) AS rn FROM lpairs)
         |  WHERE rn <= $TopK),
         |cents AS (SELECT vec_id AS cell_id, v AS cv, nrm AS cn FROM n WHERE vec_id < $IvfCells),
         |assign AS (SELECT vec_id, cell_id FROM (
         |    SELECT a.vec_id, c.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
         |        ORDER BY list_dot_product(a.v, c.cv)/(a.nrm*c.cn) DESC, c.cell_id ASC) AS rn
         |    FROM n a, cents c) WHERE rn <= 1),
         |probes AS (SELECT q_id, cell_id FROM (
         |    SELECT q.vec_id AS q_id, c.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY list_dot_product(q.v, c.cv)/(q.nrm*c.cn) DESC, c.cell_id ASC) AS rn
         |    FROM n q, cents c WHERE q.vec_id < $GateQueries) WHERE rn <= $IvfProbes),
         |ipairs AS (
         |  SELECT p.q_id, t.vec_id AS c_id,
         |    list_dot_product(qn.v, t.v) / (qn.nrm * t.nrm) AS cos
         |  FROM probes p
         |  JOIN assign a ON a.cell_id = p.cell_id
         |  JOIN n t ON t.vec_id = a.vec_id
         |  JOIN n qn ON qn.vec_id = p.q_id
         |  WHERE t.vec_id <> p.q_id),
         |ivf AS (SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id, ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY cos DESC, c_id ASC) AS rn FROM ipairs)
         |  WHERE rn <= $TopK),
         |sub AS (SELECT vec_id, m, v[m*$PqSubDim+1 : m*$PqSubDim+$PqSubDim] AS sv
         |        FROM v, range(0, $PqSubspaces) t(m)),
         |$pqTrainSql
         |pcents AS (SELECT k, m, cv FROM cb$PqKmeansIters),
         |d AS (SELECT s.vec_id, s.m, c.k,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(1, ${PqSubDim + 1}),
         |        i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))),
         |      (a, b) -> a + b) AS d
         |  FROM sub s JOIN pcents c USING (m)),
         |passign AS (SELECT vec_id AS c_id, m, k AS code FROM (
         |    SELECT vec_id, m, k, d,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d ASC, k ASC) AS rn
         |    FROM d) WHERE rn = 1),
         |lut AS (SELECT vec_id AS q_id, m, k AS code, d AS qd
         |  FROM d WHERE vec_id < $GateQueries),
         |approx AS (
         |  SELECT a.c_id, l.q_id,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(l.qd ORDER BY l.m)),
         |      (x, y) -> x + y) AS adist
         |  FROM passign a JOIN lut l USING (m, code)
         |  GROUP BY a.c_id, l.q_id),
         |pshort AS (SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id, ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY adist ASC, c_id ASC) AS rn
         |    FROM approx WHERE q_id <> c_id)
         |  WHERE rn <= ${TopK * PqRefine}),
         |prer AS (SELECT s.q_id, s.c_id,
         |    list_dot_product(q.v, t.v) / (q.nrm * t.nrm) AS cos
         |  FROM pshort s
         |  JOIN n q ON q.vec_id = s.q_id
         |  JOIN n t ON t.vec_id = s.c_id),
         |pq AS (SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id, ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY cos DESC, c_id ASC) AS rn FROM prer)
         |  WHERE rn <= $TopK),
         |rv AS (SELECT a.vec_id,
         |    list_transform(range(1, ${Dim + 1}), i -> x.v[i] - c.cv[i]) AS v
         |  FROM assign a JOIN n x ON x.vec_id = a.vec_id
         |  JOIN cents c ON c.cell_id = a.cell_id),
         |${pqTrainSqlFrom("rv", "r")}
         |rbk AS (SELECT k, m, cv FROM cb${PqKmeansIters}r),
         |rsub AS (SELECT vec_id, m, ${pqSliceSql("v")} AS sv
         |         FROM rv, range(0, $PqSubspaces) t(m)),
         |rd AS (SELECT s.vec_id, s.m, c.k, $pqDistSql AS d
         |  FROM rsub s JOIN rbk c USING (m)),
         |rcasg AS (SELECT vec_id AS c_id, m, k AS code FROM (
         |    SELECT vec_id, m, k,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d ASC, k ASC) AS rn
         |    FROM rd) WHERE rn = 1),
         |rqres AS (SELECT p.q_id, p.cell_id,
         |    list_transform(range(1, ${Dim + 1}), i -> q.v[i] - c.cv[i]) AS v
         |  FROM probes p JOIN n q ON q.vec_id = p.q_id
         |  JOIN cents c ON c.cell_id = p.cell_id),
         |rqsub AS (SELECT q_id, cell_id, m, ${pqSliceSql("v")} AS sv
         |          FROM rqres, range(0, $PqSubspaces) t(m)),
         |rlut AS (SELECT s.q_id, s.cell_id, s.m, c.k AS code, $pqDistSql AS qd
         |  FROM rqsub s JOIN rbk c USING (m)),
         |rapprox AS (SELECT a.c_id, l.q_id,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(l.qd ORDER BY l.m)),
         |      (x, y) -> x + y) AS adist
         |  FROM rcasg a
         |  JOIN assign av ON av.vec_id = a.c_id
         |  JOIN rlut l ON l.cell_id = av.cell_id AND l.m = a.m AND l.code = a.code
         |  WHERE l.q_id <> a.c_id
         |  GROUP BY a.c_id, l.q_id),
         |rshort AS (SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id, ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY adist ASC, c_id ASC) AS rn
         |    FROM rapprox)
         |  WHERE rn <= ${TopK * IvfPqRefine}),
         |rrer AS (SELECT s.q_id, s.c_id,
         |    list_dot_product(q.v, t.v) / (q.nrm * t.nrm) AS cos
         |  FROM rshort s
         |  JOIN n q ON q.vec_id = s.q_id
         |  JOIN n t ON t.vec_id = s.c_id),
         |ivfpq AS (SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id, ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY cos DESC, c_id ASC) AS rn FROM rrer)
         |  WHERE rn <= $TopK),
         |jp AS (SELECT vec_id, ${jlProjListSql("v")} AS y FROM v),
         |jpn AS (SELECT vec_id, y, sqrt(list_dot_product(y, y)) AS yn FROM jp),
         |jap AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         |    list_dot_product(q.y, c.y) / (q.yn * c.yn) AS pcos
         |  FROM jpn q JOIN jpn c ON q.vec_id < $GateQueries AND c.vec_id <> q.vec_id),
         |jsl AS (SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id, ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY pcos DESC, c_id ASC) AS rn FROM jap)
         |  WHERE rn <= ${TopK * JlRefine}),
         |jrer AS (SELECT s.q_id, s.c_id,
         |    list_dot_product(q.v, t.v) / (q.nrm * t.nrm) AS cos
         |  FROM jsl s JOIN n q ON q.vec_id = s.q_id JOIN n t ON t.vec_id = s.c_id),
         |jl AS (SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id, ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY cos DESC, c_id ASC) AS rn FROM jrer)
         |  WHERE rn <= $TopK),
         |jcents AS (SELECT vec_id AS cell_id, y AS cy, yn AS cn FROM jpn WHERE vec_id < $IvfCells),
         |jassign AS (SELECT vec_id, cell_id FROM (
         |    SELECT a.vec_id, c.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
         |        ORDER BY list_dot_product(a.y, c.cy)/(a.yn*c.cn) DESC, c.cell_id ASC) AS rn
         |    FROM jpn a, jcents c) WHERE rn <= 1),
         |jprobes AS (SELECT q_id, cell_id FROM (
         |    SELECT q.vec_id AS q_id, c.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY list_dot_product(q.y, c.cy)/(q.yn*c.cn) DESC, c.cell_id ASC) AS rn
         |    FROM jpn q, jcents c WHERE q.vec_id < $GateQueries) WHERE rn <= $IvfJlProbes),
         |jipairs AS (
         |  SELECT p.q_id, t.vec_id AS c_id,
         |    list_dot_product(qn.v, t.v) / (qn.nrm * t.nrm) AS cos
         |  FROM jprobes p
         |  JOIN jassign a ON a.cell_id = p.cell_id
         |  JOIN n t ON t.vec_id = a.vec_id
         |  JOIN n qn ON qn.vec_id = p.q_id
         |  WHERE t.vec_id <> p.q_id),
         |ivfjl AS (SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id, ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY cos DESC, c_id ASC) AS rn FROM jipairs)
         |  WHERE rn <= $TopK)
         |SELECT 'lsh_mp' AS method, t.n AS n_truth, h.c AS n_hits,
         |  FLOOR((CAST(h.c AS DOUBLE)/t.n) * 10000.0 + 0.5) / 10000.0 AS recall,
         |  FLOOR((CAST(h.c AS DOUBLE)/t.n) * 10000.0 + 0.5) / 10000.0 >= $LshMinRecall AS recall_ok
         |FROM tcount t, (SELECT COUNT(*) AS c FROM lsh s
         |  JOIN truth u ON s.q_id = u.q_id AND s.c_id = u.c_id) h
         |UNION ALL
         |SELECT 'ivf' AS method, t.n AS n_truth, h.c AS n_hits,
         |  FLOOR((CAST(h.c AS DOUBLE)/t.n) * 10000.0 + 0.5) / 10000.0 AS recall,
         |  FLOOR((CAST(h.c AS DOUBLE)/t.n) * 10000.0 + 0.5) / 10000.0 >= $IvfMinRecall AS recall_ok
         |FROM tcount t, (SELECT COUNT(*) AS c FROM ivf s
         |  JOIN truth u ON s.q_id = u.q_id AND s.c_id = u.c_id) h
         |UNION ALL
         |SELECT 'pq' AS method, t.n AS n_truth, h.c AS n_hits,
         |  FLOOR((CAST(h.c AS DOUBLE)/t.n) * 10000.0 + 0.5) / 10000.0 AS recall,
         |  FLOOR((CAST(h.c AS DOUBLE)/t.n) * 10000.0 + 0.5) / 10000.0 >= $PqMinRecall AS recall_ok
         |FROM tcount t, (SELECT COUNT(*) AS c FROM pq s
         |  JOIN truth u ON s.q_id = u.q_id AND s.c_id = u.c_id) h
         |UNION ALL
         |SELECT 'ivfpq' AS method, t.n AS n_truth, h.c AS n_hits,
         |  FLOOR((CAST(h.c AS DOUBLE)/t.n) * 10000.0 + 0.5) / 10000.0 AS recall,
         |  FLOOR((CAST(h.c AS DOUBLE)/t.n) * 10000.0 + 0.5) / 10000.0 >= $IvfPqMinRecall AS recall_ok
         |FROM tcount t, (SELECT COUNT(*) AS c FROM ivfpq s
         |  JOIN truth u ON s.q_id = u.q_id AND s.c_id = u.c_id) h
         |UNION ALL
         |SELECT 'jl' AS method, t.n AS n_truth, h.c AS n_hits,
         |  FLOOR((CAST(h.c AS DOUBLE)/t.n) * 10000.0 + 0.5) / 10000.0 AS recall,
         |  FLOOR((CAST(h.c AS DOUBLE)/t.n) * 10000.0 + 0.5) / 10000.0 >= $JlMinRecall AS recall_ok
         |FROM tcount t, (SELECT COUNT(*) AS c FROM jl s
         |  JOIN truth u ON s.q_id = u.q_id AND s.c_id = u.c_id) h
         |UNION ALL
         |SELECT 'ivf_jl' AS method, t.n AS n_truth, h.c AS n_hits,
         |  FLOOR((CAST(h.c AS DOUBLE)/t.n) * 10000.0 + 0.5) / 10000.0 AS recall,
         |  FLOOR((CAST(h.c AS DOUBLE)/t.n) * 10000.0 + 0.5) / 10000.0 >= $IvfJlMinRecall AS recall_ok
         |FROM tcount t, (SELECT COUNT(*) AS c FROM ivfjl s
         |  JOIN truth u ON s.q_id = u.q_id AND s.c_id = u.c_id) h""".stripMargin,
    "q32_ann_lsh" ->
      s"""WITH b AS (
         |  SELECT vec_id, CAST($bucketSql AS BIGINT) AS bucket,
         |    CAST(embedding AS DOUBLE[]) AS v,
         |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
         |  FROM embeddings
         |  WHERE list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0),
         |pairs AS (
         |  SELECT q.vec_id AS q_id, t.vec_id AS c_id,
         |    list_dot_product(q.v, t.v) / (q.nrm * t.nrm) AS cos
         |  FROM b q JOIN b t ON q.bucket = t.bucket
         |  WHERE q.vec_id < 50 AND t.vec_id <> q.vec_id),
         |ranked AS (
         |  SELECT q_id, c_id, cos,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS INTEGER) AS rank
         |  FROM pairs)
         |SELECT q_id, c_id, FLOOR((cos) * 10000.0 + 0.5) / 10000.0 AS cos, rank
         |FROM ranked WHERE rank <= 3""".stripMargin
  )
}
