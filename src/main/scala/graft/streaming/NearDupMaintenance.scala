package graft.streaming

import graft.Materialize
import graft.scale.Dedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** One document arriving on the ingestion stream. */
case class DocArrival(doc_id: Long, ts: Timestamp, text: String)

/** The per-arrival verdict [[NearDupMaintenance.matches]] emits: the
  * q174 row, streamed — which frozen docs the arrival near-duplicates,
  * how many distinct frozen CLUSTERS those span (> 1 = bridge doc),
  * and the min-label cluster it joins. */
case class NearDupVerdict(doc_id: Long, matched: Boolean, n_matches: Long,
                          n_clusters: Long, cluster: Option[Long])

/** Distinct (frozen_id, frozen_cluster) matches seen so far for one
  * arrival — kept as a sorted Seq (encodable, deterministic) so
  * re-delivered rows cannot double-count. */
case class NearDupState(matches: Seq[(Long, Long)])

/** Streaming NEAR-dup maintenance against a FROZEN simhash index —
  * the streaming twin of the q174 batch board
  * ([[graft.scale.Dedup.incrementalNearDup]]): documents are
  * signature'd as they arrive, blocked with the SAME Manku chunk
  * geometry the index was built with, joined stream-static against
  * the blocked index, and reduced to one verdict per arrival.
  *
  * The operational role at 100 TB: a nightly batch publishes the
  * frozen index (signatures + cluster labels — [[buildFrozenIndex]]
  * is the one-time batch step); the ingest stream then answers "is
  * this new document already in the corpus" AT ARRIVAL TIME instead
  * of at the next batch run — the gate an ingestion pipeline puts in
  * front of expensive downstream work (embedding, quality scoring).
  *
  * Scale design:
  *  - the arrival side is scan-side kernel work (words → simhash60 →
  *    chunk explode): no shuffle before the join;
  *  - the frozen index is corpus-sized, so it is a stream-static JOIN
  *    on the short (t, kv) chunk keys — never a broadcast; the
  *    blocked index is materialized ONCE under the [[Materialize]]
  *    policy so every micro-batch scans stored blocks instead of
  *    re-running the blocking;
  *  - completeness is the batch chain's own argument: ≤ maxDist
  *    differing bits leave at least one of the C(c, c−maxDist) chunk
  *    combinations fully equal, so the equality join cannot miss a
  *    true match (the reconciliation spec pins stream == q174);
  *  - state is per MATCHED arrival only (its distinct match set,
  *    bounded by the doc's own match count); unmatched arrivals emit
  *    their spine row statelessly — the verdict is a deterministic
  *    recompute of the arrival's text, so re-delivery re-derives it.
  *    Re-delivered rows fold into the same set, so duplicate delivery
  *    re-emits the SAME verdict instead of double-counting. Eviction
  *    is the index
  *    lifecycle itself: the nightly batch that republishes the frozen
  *    index ([[buildFrozenIndex]]) restarts the stream against it
  *    with a fresh checkpoint, so state never outlives an index
  *    generation. (A processing-time timeout would evict sooner, but
  *    registered timeouts make the engine trigger empty micro-batches
  *    continuously — measured 1000+ spins in minutes — burning the
  *    cluster between arrivals; the generation restart is the
  *    cheaper, simpler bound.)
  *
  * Contract notes: EVERY arrival emits a verdict — matched rows with
  * their match/cluster stats, unmatched rows with `matched = false`,
  * and wordless arrivals (empty text after normalization, no
  * signature — [[graft.scale.Dedup.simhash]]'s exclusion) a stateless
  * matched=false spine row — so the stream alone answers the complete
  * q174 board, whose spine is ALL new docs (the reconciliation specs,
  * fixed-fixture and fuzz, pin equality INCLUDING unmatched rows,
  * under duplicate and out-of-order delivery). Emits in Update mode.
  */
object NearDupMaintenance {

  /** The one-time batch step that publishes the frozen index the
    * stream joins against: (doc_id, simhash, cluster_id) over the
    * frozen corpus, cluster labels from the frozen corpus's OWN
    * near-dup components (min-id label; singletons label themselves)
    * — exactly the registry q174/q175 read. */
  def buildFrozenIndex(frozenDocs: DataFrame, maxDist: Int = 3,
                       numChunks: Int = 0): DataFrame = {
    val sh = Dedup.simhash(frozenDocs)
    val comps = Dedup.connectedComponents(
      Dedup.simhashPairs(frozenDocs, maxDist, numChunks))
    sh.join(comps, Seq("doc_id"), "left")
      .select(col("doc_id"), col("simhash"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
  }

  /** Per-arrival near-dup verdicts against `frozenIndex` (the
    * [[buildFrozenIndex]] schema). `maxDist`/`numChunks` must match
    * the geometry the index was built with. */
  def matches(arrivals: Dataset[DocArrival], frozenIndex: DataFrame,
              maxDist: Int = 3, numChunks: Int = 0): Dataset[NearDupVerdict] = {
    import graft.functions.PortableFuncs.words
    import graft.functions.SimHashExpression.simhash60
    val spark = arrivals.sparkSession
    import spark.implicits._
    val c = if (numChunks <= 0) maxDist + 1 else numChunks
    require(c >= maxDist + 1 && c <= 60,
      s"numChunks must be in [maxDist+1, 60]: $c")
    // static side, materialized ONCE (policy-routed): the blocked
    // index with its cluster labels riding along as payload
    val staticBlocked = Materialize.core(
      Dedup.blockedSignatures(
        frozenIndex.select(col("doc_id").as("f_id"),
          col("simhash"), col("cluster_id").as("f_cluster")),
        maxDist, c)
        .select(col("t"), col("kv"), col("f_id"),
          col("simhash").as("f_sim"), col("f_cluster")))
    val tok = arrivals.toDF()
      .select(col("doc_id"), words(col("text")).as("ws"))
    val streamBlocked = Dedup.blockedSignatures(
      tok.filter(size(col("ws")) > 0)
        .select(col("doc_id"), simhash60(col("ws")).as("simhash")),
      maxDist, c)
    // WORDLESS arrivals (empty text after normalization) carry no
    // signature and can match nothing — but the q174 batch board's
    // spine is ALL new docs, so they still owe a stateless
    // matched=false verdict. Routed straight to the fold with no
    // match columns (fuzz round 19: the old filter dropped them and
    // the stream no longer answered the full board).
    val wordless = tok.filter(size(col("ws")) === 0)
      .select(col("doc_id"), lit(null).cast("long").as("f_id"),
        lit(null).cast("long").as("f_cluster"))
    // LEFT join + validity PROJECTION (not a filter): an arrival whose
    // chunks hit nothing — or only above-maxDist signatures — must
    // still reach the fold and emit its matched=false verdict, so the
    // stream ALONE answers the full q174 board (round-15 flag: the
    // old inner join made "absence of a verdict" a contract the
    // consumer had to remember)
    val valid = col("f_id").isNotNull &&
      bit_count(col("simhash").bitwiseXOR(col("f_sim"))) <= maxDist
    verdictFold(
      streamBlocked
        .join(staticBlocked, Seq("t", "kv"), "left")
        .select(col("doc_id"),
          when(valid, col("f_id")).as("f_id"),
          when(valid, col("f_cluster")).as("f_cluster"))
        .unionByName(wordless)
        .as[(Long, Option[Long], Option[Long])])
  }

  /** The shared verdict fold: distinct (frozen id, frozen cluster)
    * matches per arrival, idempotent under re-delivery; unmatched
    * arrivals emit their spine row STATELESSLY (the verdict is a
    * deterministic recompute of the arrival itself, so state stays
    * bounded by matched arrivals only). Extracted so the simhash and
    * celled twins fold identically. */
  private[streaming] def verdictFold(
      arrivals: Dataset[(Long, Option[Long], Option[Long])])
      : Dataset[NearDupVerdict] = {
    val spark = arrivals.sparkSession
    import spark.implicits._
    arrivals.groupByKey(_._1)
      .flatMapGroupsWithState[NearDupState, NearDupVerdict](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (id: Long, rows: Iterator[(Long, Option[Long], Option[Long])],
         state: GroupState[NearDupState]) =>
          val prev = state.getOption.map(_.matches.toSet)
            .getOrElse(Set.empty[(Long, Long)])
          val now = prev ++ rows.flatMap(r => r._2.zip(r._3))
          if (now.isEmpty)
            Iterator.single(NearDupVerdict(id, matched = false,
              n_matches = 0L, n_clusters = 0L, cluster = None))
          else {
            state.update(NearDupState(now.toSeq.sorted))
            val clusters = now.map(_._2)
            Iterator.single(NearDupVerdict(id, matched = true,
              n_matches = now.size.toLong,
              n_clusters = clusters.size.toLong,
              cluster = Some(clusters.min)))
          }
      }
  }
}

/** Streaming near-dup maintenance against a FROZEN CELLED embedding
  * index — the streaming twin of the q184 batch board
  * ([[graft.scale.Dedup.incrementalNearDupCelled]]), completing the
  * symmetry the simhash chain already has ([[NearDupMaintenance]] ↔
  * q174): a nightly batch publishes the celled keyed index with its
  * cluster labels ([[buildFrozenIndex]]); the ingest stream then
  * answers "does this embedding near-duplicate the corpus" AT ARRIVAL
  * TIME — the gate a CLIP-dedup pipeline puts in front of expensive
  * downstream work.
  *
  * Scale design:
  *  - the arrival side is scan-side kernel work (double cast →
  *    argmax-cosine cell → fixed + diff-plane sign words → band
  *    explode): plan-constant seeds, no shuffle before the join, and
  *    NO widen/repartition step (illegal on a streaming source) —
  *    the keyed projection is built inline from the same kernels as
  *    the batch [[graft.scale.Dedup.celledKeyedVectors]], so every
  *    key is the bit-identical value the frozen index was built with;
  *  - the frozen index is corpus-sized → stream-static JOIN on the
  *    short (band, cell, bucket, word) keys, never a broadcast; the
  *    banded index is materialized ONCE under the [[Materialize]]
  *    policy;
  *  - a frozen match agreeing on BOTH bands arrives twice; the
  *    verdict fold's distinct set makes the verdict exactly-once
  *    (the same mechanism that absorbs duplicate chunk hits in the
  *    simhash twin);
  *  - the exact cosine gate runs INSIDE the validity projection (raw
  *    IEEE cosine, the batch chain's own filter), so blocking only
  *    costs recall, never precision — and the recall price is exactly
  *    q176's, priced by the q177/q182 boards;
  *  - state per MATCHED arrival only; unmatched arrivals emit
  *    `matched=false` statelessly; eviction is the index lifecycle
  *    (the republishing batch restarts the stream — see the simhash
  *    twin's timeout note).
  *
  * The reconciliation spec pins stream ≡ the FULL q184 board,
  * including unmatched spine rows, under duplicate delivery. */
object CelledNearDupMaintenance {
  import graft.functions.PortableFuncs.{dotProduct, l2Norm, toDoubleArray}
  import graft.functions.VectorExpressions
  import graft.scale.Similarity

  /** The one-time batch step: the frozen corpus's celled keyed
    * projection plus the cluster labels its own celled pairs publish
    * (min-id components; singletons label themselves) — exactly the
    * registry q184 reads. Seeds default to the frozen corpus's first
    * [[Similarity.IvfCells]] rows (the same plan-constant list every
    * batch consumer keys on); `seeds0` for expensive-kernel callers
    * (the media chain's source-bounded seed scan). */
  def buildFrozenIndex(frozenEmb: DataFrame, minCos: Double,
      seeds0: Option[Seq[(Long, Seq[Double])]] = None,
      nBands: Int = Dedup.CelledBands,
      bandBits: Int = Dedup.CelledBandBits): DataFrame = {
    val seeds = seeds0.getOrElse(
      Similarity.seedCentroidList(Similarity.nonZeroNorm(frozenEmb),
        Similarity.IvfCells))
    val keyed = Materialize.core(
      Dedup.celledKeyedVectors(frozenEmb, seeds))
    val comps = Dedup.connectedComponents(
      Dedup.embeddingNearDupCelledFrom(keyed, minCos,
        inputMaterialized = true, nBands = nBands, bandBits = bandBits),
      aCol = "vec_a", bCol = "vec_b")
    keyed.join(
        comps.select(col("doc_id").as("vec_id"), col("cluster_id")),
        Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell_id"), col("bucket"),
        col("dbucket"), col("v"), col("nrm"),
        coalesce(col("cluster_id"), col("vec_id")).as("cluster_id"))
  }

  /** A keyed table exploded to its per-band join keys
    * (band, cell_id, bucket, w) + the caller's payload columns —
    * scan-side bit arithmetic + one generate, stream-safe. */
  private def bandKeys(keyed: DataFrame, payload: Seq[String],
      nBands: Int, bandBits: Int): DataFrame = {
    val banded = Dedup.celledBands(keyed, nBands, bandBits)
    val entries = (0 until nBands).map(j =>
      struct(lit(j).as("band"), col(s"db$j").as("w")))
    banded.select(
      (Seq(col("cell_id"), col("bucket"),
        explode(array(entries: _*)).as("bw")) ++ payload.map(col)): _*)
      .select((Seq(col("bw.band").as("band"), col("cell_id"),
        col("bucket"), col("bw.w").as("w")) ++ payload.map(col)): _*)
  }

  /** Per-arrival verdicts against `frozenIndex` (the
    * [[buildFrozenIndex]] schema). `seeds` and `(nBands, bandBits)`
    * must be the list and band geometry the index was built with —
    * the plan-constant geometry contract: the stream derives its keys
    * from the same kernels and the same dial, so moving the dial
    * moves BOTH sides together (the reconciliation spec proves it at
    * two geometries). Arrivals
    * carry the [[VecArrival]] schema ([[IndexMaintenance]]'s arrival
    * type): the embedding as doubles — callers streaming float32
    * vectors cast them exactly as the batch tables do. */
  def matches(arrivals: Dataset[VecArrival], frozenIndex: DataFrame,
              seeds: Seq[(Long, Seq[Double])], minCos: Double,
              nBands: Int = Dedup.CelledBands,
              bandBits: Int = Dedup.CelledBandBits)
      : Dataset[NearDupVerdict] = {
    val spark = arrivals.sparkSession
    import spark.implicits._
    // static side, banded + materialized once
    val staticBlocked = Materialize.core(bandKeys(
      frozenIndex.select(col("vec_id").as("f_id"), col("cell_id"),
        col("bucket"), col("dbucket"), col("v").as("f_v"),
        col("nrm").as("f_nrm"), col("cluster_id").as("f_cluster")),
      payload = Seq("f_id", "f_v", "f_nrm", "f_cluster"),
      nBands, bandBits))
    // arrival side: the batch keyed projection's EXPRESSIONS inline
    // (same kernels, same seeds → bit-identical keys), minus widen
    val v = toDoubleArray(col("embedding"))
    val streamKeyed = arrivals.toDF()
      .select(col("vec_id"), v.as("v"))
      .select(col("vec_id"),
        VectorExpressions.argMaxCosine(col("v"), seeds).as("cell_id"),
        Similarity.diffPlaneBucket(col("v"), seeds).as("dbucket"),
        Similarity.fixedPlaneBucket(col("v")).as("bucket"),
        col("v"), l2Norm(col("v")).as("nrm"))
      // zero-norm arrivals are OUTSIDE the board universe: the batch
      // keyed projection excludes them (cosine undefined — see
      // celledKeyedVectors), so the stream drops them too instead of
      // dividing by zero in the validity gate (fuzz round 19)
      .filter(col("nrm") > 0d)
    val streamBlocked = bandKeys(streamKeyed,
      payload = Seq("vec_id", "v", "nrm"), nBands, bandBits)
    // LEFT join + validity projection: the exact cosine gate (raw
    // IEEE, the batch chain's own filter); unmatched arrivals keep
    // their spine row for the stateless matched=false verdict
    val valid = col("f_id").isNotNull &&
      dotProduct(col("v"), col("f_v")) / (col("nrm") * col("f_nrm")) >= minCos
    NearDupMaintenance.verdictFold(
      streamBlocked
        .join(staticBlocked, Seq("band", "cell_id", "bucket", "w"), "left")
        .select(col("vec_id"),
          when(valid, col("f_id")).as("f_id"),
          when(valid, col("f_cluster")).as("f_cluster"))
        .as[(Long, Option[Long], Option[Long])])
  }
}
