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
  * Contract notes: every SIGNATURE-BEARING arrival emits a verdict —
  * matched rows with their match/cluster stats, unmatched rows with
  * `matched = false` — so the stream alone answers the complete q174
  * board (the reconciliation spec pins equality INCLUDING unmatched
  * rows, under duplicate delivery). Arrivals with no words (empty
  * text after normalization) carry no signature and emit no verdict —
  * the same exclusion [[graft.scale.Dedup.simhash]] states. Emits in
  * Update mode.
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
    val streamBlocked = Dedup.blockedSignatures(
      arrivals.toDF()
        .select(col("doc_id"), words(col("text")).as("ws"))
        .filter(size(col("ws")) > 0)
        .select(col("doc_id"), simhash60(col("ws")).as("simhash")),
      maxDist, c)
    // LEFT join + validity PROJECTION (not a filter): an arrival whose
    // chunks hit nothing — or only above-maxDist signatures — must
    // still reach the fold and emit its matched=false verdict, so the
    // stream ALONE answers the full q174 board (round-15 flag: the
    // old inner join made "absence of a verdict" a contract the
    // consumer had to remember)
    val valid = col("f_id").isNotNull &&
      bit_count(col("simhash").bitwiseXOR(col("f_sim"))) <= maxDist
    streamBlocked
      .join(staticBlocked, Seq("t", "kv"), "left")
      .select(col("doc_id"),
        when(valid, col("f_id")).as("f_id"),
        when(valid, col("f_cluster")).as("f_cluster"))
      .as[(Long, Option[Long], Option[Long])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[NearDupState, NearDupVerdict](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (id: Long, rows: Iterator[(Long, Option[Long], Option[Long])],
         state: GroupState[NearDupState]) =>
          // fold new rows into the distinct match set: idempotent
          // under re-delivery, bounded by the doc's own match count
          val prev = state.getOption.map(_.matches.toSet)
            .getOrElse(Set.empty[(Long, Long)])
          val now = prev ++ rows.flatMap(r => r._2.zip(r._3))
          if (now.isEmpty)
            // unmatched: emit the spine row but store NOTHING — the
            // verdict is a deterministic recompute of the arrival's
            // text, so re-delivery re-derives it and state stays
            // bounded by MATCHED arrivals only
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
