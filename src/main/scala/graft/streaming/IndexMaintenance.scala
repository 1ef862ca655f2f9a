package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import java.sql.Timestamp

/** One embedding arriving on the ingestion stream. */
case class VecArrival(vec_id: Long, ts: Timestamp, embedding: Array[Double])

/** Running (count, sum) state shared by both maintenance ops: the sum
  * holds cosines for IVF cells and reconstruction errors for PQ
  * subspaces, accumulated EXACTLY in decimal space (scale 18) so that
  * addition is associative — replay order, partition order, and batch
  * iteration order cannot change the state by even an ulp. Encoded as
  * Spark's default Decimal(38, 18): 20 integer digits of headroom ≈
  * 10²⁰ unit-magnitude arrivals before overflow.
  *
  * MIGRATION: the sum field was Double before the decimal rework, so
  * a streaming checkpoint written by the old encoder (Long, Double)
  * does not restore into this schema. WHAT THE OPERATOR SEES: Spark's
  * state-schema compatibility check fails the query AT START with
  * `StateSchemaNotCompatible` ("Provided schema doesn't match to the
  * existing state schema" — the stored value schema shows
  * `sum: double`, the new one `sum: decimal(38,18)`); the query never
  * reads a state row under the wrong layout, so there is no silent
  * corruption window. ACTION: restart the query with a fresh
  * checkpoint directory (lifetime counts restart from the new stream
  * position; the drift detector is batch-local and loses nothing). */
case class RunningSum(n: Long, sum: BigDecimal)

/** Per-batch maintenance report for one IVF cell: lifetime stats plus
  * the batch-local mean that drives the rebuild signal. */
case class CellUpdate(cell_id: Long, n_batch: Long, n_total: Long,
                      mean_cos: Double, batch_mean_cos: Double,
                      rebuild: Boolean)

/** Per-batch maintenance report for one PQ subspace codebook. */
case class SubspaceUpdate(m: Int, n_batch: Long, n_total: Long,
                          mean_err: Double, batch_mean_err: Double,
                          retrain: Boolean)

/** Streaming maintenance of a batch-built IVF ANN index
  * ([[graft.scale.Similarity.ivfCells]] builds the static form): new
  * embeddings are assigned to their nearest coarse centroid as they
  * arrive, and per-cell statistics track how well the frozen centroids
  * still describe the growing corpus.
  *
  * The operational question this answers at 100 TB is WHEN TO REBUILD:
  * an IVF index degrades silently as the data distribution drifts away
  * from the centroids it was trained on — probe recall drops with no
  * error anywhere. The rebuild signal is the BATCH-LOCAL mean cosine
  * between arrivals and their centroid: a lifetime mean would be
  * anchored by history (after 10⁹ aligned members, a full
  * distribution shift needs another ~10⁹ drifted rows to move it),
  * while the batch mean reflects what is arriving NOW. The lifetime
  * mean is still emitted as the slow-moving health baseline.
  *
  * Scale design:
  *  - centroid assignment is per-row arithmetic against a tiny
  *    broadcast array (k centroids) — scan-side compute, no shuffle,
  *    no lookup join;
  *  - the only shuffle is groupByKey(cell_id), and state is bounded by
  *    the CELL COUNT (k entries of (n, sum) — a few hundred bytes),
  *    not by stream length: no watermark eviction needed, ever;
  *  - the per-batch fold STREAMS the group iterator — O(1) memory per
  *    group, never materializing a batch (an earlier form sorted each
  *    group's rows for a deterministic double fold, which buffered a
  *    whole batch's arrivals for one hot cell in a single task).
  *    Determinism now comes from arithmetic, not ordering: each value
  *    is rounded once to decimal scale 18 (HALF_EVEN — deterministic)
  *    and summed EXACTLY; decimal addition is associative, so any
  *    iteration order yields the bit-identical state and means.
  */
object IndexMaintenance {

  /** One double → exact scale-18 decimal, the unit of the associative
    * state sum. Non-finite inputs fail loudly with context instead of
    * surfacing as BigDecimal's bare NumberFormatException. */
  private def toDec(x: Double, what: String): java.math.BigDecimal = {
    require(java.lang.Double.isFinite(x),
      s"$what must be finite, got $x — a NaN/Inf embedding upstream?")
    new java.math.BigDecimal(x)
      .setScale(18, java.math.RoundingMode.HALF_EVEN)
  }

  /** Stream a group's values into the running (n, sum) state and emit
    * (n_batch, n_total, lifetime mean, batch mean): the shared state
    * fold of both maintenance ops. Exact decimal accumulation — see
    * the class note; the iterator is consumed one element at a time. */
  private def foldBatch(values: Iterator[Double], what: String,
                        state: GroupState[RunningSum]): (Long, Long, Double, Double) = {
    var nBatch = 0L
    var batchSum = java.math.BigDecimal.ZERO
    values.foreach { x => nBatch += 1; batchSum = batchSum.add(toDec(x, what)) }
    val prev = state.getOption.getOrElse(RunningSum(0L, BigDecimal(0L).setScale(18)))
    // java-space add: exact, keeps scale 18 (scala BigDecimal ops run
    // under MathContext.DECIMAL128 — 34 significant digits — which
    // would silently round, and rounded addition is not associative)
    val nextSum = prev.sum.bigDecimal.add(batchSum)
    val next = RunningSum(prev.n + nBatch, BigDecimal(nextSum))
    state.update(next)
    (nBatch, next.n,
      nextSum.doubleValue / next.n, batchSum.doubleValue / nBatch)
  }

  /** Nearest-centroid id by cosine, smallest cell id on ties — the same
    * argmax contract as the batch `ivfCells` argmax_cosine kernel.
    * `norms` carries the centroids' precomputed L2 norms so the per-row
    * hot loop does only the dot product (centroids are frozen for the
    * query's lifetime; re-deriving k norms per row would double the
    * flop count forever). A zero vector (or zero centroid) scores
    * cos −1 and still assigns; an embedding with NaN/Inf components
    * would fail every comparison and is rejected loudly below instead
    * of silently accumulating state under a phantom cell −1. */
  private[streaming] def assignCell(v: Array[Double],
                                    cents: Array[(Long, Array[Double])],
                                    norms: Array[Double]): (Long, Double) = {
    var nv = 0.0
    var j = 0
    while (j < v.length) { nv += v(j) * v(j); j += 1 }
    nv = math.sqrt(nv)
    var bestId = -1L; var bestCos = Double.NegativeInfinity
    var k = 0
    while (k < cents.length) {
      val (id, c) = cents(k)
      var dot = 0.0
      var i = 0
      while (i < v.length) { dot += v(i) * c(i); i += 1 }
      val cos = if (nv == 0.0 || norms(k) == 0.0) -1.0 else dot / (nv * norms(k))
      if (cos > bestCos || (cos == bestCos && id < bestId)) {
        bestId = id; bestCos = cos
      }
      k += 1
    }
    if (bestId == -1L)
      throw new IllegalArgumentException(
        "assignCell: no centroid produced a comparable cosine — the " +
          "embedding (or every centroid) contains NaN/Inf components")
    (bestId, bestCos)
  }

  /** Convenience form computing the centroid norms on the spot (tests,
    * one-off calls — the streaming path precomputes them once). */
  private[streaming] def assignCell(v: Array[Double],
                                    cents: Array[(Long, Array[Double])]): (Long, Double) =
    assignCell(v, cents, cents.map { case (_, c) =>
      math.sqrt(c.map(x => x * x).sum)
    })

  /** Min squared-L2 from the `m`-th sub-vector of `v` to the codes of
    * that subspace's codebook — the per-row kernel of [[maintainPq]],
    * and the quantity whose sum over subspaces is the PQ
    * reconstruction SSE ([[graft.scale.Similarity.pqCodes]] computes
    * the same thing batch-side; a spec holds the two equal). */
  private[streaming] def subspaceErr(v: Array[Double], m: Int,
                                     codebook: Array[Array[Double]],
                                     subDim: Int): Double = {
    val off = m * subDim
    var best = Double.PositiveInfinity
    var k = 0
    while (k < codebook.length) {
      val c = codebook(k)
      var d = 0.0
      var i = 0
      while (i < subDim) {
        val diff = v(off + i) - c(i); d += diff * diff; i += 1
      }
      if (d < best) best = d
      k += 1
    }
    best
  }

  /** Maintain the PQ codebooks against a stream of arrivals — the
    * product-quantization twin of [[maintainIvf]]: each arriving
    * vector is quantized against the frozen per-subspace codebooks
    * (`codebooks(m)(k)` = code k of subspace m) and the per-subspace
    * reconstruction error feeds per-SUBSPACE state. Subspace
    * granularity is the actionable unit: PQ codebooks are independent
    * per subspace, so `retrain = true` on subspace 3 means re-k-means
    * THAT codebook, not the whole index. Drift direction is inverted
    * vs IVF: reconstruction error GROWS as the distribution leaves
    * the codebook, so the flag fires on `batch_mean_err >
    * errThreshold` (batch-local for the same reason as maintainIvf —
    * a lifetime mean dilutes drift as the index grows). State is one
    * (n, sum) entry per subspace — bounded by the subspace count, never the
    * stream — and each batch streams through the group iterator in
    * O(1) memory (exact decimal sum; see [[RunningSum]]). */
  def maintainPq(arrivals: Dataset[VecArrival],
                 codebooks: Array[Array[Array[Double]]],
                 errThreshold: Double = 0.5): Dataset[SubspaceUpdate] = {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
      "maintainPq needs a non-empty codebook per subspace")
    val subDim = codebooks.head.head.length
    require(codebooks.flatten.forall(_.length == subDim),
      "all PQ codes must share the sub-vector dimension")
    import arrivals.sparkSession.implicits._
    val nSub = codebooks.length
    val bc = arrivals.sparkSession.sparkContext.broadcast(codebooks)
    arrivals
      .flatMap { a =>
        require(a.embedding.length >= nSub * subDim,
          s"embedding dim ${a.embedding.length} < $nSub×$subDim")
        (0 until nSub).map { m =>
          (m, subspaceErr(a.embedding, m, bc.value(m), subDim))
        }
      }
      .groupByKey(_._1)
      .mapGroupsWithState[RunningSum, SubspaceUpdate](
        GroupStateTimeout.NoTimeout) {
        (m: Int, rows: Iterator[(Int, Double)],
         state: GroupState[RunningSum]) =>
          val (nBatch, nTotal, mean, batchMean) =
            foldBatch(rows.map(_._2), "subspace reconstruction error", state)
          SubspaceUpdate(m, nBatch, nTotal, mean, batchMean,
            retrain = batchMean > errThreshold)
      }
  }

  /** Maintain the IVF index against a stream of arrivals: per
    * micro-batch, emit each touched cell's batch count, lifetime
    * count, lifetime and batch-local mean member-to-centroid cosine,
    * and the rebuild flag (`batch_mean_cos < driftThreshold` — the
    * batch mean is the drift detector, the lifetime mean the
    * baseline). Emits in Update mode — one row per touched cell per
    * batch; a batch that lands millions of arrivals in ONE cell
    * streams through that group's iterator without buffering (exact
    * decimal sum; see [[RunningSum]]). */
  def maintainIvf(arrivals: Dataset[VecArrival],
                  centroids: Array[(Long, Array[Double])],
                  driftThreshold: Double = 0.7): Dataset[CellUpdate] = {
    require(centroids.nonEmpty, "maintainIvf needs a non-empty centroid set")
    import arrivals.sparkSession.implicits._
    val norms = centroids.map { case (_, c) =>
      math.sqrt(c.map(x => x * x).sum)
    }
    val bc = arrivals.sparkSession.sparkContext.broadcast((centroids, norms))
    arrivals
      .map { a =>
        val (cents, ns) = bc.value
        val (cell, cos) = assignCell(a.embedding, cents, ns)
        (cell, cos)
      }
      .groupByKey(_._1)
      .mapGroupsWithState[RunningSum, CellUpdate](
        GroupStateTimeout.NoTimeout) {
        (cell: Long, rows: Iterator[(Long, Double)],
         state: GroupState[RunningSum]) =>
          val (nBatch, nTotal, mean, batchMean) =
            foldBatch(rows.map(_._2), "member-to-centroid cosine", state)
          CellUpdate(cell, nBatch, nTotal, mean, batchMean,
            rebuild = batchMean < driftThreshold)
      }
  }
}
