package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** One embedding arriving on the ingestion stream. */
case class VecArrival(vec_id: Long, ts: Timestamp, embedding: Array[Double])

/** Running per-cell index state: population and cosine-to-centroid sum. */
case class CellStats(n: Long, sumCos: Double)

/** Per-batch maintenance report for one IVF cell: lifetime stats plus
  * the batch-local mean that drives the rebuild signal. */
case class CellUpdate(cell_id: Long, n_batch: Long, n_total: Long,
                      mean_cos: Double, batch_mean_cos: Double,
                      rebuild: Boolean)

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
  *    the CELL COUNT (k entries of (n, sumCos) — a few hundred bytes),
  *    not by stream length: no watermark eviction needed, ever;
  *  - within a batch each cell's rows are folded in (ts, vec_id) order,
  *    so the double sum is deterministic under replay.
  */
object IndexMaintenance {

  /** Nearest-centroid id by cosine, smallest cell id on ties — the same
    * argmax contract as the batch `ivfCells` max_by aggregate.
    * `norms` carries the centroids' precomputed L2 norms so the per-row
    * hot loop does only the dot product (centroids are frozen for the
    * query's lifetime; re-deriving k norms per row would double the
    * flop count forever). */
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
    (bestId, bestCos)
  }

  /** Convenience form computing the centroid norms on the spot (tests,
    * one-off calls — the streaming path precomputes them once). */
  private[streaming] def assignCell(v: Array[Double],
                                    cents: Array[(Long, Array[Double])]): (Long, Double) =
    assignCell(v, cents, cents.map { case (_, c) =>
      math.sqrt(c.map(x => x * x).sum)
    })

  /** Maintain the IVF index against a stream of arrivals: per
    * micro-batch, emit each touched cell's batch count, lifetime
    * count, lifetime and batch-local mean member-to-centroid cosine,
    * and the rebuild flag (`batch_mean_cos < driftThreshold` — the
    * batch mean is the drift detector, the lifetime mean the
    * baseline). Emits in Update mode — one row per touched cell per
    * batch. */
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
        (cell, a.vec_id, a.ts.getTime, cos)
      }
      .groupByKey(_._1)
      .mapGroupsWithState[CellStats, CellUpdate](
        GroupStateTimeout.NoTimeout) {
        (cell: Long, rows: Iterator[(Long, Long, Long, Double)],
         state: GroupState[CellStats]) =>
          // deterministic fold order under replay: (ts, vec_id)
          val batch = rows.toSeq.sortBy(r => (r._3, r._2))
          val prev = state.getOption.getOrElse(CellStats(0L, 0.0))
          val batchSum = batch.foldLeft(0.0)((s, r) => s + r._4)
          val next = CellStats(prev.n + batch.size, prev.sumCos + batchSum)
          state.update(next)
          val batchMean = batchSum / batch.size
          CellUpdate(cell, batch.size.toLong, next.n,
            next.sumCos / next.n, batchMean,
            rebuild = batchMean < driftThreshold)
      }
  }
}
