package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** One embedding arriving on the ingestion stream. */
case class VecArrival(vec_id: Long, ts: Timestamp, embedding: Array[Double])

/** Running per-cell index state: population and cosine-to-centroid sum. */
case class CellStats(n: Long, sumCos: Double)

/** Per-batch maintenance report for one IVF cell. */
case class CellUpdate(cell_id: Long, n_batch: Long, n_total: Long,
                      mean_cos: Double, rebuild: Boolean)

/** Streaming maintenance of a batch-built IVF ANN index
  * ([[graft.scale.Similarity.ivfCells]] builds the static form): new
  * embeddings are assigned to their nearest coarse centroid as they
  * arrive, and per-cell statistics track how well the frozen centroids
  * still describe the growing corpus.
  *
  * The operational question this answers at 100 TB is WHEN TO REBUILD:
  * an IVF index degrades silently as the data distribution drifts away
  * from the centroids it was trained on — probe recall drops with no
  * error anywhere. Tracking the running mean cosine between each
  * cell's members and its centroid turns that drift into a metric, and
  * a cell whose mean falls below a threshold flags `rebuild = true`.
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
    * argmax contract as the batch `ivfCells` max_by aggregate. */
  private[streaming] def assignCell(v: Array[Double],
                                    cents: Array[(Long, Array[Double])]): (Long, Double) = {
    val nv = math.sqrt(v.map(x => x * x).sum)
    var bestId = -1L; var bestCos = Double.NegativeInfinity
    cents.foreach { case (id, c) =>
      var dot = 0.0; var nc = 0.0
      var i = 0
      while (i < v.length) { dot += v(i) * c(i); nc += c(i) * c(i); i += 1 }
      val cos = if (nv == 0.0 || nc == 0.0) -1.0 else dot / (nv * math.sqrt(nc))
      if (cos > bestCos || (cos == bestCos && id < bestId)) {
        bestId = id; bestCos = cos
      }
    }
    (bestId, bestCos)
  }

  /** Maintain the IVF index against a stream of arrivals: per
    * micro-batch, emit each touched cell's batch count, lifetime
    * count, running mean member-to-centroid cosine, and the rebuild
    * flag (`mean_cos < driftThreshold`). Emits in Update mode — one
    * row per touched cell per batch. */
  def maintainIvf(arrivals: Dataset[VecArrival],
                  centroids: Array[(Long, Array[Double])],
                  driftThreshold: Double = 0.7): Dataset[CellUpdate] = {
    require(centroids.nonEmpty, "maintainIvf needs a non-empty centroid set")
    import arrivals.sparkSession.implicits._
    val bc = arrivals.sparkSession.sparkContext.broadcast(centroids)
    arrivals
      .map { a =>
        val (cell, cos) = assignCell(a.embedding, bc.value)
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
          val next = batch.foldLeft(prev) { (s, r) =>
            CellStats(s.n + 1, s.sumCos + r._4)
          }
          state.update(next)
          val mean = next.sumCos / next.n
          CellUpdate(cell, batch.size.toLong, next.n, mean,
            rebuild = mean < driftThreshold)
      }
  }
}
