package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed MERGE/upsert — the shape single-row mutations (M1/M2)
  * take at 100 TB, where rewriting the full table per patch
  * (`patch_dp.py`'s model) is impossible and per-key conditional
  * projections don't batch.
  *
  * `upsert` is one shuffle-or-broadcast join: matched keys take the
  * source row's values, unmatched target rows pass through, unmatched
  * source rows insert. Equivalent to Delta's
  * `MERGE … WHEN MATCHED UPDATE SET * WHEN NOT MATCHED INSERT *`, but
  * expressed on vanilla Spark against the atomic-overwrite commit
  * ([[TableIO.atomicOverwrite]]) — on a partitioned table, pair with
  * partition pruning so only touched partitions rewrite.
  */
object Merge {

  /** Upsert `source` into `target` by `key`. Columns are aligned by
    * name; source columns missing from target are dropped, target
    * columns missing from source keep their target values. */
  def upsert(target: DataFrame, source: DataFrame, key: String): DataFrame = {
    val cols = target.columns
    val src = source.select(cols.filter(c =>
      source.columns.contains(c) || c == key).map(col): _*)
    val t = target.as("t")
    val s = src.as("s")
    t.join(s, col(s"t.$key") === col(s"s.$key"), "full_outer")
      .select(cols.map { c =>
        if (src.columns.contains(c)) coalesce(col(s"s.$c"), col(s"t.$c")).as(c)
        else col(s"t.$c").as(c)
      }: _*)
  }

  /** Keyed delete: target minus the delete-key set, as an anti-join
    * (batches M3 at scale — broadcast the key set). */
  def deleteKeys(target: DataFrame, keys: DataFrame, key: String): DataFrame =
    target.join(broadcast(keys.select(key)), Seq(key), "left_anti")
}
