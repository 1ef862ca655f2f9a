package graft.tools

/** Differential-fuzz runner (round-18 prescription): for each seed,
  * generate an adversarial corpus with [[FuzzGen]] and run the FULL
  * gate dump (`graft.Verify.run` — every query, every oracle) against
  * it, all inside ONE session. The DuckDB half of the differential
  * compare then runs per seed via `tools/fuzz.py` (which loops
  * `tools/check.py` over the seed dirs), exactly mirroring the
  * driver's gate on each randomized draw.
  *
  * Layout: `<base>/seed<N>/data/` (corpus parquet tables) and
  * `<base>/seed<N>/out/` (dump + oracle_sql.json).
  *
  * Between seeds the Shared core registry and every storage block are
  * dropped (the Bench main's batch-boundary discipline): cores are
  * keyed by (core, sfDir) so cross-seed reuse is impossible anyway,
  * but the blocks would otherwise accumulate across seeds.
  */
object Fuzz {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Fuzz <baseDir> <seed>...")
    val base = args(0)
    val seeds = args.tail.map(_.toLong)
    val spark = graft.Verify.session()
    for (seed <- seeds) {
      val t0 = System.nanoTime()
      System.err.println(s"[fuzz] seed $seed: generating corpus")
      FuzzGen.write(spark, seed, s"$base/seed$seed/data")
      System.err.println(s"[fuzz] seed $seed: running the full gate dump")
      graft.Verify.run(spark, s"$base/seed$seed/data", s"$base/seed$seed/out",
        Set.empty)
      graft.Shared.clear()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.err.println(f"[fuzz] seed $seed done in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
