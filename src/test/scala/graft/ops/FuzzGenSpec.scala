package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** The differential-fuzz corpus generator: the fuzz gate's evidence is
  * only as good as the generator's two contracts — (1) a seed is a
  * permanent repro (bit-deterministic corpora), and (2) every corpus
  * passes the same schema preflight the driver testdata does (else the
  * fuzz would exercise loader-adaptation paths, not query semantics).
  */
class FuzzGenSpec extends AnyFunSuite with SparkSpec {

  private def corpusFingerprint(dir: String): Map[String, (Long, String)] =
    graft.SchemaCanary.expected.keys.toSeq.sorted.map { t =>
      val df = spark.read.parquet(s"$dir/$t.parquet")
      val cols = df.columns.sorted
      val canon = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      // order-insensitive content hash: decimal sum of per-row hashes
      // (a long sum overflows under ANSI)
      val h = canon.select(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.xxhash64(
          cols.map(org.apache.spark.sql.functions.col): _*)
          .cast("decimal(38,0)")).cast("string"))
        .collect()(0).getString(0)
      t -> (df.count(), h)
    }.toMap

  test("same seed, same corpus: regeneration is bit-deterministic " +
    "(a red fuzz seed must be a permanent repro command)") {
    val base = java.nio.file.Files.createTempDirectory("fuzzgen").toString
    graft.tools.FuzzGen.write(spark, 7L, s"$base/a")
    graft.tools.FuzzGen.write(spark, 7L, s"$base/b")
    assert(corpusFingerprint(s"$base/a") === corpusFingerprint(s"$base/b"))
  }

  test("generated corpora pass the SchemaCanary preflight on both " +
    "profiles (normal seed and tiny single-row seed)") {
    val base = java.nio.file.Files.createTempDirectory("fuzzgen").toString
    graft.tools.FuzzGen.write(spark, 11L, s"$base/normal") // 11 % 3 != 0
    graft.tools.FuzzGen.write(spark, 9L, s"$base/tiny")    // 9 % 3 == 0
    assert(graft.SchemaCanary.drift(spark, s"$base/normal") === Nil)
    assert(graft.SchemaCanary.drift(spark, s"$base/tiny") === Nil)
    // the tiny profile IS the degenerate-cardinality stress
    assert(spark.read.parquet(s"$base/tiny/lineitem.parquet").count() === 1L)
    assert(spark.read.parquet(s"$base/normal/lineitem.parquet").count() > 100L)
  }

  test("the adversarial draws are present: duplicate documents, tied " +
    "order keys, an all-identical embedding block, zero-weight props") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("fuzzgen").toString
    graft.tools.FuzzGen.write(spark, 11L, s"$base/c")
    val docs = spark.read.parquet(s"$base/c/documents.parquet")
    assert(docs.groupBy(col("text")).count().filter(col("count") > 1).count() > 0,
      "exact-duplicate documents must exist")
    assert(docs.filter(length(col("text")) === 0).count() > 0,
      "an empty-text document must exist")
    val li = spark.read.parquet(s"$base/c/lineitem.parquet")
    assert(li.select(countDistinct(col("l_extendedprice"))).collect()(0).getLong(0) < 10,
      "order-by-able numerics must draw from tiny tie domains")
    val emb = spark.read.parquet(s"$base/c/embeddings.parquet")
    val dupVecs = emb.groupBy(col("embedding")).count()
      .filter(col("count") >= 10).count()
    assert(dupVecs > 0, "an all-identical embedding block must exist")
    val ev = spark.read.parquet(s"$base/c/events.parquet")
    assert(ev.filter(col("props") === lit("""{"k": 0}""")).count() > 0,
      "zero-weight props must exist")
    // failed-encode zeros: the draw that forced the engine-wide
    // "cosine boards exclude zero-norm vectors" contract — and (r20)
    // one of them BELOW IvfCells, so every seed-centroid selection
    // faces a zero-norm SEED candidate (the r19 ADVICE gap)
    val zeros = emb.filter(aggregate(col("embedding"), lit(0.0d),
      (a, x) => a + x * x) === 0.0d)
    assert(zeros.count() === 3L, "three all-zero embeddings must exist")
    assert(zeros.filter(col("vec_id") < graft.scale.Similarity.IvfCells)
      .count() === 1L, "one zero-norm vector must sit below IvfCells " +
      "(a zero-norm SEED candidate)")
  }
}
