package graft.scale

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  test("int8 quantization: exact scale, zero error on lattice points, " +
    "bounded error elsewhere") {
    val spark2 = spark
    import spark2.implicits._
    val emb = Seq(
      (1L, Array(1.0f, -1.0f, 0.0f, 1.0f)),   // ±127, 0: exact lattice
      (2L, Array(0.3f, 0.7f, -0.2f, 0.11f)),  // generic values
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f))     // zero vector → filtered out
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizeStats(emb).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Double]("scale"), r.getAs[Double]("sse"))).toMap
    assert(out.size === 2) // zero vector dropped
    assert(out(1L)._1 === 127.0) // scale = 127/max|x|
    assert(out(1L)._2 === 0.0)   // lattice points reconstruct exactly
    // generic vector: positive error, bounded by n * (half step)^2
    val (s2, sse2) = out(2L)
    assert(sse2 > 0.0 && sse2 <= 4 * math.pow(1.0 / (2 * s2), 2) + 1e-12)
  }

  test("product quantization: codebook vectors code to themselves with zero error") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(3)
    // 16 codebook vectors + 4 others, 64 dims
    val emb = (0 until 20).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val out = Similarity.pqCodes(emb).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[String]("codes"), r.getAs[Double]("sse"))).toMap
    assert(out.size === 20)
    // every codebook vector's nearest sub-centroid is itself, exactly
    (0 until 16).foreach { k =>
      assert(out(k.toLong)._1 === Seq.fill(8)(k).mkString("-"))
      assert(out(k.toLong)._2 === 0.0)
    }
    // non-codebook vectors get positive error and 8 in-range codes
    (16 until 20).foreach { i =>
      val (codes, sse) = out(i.toLong)
      assert(sse > 0.0)
      val ks = codes.split("-").map(_.toInt)
      assert(ks.length === 8 && ks.forall(k => k >= 0 && k < 16))
    }
  }

  test("quantization error equals the floor(x*s+0.5) reference formula") {
    val spark2 = spark
    import spark2.implicits._
    val vals = Array(0.31f, -0.87f, 0.003f, 0.999f, -0.5f, 0.25f)
    val emb = Seq((1L, vals)).toDF("vec_id", "embedding")
    val row = Similarity.quantizeStats(emb).collect().head
    val xs = vals.map(_.toDouble)
    val mx = xs.map(math.abs).max
    val scale = 127.0 / mx
    val expected = xs.map { x =>
      val recon = math.floor(x * scale + 0.5) / scale
      (x - recon) * (x - recon)
    }.foldLeft(0.0)(_ + _)
    assert(row.getAs[Double]("mx") === mx)
    assert(math.abs(row.getAs[Double]("sse") - expected) < 1e-12)
  }

  test("multi-probe LSH: maxFlips=NumPlanes candidates everything and " +
    "equals brute force; maxFlips widens monotonically; flips guard") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(11)
    val emb = (0 until 40).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    // probing all 2^8 buckets makes every corpus vector a candidate:
    // the "ANN" result must equal exact brute force
    val full = rows(Similarity.annLsh(emb, nQueries = 4, k = 5,
      maxFlips = Similarity.NumPlanes))
    val brute = rows(Similarity.knnBrute(emb, nQueries = 4, k = 5))
    assert(full === brute)
    // candidate sets only grow with radius → hit count vs truth is
    // monotone non-decreasing in maxFlips
    val perFlip = Seq(0, 2, 4, 8).map(f =>
      rows(Similarity.annLsh(emb, 4, 5, f)).map { case (q, c, _) => (q, c) }
        .intersect(brute.map { case (q, c, _) => (q, c) }).size)
    assert(perFlip.sliding(2).forall { case Seq(a, b) => a <= b })
    intercept[IllegalArgumentException](Similarity.annLsh(emb, 4, 5, 9))
  }

  test("annRecall: one row per method, ivf certified on clustered data, " +
    "recall deterministic across reruns") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(7)
    // clustered corpus: 10 anchor directions, 5 jittered copies each —
    // real neighbor structure so the ANN paths have something to find
    val anchors = Array.fill(10)(Array.fill(64)(rnd.nextFloat() * 2 - 1))
    val emb = (0 until 50).map { i =>
      val a = anchors(i % 10)
      (i.toLong, a.map(x => x + rnd.nextFloat() * 0.1f))
    }.toDF("vec_id", "embedding")
    val out = Similarity.annRecall(emb).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toMap
    assert(out.keySet === Set("lsh_mp", "ivf", "pq"))
    out.values.foreach { case (nTruth, nHits, recall, _) =>
      assert(nTruth === 40L) // 8 queries × top-5
      assert(nHits >= 0L && nHits <= nTruth)
      assert(recall >= 0.0 && recall <= 1.0)
    }
    // multi-probe LSH and IVF find jitter-cluster neighbors easily
    assert(out("lsh_mp")._3 >= 0.5)
    assert(out("ivf")._3 >= 0.5)
    // rerun → identical values (deterministic tie-breaks everywhere)
    val again = Similarity.annRecall(emb).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toMap
    assert(again === out)
  }
}
