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
}
