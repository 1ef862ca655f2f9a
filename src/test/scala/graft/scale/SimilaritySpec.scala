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

  test("product quantization: trained codebook reconstructs no worse than " +
    "its seed (Lloyd non-increase), SSE matches a driver recomputation") {
    val spark2 = spark
    import spark2.implicits._
    import Similarity.{PqCodebook, PqSubDim, PqSubspaces}
    val rnd = new scala.util.Random(3)
    // PqCodebook seed vectors + 8 others, 64 dims — all inside the
    // training sample (vec_id < PqTrainSample), so the k-means
    // monotonicity argument below covers every row
    val nVecs = PqCodebook + 8
    val emb = (0 until nVecs).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val vecs = emb.select(org.apache.spark.sql.functions.col("vec_id"),
      graft.functions.PortableFuncs.toDoubleArray(
        org.apache.spark.sql.functions.col("embedding")).as("v"))
      .as[(Long, Array[Double])].collect().toMap
    def sseAgainst(v: Array[Double], books: Array[Array[Array[Double]]]): Double =
      (0 until PqSubspaces).map { m =>
        books(m).map { c =>
          var d = 0.0
          (0 until PqSubDim).foreach { i =>
            val x = v(m * PqSubDim + i) - c(i); d += x * x
          }
          d
        }.min
      }.sum
    def toBooks(rows: Array[(Int, Int, Array[Double])]) =
      Array.tabulate(PqSubspaces)(m =>
        rows.filter(_._2 == m).sortBy(_._1).map(_._3))
    val seed = toBooks((0 until PqCodebook).flatMap { k =>
      (0 until PqSubspaces).map(m =>
        (k, m, vecs(k.toLong).slice(m * PqSubDim, (m + 1) * PqSubDim)))
    }.toArray)
    val trained = toBooks(Similarity.pqTrainedCents(emb).collect().map(r =>
      (r.getAs[Int]("k"), r.getAs[Int]("m"),
        r.getAs[Seq[Double]]("cv").toArray)))
    val out = Similarity.pqCodes(emb).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[String]("codes"), r.getAs[Double]("sse"))).toMap
    assert(out.size === nVecs)
    // k-means never worsens the training objective: total SSE under
    // the trained codebook <= total SSE under the first-16 seed
    val seedTotal = vecs.values.map(sseAgainst(_, seed)).sum
    val trainedTotal = vecs.values.map(sseAgainst(_, trained)).sum
    assert(trainedTotal <= seedTotal,
      s"training worsened reconstruction: $trainedTotal > $seedTotal")
    // the plan's SSE equals the driver recomputation against the
    // collected trained codebook (same fold order -> exact equality),
    // and every code is in range
    (0 until nVecs).foreach { i =>
      val (codes, sse) = out(i.toLong)
      assert(sse === sseAgainst(vecs(i.toLong), trained), s"vec $i SSE")
      val ks = codes.split("-").map(_.toInt)
      assert(ks.length === PqSubspaces && ks.forall(k => k >= 0 && k < PqCodebook))
    }
  }

  test("zero-norm vectors are outside every cosine board's universe: " +
    "excluded as query AND candidate, with no ANSI division error") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(23)
    val emb = ((0 until 40).map { i =>
      val v = if (i == 2 || i == 25) Array.fill(16)(0.0f)
              else Array.fill(16)((rnd.nextGaussian() * 0.3).toFloat)
      (i.toLong, v)
    }).toDF("vec_id", "embedding")
    // brute-force: the zero vectors appear on NEITHER side (a zero
    // query would otherwise divide by zero under ANSI; a zero
    // candidate has no direction to rank by)
    val rows = Similarity.knnBrute(emb, nQueries = 8L, k = 3).collect()
    assert(rows.nonEmpty)
    assert(!rows.exists(r => r.getLong(0) == 2L || r.getLong(1) == 2L ||
      r.getLong(1) == 25L), "zero-norm vectors must not appear")
    // the IVF family survives a zero vector in the SEED range too
    // (seeds are drawn from the filtered universe)
    assert(Similarity.annIvf(emb, nQueries = 8L, k = 3).collect().nonEmpty)
    assert(graft.scale.Dedup.semDedup(emb, minCos = 0.99).collect()
      .forall(r => r.getLong(0) != 2L && r.getLong(0) != 25L),
      "semdedup keep/drop verdicts exclude zero-norm vectors")
  }

  test("a holed seed range trains a rank-numbered PQ book (oracle " +
    "ROW_NUMBER contract); the position-numbered experimental trainer " +
    "still refuses loudly") {
    val spark2 = spark
    import spark2.implicits._
    import Similarity.PqCodebook
    val rnd = new scala.util.Random(7)
    // drop vec_id 3 from the seed range: the PQ codebook now numbers
    // codes by RANK of vec_id (the oracle's ROW_NUMBER contract), so a
    // holed corpus TRAINS fine and keeps the full codebook shape —
    // while the experimental position-numbered ivfTrainedCents (no
    // rank-numbered oracle) still refuses loudly
    val holed = ((0 until PqCodebook + 8).map(_.toLong).filter(_ != 3L))
      .map(i => (i, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    // 15 of the 16 seed ids remain below PqCodebook after the hole —
    // the book keeps exactly that many rank-numbered codes
    val trained = Similarity.pqTrainedCents(holed).collect()
    assert(trained.length === (PqCodebook - 1) * Similarity.PqSubspaces,
      "a holed seed range must train a rank-numbered book of the " +
        "remaining seeds")
    val e2 = intercept[IllegalArgumentException] {
      Similarity.ivfTrainedCents(holed).collect()
    }
    assert(e2.getMessage.contains("contiguous vec_ids"))
  }

  test("ivfTrainedCents: deterministic spherical k-means that balances " +
    "cells vs the seed (the documented reason it stays experimental)") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    import org.apache.spark.sql.functions.col
    val t1 = Similarity.ivfTrainedCents(emb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).sortBy(_._1)
    val t2 = Similarity.ivfTrainedCents(emb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).sortBy(_._1)
    assert(t1.toSeq === t2.toSeq, "training must be bit-deterministic")
    assert(t1.length === Similarity.IvfCells)
    // spherical-k-means objective (mean best-cosine over the training
    // sample) must not decrease vs the seed: centroid quality improved
    // even though recall@5 at the fixed 2-probe budget DROPS with
    // training (measured 0.925->0.875 / 0.925->0.75 / 1.0->0.8 across
    // sf0.001/0.01/0.1) — better centroids re-shard the corpus so the
    // fixed-probe search covers different (not strictly richer) cells.
    // That divergence between index-quality and fixed-budget recall is
    // the documented reason production annIvf keeps the seed.
    val sample = emb.select(col("vec_id"),
      graft.functions.PortableFuncs.toDoubleArray(col("embedding")).as("v"))
      .collect().map(r => r.getSeq[Double](1).toArray)
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    def objective(cents: Seq[Seq[Double]]): Double =
      sample.map { v =>
        cents.map { c =>
          val ca = c.toArray
          dot(v, ca) / (math.sqrt(dot(v, v)) * math.sqrt(dot(ca, ca)))
        }.max
      }.sum / sample.length
    val seedCents = sample.take(Similarity.IvfCells).map(_.toSeq).toSeq
    val trainedObj = objective(t1.map(_._2).toSeq)
    val seedObj = objective(seedCents)
    assert(trainedObj >= seedObj - 1e-9,
      s"training worsened the spherical objective: $trainedObj < $seedObj")
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
    assert(out.keySet === Set("lsh_mp", "ivf", "pq", "ivfpq", "jl", "ivf_jl"))
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

  test("ivfHealth: a tight cluster reads healthy, a drifted cluster " +
    "flags rebuild, and the mean matches a direct per-member average") {
    val spark2 = spark
    import spark2.implicits._
    def unit(x: Float, y: Float, z: Float) = Array(x, y, z, 0f)
    // seeds: cell 0 = x-axis, cell 1 = y-axis. Cell 0's members hug it;
    // cell 1's members still assign to y but sit far off-axis (drift)
    val emb = Seq(
      (0L, unit(1f, 0f, 0f)), (1L, unit(0f, 1f, 0f)),
      (2L, unit(0.99f, 0.05f, 0f)), (3L, unit(0.98f, 0f, 0.08f)),
      (4L, unit(0.2f, 0.6f, 0.75f)), (5L, unit(0f, 0.5f, 0.85f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.ivfHealth(emb, nCells = 2, minMeanCos = 0.8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out.keySet === Set(0L, 1L))
    val (n0, m0, r0) = out(0L)
    val (n1, m1, r1) = out(1L)
    assert(n0 === 3L && n1 === 3L) // seeds are their own members
    assert(m0 > 0.95 && !r0, s"tight cluster must read healthy: $m0")
    assert(m1 < 0.8 && r1, s"drifted cluster must flag rebuild: $m1")
    // the reported mean is the plain average of member cosines to the
    // winning centroid (cross-checked by hand for cell 0)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val d = ad.zip(bd).map { case (x, y) => x * y }.sum
      d / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
    }
    val c0 = unit(1f, 0f, 0f)
    val expected0 = Seq(unit(1f, 0f, 0f), unit(0.99f, 0.05f, 0f),
      unit(0.98f, 0f, 0.08f)).map(cos(_, c0)).sum / 3
    assert(math.abs(m0 - expected0) < 1e-3)
  }

  test("pqHealth: one row per subspace, means reconcile with pqCodes' " +
    "per-vector SSE, and the threshold flips the retrain flag") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(29)
    val emb = (0 until 64).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val rows = Similarity.pqHealth(emb).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    assert(rows.keySet === (0 until Similarity.PqSubspaces).toSet)
    assert(rows.values.forall(_._1 === 64L))
    // Σ_m mean_m · n == Σ_vec sse (same distances, two rollups) — the
    // only slack is the 4-dp rounding of each mean
    val bySubspace = rows.values.map { case (n, m, _) => m * n }.sum
    val byVector = Similarity.pqCodes(emb)
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("sse")))
      .head().getDouble(0)
    assert(math.abs(bySubspace - byVector) < 16 * 64 * 1e-4,
      s"subspace rollup $bySubspace vs per-vector SSE $byVector")
    // the flag is the threshold comparison, both directions
    assert(Similarity.pqHealth(emb, errThreshold = 0.0).collect()
      .forall(_.getBoolean(3)))
    assert(Similarity.pqHealth(emb, errThreshold = 1e9).collect()
      .forall(!_.getBoolean(3)))
  }

  test("annIvfPq: well-formed per-query boards, candidates only from " +
    "probed cells, strong recall on clustered data, deterministic rerun") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(11)
    // clustered corpus (the annRecall fixture shape): real neighbor
    // structure inside cells, so residual-PQ has something to encode
    val anchors = Array.fill(10)(Array.fill(64)(rnd.nextFloat() * 2 - 1))
    val emb = (0 until 60).map { i =>
      val a = anchors(i % 10)
      (i.toLong, a.map(x => x + rnd.nextFloat() * 0.1f))
    }.toDF("vec_id", "embedding").repartition(8)
    val out = Similarity.annIvfPq(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // boards: ≤ k rows per query, ranks 1..n contiguous, no self-hit
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet === (0L until 8L).toSet)
    byQ.foreach { case (q, rows) =>
      assert(rows.length <= Similarity.TopK)
      assert(rows.map(_._4).sorted.toSeq === (1 to rows.length))
      assert(!rows.exists(_._2 == q))
    }
    // candidate provenance: every returned neighbor's cell is among
    // its query's probed cells (the IVF restriction is real)
    val cells = Similarity.ivfCells(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probes = Similarity.annIvf(emb).collect()
      .map(r => (r.getLong(0), cells(r.getLong(1)))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // annIvf's results visit exactly the probed cells, so its result
    // cells form a valid probe-set reference for the same queries
    out.foreach { case (q, c, _, _) =>
      assert(probes(q).contains(cells(c)),
        s"query $q neighbor $c from unprobed cell ${cells(c)}")
    }
    // recall vs brute truth on the clustered corpus: the composed
    // index must not lose the cluster neighbors residual-PQ encodes
    val truth = Similarity.knnBrute(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val hits = out.map { case (q, c, _, _) =>
      if (truth(q).contains(c)) 1 else 0 }.sum
    val recall = hits.toDouble / truth.values.map(_.size).sum
    assert(recall >= 0.5, s"IVF-PQ recall@5 $recall below floor")
    // deterministic rerun (fixed-point training, total tie-breaks)
    val again = Similarity.annIvfPq(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(again.toSet === out.toSet)
  }

  test("persisted IVF-PQ index: search-from-index equals the from-scratch " +
    "search exactly, and the codes scan prunes to the probed cells' " +
    "partitions") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(13)
    val anchors = Array.fill(10)(Array.fill(64)(rnd.nextFloat() * 2 - 1))
    val emb = (0 until 60).map { i =>
      val a = anchors(i % 10)
      (i.toLong, a.map(x => x + rnd.nextFloat() * 0.1f))
    }.toDF("vec_id", "embedding").repartition(8)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    Similarity.buildIvfPqIndex(emb, dir)
    val fromIndex = Similarity.annIvfPqFromIndex(spark, dir, emb)
    val fresh = Similarity.annIvfPq(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(fromIndex.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet === fresh)
    // the serving contract: the codes scan must carry a static
    // partition filter on cell_id — unprobed cells are never read
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell_id"),
      s"expected a static cell_id partition filter in:\n$plan")
    // index reads tolerate the seed rows leaving the vector table:
    // the search metadata comes from dir/cents, not emb — dropping a
    // NON-seed, non-query vector from emb only shrinks the re-rank
    val embLess = emb.filter(
      org.apache.spark.sql.functions.col("vec_id") =!= 59L)
    val still = Similarity.annIvfPqFromIndex(spark, dir, embLess)
      .collect()
    assert(still.nonEmpty)
  }

  test("knnBrute's bounded top-k aggregate equals the row_number window " +
    "formulation, including exact cosine ties broken by c_id asc") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // the executable window specification the aggregate replaced
    def windowRef(emb: org.apache.spark.sql.DataFrame, nQueries: Long,
                  k: Int): Set[(Long, Long, Double, Int)] = {
      val corpus = emb.select(col("vec_id").as("c_id"),
          transform(col("embedding"), _.cast("double")).as("cv"))
        .withColumn("cn", sqrt(aggregate(zip_with(col("cv"), col("cv"), _ * _),
          lit(0.0), _ + _)))
      val queries = emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"),
          transform(col("embedding"), _.cast("double")).as("qv"))
        .withColumn("qn", sqrt(aggregate(zip_with(col("qv"), col("qv"), _ * _),
          lit(0.0), _ + _)))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("c_id").asc)
      corpus.join(broadcast(queries), col("q_id") =!= col("c_id"))
        .select(col("q_id"), col("c_id"),
          (aggregate(zip_with(col("qv"), col("cv"), _ * _), lit(0.0), _ + _)
            / (col("qn") * col("cn"))).as("cos"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("q_id"), col("c_id"), round(col("cos"), 4).as("cos"),
          col("rank"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
    }
    def agg32(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    val rnd = new scala.util.Random(31)
    // random corpus, spread over many partitions so the aggregate's
    // partial/serialize/merge path (not just a single in-memory heap)
    // produces the result
    val emb = (0 until 60).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding").repartition(16)
    assert(agg32(Similarity.knnBrute(emb, nQueries = 5, k = 7)) ===
      windowRef(emb, 5, 7))
    // exact-tie battery: duplicated vectors make cosines identical
    // bit-for-bit, so rank order inside a tie is purely the c_id asc
    // tiebreak; k cuts through the middle of a tie group
    val base = Array.fill(5)(Array.fill(64)(rnd.nextFloat() * 2 - 1))
    val dup = (0 until 30).map(i => (i.toLong, base(i % 5).clone()))
      .toDF("vec_id", "embedding").repartition(8)
    assert(agg32(Similarity.knnBrute(dup, nQueries = 3, k = 4)) ===
      windowRef(dup, 3, 4))
    // k larger than the corpus: every candidate ranked, none invented
    assert(agg32(Similarity.knnBrute(emb, nQueries = 2, k = 100)) ===
      windowRef(emb, 2, 100))
  }

  test("knnLabelAccuracy: clustered classes score 1.0, vote ties break " +
    "to the smaller label deterministically") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(11)
    // three well-separated clusters along orthogonal axes, 8 members
    // each, labels = cluster → leave-one-out kNN is perfect
    def member(axis: Int): Array[Float] = {
      val v = Array.fill(64)(rnd.nextFloat() * 0.02f)
      v(axis) = 1.0f; v
    }
    val emb = (0 until 24).map(i => (i.toLong, member(i % 3), i % 3))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.knnLabelAccuracy(emb, nQueries = 24L, k = 5)
      .collect().map(r => r.getAs[Int]("true_label") ->
        (r.getAs[Long]("n_queries"), r.getAs[Long]("n_correct"),
          r.getAs[Double]("accuracy"))).toMap
    assert(out === Map(0 -> ((8L, 8L, 1.0)), 1 -> ((8L, 8L, 1.0)),
      2 -> ((8L, 8L, 1.0))))
    // tie battery: query 0's two neighbours carry labels 2 and 1 with
    // one vote each — the (cnt DESC, label ASC) rule must pick 1
    val tie = Seq(
      (0L, Array(1.0f, 0f, 0f, 0f), 9),
      (1L, Array(0.9f, 0.1f, 0f, 0f), 2),
      (2L, Array(0.9f, -0.1f, 0f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.knnLabelAccuracy(tie, nQueries = 1L, k = 2)
      .collect().head
    assert(r.getAs[Int]("true_label") === 9)
    assert(r.getAs[Long]("n_correct") === 0L) // predicted 1, not 9
  }

  test("ivfProbeSweep: recall and cost are monotone in the probe " +
    "fan-out, and probing every cell IS brute force") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(7)
    val emb = (0 until 80).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding").repartition(8)
    val rows = Similarity.ivfProbeSweep(emb).collect()
      .sortBy(_.getAs[Int]("n_probes"))
    assert(rows.map(_.getAs[Int]("n_probes")).toSeq === Seq(1, 2, 4, 8))
    // candidates grow strictly with the fan-out; recall never falls
    val cands = rows.map(_.getAs[Long]("n_candidates")).toSeq
    assert(cands === cands.sorted && cands.distinct === cands)
    val recalls = rows.map(_.getAs[Double]("recall")).toSeq
    assert(recalls === recalls.sorted)
    // scan_frac is exactly candidates / (nQueries × (corpus − 1))
    rows.foreach { r =>
      assert(r.getAs[Double]("scan_frac") ===
        math.round(r.getAs[Long]("n_candidates").toDouble
          / (8 * 79) * 1e4) / 1e4)
    }
    // the degenerate end of the frontier: probing all 16 cells scans
    // everything and must reproduce the brute-force referee exactly
    val full = Similarity.ivfProbeSweep(emb, probesList = Seq(16))
      .collect().head
    assert(full.getAs[Double]("recall") === 1.0)
    assert(full.getAs[Long]("n_candidates") === 8L * 79)
    assert(full.getAs[Double]("scan_frac") === 1.0)
  }

  test("annIvfJl: well-formed boards, candidates only from cells probed " +
    "in PROJECTED space (independent driver reimplementation), strong " +
    "recall on clustered data, deterministic rerun") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(17)
    val anchors = Array.fill(10)(Array.fill(64)(rnd.nextFloat() * 2 - 1))
    val vecs: Seq[(Long, Array[Float])] = (0 until 60).map { i =>
      val a = anchors(i % 10)
      (i.toLong, a.map(x => x + rnd.nextFloat() * 0.1f))
    }
    val emb = vecs.toDF("vec_id", "embedding").repartition(8)
    val out = Similarity.annIvfJl(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet === (0L until 8L).toSet)
    byQ.foreach { case (q, rows) =>
      assert(rows.length <= Similarity.TopK)
      assert(rows.map(_._4).sorted.toSeq === (1 to rows.length))
      assert(!rows.exists(_._2 == q))
    }
    // independent reimplementation of the projected-space geometry:
    // project driver-side with the published sign matrix (same
    // left-to-right double fold as the codegen'd kernel), assign by
    // argmax cosine (lowest-cell ties), probe top-IvfJlProbes cells
    def proj(v: Array[Float]): Array[Double] =
      Similarity.jlSigns.map { s =>
        var acc = 0.0; var i = 0
        while (i < 64) { acc += v(i).toDouble * s(i); i += 1 }
        acc
      }.toArray
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      def d(x: Array[Double], y: Array[Double]) = {
        var acc = 0.0; var i = 0
        while (i < x.length) { acc += x(i) * y(i); i += 1 }
        acc
      }
      d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b)))
    }
    val ys = vecs.map { case (id, v) => id -> proj(v) }.toMap
    val cents = (0L until Similarity.IvfCells.toLong).map(i => i -> ys(i))
    def cellOf(y: Array[Double]): Long =
      cents.map { case (cid, cy) => (cid, cosine(y, cy)) }
        .minBy { case (cid, c) => (-c, cid) }._1
    val cellMap = ys.map { case (id, y) => id -> cellOf(y) }
    val probeMap = (0L until 8L).map { q =>
      q -> cents.map { case (cid, cy) => (cid, cosine(ys(q), cy)) }
        .sortBy { case (cid, c) => (-c, cid) }
        .take(Similarity.IvfJlProbes).map(_._1).toSet
    }.toMap
    out.foreach { case (q, c, _, _) =>
      assert(probeMap(q).contains(cellMap(c)),
        s"query $q neighbor $c from unprobed projected cell ${cellMap(c)}")
    }
    // clustered corpus: JL preserves the anchor geometry, so the
    // composed index must keep most true neighbors
    val truth = Similarity.knnBrute(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val hits = out.map { case (q, c, _, _) =>
      if (truth(q).contains(c)) 1 else 0 }.sum
    val recall = hits.toDouble / truth.values.map(_.size).sum
    assert(recall >= 0.5, s"ivf_jl recall@5 $recall below floor")
    // deterministic rerun (plan-constant signs/centroids, total ties)
    val again = Similarity.annIvfJl(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(again.toSet === out.toSet)
  }

  test("embeddingHealth property: random vectors (with planted NaN/Inf/" +
    "zero/dup rows) match an independent reference") {
    val spark2 = spark
    import spark2.implicits._
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val rnd = new scala.util.Random(23)
    val rows: Seq[(Long, Array[Float])] = (1 to 40).map { i =>
      val v = Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat)
      if (i % 11 == 0) v(rnd.nextInt(8)) = Float.NaN
      if (i % 13 == 0) v(rnd.nextInt(8)) = Float.PositiveInfinity
      if (i % 7 == 0) java.util.Arrays.fill(v, 0f)
      // duplicate ids every 17th row
      ((if (i % 17 == 0) i - 1 else i).toLong, v)
    }
    val out = Similarity.embeddingHealth(rows.toDF("vec_id", "embedding"))
      .collect().head
    // independent reference (scalar fold in array order = the engine's
    // sequential dot-product contract)
    def bad(v: Array[Float]) =
      v.exists(x => x.isNaN || x.isInfinite)
    def norm(v: Array[Float]) =
      math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
    val fin = rows.filter(r => !bad(r._2))
    val norms = fin.map(r => r6(norm(r._2)))
    assert(out.getAs[Long]("n_vecs") === 40L)
    assert(out.getAs[Long]("n_dup_ids") ===
      (40L - rows.map(_._1).distinct.size))
    assert(out.getAs[Boolean]("dim_consistent"))
    assert(out.getAs[Long]("n_nonfinite") === rows.count(r => bad(r._2)).toLong)
    assert(out.getAs[Long]("n_zero") ===
      rows.count(r => !bad(r._2) && r._2.forall(_ == 0f)).toLong)
    assert(out.getAs[Double]("min_norm") === norms.min)
    assert(out.getAs[Double]("max_norm") === norms.max)
    val mean = r6(norms.map(BigDecimal(_).setScale(6,
      BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / norms.size)
    assert(out.getAs[Double]("mean_norm") === mean)
    // sanity: all three planted pathologies occurred
    assert(rows.count(r => bad(r._2)) > 0)
    assert(rows.count(r => !bad(r._2) && r._2.forall(_ == 0f)) > 0)
    assert(rows.map(_._1).distinct.size < 40)
  }

  test("embeddingHealth counts zero/non-finite/duplicate-id rows and " +
    "excludes non-finite vectors from the norm stats") {
    val spark2 = spark
    import spark2.implicits._
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val emb = Seq(
      (0L, Array(3f, 4f)),              // norm 5
      (1L, Array(0f, 0f)),              // zero vector (norm 0, counted)
      (1L, Array(1f, 0f)),              // duplicate id, norm 1
      (2L, Array(Float.NaN, 1f)),       // non-finite: excluded from norms
      (3L, Array(Float.PositiveInfinity, 0f)) // non-finite too
    ).toDF("vec_id", "embedding")
    val r = Similarity.embeddingHealth(emb).collect().head
    assert(r.getAs[Long]("n_vecs") === 5L)
    assert(r.getAs[Long]("n_dup_ids") === 1L)
    assert(r.getAs[Int]("min_dims") === 2 && r.getAs[Int]("max_dims") === 2)
    assert(r.getAs[Boolean]("dim_consistent"))
    assert(r.getAs[Long]("n_zero") === 1L)
    assert(r.getAs[Long]("n_nonfinite") === 2L)
    assert(r.getAs[Double]("min_norm") === 0.0)
    assert(r.getAs[Double]("max_norm") === 5.0)
    assert(r.getAs[Double]("mean_norm") === r6((5.0 + 0.0 + 1.0) / 3))
  }
}
