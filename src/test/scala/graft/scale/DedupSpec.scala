package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  def docs = {
    val spark2 = spark
    import spark2.implicits._
    val base = "the quick brown fox jumps over the lazy dog and keeps on running far away"
    Seq(
      (1L, base),
      (2L, base),                                   // exact dup of 1
      (3L, base.replace("lazy", "sleepy")),         // near dup of 1
      (4L, "completely different text about spark engines and data pipelines at scale here")
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups identical content under the lowest id") {
    val out = Dedup.exactDedup(docs).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out(1L) === 2L) // keep_id 1 with 2 copies
    assert(out.values.sum === 4L)
  }

  test("minhash pairs surface exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 2L)) === Dedup.NumBands.toLong) // identical: all bands agree
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near dup caught
    assert(!pairs.keySet.exists { case (a, b) => b == 4L || a == 4L }) // no false pair
  }

  test("sourcePairMatrix: a planted cross-source mirror lands in the " +
    "right undirected cell with exact shares") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (1L, "a", "web"), (2L, "b", "mirror"), (3L, "c", "web"),
      (4L, "d", "web")
    ).toDF("doc_id", "text", "source")
    // explicit pair graph: (1,2) is the cross-source mirror at dist 0,
    // (1,3)/(2,3) are near dups at dist 4; doc 4 pairs with nothing
    val pairs = Seq((1L, 2L, 0), (1L, 3L, 4), (2L, 3L, 4))
      .toDF("doc_a", "doc_b", "dist")
    val out = Dedup.sourcePairMatrix(pairs, docs).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Int]("min_dist"),
          r.getAs[Double]("mean_dist"), r.getAs[Double]("share"))).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // pairs: (1,2) d=0 mirror↔web, (1,3) d=D web↔web, (2,3) d=D
    // mirror↔web — the undirected key is (least, greatest)
    assert(out.keySet === Set(("mirror", "web"), ("web", "web")))
    val (mwN, mwMin, mwMean, mwShare) = out(("mirror", "web"))
    val (wwN, _, wwMean, wwShare) = out(("web", "web"))
    assert((mwN, mwMin) === ((2L, 0)))
    assert(wwN === 1L)
    assert(mwShare === r6(2.0 / 3) && wwShare === r6(1.0 / 3))
    // docs 1 and 2 are identical, so dist(1,3) = dist(2,3) = D:
    // the mirror cell's mean is exactly D/2, the web cell's is D
    assert(mwMean === r6(wwMean / 2))
  }

  test("bandSweep: thresholds are the exact sqrt chains, candidate sets " +
    "nest as bands widen, the identical pair survives every config") {
    val out = Dedup.bandSweep(docs).collect()
      .sortBy(_.getAs[Int]("rows_per_band"))
    assert(out.map(r => (r.getAs[Int]("n_bands"),
      r.getAs[Int]("rows_per_band"))).toSeq ===
      Seq((16, 1), (8, 2), (4, 4), (2, 8), (1, 16)))
    // the S-curve midpoints: exact dyadic rationals through sqrt chains
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out.map(_.getAs[Double]("threshold")).toSeq === Seq(
      0.0625, r6(math.sqrt(0.125)), r6(math.sqrt(math.sqrt(0.25))),
      r6(math.sqrt(math.sqrt(math.sqrt(0.5)))), 1.0))
    // a band of 2r is the concatenation of two r-bands, so a candidate
    // at r=2k is a candidate at r=k: counts are monotone non-increasing
    val pairs = out.map(_.getAs[Long]("n_pairs")).toSeq
    assert(pairs === pairs.sorted.reverse)
    // docs 1/2 are identical → all 16 components match → they band
    // together in EVERY config, including the strictest
    assert(pairs.last >= 1L)
    // and at r=16 every candidate has a fully-matching signature
    assert(out.last.getAs[Double]("mean_est_jaccard") === 1.0)
    assert(out.last.getAs[Long]("n_weak") === 0L)
  }

  test("simhash: identical docs collide, near dups closer than strangers") {
    val sig = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(sig(a) ^ sig(b))
    assert(dist(1L, 2L) === 0)
    assert(dist(1L, 3L) < dist(1L, 4L))
    // pair generation blocks on equal 15-bit chunks (pigeonhole for
    // dist<=3): the exact-dup pair must surface at distance 0
    val pairs = Dedup.simhashPairs(docs, maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) === 0)
  }

  test("simhashPairs blocking is COMPLETE: blocked result equals the exact " +
    "O(n²) hamming join for every maxDist, including chunk-shrinking ones") {
    val spark2 = spark
    import spark2.implicits._
    // enough docs with word-level perturbations to populate many distances
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today".split(" ")
    val corpus = (0 until 40).map { i =>
      val ws = base.zipWithIndex.map { case (w, j) =>
        if ((i + j) % 7 == 0) s"${w}$i" else w
      }
      (i.toLong, ws.mkString(" "))
    }.toDF("doc_id", "text")
    val sig = Dedup.simhash(corpus).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (maxDist <- Seq(3, 5, 17)) {
      val exact = (for {
        a <- sig.keys; b <- sig.keys if a < b
        d = java.lang.Long.bitCount(sig(a) ^ sig(b)) if d <= maxDist
      } yield (a, b, d)).toSet
      val blocked = Dedup.simhashPairs(corpus, maxDist).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(blocked === exact, s"maxDist=$maxDist")
    }
    // pigeonhole needs maxDist+1 chunks, so 60-bit sigs cap at 59
    intercept[IllegalArgumentException](Dedup.simhashPairs(corpus, 60))
  }

  test("connected components: chains, triangles, and disjoint clusters " +
    "all labeled by their smallest member") {
    val spark2 = spark
    import spark2.implicits._
    // component A: chain 1-2-3-4 (diameter > 1 forces iteration);
    // component B: triangle 10-11-12 with redundant edges;
    // component C: isolated pair 20-21
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)
    ).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
    // long chain: label must propagate the full diameter
    val chain = (0 until 20).map(i => (i.toLong, i + 1L)).toDF("doc_a", "doc_b")
    val ccChain = Dedup.connectedComponents(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ccChain.values.toSet === Set(0L))
    assert(ccChain.size === 21)
  }

  test("connected components of an empty pair list is empty, not an error") {
    val spark2 = spark
    import spark2.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(empty).count() === 0)
    // both paths must handle the empty graph
    assert(Dedup.connectedComponents(empty, driverMaxEdges = -1L).count() === 0)
  }

  test("connected components rejects non-integral id columns at analysis " +
    "time instead of silently casting them to null") {
    val spark2 = spark
    import spark2.implicits._
    val strPairs = Seq(("a", "b"), ("b", "c")).toDF("doc_a", "doc_b")
    val err = intercept[IllegalArgumentException](
      Dedup.connectedComponents(strPairs))
    assert(err.getMessage.contains("integral"))
    // double ids are equally unsafe (fractional ids would collide)
    val dblPairs = Seq((1.0, 2.0)).toDF("doc_a", "doc_b")
    intercept[IllegalArgumentException](Dedup.connectedComponents(dblPairs))
  }

  test("connected components drops null-endpoint edges on both paths") {
    val spark2 = spark
    import spark2.implicits._
    val pairs = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(2L)),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(3L)),
      (java.lang.Long.valueOf(4L), null.asInstanceOf[java.lang.Long])
    ).toDF("doc_a", "doc_b")
    for (threshold <- Seq(1L << 20, -1L)) {
      val cc = Dedup.connectedComponents(pairs, driverMaxEdges = threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(cc === Map(1L -> 1L, 2L -> 1L), s"threshold $threshold")
    }
  }

  test("distributed label-propagation path agrees with the driver fast path") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(97)
    for (trial <- 0 until 3) {
      val n = 40
      val edges = (0 until 35).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct.toDF("doc_a", "doc_b")
      val fast = Dedup.connectedComponents(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // driverMaxEdges = -1 forces every graph down the iterative path
      val dist = Dedup.connectedComponents(edges, driverMaxEdges = -1L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast === dist, s"trial $trial")
    }
  }

  test("label propagation splits bridge-linked dense communities that " +
    "connected components merges") {
    val spark2 = spark
    import spark2.implicits._
    // two triangles joined by ONE bridge edge: a single CC, but two
    // LPA communities — the bridge ballot never outvotes the triangle
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (3L, 10L)
    ).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.values.toSet === Set(1L), "CC merges across the bridge")
    val lp = Dedup.labelPropagation(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lp === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("label propagation: self-loop ballots stop the 2-cycle label swap " +
    "and ties break to the smallest label") {
    val spark2 = spark
    import spark2.implicits._
    // single edge: without self-loops synchronous LPA swaps labels
    // forever (1↔2); the self ballot makes round 1 a (count 1, count 1)
    // tie broken to min — both nodes settle on 1 and stay there
    val pair = Seq((2L, 1L)).toDF("doc_a", "doc_b")
    val lp = Dedup.labelPropagation(pair).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lp === Map(1L -> 1L, 2L -> 1L))
    // star: leaves adopt the hub's label via the same tie-break
    val star = Seq((5L, 6L), (5L, 7L), (5L, 8L)).toDF("doc_a", "doc_b")
    val lpStar = Dedup.labelPropagation(star).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lpStar === Map(5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 5L))
  }

  test("label propagation: empty pair list is empty; non-integral ids " +
    "rejected like connectedComponents") {
    val spark2 = spark
    import spark2.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.labelPropagation(empty).count() === 0)
    val strPairs = Seq(("a", "b")).toDF("doc_a", "doc_b")
    val err = intercept[IllegalArgumentException](
      Dedup.labelPropagation(strPairs))
    assert(err.getMessage.contains("integral"))
  }

  test("triangle stats: counts, degrees, and clustering coefficients on " +
    "known shapes") {
    val spark2 = spark
    import spark2.implicits._
    // triangle {1,2,3} with a pendant 4 hanging off node 3
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.triangleStats(pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got === Map(
      1L -> ((2L, 1L, 1.0)), 2L -> ((2L, 1L, 1.0)),
      3L -> ((3L, 1L, 0.3333)), 4L -> ((1L, 0L, 0.0))))
    // K4: every node in 3 triangles, fully clustered
    val k4 = (for { a <- 1 to 4; b <- (a + 1) to 4 } yield (a.toLong, b.toLong))
      .toDF("doc_a", "doc_b")
    val gotK4 = Dedup.triangleStats(k4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(gotK4.values.toSet === Set((3L, 3L, 1.0)))
    // star: a hub with 5 leaves has wedges but zero triangles — and the
    // degree-ordered orientation points every edge AT the hub, so no
    // task ever enumerates the hub's deg² wedge pairs
    val star = (2 to 6).map(i => (1L, i.toLong)).toDF("doc_a", "doc_b")
    val gotStar = Dedup.triangleStats(star).collect()
    assert(gotStar.forall(_.getLong(2) === 0L))
    assert(gotStar.map(_.getDouble(3)).sum === 0.0)
    // same integral-id guard as every other graph op (shared symEdges)
    val strPairs = Seq(("a", "b")).toDF("doc_a", "doc_b")
    intercept[IllegalArgumentException](Dedup.triangleStats(strPairs))
  }

  test("integer PageRank matches the hand-simulated fixed-point values " +
    "and ranks the hub above the pendant") {
    val spark2 = spark
    import spark2.implicits._
    // triangle {1,2,3} + pendant 4 on node 3; expected values verified
    // by an independent adjacency-list simulation of the same integer
    // recurrence (1e6 micro-units, div truncation, 0.85 damping)
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.pageRank(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(
      1L -> 1006756L, 2L -> 1006756L, 3L -> 1381399L, 4L -> 605076L))
    // the bridge-degree hub outranks symmetric peers; pendant lowest
    assert(got(3L) > got(1L) && got(4L) < got(1L))
    // non-integral ids rejected like the other graph ops
    val strPairs = Seq(("a", "b")).toDF("doc_a", "doc_b")
    intercept[IllegalArgumentException](Dedup.pageRank(strPairs))
  }

  test("source contamination matrix folds both pair orientations into " +
    "one unordered cell and counts the diagonal") {
    val spark2 = spark
    import spark2.implicits._
    // near-identical texts land within simhash distance; srcX↔srcY in
    // both id orders plus one within-source dup
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base, "srcY"), (2L, base, "srcX"),        // Y↔X (a<b gives Y,X)
      (3L, base, "srcX"), (4L, base, "srcY"),        // X↔Y (other order)
      (5L, base + " extra", "srcX"),
      (6L, "completely unrelated text about spark catalyst internals", "srcZ")
    ).toDF("doc_id", "text", "source")
    val m = Dedup.sourceContamination(docs, maxDist = 5).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // pairs among {1..5}: all C(5,2)=10 (near-identical); sources:
    // X={2,3,5}, Y={1,4} → XX C(3,2)=3, YY C(2,2)=1, XY 3·2=6
    assert(m === Map(
      ("srcX", "srcX") -> 3L, ("srcX", "srcY") -> 6L,
      ("srcY", "srcY") -> 1L))
  }

  test("label propagation and PageRank match driver-side simulations of " +
    "the same recurrences on random graphs") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(131)
    for (trial <- 0 until 3) {
      val n = 30
      val edges = (0 until 40).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
      // synchronous LPA: ballots = self + neighbors, (count DESC, label
      // ASC) — the exact contract of the distributed rounds
      var lab = adj.keys.map(k => k -> k).toMap
      for (_ <- 1 to 4) {
        lab = adj.map { case (node, nbrs) =>
          val ballots = (nbrs.toSeq.map(lab) :+ lab(node))
            .groupBy(identity).map { case (l, xs) => (l, xs.size) }
          node -> ballots.toSeq.map { case (l, c) => (-c, l) }.min._2
        }
      }
      val gotLp = Dedup.labelPropagation(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotLp === lab, s"LPA trial $trial")
      // integer PageRank recurrence
      var rank = adj.keys.map(k => k -> 1000000L).toMap
      for (_ <- 1 to 4) {
        val contrib = scala.collection.mutable.Map.empty[Long, Long]
          .withDefaultValue(0L)
        adj.foreach { case (node, nbrs) =>
          val c = rank(node) / nbrs.size
          nbrs.foreach(m => contrib(m) += c)
        }
        rank = adj.keys.map(k => k -> (150000L + 85L * contrib(k) / 100L)).toMap
      }
      val gotPr = Dedup.pageRank(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotPr === rank, s"PageRank trial $trial")
    }
  }

  test("weighted LPA: all-1 weights equal the unweighted form; random " +
    "weighted graphs match the driver simulation; double weights rejected") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(211)
    for (trial <- 0 until 3) {
      val n = 25
      val wpairs = (0 until 35).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b), 1L + rnd.nextInt(7))
      }.filter(p => p._1 != p._2)
        .groupBy(p => (p._1, p._2)).values.map(_.head).toSeq // unique pairs
      val df = wpairs.toDF("doc_a", "doc_b", "w")
      // all-1 weights reduce to the unweighted form exactly
      val ones = df.withColumn("w", lit(1L))
      assert(Dedup.labelPropagationWeighted(ones, "w").collect().toSet ===
        Dedup.labelPropagation(df).collect().toSet, s"trial $trial ones")
      // weighted ballots: each neighbor weighs its edge, self weighs
      // the node's MAX incident weight (the anti-oscillation anchor)
      val adj = wpairs.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(v => (v._2, v._3)) }
      var lab = adj.keys.map(k => k -> k).toMap
      for (_ <- 1 to 4) {
        lab = adj.map { case (node, nbrs) =>
          val tally = scala.collection.mutable.Map.empty[Long, Long]
            .withDefaultValue(0L)
          nbrs.foreach { case (m, w) => tally(lab(m)) += w }
          tally(lab(node)) += nbrs.map(_._2).max
          node -> tally.toSeq.map { case (l, c) => (-c, l) }.min._2
        }
      }
      val got = Dedup.labelPropagationWeighted(df, "w").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === lab, s"trial $trial weighted")
    }
    val dbl = Seq((1L, 2L, 0.5)).toDF("doc_a", "doc_b", "w")
    val err = intercept[IllegalArgumentException](
      Dedup.labelPropagationWeighted(dbl, "w"))
    assert(err.getMessage.contains("integral weight"))
  }

  test("weighted LPA contract edges: heavy pairs don't oscillate, " +
    "duplicate listings take the max weight, self-pair-only nodes stay " +
    "as singleton communities (CC node-set parity), non-positive " +
    "weights raise") {
    val spark2 = spark
    import spark2.implicits._
    // an isolated heavy pair must MERGE (max-incident self-ballot ties
    // round 1 at w vs w → min label), not swap labels for 4 rounds
    val heavy = Seq((1L, 2L, 5L)).toDF("doc_a", "doc_b", "w")
    assert(Dedup.labelPropagationWeighted(heavy, "w").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
      === Map(1L -> 1L, 2L -> 1L))
    // same pair in both orientations with different weights: one edge,
    // max weight — plus self-pairs: (7,7) on a connected node carries
    // no vote, (9,9) on an otherwise-absent node keeps 9 in the result
    // as its own community — the same node set connectedComponents
    // reports, so the two ops' outputs stay joinable
    val dup = Seq((1L, 2L, 3L), (2L, 1L, 5L), (7L, 7L, 9L), (2L, 7L, 1L),
      (9L, 9L, 4L)).toDF("doc_a", "doc_b", "w")
    val lab = Dedup.labelPropagationWeighted(dup, "w").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 2: self-ballot 5 (the deduped 1↔2 edge), label1 5, label7 1
    // → tie (5,5) breaks to label 1; node 7 follows its only neighbor
    assert(lab === Map(1L -> 1L, 2L -> 1L, 7L -> 1L, 9L -> 9L))
    assert(lab.keySet === Dedup.connectedComponents(dup).collect()
      .map(_.getLong(0)).toSet, "LPA and CC must agree on the node set")
    // node-set parity extends to half-null pairs: CC drops a pair with
    // one null endpoint entirely, so LPA must not keep its other node
    val halfNull = Seq((Some(1L), Some(2L), 3L), (Some(5L), None, 7L))
      .toDF("doc_a", "doc_b", "w")
    val labN = Dedup.labelPropagationWeighted(halfNull, "w").collect()
      .map(_.getLong(0)).toSet
    assert(labN === Set(1L, 2L), "half-null pair must contribute no node")
    assert(labN === Dedup.connectedComponents(halfNull).collect()
      .map(_.getLong(0)).toSet)
    // zero and negative weights fail at execution, not silently
    for (badW <- Seq(0L, -2L)) {
      val bad = Seq((1L, 2L, badW)).toDF("doc_a", "doc_b", "w")
      val e = intercept[Exception](
        Dedup.labelPropagationWeighted(bad, "w").collect())
      assert(e.getMessage.contains("weights must be >= 1"), s"w=$badW")
    }
  }

  test("graph ops are partition-layout invariant: same results from a " +
    "1-partition and a many-partition edge list") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(17)
    val edges = (0 until 50).map { _ =>
      val a = rnd.nextInt(25).toLong; val b = rnd.nextInt(25).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct.toDF("doc_a", "doc_b")
    for (op <- Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame](
      Dedup.labelPropagation(_), Dedup.pageRank(_), Dedup.triangleStats(_),
      df => Dedup.labelPropagationWeighted(
        df.withColumn("w", (col("doc_a") % 5 + 1).cast("long")), "w"))) {
      val one = op(edges.repartition(1)).collect()
        .map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
      val many = op(edges.repartition(13)).collect()
        .map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
      assert(one === many)
    }
  }

  test("graph summary aggregates triangle stats into exact one-row counts") {
    val spark2 = spark
    import spark2.implicits._
    // can't run graphSummary directly on toy pairs (it tokenizes docs),
    // so assert the aggregation identities on triangleStats output for
    // the triangle+pendant shape: 4 edges, 1 triangle, max deg 3
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("doc_a", "doc_b")
    val stats = Dedup.triangleStats(pairs)
    import org.apache.spark.sql.functions._
    val row = stats.agg(
      count(lit(1)), expr("sum(deg) div 2"), expr("sum(n_tri) div 3"),
      max(col("deg"))).head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      === ((4L, 4L, 1L, 3L)))
  }

  test("connected components equals driver-side union-find on random graphs") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(41)
    for (trial <- 0 until 3) {
      val n = 60
      val edges = (0 until 50).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(x => x -> find(x)).toMap
      assert(got === expected, s"trial $trial")
    }
  }

  test("ngram jaccard: identical docs at 1.0, near dup high, stranger absent or low") {
    val j = Dedup.ngramJaccard(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(j((1L, 2L)) === 1.0)
    assert(j((1L, 3L)) > 0.3 && j((1L, 3L)) < 1.0)
    assert(!j.contains((1L, 4L)))
  }

  test("ngram jaccard: shingles over the df cap generate no candidate pairs") {
    val spark2 = spark
    import spark2.implicits._
    // every doc shares the same boilerplate shingle (df = 4); each has
    // unique filler so no other shingle is shared
    val boiler = "all rights reserved worldwide"
    val hotDocs = (1L to 4L).map { i =>
      (i, s"$boiler unique$i filler$i words$i here$i")
    }.toDF("doc_id", "text")
    // cap below the boilerplate df: the only shared shingle is dropped,
    // so NO pair survives — this is the 100-TB pair-explosion guard
    assert(Dedup.ngramJaccard(hotDocs, maxDf = 3L).count() === 0)
    // cap above it: all 6 pairs appear, and the hot shingle counts in
    // both intersection and sizes (consistent feature space)
    assert(Dedup.ngramJaccard(hotDocs, maxDf = 64L).count() === 6)
  }

  test("embedding near-dup finds the self-evident pair") {
    val spark2 = spark
    import spark2.implicits._
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.1f, 0.0f)),  // near dup of 1
      (3L, Array(0.0f, 0.0f, 1.0f))    // orthogonal
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(emb, minCos = 0.9, maxId = 10L).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((1L, 2L)))
  }

  test("dedupCorpus keeps exactly one representative per near-dup cluster " +
    "and every untouched doc") {
    val spark2 = spark
    import spark2.implicits._
    val base = "the quick brown fox jumps over the lazy dog and keeps on running far away"
    val corpus = Seq(
      (1L, base, "en", "web"),
      (2L, base, "en", "web"),                           // exact dup of 1
      (3L, base.replace("lazy", "sleepy"), "en", "web"), // near dup of 1
      (4L, "completely different text about spark engines and data pipelines at scale here", "en", "web"),
      (5L, "another unrelated document discussing gardens weather and mountain hiking trips", "en", "book")
    ).toDF("doc_id", "text", "lang", "source")
    // ground truth from the pair generator itself: docs in no pair
    // survive; each pair-graph component keeps exactly one member
    val pairs = Dedup.simhashPairs(corpus, maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L))) // the exact dup is always paired
    val clustered = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val untouched = Set(1L, 2L, 3L, 4L, 5L) -- clustered
    val kept = Dedup.dedupCorpus(corpus, maxDist = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(untouched.subsetOf(kept), s"untouched docs must survive: $untouched vs $kept")
    // of the pair {1,2} (same component), exactly one survives
    assert((kept & Set(1L, 2L)).size === 1)
    // deterministic: same pick on rerun
    val kept2 = Dedup.dedupCorpus(corpus, maxDist = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept2 === kept)
  }

  test("decontamination flags corpus docs overlapping the eval set and " +
    "leaves clean docs with zero overlap") {
    val spark2 = spark
    import spark2.implicits._
    val evalText = "which ocean borders the coast of chile on the western side exactly"
    val corpus = Seq(
      (1L, evalText),                                         // eval holdout
      (30L, s"some training document that quotes $evalText verbatim in full"),
      (31L, "an unrelated training document about compilers and type systems theory")
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, evalMaxId = 25L).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getAs[Boolean]("contaminated")))).toMap
    assert(!out.contains(1L), "eval docs are not scored")
    assert(out(30L)._3, "quoting doc must be flagged")
    assert(out(30L)._2 > 0 && out(30L)._2 <= out(30L)._1)
    assert(out(31L) === ((out(31L)._1, 0L, false)), "clean doc has zero overlap")
  }

  test("weighted_mode equals the two-step tally+argmax ballot on random " +
    "ballots, ties included") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions.{max_by, struct, sum}
    // 40 nodes × 8 labels × small weights: plenty of exact weight ties
    val rnd = new scala.util.Random(42)
    val ballots = Seq.tabulate(500)(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(8).toLong, (rnd.nextInt(5) + 1).toLong))
      .toDF("node", "label", "w")
      .repartition(7) // force multi-partition partial merges
    val fused = ballots.groupBy($"node")
      .agg(graft.functions.WeightedMode.weightedMode($"label", $"w").as("label"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val twoStep = ballots.groupBy($"node", $"label").agg(sum($"w").as("c"))
      .groupBy($"node")
      .agg(max_by($"label", struct($"c", -$"label")).as("label"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused === twoStep)
    // sanity: the fixture really exercises ties — at least one node has
    // two labels at the same winning weight
    val tallies = ballots.groupBy($"node", $"label").agg(sum($"w").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val tied = tallies.groupBy(_._1).exists { case (_, ts) =>
      val mx = ts.map(_._3).max; ts.count(_._3 == mx) > 1 }
    assert(tied, "fixture should contain at least one winning-weight tie")
  }

  test("decontaminateBloom is row-identical to the exact decontaminate " +
    "(the Bloom path passes only false positives; the exact join removes them)") {
    val spark2 = spark
    import spark2.implicits._
    val evalText = "which ocean borders the coast of chile on the western side exactly"
    val corpus = (Seq(
      (1L, evalText),
      (30L, s"some training document that quotes $evalText verbatim in full"),
      (31L, "an unrelated training document about compilers and type systems theory")
    ) ++ (32 to 60).map(i =>
      (i.toLong, s"filler corpus document number $i about topic ${i * 3} with enough words to shingle")))
      .toDF("doc_id", "text")
    val exact = Dedup.decontaminate(corpus, evalMaxId = 25L)
      .orderBy("doc_id").collect().toSeq
    // fpp = 0.5: a deliberately lossy sketch floods the confirm join
    // with false positives — equality still must hold
    val bloom = Dedup.decontaminateBloom(corpus, evalMaxId = 25L, fpp = 0.5)
      .orderBy("doc_id").collect().toSeq
    assert(bloom === exact)
    assert(exact.exists(_.getAs[Boolean]("contaminated")),
      "fixture must exercise the contaminated path")
  }

  test("repeatedNgrams flags boilerplate shared across unrelated docs " +
    "that pairwise near-dup would miss") {
    val spark2 = spark
    import spark2.implicits._
    val header = "this work is licensed under the creative commons attribution license terms"
    def body(i: Int) =
      s"unique content number $i discussing entirely separate topic area ${i * 7} in depth"
    // 5 docs share the header boilerplate; bodies are all distinct
    val corpus = ((1 to 5).map(i => (i.toLong, s"$header. ${body(i)}")) :+
      (9L, "a fully independent document with no shared boilerplate at all present here"))
      .toDF("doc_id", "text")
    val out = Dedup.repeatedNgrams(corpus, threshold = 3L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getAs[Boolean]("flagged")))).toMap
    (1 to 5).foreach(i => assert(out(i.toLong)._2, s"doc $i shares the header"))
    assert(out(9L) === ((0L, false)), "independent doc must not be flagged")
    // the shared region is identical for all five docs, so each sees
    // the same hot-shingle count (header + boundary shingles)
    assert(out(1L)._1 > 0)
    assert((2 to 5).forall(i => out(i.toLong)._1 === out(1L)._1))
  }

  test("incrementalDedup drops arrivals colliding with the corpus index " +
    "and keeps genuinely new or unshingleable docs") {
    val spark2 = spark
    import spark2.implicits._
    val base = "the quick brown fox jumps over the lazy dog and keeps on running far away"
    val corpus = Seq(
      (1L, base),
      (2L, "existing corpus document about spark engines and data pipelines at large scale")
    ).toDF("doc_id", "text")
    val arrivals = Seq(
      (10L, base),                     // exact dup of corpus doc 1 → dropped
      (11L, "a brand new document discussing gardens weather and mountain hiking trips"),
      (12L, "too short")               // < 4 words: no bands, passes through
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalDedup(arrivals, corpus)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(11L, 12L))
    // the one-pass same-table form produces identical results
    val keptAt = Dedup.incrementalDedupAt(corpus.unionByName(arrivals), 10L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptAt === kept)
  }

  test("full-range LSH near-dup gate: identical vectors pair at cos 1.0, " +
    "sub-threshold pairs are filtered") {
    val spark2 = spark
    import spark2.implicits._
    // 64-dim to match the LSH hyperplane dimensionality
    def vec(seed: Int): Array[Float] =
      Array.tabulate(64)(i => math.sin(seed * 31 + i).toFloat)
    val emb = Seq(
      (1L, vec(1)),
      (2L, vec(1)),          // identical → same bucket, cos 1.0
      (3L, vec(7)),          // unrelated
      (4L, vec(1).map(-_))   // antipode: cos −1, opposite bucket
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupLsh(emb, minCos = 0.95).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq === Seq((1L, 2L)))
    assert(pairs.head._3 === 1.0)
  }

  test("dupSpans merges cross-doc duplicated windows into maximal spans " +
    "and ignores within-doc-only repetition") {
    val spark2 = spark
    import spark2.implicits._
    // docs 1/2 share a 10-word prefix (w0..w9), then diverge; windows at
    // word positions 0..6 are duplicated, merging into one span of 10
    val shared = (0 until 10).map(i => s"alpha$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$shared tail one unique ending here now"),
      (2L, s"$shared other closing words go there instead"),
      // doc 3 repeats ITS OWN phrase twice but shares nothing: the
      // window fingerprints occur in only one distinct doc → no span
      (3L, "echo1 echo2 echo3 echo4 filler echo1 echo2 echo3 echo4 done"),
      (4L, "entirely separate words about mountains rivers valleys clouds")
    ).toDF("doc_id", "text")
    val spans = Dedup.dupSpans(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(s => (s._1, s._2))
    // max_df 2: every shared window lives in exactly docs 1 and 2
    assert(spans === Seq((1L, 0L, 10L, 7L, 2L), (2L, 0L, 10L, 7L, 2L)))
  }

  test("dupSpans equals a brute-force span reference on random corpora") {
    val spark2 = spark
    import spark2.implicits._
    val n = Dedup.ShingleSize
    // brute reference: per doc, positions whose window occurs in >= 2
    // distinct docs, merged by the pos > prev + n break rule
    def bruteSpans(corpus: Seq[(Long, String)]): Set[(Long, Long, Long, Long, Long)] = {
      def wordsOf(t: String): Seq[String] =
        t.toLowerCase.replaceAll("[^a-z0-9 ]", " ").trim
          .split(" +").filter(_.nonEmpty).toSeq
      val wins = corpus.flatMap { case (id, t) =>
        val ws = wordsOf(t)
        if (ws.length < n) Seq.empty
        else (0 to ws.length - n).map(p => (id, p, ws.slice(p, p + n).mkString(" ")))
      }
      val dfByH = wins.groupBy(_._3).view
        .mapValues(_.map(_._1).distinct.size.toLong).toMap
      val dupH = dfByH.filter(_._2 >= 2).keySet
      wins.filter(w => dupH(w._3)).groupBy(_._1).flatMap { case (id, ps) =>
        val pos = ps.map(p => (p._2, dfByH(p._3))).sortBy(_._1)
        val spans = scala.collection.mutable.ListBuffer.empty[(Int, Int, Int, Long)]
        for ((p, df) <- pos) spans.lastOption match {
          case Some((s, e, c, m)) if p <= e + n =>
            spans(spans.length - 1) = (s, p, c + 1, math.max(m, df))
          case _ => spans += ((p, p, 1, df))
        }
        spans.map { case (s, e, c, m) =>
          (id, s.toLong, (e - s + n).toLong, c.toLong, m) }
      }.toSet
    }
    val rnd = new scala.util.Random(29)
    // small vocab + doc lengths around the window size → plenty of
    // genuine cross-doc window collisions and edge-length docs
    for (trial <- 0 until 5) {
      val corpus = (0 until 12).map { i =>
        val len = 2 + rnd.nextInt(14)
        (i.toLong, Seq.fill(len)(s"t${rnd.nextInt(6)}").mkString(" "))
      }
      val got = Dedup.dupSpans(corpus.toDF("doc_id", "text")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      assert(got === bruteSpans(corpus), s"trial $trial: $corpus")
    }
  }

  test("dupSpans: separated duplicated regions stay two spans, " +
    "word-adjacent ones merge") {
    val spark2 = spark
    import spark2.implicits._
    // two shared 5-word phrases separated by ≥2 non-shared words in
    // both docs → two spans each; phrase positions differ per doc
    val p1 = (0 until 5).map(i => s"head$i").mkString(" ")
    val p2 = (0 until 5).map(i => s"tail$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$p1 gapword1 gapword2 $p2"),
      (2L, s"front filler words here $p1 other gapx gapy $p2 yet more unique")
    ).toDF("doc_id", "text")
    val spans = Dedup.dupSpans(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(s => (s._1, s._2))
    // doc 1: words 0-4 (head) and 7-11 (tail); doc 2: words 4-8, 12-16
    assert(spans === Seq((1L, 0L, 5L), (1L, 7L, 5L),
      (2L, 4L, 5L), (2L, 12L, 5L)))
    // a doc whose two duplicated windows touch (pos delta == n) merges
    // them: doc 10/11 share w0..w3 and w4..w7 but not the bridging
    // windows (middle words differ... they don't here — both phrases
    // are contiguous in both docs, so the whole 8 words is ONE span)
    val both = Seq(
      (10L, s"$p1 $p2 closing distinct remainder words"),
      (11L, s"prefix unshared $p1 $p2 another finish")
    ).toDF("doc_id", "text")
    val merged = Dedup.dupSpans(both).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(s => (s._1, s._2))
    assert(merged === Seq((10L, 0L, 10L), (11L, 2L, 10L)))
    // guards: a 1-doc "duplicate" threshold is rejected loudly
    intercept[IllegalArgumentException](Dedup.dupSpans(corpus, minDocs = 1))
  }

  test("spanPairs attributes shared spans to document pairs and drops " +
    "hot boilerplate past the df cap") {
    val spark2 = spark
    import spark2.implicits._
    val shared = (0 until 10).map(i => s"alpha$i").mkString(" ")
    val boiler = (0 until 6).map(i => s"tmpl$i").mkString(" ")
    // docs 1/2 share a 10-word prefix; docs 5-8 all carry a 6-word
    // template phrase (df 4 > cap 3) that must generate NO pairs
    val corpus = Seq(
      (1L, s"$shared tail one unique ending here now"),
      (2L, s"$shared other closing words go there instead"),
      (5L, s"$boiler unique5 after the template text"),
      (6L, s"$boiler unique6 more other unrelated words"),
      (7L, s"$boiler unique7 yet different trailing talk"),
      (8L, s"$boiler unique8 closing remarks completely new")
    ).toDF("doc_id", "text")
    val pairs = Dedup.spanPairs(corpus, dfCap = 3L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(p => (p._1, p._2, p._3))
    // only the (1,2) prefix span survives: 7 windows, 10 words, df 2
    assert(pairs === Seq((1L, 2L, 0L, 10L, 7L, 2L)))
    // with the cap lifted the template phrase pairs all C(4,2)=6 ways
    val uncapped = Dedup.spanPairs(corpus, dfCap = 16L).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(uncapped.count(p => p._1 >= 5L) === 6)
    // guards
    intercept[IllegalArgumentException](Dedup.spanPairs(corpus, minDocs = 1))
    intercept[IllegalArgumentException](
      Dedup.spanPairs(corpus, minDocs = 4, dfCap = 3))
  }

  test("incrementalDupSpans: batch-vs-index spans equal batch dupSpans " +
    "on the same data, across a folded two-batch stream") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(57)
    // small vocab → plenty of genuine cross-doc (and cross-batch)
    // window collisions, including corpus windows that only become
    // duplicated when a batch arrives
    def mkDocs(ids: Range): Seq[(Long, String)] = ids.map { i =>
      val len = 2 + rnd.nextInt(14)
      (i.toLong, Seq.fill(len)(s"t${rnd.nextInt(6)}").mkString(" "))
    }
    for (trial <- 0 until 3) {
      val corpus = mkDocs(0 until 8)
      val batch1 = mkDocs(8 until 12)
      val batch2 = mkDocs(12 until 16)
      def spans(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      // batch 1 against the corpus index == the batch rows of a full
      // batch-mode dupSpans over corpus ∪ batch1
      val idx0 = Dedup.spanIndex(corpus.toDF("doc_id", "text"))
      val inc1 = spans(Dedup.incrementalDupSpans(
        batch1.toDF("doc_id", "text"), idx0))
      val full1 = spans(Dedup.dupSpans((corpus ++ batch1).toDF("doc_id", "text"))
        .filter(col("doc_id") >= 8L))
      assert(inc1 === full1, s"trial $trial batch1")
      // fold batch 1 into the index; batch 2 sees corpus + batch1 dfs
      val idx1 = Dedup.spanIndexMerge(idx0, batch1.toDF("doc_id", "text"))
      val inc2 = spans(Dedup.incrementalDupSpans(
        batch2.toDF("doc_id", "text"), idx1))
      val full2 = spans(
        Dedup.dupSpans((corpus ++ batch1 ++ batch2).toDF("doc_id", "text"))
          .filter(col("doc_id") >= 12L))
      assert(inc2 === full2, s"trial $trial batch2")
      // the folded index equals an index built from scratch
      val rebuilt = Dedup.spanIndex((corpus ++ batch1).toDF("doc_id", "text"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val folded = idx1.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(folded === rebuilt, s"trial $trial index fold")
    }
  }

  test("spanPairs equals a brute-force pair-span reference on random corpora") {
    val spark2 = spark
    import spark2.implicits._
    val n = Dedup.ShingleSize
    def brutePairs(corpus: Seq[(Long, String)], cap: Long):
        Set[(Long, Long, Long, Long, Long, Long)] = {
      def wordsOf(t: String): Seq[String] =
        t.toLowerCase.replaceAll("[^a-z0-9 ]", " ").trim
          .split(" +").filter(_.nonEmpty).toSeq
      val wins = corpus.flatMap { case (id, t) =>
        val ws = wordsOf(t)
        if (ws.length < n) Seq.empty
        else (0 to ws.length - n).map(p => (id, p, ws.slice(p, p + n).mkString(" ")))
      }
      val dfByH = wins.groupBy(_._3).view
        .mapValues(_.map(_._1).distinct.size.toLong).toMap
      val keptH = dfByH.filter(d => d._2 >= 2 && d._2 <= cap).keySet
      // first occurrence per (doc, window)
      val occ = wins.filter(w => keptH(w._3)).groupBy(w => (w._1, w._3)).map {
        case ((id, h), ws2) => (id, h, ws2.map(_._2).min)
      }
      val byH = occ.groupBy(_._2)
      val pairRows = byH.toSeq.flatMap { case (h, os) =>
        val docs = os.toSeq.sortBy(_._1)
        for (a <- docs; b <- docs if a._1 < b._1)
          yield (a._1, b._1, a._3, dfByH(h))
      }
      pairRows.groupBy(p => (p._1, p._2)).flatMap { case ((da, db), ps) =>
        val pos = ps.map(p => (p._3, p._4)).sortBy(_._1)
        val spans = scala.collection.mutable.ListBuffer.empty[(Int, Int, Int, Long)]
        for ((p, df) <- pos) spans.lastOption match {
          case Some((s, e, c, m)) if p <= e + n =>
            spans(spans.length - 1) = (s, p, c + 1, math.max(m, df))
          case _ => spans += ((p, p, 1, df))
        }
        spans.map { case (s, e, c, m) =>
          (da, db, s.toLong, (e - s + n).toLong, c.toLong, m) }
      }.toSet
    }
    val rnd = new scala.util.Random(41)
    for (trial <- 0 until 5) {
      val corpus = (0 until 12).map { i =>
        val len = 2 + rnd.nextInt(14)
        (i.toLong, Seq.fill(len)(s"t${rnd.nextInt(6)}").mkString(" "))
      }
      // tight cap exercises the boilerplate-exclusion path too: with a
      // 6-token vocab many windows exceed df 4
      for (cap <- Seq(4L, 16L)) {
        val got = Dedup.spanPairs(corpus.toDF("doc_id", "text"), dfCap = cap)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4), r.getLong(5))).toSet
        assert(got === brutePairs(corpus, cap), s"trial $trial cap $cap: $corpus")
      }
    }
  }

  test("incremental char spans equal the batch char path restricted to " +
    "the batch (the index stays char-agnostic)") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(59)
    val seps = Vector(" ", ", ", "!!  ", " — ", "\n")
    def render(ws: Seq[String]): String =
      ws.map(w => w + seps(rnd.nextInt(seps.length))).mkString
    def spanSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getAs[Long]("char_start"), r.getAs[Long]("char_len")))
      .toSet
    for (trial <- 0 until 3) {
      val corpus = (0 until 8).map { i =>
        (i.toLong, render(Seq.fill(2 + rnd.nextInt(14))(s"t${rnd.nextInt(6)}")))
      }
      val batch = (8 until 12).map { i =>
        (i.toLong, render(Seq.fill(2 + rnd.nextInt(14))(s"t${rnd.nextInt(6)}")))
      }
      val idx = Dedup.spanIndex(corpus.toDF("doc_id", "text"))
      val inc = spanSet(Dedup.incrementalDupSpans(
        batch.toDF("doc_id", "text"), idx, charCoords = true))
      val full = spanSet(Dedup.dupSpans(
        (corpus ++ batch).toDF("doc_id", "text"), charCoords = true)
        .filter(col("doc_id") >= 8L))
      assert(inc === full, s"trial $trial")
    }
  }

  test("char coordinates: dupSpans/spanPairs char variants keep the word " +
    "columns identical and report offsets a brute reference confirms " +
    "slice the actual text") {
    val spark2 = spark
    import spark2.implicits._
    val n = Dedup.ShingleSize
    // independent word-start reference: codepoint offsets into
    // lower(text), words = maximal [a-z0-9] runs (same contract as the
    // kernel, restated over a codepoint stream instead of UTF-8 bytes)
    def startsRef(t: String): Vector[(Long, Int)] = {
      import scala.jdk.CollectionConverters._
      val cps = t.toLowerCase.codePoints.iterator.asScala.map(_.intValue).toVector
      val buf = Vector.newBuilder[(Long, Int)]
      var i = 0
      while (i < cps.length) {
        def keep(c: Int) = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
        if (keep(cps(i)) && (i == 0 || !keep(cps(i - 1)))) {
          var j = i
          while (j < cps.length && keep(cps(j))) j += 1
          buf += ((i.toLong, j - i))
        }
        i += 1
      }
      buf.result()
    }
    // codepoint-aware slice of lower(text) — exercises the multi-byte
    // and astral separators below
    def sliceCp(t: String, start: Long, len: Long): String = {
      val lt = t.toLowerCase
      val a = lt.offsetByCodePoints(0, start.toInt)
      val b = lt.offsetByCodePoints(a, len.toInt)
      lt.substring(a, b)
    }
    val rnd = new scala.util.Random(53)
    // separators include multi-char, multi-byte (é, —) and astral (🎉)
    // sequences: codepoint counting must survive all of them
    val seps = Vector(" ", ", ", "!!  ", " — ", "\n", "...é ", " 🎉 ")
    def render(ws: Seq[String]): String =
      ws.map(w => w + seps(rnd.nextInt(seps.length))).mkString
    for (trial <- 0 until 5) {
      val corpus = (0 until 12).map { i =>
        val len = 2 + rnd.nextInt(14)
        (i.toLong, render(Seq.fill(len)(s"t${rnd.nextInt(6)}")))
      }
      val docs = corpus.toDF("doc_id", "text")
      val textOf = corpus.toMap
      // 1) word columns are IDENTICAL to the plain variants
      val plain = Dedup.dupSpans(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      val char = Dedup.dupSpans(docs, charCoords = true).collect()
      assert(char.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet === plain, s"trial $trial word cols")
      // 2) char_start/char_len match the reference offsets, and the
      // slice they denote starts/ends exactly on the span's words
      char.foreach { r =>
        val (id, s, l) = (r.getLong(0), r.getLong(1), r.getLong(2))
        val (cs, cl) = (r.getAs[Long]("char_start"), r.getAs[Long]("char_len"))
        val st = startsRef(textOf(id))
        val (expS, _) = st(s.toInt)
        val (lastS, lastL) = st((s + l - 1).toInt)
        assert(cs === expS, s"trial $trial doc $id span $s char_start")
        assert(cl === lastS + lastL - expS, s"trial $trial doc $id char_len")
        val slice = sliceCp(textOf(id), cs, cl)
        assert(slice.head.isLetterOrDigit && slice.last.isLetterOrDigit,
          s"trial $trial slice '$slice' not word-aligned")
      }
      // 3) pair variant: word columns equal plain spanPairs, char
      // coords are doc_a's reference offsets
      val pPlain = Dedup.spanPairs(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
      val pChar = Dedup.spanPairs(docs, charCoords = true).collect()
      assert(pChar.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet === pPlain,
        s"trial $trial pair word cols")
      pChar.foreach { r =>
        val (da, s, l) = (r.getLong(0), r.getLong(2), r.getLong(3))
        val (cs, cl) = (r.getAs[Long]("char_start"), r.getAs[Long]("char_len"))
        val st = startsRef(textOf(da))
        val (expS, _) = st(s.toInt)
        val (lastS, lastL) = st((s + l - 1).toInt)
        assert(cs === expS && cl === lastS + lastL - expS,
          s"trial $trial pair ($da) span $s char coords")
      }
    }
  }

  test("contaminationBySource names the leaking source: per-source " +
    "rates from q71 verdicts, shingle-less docs excluded from the " +
    "denominator") {
    val spark2 = spark
    import spark2.implicits._
    val evalPhrase = "the held out benchmark question about rivers"
    val docs = Seq(
      (1L, "na", evalPhrase + " and its official answer text here"),
      // crawlA leaked the benchmark; crawlB is clean; the two-word doc
      // in crawlB forms no 4-shingle and must not count at all
      (30L, "crawlA", s"scraped page containing $evalPhrase verbatim body"),
      (31L, "crawlA", "another crawlA page with entirely original words"),
      (32L, "crawlB", "clean corpus text about mountains and weather"),
      (33L, "crawlB", "two words")
    ).toDF("doc_id", "source", "text")
    val out = Dedup.contaminationBySource(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(out.keySet === Set("crawlA", "crawlB"))
    val (aDocs, aCont, aOver, aRate) = out("crawlA")
    assert(aDocs === 2L && aCont === 1L && aOver >= 1L && aRate === 0.5)
    assert(out("crawlB") === ((1L, 0L, 0L, 0.0)))
  }

  test("minhashAudit: audits exactly the LSH candidate pairs, exact " +
    "duplicates score err 0, and a zero tol flips within_tol") {
    val spark2 = spark
    import spark2.implicits._
    val base = "alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet kilo lima mike november oscar papa"
    val docs = Seq(
      (1L, base),                                  // identical pair ↓
      (2L, base),
      (3L, base + " quebec romeo sierra tango"),   // high-overlap variant
      (4L, "completely unrelated words about mountains weather rivers " +
        "valleys forests deserts islands oceans glaciers meadows")
    ).toDF("doc_id", "text")
    val out = Dedup.minhashAudit(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // audit universe == the band-sharing candidate universe
    val cands = Dedup.minhashPairs(docs).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.keySet === cands)
    // the identical pair: est = 1, jaccard = 1, err = 0, within_tol
    val dup = out((1L, 2L))
    assert(dup.getDouble(3) === 1.0 && dup.getDouble(4) === 1.0 &&
      dup.getDouble(5) === 0.0 && dup.getBoolean(6))
    // doc 4 shares nothing — it is in no candidate pair
    assert(!out.keySet.exists(p => p._1 == 4L || p._2 == 4L))
    // every audited pair within the production tol on this corpus...
    assert(out.values.forall(_.getBoolean(6)))
    // ...and a zero tolerance flips any pair whose est ≠ exact (the
    // (1,3)/(2,3) variants estimate in 1/16 steps, exact is 12/16+4)
    val strict = Dedup.minhashAudit(docs, tol = 0.0).collect()
    assert(strict.exists(r => !r.getBoolean(6)))
  }

  test("dedupImpact reconciles with dedupCorpus per source and charges " +
    "removed tokens to the right source") {
    val spark2 = spark
    import spark2.implicits._
    val dupText = "the exact same mirrored page body repeated " +
      "across a mirror heavy crawl with identical words"
    val docs = Seq(
      (1L, "mirrorful", "en", dupText),
      (2L, "mirrorful", "en", dupText),
      (3L, "mirrorful", "en", dupText),
      (4L, "cleanish", "en", "a unique article about glaciers and fjords"),
      (5L, "cleanish", "en", "another unique article about desert climates")
    ).toDF("doc_id", "source", "lang", "text")
    val out = Dedup.dedupImpact(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val keptPerSource = Dedup.dedupCorpus(docs, maxDist = 5).collect()
      .groupBy(_.getString(2)).view.mapValues(_.length.toLong).toMap
    out.foreach { case (src, (n, removed, toksTot, toksRem, rate)) =>
      assert(n - removed === keptPerSource.getOrElse(src, 0L),
        s"$src kept mismatch")
      assert(toksRem <= toksTot && rate ===
        math.rint(removed.toDouble / n * 10000) / 10000)
    }
    // the three mirrored docs collapse to one survivor, tokens charged
    val (n, removed, _, toksRem, _) = out("mirrorful")
    assert(n === 3L && removed === 2L && toksRem > 0L)
    assert(out("cleanish")._2 === 0L && out("cleanish")._4 === 0L)
  }

  test("contaminationMatrix emits only the hit (suite, source) cells " +
    "and its marginals reconcile with q102's per-suite rollup") {
    val spark2 = spark
    import spark2.implicits._
    val leakX = "the held out benchmark question about rivers"
    val leakY = "a different benchmark prompt about ancient coins"
    val docs = Seq(
      (1L, "suiteX", leakX + " and its official answer text here"),
      (2L, "suiteY", leakY + " with its gold label continuation"),
      // suiteX leaks into crawlA only; suiteY into crawlB only
      (30L, "crawlA", s"scraped page containing $leakX verbatim body"),
      (31L, "crawlA", "another crawlA page with entirely original words"),
      (32L, "crawlB", s"mirror hosting $leakY in full detail"),
      (33L, "crawlB", "clean corpus text about mountains and weather")
    ).toDF("doc_id", "source", "text")
    val cells = Dedup.contaminationMatrix(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // exactly the two planted pairs — no zero cells
    assert(cells.keySet === Set(("suiteX", "crawlA"), ("suiteY", "crawlB")))
    assert(cells(("suiteX", "crawlA"))._1 === 1L)
    assert(cells(("suiteY", "crawlB"))._1 === 1L)
    // marginals == q102's per-suite totals
    val bySuite = Dedup.decontaminateBySuite(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    cells.groupBy(_._1._1).foreach { case (suite, cs) =>
      val (hitSum, overSum) =
        (cs.values.map(_._1).sum, cs.values.map(_._2).sum)
      assert(bySuite(suite) === ((hitSum, overSum)),
        s"suite $suite marginal mismatch")
    }
  }

  test("decontaminateBySuite names the leaking suite: per-suite hit " +
    "counts over the q71 corpus universe, zero-hit and shingle-less " +
    "suites report zeros") {
    val spark2 = spark
    import spark2.implicits._
    val leak = "the held out benchmark question about rivers"
    val docs = Seq(
      // suiteX leaks into doc 30; suiteY is clean; suiteZ's only eval
      // doc is too short to form a shingle (n_eval_shingles = 0)
      (1L, "suiteX", leak + " and its official answer text here"),
      (2L, "suiteY", "a different benchmark prompt about ancient coins"),
      (3L, "suiteZ", "tiny eval"),
      (30L, "crawlA", s"scraped page containing $leak verbatim body"),
      (31L, "crawlA", "another crawlA page with entirely original words"),
      // two words → no shingle → outside the universe denominator
      (32L, "crawlB", "two words")
    ).toDF("doc_id", "source", "text")
    val out = Dedup.decontaminateBySuite(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out.keySet === Set("suiteX", "suiteY", "suiteZ"))
    val (xDocs, xShingles, xHit, xOver, xRate) = out("suiteX")
    assert(xDocs === 1L && xShingles >= 5L && xHit === 1L && xOver >= 1L)
    // universe = docs 30 and 31 (doc 32 forms no shingle) → rate 1/2
    assert(xRate === 0.5)
    val (yDocs, yShingles, yHit, yOver, yRate) = out("suiteY")
    assert(yDocs === 1L && yShingles >= 1L &&
      yHit === 0L && yOver === 0L && yRate === 0.0)
    assert(out("suiteZ") === ((1L, 0L, 0L, 0L, 0.0)))
  }

  test("semDedup equals a brute-force assign/pair/union-find reference " +
    "on clustered random vectors") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(67)
    // 4 well-separated base directions + noisy members around each: the
    // first 4 vec_ids are the bases, so cells align with planted groups
    val dim = 64
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val bases = Array.tabulate(4)(g =>
      unit(Array.tabulate(dim)(i => math.sin(g * 97 + i * 13 + 1.0))))
    val vecs: Seq[(Long, Array[Float])] =
      bases.zipWithIndex.map { case (b, g) => (g.toLong, b.map(_.toFloat)) }.toSeq ++
        (4 until 40).map { id =>
          val b = bases(rnd.nextInt(4))
          // σ 0.02/dim over 64 dims: ‖noise‖ ≈ 0.16, so intra-group
          // cosines sit ≈ 0.97 (above the 0.9 gate) while cross-group
          // stays far below — pairs form inside groups only
          val noisy = b.map(x => x + rnd.nextGaussian() * 0.02)
          (id.toLong, noisy.map(_.toFloat))
        }
    val emb = vecs.toDF("vec_id", "embedding")
    val minCos = 0.9
    val got = Dedup.semDedup(emb, minCos = minCos, nCells = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    // reference: same float->double cast, argmax-cosine assignment with
    // the kernel's lowest-cell tie-break, within-cell pairs, union-find
    val dv: Map[Long, Array[Double]] =
      vecs.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dim) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val cents = (0 until 4).map(c => (c.toLong, dv(c.toLong)))
    val cellOf: Map[Long, Long] = dv.map { case (id, v) =>
      id -> cents.foldLeft((-1L, Double.NegativeInfinity)) {
        case ((bc, bs), (c, cv)) =>
          val s = cos(v, cv); if (s > bs) (c, s) else (bc, bs)
      }._1
    }
    val ids = vecs.map(_._1).sorted
    val pairs = for {
      a <- ids; b <- ids
      if a < b && cellOf(a) == cellOf(b) && cos(dv(a), dv(b)) >= minCos
    } yield (a, b)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val expect = ids.map { id =>
      (id, cellOf(id), !members.contains(id) || find(id) == id)
    }.toSet
    assert(got === expect)
    // the planted structure is non-trivial: something pruned, much kept
    val pruned = expect.count(!_._3)
    assert(pruned > 0 && pruned < ids.size)
  }

  test("semDedup components are transitive within a cell: a chain " +
    "a~b~c with cos(a,c) below threshold keeps only the chain minimum") {
    val spark2 = spark
    import spark2.implicits._
    // v(θ) in the e0/e1 plane: cos(v(x), v(y)) = cos(x - y); angles
    // 0°, 25°, 50° with threshold cos(30°): adjacent pairs qualify,
    // the endpoints alone do not — CC must still fuse all three
    def v(deg: Double): Array[Float] = {
      val r = math.toRadians(deg)
      Array.tabulate(64)(i =>
        if (i == 0) math.cos(r).toFloat
        else if (i == 1) math.sin(r).toFloat else 0f)
    }
    val emb = Seq((0L, v(0)), (1L, v(25)), (2L, v(50)), (3L, Array.tabulate(64)(i => if (i == 2) 1f else 0f)))
      .toDF("vec_id", "embedding")
    val got = Dedup.semDedup(emb, minCos = math.cos(math.toRadians(30)), nCells = 1)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(got === Map(0L -> true, 1L -> false, 2L -> false, 3L -> true))
  }

  test("clusterSizes reconciles with the q59 component board") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val comps = Dedup.connectedComponents(Dedup.simhashPairs(docs, maxDist = 5))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
    val expected = comps.groupBy(_._2).values.map(_.size)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Dedup.clusterSizes(docs).collect()
      .map(r => r.getAs[Long]("cluster_size").toInt ->
        r.getAs[Long]("n_clusters")).toMap
    assert(got === expected)
    // every paired doc is accounted for exactly once
    assert(got.map { case (sz, n) => sz * n }.sum === comps.length)
  }

  test("lineDedup drops corpus-repeated lines, preserves order in the " +
    "cleaned fingerprint, and hashes the all-dropped doc as empty") {
    val spark2 = spark
    import spark2.implicits._
    def md5s(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val boiler = "accept cookies to continue"
    val docs = Seq(
      (1L, s"$boiler\nunique first body\nmore first text"),
      (2L, s"second doc intro\n$boiler\nsecond doc end"),
      (3L, boiler) // all boilerplate -> empty after cleaning
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("n_dropped"),
          r.getAs[String]("clean_md5"))).toMap
    assert(out(1L) === ((3L, 1L,
      md5s("unique first body\nmore first text"))))
    assert(out(2L) === ((3L, 1L,
      md5s("second doc intro\nsecond doc end"))))
    assert(out(3L) === ((1L, 1L, md5s(""))))
  }

  test("lineDedup: results are identical whichever join path a line " +
    "takes — a planted Zipf-head line, capacity 1 vs default vs a " +
    "brute per-line-count reference") {
    val spark2 = spark
    import spark2.implicits._
    // a boilerplate line in 80% of docs — the hot key that would
    // funnel one shuffle-join task without the heavy/light split
    val hot = "accept cookies to continue"
    val docs = (1L to 50L).map { i =>
      if (i <= 40L) (i, s"$hot\nunique body $i")
      else (i, s"unique body $i")
    }.toDF("doc_id", "text")
    def collectOut(cap: Int) = Dedup.lineDedup(docs, heavyCapacity = cap)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("n_dropped"),
          r.getAs[String]("clean_md5"))).toMap
    val base = collectOut(4096)
    // capacity 1: at most one candidate can be nominated (the hot
    // line, by MG retention) — routing must not change any result
    assert(collectOut(1) === base)
    // brute reference: per-line corpus counts computed the naive way
    def md5s(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val cnt = docs.collect().flatMap(_.getString(1).split("\n", -1))
      .groupBy(identity).map { case (l, o) => l -> o.length }
    docs.collect().foreach { r =>
      val ls = r.getString(1).split("\n", -1)
      val kept = ls.filter(cnt(_) < 2)
      val exp = (ls.length.toLong, ls.count(cnt(_) >= 2).toLong,
        md5s(kept.mkString("\n")))
      assert(base(r.getLong(0)) === exp, s"doc ${r.getLong(0)}")
    }
  }

  test("signalCalibration: per-distance bucket stats equal a brute " +
    "per-pair recomputation from simhashPairs × ngramJaccard") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Dedup.signalCalibration(docs).collect()
      .map(r => r.getAs[Int]("dist") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Double]("mean_jaccard"),
          r.getAs[Double]("min_jaccard"), r.getAs[Double]("max_jaccard"))))
      .toMap
    val pairs = Dedup.simhashPairs(docs, maxDist = 5).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Int]("dist")).toMap
    val jac = Dedup.ngramJaccard(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap
    assert(pairs.nonEmpty, "fixture must produce candidate pairs")
    val byDist = pairs.toSeq.groupBy(_._2)
    assert(out.keySet === byDist.keySet)
    byDist.foreach { case (d, ps) =>
      val js = ps.map { case (k, _) => jac.getOrElse(k, 0.0) }
      val (n, mean, mn, mx) = out(d)
      assert(n === ps.size.toLong, s"dist $d n_pairs")
      // the operator's exact chain: DECIMAL(18,6) sum → double ÷ n → r6
      val sumDec = js.map(j => BigDecimal(j)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
      val expMean =
        math.floor(sumDec.toDouble / js.size * 1e6 + 0.5) / 1e6
      assert(mean === expMean, s"dist $d mean")
      assert(mn === js.min && mx === js.max, s"dist $d min/max")
    }
    // the calibration is monotone on this corpus in the aggregate:
    // identical docs (dist 0) must out-score the loosest bucket
    if (out.contains(0) && out.keySet.max > 0)
      assert(out(0)._2 >= out(out.keySet.max)._2)
  }

  test("bestRep picks the highest-quality member per cluster " +
    "(doc_id ASC ties) and flags divergence from the min-id policy") {
    val spark2 = spark
    import spark2.implicits._
    val comps = Seq((10L, 1L), (11L, 1L), (12L, 1L), (20L, 2L), (21L, 2L))
      .toDF("doc_id", "cluster_id")
    val scored = Seq(
      (10L, 0.4), (11L, 0.9), (12L, 0.9), // tie at 0.9 -> 11 wins
      (20L, 0.7), (21L, 0.3)              // min id IS the best
    ).toDF("doc_id", "quality")
    val out = Dedup.bestRep(comps, scored).collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        (r.getAs[Long]("n_members"), r.getAs[Long]("rep_id"),
          r.getAs[Double]("rep_quality"), r.getAs[Long]("min_id"),
          r.getAs[Boolean]("rep_differs"))).toMap
    assert(out(1L) === ((3L, 11L, 0.9, 10L, true)))
    assert(out(2L) === ((2L, 20L, 0.7, 20L, false)))
  }

  /** 30 exact-dup pairs with ids far apart, so the q140 hash scatters
    * endpoints across splits — the leakage fixture q146/q147 share. */
  private def leakDocs = {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 30).flatMap { i =>
      val words = Seq.fill(12)("w" + rnd.nextInt(5000)).mkString(" ")
      Seq((i.toLong, words), (i + 1000L, words))
    }.toDF("doc_id", "text")
  }

  test("splitLeakage equals the brute pairs×hashSplit recomputation and " +
    "the fixture really crosses splits") {
    val d = leakDocs
    val pairs = Dedup.simhashPairs(d, maxDist = 5)
    val split = Curation.hashSplit(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val expected = pairs.collect()
      .map { r =>
        val (sa, sb) = (split(r.getAs[Long]("doc_a")),
          split(r.getAs[Long]("doc_b")))
        ((if (sa <= sb) sa else sb, if (sa <= sb) sb else sa),
          r.getAs[Int]("dist"))
      }
      .groupBy(_._1)
      .map { case (k, vs) => k -> (vs.length.toLong, vs.map(_._2).min) }
    val out = Dedup.splitLeakage(pairs).collect()
      .map(r => (r.getAs[String]("split_a"), r.getAs[String]("split_b")) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Int]("min_dist"))).toMap
    assert(out === expected)
    assert(expected.keys.exists { case (a, b) => a != b },
      "fixture should produce at least one cross-split pair")
  }

  test("clusterSplit: components land whole in one split, singletons " +
    "keep the q140 assignment, and leakage is zero by construction") {
    val d = leakDocs
    val pairs = Dedup.simhashPairs(d, maxDist = 5)
    val comps = Dedup.connectedComponents(pairs)
    val out = Dedup.clusterSplit(d, comps).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("rep_id"), r.getAs[String]("split"))).toMap
    assert(out.size === 60)
    // every component member carries its rep's split — so every pair
    // is split-coherent (zero leakage)
    pairs.collect().foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(out(a)._2 === out(b)._2, s"pair ($a,$b) crosses splits")
    }
    // singletons (docs in no pair) keep rep = self and the plain q140
    // split; members' rep is their component's min id
    val inPair = pairs.collect()
      .flatMap(r => Seq(r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val plain = Curation.hashSplit(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    out.foreach { case (id, (rep, s)) =>
      if (!inPair(id)) { assert(rep === id); assert(s === plain(id)) }
      else assert(s === plain(rep), s"member $id must take rep $rep's split")
    }
  }

  test("boilerplateBySource flags lines repeated across a source's docs, " +
    "honors minLen, and isolates sources") {
    val spark2 = spark
    import spark2.implicits._
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val docs = Seq(
      // "copyright acme corp" in 2 of 3 docs (df=2 ≥ ceil(0.5·3)=2) →
      // boilerplate; "short" is 5 chars but df=1; unique lines df=1
      (1L, "copyright acme corp\nunique one", "A"),
      (2L, "copyright acme corp\nunique two", "A"),
      (3L, "short\nunique three", "A"),
      // source B: its one doc's lines all have df=1 ≥ ceil(0.5·1)=1,
      // but both are under minLen → nothing flagged
      (4L, "x\ny", "B")
    ).toDF("doc_id", "text", "source")
    val out = Dedup.boilerplateBySource(docs, minShare = 0.5, minLen = 5)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_lines"),
          r.getAs[Long]("boiler_lines"), r.getAs[Long]("boiler_occ"),
          r.getAs[Long]("chars_total"), r.getAs[Long]("chars_boiler"),
          r.getAs[Double]("boiler_share"))).toMap
    // A: 6 line occurrences; boiler = the 19-char copyright line ×2;
    // chars 19·2 + 10 + 10 + 5 + 12 = 75
    assert(out("A") === ((3L, 6L, 1L, 2L, 75L, 38L, r6(38.0 / 75))))
    assert(out("B") === ((1L, 2L, 0L, 0L, 2L, 0L, 0.0)))
  }

  test("boilerplateBySource property: 30 random multi-line docs match " +
    "an independent per-source reference") {
    val spark2 = spark
    import spark2.implicits._
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val rnd = new scala.util.Random(7)
    val lineAlphabet = Vector("copyright acme corp", "nav home about",
      "x", "hello world", "unique", "abcd efgh")
    val docs = (1L to 30L).map { id =>
      (id, Seq.fill(rnd.nextInt(4) + 1)(
        lineAlphabet(rnd.nextInt(lineAlphabet.size))).mkString("\n"),
        if (rnd.nextBoolean()) "A" else "B")
    }
    val minShare = 0.4; val minLen = 4
    val expected = docs.groupBy(_._3).map { case (src, ds) =>
      val nDocs = ds.size.toLong
      val lines = ds.flatMap { case (id, t, _) =>
        t.split("\n", -1).map(l => (id, l)) }
      val occ = lines.groupBy(_._2).map { case (l, xs) => l -> xs.size.toLong }
      val df = lines.distinct.groupBy(_._2)
        .map { case (l, xs) => l -> xs.size.toLong }
      def isB(l: String) =
        df(l) >= math.ceil(minShare * nDocs) && l.length >= minLen
      val chars = occ.map { case (l, c) => l -> c * l.length }
      val chTot = chars.values.sum
      val chB = chars.collect { case (l, c) if isB(l) => c }.sum
      src -> ((nDocs, occ.values.sum, occ.keys.count(isB).toLong,
        occ.collect { case (l, c) if isB(l) => c }.sum,
        chTot, chB,
        if (chTot > 0) r6(chB.toDouble / chTot) else null))
    }
    val out = Dedup.boilerplateBySource(docs.toDF("doc_id", "text", "source"),
        minShare, minLen)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_lines"),
          r.getAs[Long]("boiler_lines"), r.getAs[Long]("boiler_occ"),
          r.getAs[Long]("chars_total"), r.getAs[Long]("chars_boiler"),
          r.getAs[Any]("boiler_share")))).toMap
    assert(out === expected)
    // the random corpus exercises both flag outcomes
    assert(expected.values.exists(_._3 > 0), "no boilerplate generated")
    assert(expected.values.exists(v => v._3 < 6), "everything flagged")
  }

  test("dedupRoi prices exact, near-dup and line dedup on the same " +
    "token axis with hand-computed masses") {
    val spark2 = spark
    import spark2.implicits._
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    // toks = ceil(chars/4): docs 1/2 → 4 each, doc 3 → 6, doc 4 → 4;
    // corpus total 18. Docs 1/2 are exact copies (and their single
    // line therefore also duplicates); "shared line" spans docs 3/4.
    val docs = Seq(
      (1L, "hello world foo"),
      (2L, "hello world foo"),
      (3L, "aaa\nbbb ccc\nshared line"),
      (4L, "xxx\nshared line")
    ).toDF("doc_id", "text")
    // explicit near-dup components (house pattern): docs 1,2 cluster 1
    val comps = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "cluster_id")
    val out = Dedup.dedupRoiFrom(docs, comps, Dedup.lineTable(docs)).collect()
      .map(r => r.getAs[String]("method") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("toks_removed"),
          r.getAs[Double]("share")))).toMap
    // exact: one dup group of 2 → remove 1 doc × 4 toks
    assert(out("exact") === ((1L, 4L, r6(4.0 / 18))))
    // near-dup: doc 2 is the non-representative member
    assert(out("near_dup") === ((1L, 4L, r6(4.0 / 18))))
    // line: "hello world foo" (cnt 2 × 4 toks) + "shared line"
    // (cnt 2 × 3 toks) = 14 toks across all four docs
    assert(out("line") === ((4L, 14L, r6(14.0 / 18))))
  }

  test("survivalLedger attributes sequentially (gate before dup) and " +
    "rolls the kept-token share per source") {
    val spark2 = spark
    import spark2.implicits._
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    // toks = ceil(chars/4): 2 / 1 / 4 (13 chars) / 5 (18 chars)
    val docs = Seq(
      (1L, "aaaa bbb", "A"), (2L, "cccc", "A"),
      (3L, "dddd eee ffff", "B"), (4L, "gggg hhh iii jjjjj", "B")
    ).toDF("doc_id", "text", "source")
    // explicit gate flags and kept set (house pattern): doc 2 fails
    // the gate AND is absent from the kept set — it must count as
    // `gate`, not `dup` (the battery runs first; dedup never sees it)
    val gate = Seq((1L, true), (2L, false), (3L, true), (4L, true))
      .toDF("doc_id", "keep")
    val kept = Seq(Tuple1(1L), Tuple1(4L)).toDF("doc_id")
    val out = Dedup.survivalLedger(docs, gate, kept).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_toks"),
          r.getAs[Long]("gate_docs"), r.getAs[Long]("gate_toks"),
          r.getAs[Long]("dup_docs"), r.getAs[Long]("dup_toks"),
          r.getAs[Long]("kept_docs"), r.getAs[Long]("kept_toks"),
          r.getAs[Double]("kept_share")))).toMap
    assert(out("A") === ((2L, 3L, 1L, 1L, 0L, 0L, 1L, 2L, r6(2.0 / 3))))
    assert(out("B") === ((2L, 9L, 0L, 0L, 1L, 4L, 1L, 5L, r6(5.0 / 9))))
  }

  test("dedupRoi's near arm and q112's impact report agree on REMOVED " +
    "DOC COUNTS across representative policies (one survivor per " +
    "component either way); removed token mass may differ") {
    val spark2 = spark
    import spark2.implicits._
    // two near-dup components over six docs with unequal member sizes
    // so a different representative changes the removed TOKEN mass
    val docs = Seq(
      (1L, "a" * 4, "S"), (2L, "b" * 8, "S"), (3L, "c" * 12, "S"),
      (4L, "d" * 16, "S"), (5L, "e" * 20, "S"), (6L, "f" * 24, "S")
    ).toDF("doc_id", "text", "source").withColumn("lang", lit("en"))
    val comps = Seq((1L, 1L), (2L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("doc_id", "cluster_id")
    val roiNear = Dedup.dedupRoiFrom(docs, comps, Dedup.lineTable(docs))
      .collect().find(_.getAs[String]("method") == "near_dup").get
    // q112 path: q68's kept set from the SAME components (min-hash rep)
    val impact = Dedup.dedupImpactFrom(docs,
      Dedup.dedupCorpusFrom(docs, comps)).collect()
      .map(r => r.getAs[Long]("n_removed")).sum
    // policy-independent: members minus one survivor per component
    assert(roiNear.getAs[Long]("n_docs") === 3L)
    assert(impact === 3L)
  }

  /** A planted d-doc near-identical template family — the workload
    * the round-13 hot-bucket flag is about: every member shares its
    * SimHash chunk values, so the chunk buckets go hot and the pair
    * volume is the family's own d²/2. */
  private def templateFamily = {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(61)
    val tmpl = (1 to 60).map(i => s"word${i % 23}").mkString(" ")
    val fam = (1 to 250).map { i =>
      // one mutated token per doc: signatures differ by a few bits
      (i.toLong, tmpl + s" extra${i % 7} tail${i % 3}")
    }
    val noise = (251 to 280).map { i =>
      (i.toLong, (1 to 40).map(_ => s"n${rnd.nextInt(9000)}").mkString(" "))
    }
    (fam ++ noise).toDF("doc_id", "text")
  }

  test("simhashPairs: a planted 250-doc template family equals the exact " +
    "O(n^2) hamming reference while its chunk buckets are far over the " +
    "hot-bucket bound (the grid path is live, not dormant)") {
    val docs = templateFamily
    val maxDist = 3
    val sh = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val ref = (for {
      (a, ha) <- sh; (b, hb) <- sh
      if a < b
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= maxDist
    } yield (a, b, d)).toSet
    assert(ref.size > 5000, s"family must be dense: ${ref.size} pairs")
    // the planted family actually exercises the grid path: the
    // hottest 15-bit chunk bucket (maxDist=3 ⇒ 4 chunks) holds the
    // whole family, 4x past the hotDf=64 routing threshold
    val hottest = sh.flatMap { case (_, h) =>
      (0 until 4).map(c => (c, (h >> (c * 15)) & 0x7fff))
    }.groupBy(identity).values.map(_.size).max
    assert(hottest > 64, s"hottest chunk bucket only $hottest")
    val got = Dedup.simhashPairs(docs, maxDist).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === ref)
  }

  test("simhashPairs: the generalized multi-table blocking " +
    "(numChunks = 8, 2-chunk keys) is complete — same exact reference") {
    val docs = templateFamily
    val maxDist = 3
    val sh = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val ref = (for {
      (a, ha) <- sh; (b, hb) <- sh
      if a < b
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= maxDist
    } yield (a, b, d)).toSet
    val got = Dedup.simhashPairs(docs, maxDist, numChunks = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === ref)
  }

  test("chunkSweep: n_true is invariant across arms (every arm is a " +
    "complete blocking) and equals the exact O(n^2) count; emissions " +
    "fall and diagnostics reconcile as keys widen") {
    val docs = templateFamily
    val maxDist = 3
    val sh = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val exactTrue = (for {
      (a, ha) <- sh; (b, hb) <- sh
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= maxDist
    } yield 1).size.toLong
    val rows = Dedup.chunkSweep(docs, maxDist, configs = Seq(4, 5, 6))
      .collect().map(r => r.getAs[Int]("n_chunks") -> r).toMap
    assert(rows.keySet === Set(4, 5, 6))
    for ((c, r) <- rows) {
      assert(r.getAs[Long]("n_true") === exactTrue, s"arm $c completeness")
      // C(c, c-m) tables; every doc appears once per table
      val nt = (0 until c).combinations(c - maxDist).size
      assert(r.getAs[Int]("n_tables") === nt)
      assert(r.getAs[Long]("n_rows") === sh.length.toLong * nt)
      // candidates are deduped emissions; true pairs are a subset
      assert(r.getAs[Long]("emissions") >= r.getAs[Long]("n_candidates"))
      assert(r.getAs[Long]("n_candidates") >= r.getAs[Long]("n_true"))
    }
    // the knob's reason to exist: the template family's hot bucket
    // shrinks as keys widen
    assert(rows(6).getAs[Long]("max_df") <= rows(4).getAs[Long]("max_df"))
    // cross-board reconciliation: the sweep's n_true IS the q28 pair
    // count at the same maxDist — the sweep and the production chain
    // cannot drift
    val q28 = Dedup.simhashPairs(docs, maxDist).count()
    assert(rows.values.forall(_.getAs[Long]("n_true") === q28))
  }

  test("embeddingNearDupLsh: a planted 100-identical-vector bucket (hot, " +
    "array payload through the grid) yields exactly the family's " +
    "all-pairs at cosine 1.0") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(89)
    val fam = (1 to 100).map(i =>
      (i.toLong, Array(0.6f, 0.8f, 0.0f, 0.0f)))
    val noise = (101 to 120).map { i =>
      val v = Array.fill(4)(rnd.nextGaussian().toFloat)
      (i.toLong, v)
    }
    val emb = (fam ++ noise).toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDupLsh(emb, minCos = 0.999999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val famPairs = out.filter { case (a, b, _) => a <= 100 && b <= 100 }
    assert(famPairs.length === 100 * 99 / 2,
      s"expected the full family clique, got ${famPairs.length}")
    assert(famPairs.forall(_._3 === 1.0))
    // no duplicate pair from the grid routing
    assert(out.map(p => (p._1, p._2)).distinct.length === out.length)
    assert(out.forall { case (a, b, _) => a < b })
  }

  test("minhashPairs: a planted identical-signature family rides the hot " +
    "band buckets and still matches the naive band-join reference") {
    val spark2 = spark
    import spark2.implicits._
    // 120 byte-identical docs (one band bucket per band holds all of
    // them — 4 buckets of df=120 > 64) + distinct noise
    val tmpl = (1 to 30).map(i => s"same${i}").mkString(" ")
    val docs = ((1 to 120).map(i => (i.toLong, tmpl)) ++
      (121 to 140).map(i =>
        (i.toLong, (1 to 25).map(j => s"x${i}_$j").mkString(" "))))
      .toDF("doc_id", "text")
    val bands = Dedup.minhashBands(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    val ref = bands.groupBy(t => (t._2, t._3)).values.toSeq.flatMap { grp =>
      for { a <- grp; b <- grp if a._1 < b._1 } yield (a._1, b._1)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(ref.values.max === Dedup.NumBands.toLong)
    assert(ref.size === 120 * 119 / 2, "the family is all-pairs")
    val got = Dedup.minhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === ref)
  }

  test("incrementalNearDup reconciles against the full-corpus q28 " +
    "chain: matches are exactly the cross-boundary pair subset and " +
    "cluster labels agree with an independent union-find over the " +
    "frozen half") {
    val spark2 = spark
    import spark2.implicits._
    // planted structure across a boundary at 200: a frozen template
    // family (forming one frozen cluster), frozen noise, new docs that
    // copy the template (must match into the family's cluster), and
    // new-only noise (must report matched = false)
    val tmpl = (1 to 50).map(i => s"w${i % 19}").mkString(" ")
    val rnd = new scala.util.Random(97)
    val docs = (
      (1 to 60).map(i => (i.toLong, tmpl + s" v${i % 5}")) ++
      (61 to 199).map(i =>
        (i.toLong, (1 to 40).map(_ => s"z${rnd.nextInt(8000)}").mkString(" "))) ++
      (200 to 230).map(i => (i.toLong, tmpl + s" v${i % 5}")) ++
      (231 to 260).map(i =>
        (i.toLong, (1 to 40).map(_ => s"q${rnd.nextInt(8000)}").mkString(" "))))
      .toDF("doc_id", "text")
    val boundary = 200L
    val pairs = Dedup.simhashPairs(docs, maxDist = 5).localCheckpoint()
    val board = Dedup.incrementalNearDup(docs, pairs, boundary)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("matched"), r.getAs[Long]("n_matches"),
          r.getAs[Long]("n_clusters"),
          Option(r.getAs[java.lang.Long]("cluster")).map(_.toLong)))).toMap
    assert(board.keySet === (200L to 260L).toSet)
    // independent reference: collect the full pair list once, split it
    // in plain Scala, union-find the frozen half
    val allPairs = pairs.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- allPairs if b < boundary) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val cross = allPairs.filter { case (a, b) => a < boundary && b >= boundary }
    val byNew = cross.groupBy(_._2)
    for (id <- 200L to 260L) {
      val ms = byNew.getOrElse(id, Array.empty).map(_._1)
      val labels = ms.map(find).toSet
      val expect = (ms.nonEmpty, ms.length.toLong, labels.size.toLong,
        if (ms.isEmpty) None else Some(labels.min))
      assert(board(id) === expect, s"doc $id")
    }
    // the planted semantics hold: every new template copy joins the
    // frozen family's single cluster; new-only noise stays unmatched
    assert((200L to 230L).forall(board(_)._1), "template copies must match")
    assert((200L to 230L).map(board(_)._4).toSet.size === 1,
      "all template copies join the SAME frozen cluster")
    assert((231L to 260L).forall(!board(_)._1), "noise must not match")
  }

  test("registryUpdate classifies a hand-built merge topology: bridge " +
    "doc merges two frozen clusters (relabeled), plus joined / " +
    "new_cluster / new_singleton / stable rows — all exact") {
    val spark2 = spark
    import spark2.implicits._
    // explicit pair list (registryUpdate is topology-in, verdict-out):
    // frozen cluster A {1,2,3}, frozen cluster B {10,11}, frozen
    // singleton 20; new bridge 100 linking A and B (merges them), new
    // pair {101,102}, new singleton 103, new doc 104 joining 20
    val boundary = 100L
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L),
      (3L, 100L), (10L, 100L), (20L, 104L), (101L, 102L))
      .toDF("doc_a", "doc_b")
    val ids = Seq(1L, 2L, 3L, 10L, 11L, 20L, 100L, 101L, 102L, 103L, 104L)
    val docs = ids.toDF("doc_id")
    val full = Dedup.connectedComponents(pairs)
    val frozen = Dedup.connectedComponents(
      pairs.filter(col("doc_b") < boundary))
    val got = Dedup.registryUpdate(docs, pairs, full, frozen, boundary)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("is_new"),
          Option(r.getAs[java.lang.Long]("old_cluster")).map(_.toLong),
          r.getAs[Long]("new_cluster"),
          r.getAs[String]("status")))).toMap
    val expect = Map(
      1L -> ((false, Some(1L), 1L, "stable")),
      2L -> ((false, Some(1L), 1L, "stable")),
      3L -> ((false, Some(1L), 1L, "stable")),
      // the bridge merged B into A: labels rewrite 10 → 1
      10L -> ((false, Some(10L), 1L, "relabeled")),
      11L -> ((false, Some(10L), 1L, "relabeled")),
      20L -> ((false, Some(20L), 20L, "stable")),
      100L -> ((true, None, 1L, "joined")),
      101L -> ((true, None, 101L, "new_cluster")),
      102L -> ((true, None, 101L, "new_cluster")),
      103L -> ((true, None, 103L, "new_singleton")),
      104L -> ((true, None, 20L, "joined")))
    assert(got === expect)
  }

  test("registryUpdate property: on random pair graphs across a " +
    "boundary, every doc's labels and classification equal an " +
    "independent from-scratch union-find reference (3 seeds)") {
    val spark2 = spark
    import spark2.implicits._
    def unionFind(pairs: Seq[(Long, Long)]): Long => Long = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      for ((a, b) <- pairs) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      find
    }
    for (seed <- Seq(7, 131, 4099)) {
      val rnd = new scala.util.Random(seed)
      val n = 60L
      val boundary = 30L
      // ~70 ordered pairs drawn uniformly — dense enough that merges,
      // bridges and multi-component families all occur; boundary draws
      // (a = boundary-1, b = boundary) are likely at this density
      val pairSet = Iterator.continually {
        val a = rnd.nextInt(n.toInt).toLong; val b = rnd.nextInt(n.toInt).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).take(70).toSet.toSeq.sorted
      val docs = (0L until n).toDF("doc_id")
      val pairsDf = pairSet.toDF("doc_a", "doc_b").localCheckpoint()
      val got = Dedup.registryUpdate(docs, pairsDf,
          Dedup.connectedComponents(pairsDf),
          Dedup.connectedComponents(
            pairsDf.filter(col("doc_b") < boundary)),
          boundary)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Boolean]("is_new"),
            Option(r.getAs[java.lang.Long]("old_cluster")).map(_.toLong),
            r.getAs[Long]("new_cluster"),
            r.getAs[String]("status")))).toMap
      // independent reference: label EVERY doc from scratch — full
      // graph and frozen half each get their own union-find; the
      // classification re-derives from those labels alone
      val findFull = unionFind(pairSet)
      val findFrozen = unionFind(pairSet.filter(_._2 < boundary))
      val inAnyPair = pairSet.flatMap(p => Seq(p._1, p._2)).toSet
      val joined = pairSet.collect {
        case (a, b) if a < boundary && b >= boundary => b }.toSet
      val expect = (0L until n).map { id =>
        val newLbl = findFull(id)
        if (id < boundary) {
          val oldLbl = findFrozen(id)
          id -> ((false, Some(oldLbl), newLbl,
            if (oldLbl == newLbl) "stable" else "relabeled"))
        } else id -> ((true, None: Option[Long], newLbl,
          if (joined(id)) "joined"
          else if (!inAnyPair(id)) "new_singleton"
          else "new_cluster"))
      }.toMap
      assert(got === expect, s"seed $seed")
      // the draw really exercised the interesting strata
      assert(expect.values.exists(_._4 == "relabeled"), s"seed $seed: no merge drawn")
      assert(expect.values.exists(_._4 == "joined"), s"seed $seed: no join drawn")
    }
  }

  test("embeddingNearDupCelled2From property: on random clustered " +
    "embeddings of randomized size — with PLANTED argmax2 ties " +
    "(identical seed centroids) and an exact duplicate pair — the " +
    "board equals a brute-force blocked reference (probe-set " +
    "intersection AND bucket AND either band AND cosine gate), " +
    "emitted exactly once, with the kernel's top-2 cells matching an " +
    "independent ranking (3 seeds)") {
    val spark2 = spark
    import spark2.implicits._
    def cosine(a: Seq[Double], b: Seq[Double]): Double = {
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) { dot += a(i) * b(i); i += 1 }
      i = 0; while (i < a.length) { na += a(i) * a(i); i += 1 }
      i = 0; while (i < b.length) { nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (seed <- Seq(11, 257, 9001)) {
      val rnd = new scala.util.Random(seed)
      val dim = 12
      // randomized corpus size so the probe/band occupancy varies
      val n = 90 + rnd.nextInt(60)
      // clustered draw: near-dup pairs exist (same base, small noise)
      // and cluster members straddle cell boundaries — the stratum the
      // multi-probe exists for
      val bases = Array.fill(10)(Array.fill(dim)(rnd.nextGaussian()))
      val raw = (0 until n).map { i =>
        val b = bases(rnd.nextInt(bases.length))
        (i.toLong, b.map(_ + 0.15 * rnd.nextGaussian()).toSeq)
      }.toArray
      // ADVERSARIAL TIES: seed rows 3 and 7 are made IDENTICAL, so for
      // every vector cos(v, c3) == cos(v, c7) exactly (same doubles) —
      // the argmax/argmax2 id tiebreak decides the probe set
      // corpus-wide; and one exact duplicate pair among the corpus
      // rows ties at cosine 1.0
      raw(7) = (7L, raw(3)._2)
      raw(n - 1) = ((n - 1).toLong, raw(20)._2)
      val emb = raw.toSeq.toDF("vec_id", "embedding").localCheckpoint()
      val seeds = Similarity.seedCentroidList(emb, Similarity.IvfCells)
      val keyed = Dedup.celledKeyedVectors(emb, seeds).localCheckpoint()
      val minCos = 0.9
      val got0 = Dedup.embeddingNearDupCelled2From(keyed, minCos,
          inputMaterialized = true)
        .collect().map(r => (r.getAs[Long]("vec_a"),
          r.getAs[Long]("vec_b"), r.getAs[Double]("cos")))
      assert(got0.length === got0.toSet.size,
        s"seed $seed: a pair was emitted more than once")
      val rows = keyed.collect().map { r =>
        r.getAs[Long]("vec_id") -> ((r.getAs[Long]("cell_id"),
          r.getAs[Long]("cell2"), r.getAs[Long]("dbucket"),
          r.getAs[Long]("bucket"),
          r.getAs[scala.collection.Seq[Double]]("v").toSeq))
      }.toMap
      // the kernel's top-2 vs an independent full ranking (ties have
      // probability zero under the Gaussian draw; the deterministic
      // tie order is pinned by the VectorExpressionsSpec fixtures)
      for ((id, (c1, c2, _, _, v)) <- rows) {
        val ranked = seeds.map { case (cid, cv) => (cid, cosine(v, cv)) }
          .sortBy { case (cid, c) => (-c, cid) }.map(_._1)
        assert((c1, c2) === ((ranked(0), ranked(1))),
          s"seed $seed: kernel top-2 diverged for vec $id")
      }
      // brute-force blocked reference over the collected table
      val ids = rows.keys.toSeq.sorted
      val expected = (for {
        ai <- ids.indices.iterator
        bi <- (ai + 1) until ids.length
        a = ids(ai); b = ids(bi)
        (c1a, c2a, dba, bka, va) = rows(a)
        (c1b, c2b, dbb, bkb, vb) = rows(b)
        if (Set(c1a, c2a) & Set(c1b, c2b)).nonEmpty
        if bka == bkb
        if (dba & 15L) == (dbb & 15L) || (dba >> 4) == (dbb >> 4)
        c = cosine(va, vb)
        if c >= minCos
      } yield (a, b, r4(c))).toSet
      assert(got0.toSet === expected,
        s"seed $seed: board != blocked reference — missing " +
          s"${expected -- got0.toSet}, extra ${got0.toSet -- expected}")
      // the draw really exercised the multi-probe stratum: some
      // expected pair's endpoints sit in DIFFERENT primary cells
      assert(expected.exists { case (a, b, _) =>
        rows(a)._1 != rows(b)._1 },
        s"seed $seed: no cross-primary-cell pair drawn")
      assert(expected.nonEmpty, s"seed $seed: empty board proves nothing")
    }
  }

  test("incrementalNearDupCelled reconciles against the published " +
    "celled board: frozen-frozen labels only (via an independent " +
    "union-find), cross pairs are row subsets of the q176 chain, and " +
    "matched/unmatched/bridge strata are all exercised") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(43)
    val dim = 12
    val boundary = 60L
    // clustered draw + planted structure: new id 100 duplicates frozen
    // id 20 (a guaranteed cross match); frozen ids 30 and 31 duplicate
    // each other (a frozen cluster) and new id 101 duplicates id 30
    // (joins that cluster); the noise draw supplies unmatched arrivals
    val bases = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian()))
    val raw = (0 until 110).map { i =>
      val b = bases(rnd.nextInt(bases.length))
      (i.toLong, b.map(_ + 0.15 * rnd.nextGaussian()).toSeq)
    }.toArray
    raw(100) = (100L, raw(20)._2)
    raw(31) = (31L, raw(30)._2)
    raw(101) = (101L, raw(30)._2)
    val emb = raw.toSeq.toDF("vec_id", "embedding").localCheckpoint()
    val keyed = Dedup.celledKeyedVectors(emb,
      Similarity.seedCentroidList(emb, Similarity.IvfCells)).localCheckpoint()
    val minCos = 0.9
    val pairs = Dedup.embeddingNearDupCelledFrom(keyed, minCos,
      inputMaterialized = true).localCheckpoint()
    val got = Dedup.incrementalNearDupCelled(keyed, pairs, boundary)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Boolean]("matched"), r.getAs[Long]("n_matches"),
          r.getAs[Long]("n_clusters"),
          Option(r.getAs[java.lang.Long]("cluster")).map(_.toLong)))).toMap
    // independent reference off the SAME published pair list — the
    // frozen-artifact contract: everything derives from q176's rows
    val plist = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val frozenPairs = plist.filter(_._2 < boundary)
    val cross = plist.filter(p => p._1 < boundary && p._2 >= boundary)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      r
    }
    frozenPairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = (boundary until 110L).map { id =>
      val hits = cross.filter(_._2 == id).map(c => find(c._1))
      id -> ((hits.nonEmpty, hits.length.toLong,
        hits.distinct.length.toLong,
        if (hits.isEmpty) None else Some(hits.min)))
    }.toMap
    assert(got === expect)
    // the planted strata all materialized
    assert(got(100L)._1 && got(100L)._4.isDefined, "planted cross match lost")
    // 101 joins whatever frozen cluster 30 belongs to (the noise draw
    // may have linked 30 into a larger component — the label is that
    // component's min id, not necessarily 30 itself)
    assert(got(101L)._4 === Some(find(30L)), "planted cluster join mislabeled")
    assert(got.values.exists(!_._1), "no unmatched arrival drawn")
    // new-new duplicates must NOT create matches: only cross pairs count
    assert(cross.forall(_._1 < boundary))
  }

  test("celled chain on the spread corpus (q181-q183): the pair board " +
    "is a strict subset of the q69 LSH gate's, the blocking board's " +
    "geometry sweep reconciles with the shipped per-band rows, and " +
    "the celled recall never exceeds the q127 LSH profile") {
    val d = "/root/testdata/sf0.001"
    val emb = graft.Tables.embeddings(spark, d)
    val seeds = Similarity.seedCentroidList(emb, Similarity.IvfCells)
    val keyed = Dedup.celledKeyedVectors(emb, seeds).localCheckpoint()
    // subset: same fixed bucket stays in every celled key, so the
    // celled pairs can only be LSH pairs (the q176-vs-q173 discipline
    // transplanted to the spread corpus)
    val celled = Dedup.embeddingNearDupCelledFrom(keyed,
        Dedup.LshNearDupMinCos, inputMaterialized = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupLsh(emb, Dedup.LshNearDupMinCos)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(celled.subsetOf(lsh),
      s"celled pairs not a subset of LSH: ${celled -- lsh}")
    assert(celled.size < lsh.size,
      "celled blocking pruned nothing — the spread claim is untested")
    // blocking board: the shipped-geometry sweep row aggregates the
    // SAME groupings as the per-band rows, so its volumes are their sum
    val board = Dedup.celledBlockingBoard(keyed).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    val shipped =
      board(s"bands_${Dedup.CelledBands}x${Dedup.CelledBandBits}bit")
    val perBand = (0 until Dedup.CelledBands).map(j => board(s"celled_band$j"))
    assert(shipped._1 === perBand.map(_._1).sum, "n_groups sum diverged")
    assert(shipped._2 === perBand.map(_._2).max, "max_group diverged")
    assert(shipped._3 === perBand.map(_._3).sum, "cand_pairs sum diverged")
    assert(shipped._4 === perBand.head._4, "quad_pairs diverged")
    // every geometry's volume sits under the quadratic worst case and
    // under (or at) the single fixed-bucket scheme's
    for ((nb, bb) <- Dedup.CelledGeometries) {
      val g = board(s"bands_${nb}x${bb}bit")
      assert(g._3 <= board("lsh_bucket")._3 && g._3 < g._4,
        s"geometry ${nb}x$bb prices above the LSH bucket or quadratic")
    }
    // recall: celled candidates ⊆ LSH candidates ⇒ per-band n_cand ≤
    // q127's, n_true identical (same referee)
    val celledRec = Dedup.celledNearDupRecall(emb).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val lshRec = Dedup.nearDupRecall(emb).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(celledRec.keySet === lshRec.keySet)
    for ((band, (nTrue, nCand)) <- celledRec) {
      assert(nTrue === lshRec(band)._1, s"band $band: truth diverged")
      assert(nCand <= lshRec(band)._2, s"band $band: celled recall " +
        "exceeds the LSH gate it is a subset of")
    }
  }
}
