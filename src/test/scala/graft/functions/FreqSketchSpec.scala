package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Misra–Gries sketch aggregate + the guarded heavy-hitters operator:
  * the frequency-axis sibling of the q93 Bloom-confirm pattern. */
class FreqSketchSpec extends SparkSpec {

  test("misra_gries candidates contain every item above N/(cap+1) under " +
    "adversarial partitionings (merge path exercised)") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(71)
    // Zipf-ish stream over 40 distinct items: item i drawn ∝ 1/(i+1)
    val weights = Array.tabulate(40)(i => 1.0 / (i + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail.map(_ / weights.sum)
    val stream = Seq.fill(20000) {
      val u = rnd.nextDouble()
      s"t${cum.indexWhere(u <= _)}"
    }
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size.toLong
    for (cap <- Seq(8, 32); parts <- Seq(1, 5, 13)) {
      val got = stream.toDF("w").repartition(parts)
        .agg(FreqSketch.misraGries(col("w"), cap).as("cand"))
        .head().getSeq[String](0).toSet
      assert(got.size <= cap, s"cap=$cap parts=$parts overflow: ${got.size}")
      val mustHave = exact.filter(_._2 > n / (cap + 1)).keySet
      assert(mustHave.subsetOf(got),
        s"cap=$cap parts=$parts missing ${mustHave -- got}")
    }
  }

  test("misra_gries retention property: randomized capacities and " +
    "ADVERSARIAL interleavings (sorted runs, heavy-last, split-heavy, " +
    "uniform + spike) never evict a true heavy item") {
    val spark2 = spark
    import spark2.implicits._
    // the q134/boundedSelfPairs routing rests on exactly this bound:
    // every item with count > N/(cap+1) is in the sketch — pin it
    // against orderings built to stress eviction and merge, not just
    // the Zipf fixture above
    val rnd = new scala.util.Random(101)
    def heavy(i: Int) = s"H$i"
    def noise() = s"z${rnd.nextInt(5000)}"
    val streams: Seq[(String, Seq[String])] = Seq(
      // heavy items arrive LAST, after noise has filled every buffer
      "heavy-last" -> ((1 to 6000).map(_ => noise()) ++
        (0 until 4).flatMap(h => Seq.fill(2500)(heavy(h)))),
      // heavy occurrences split thin across the whole stream
      "interleaved" -> (0 until 12000).map(i =>
        if (i % 4 == 0) heavy(i % 3) else noise()),
      // sorted runs: each partition sees long same-item runs
      "sorted-runs" -> ((0 until 3).flatMap(h => Seq.fill(3000)(heavy(h))) ++
        (1 to 5000).map(_ => noise())).sorted,
      // near-uniform field with one spike barely above the bound
      "uniform-spike" -> rnd.shuffle(
        (1 to 9000).map(i => s"u${i % 1500}") ++ Seq.fill(1200)(heavy(0)))
    )
    for ((name, stream) <- streams; cap <- Seq(5, 17, 64);
         parts <- Seq(1, 7)) {
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
      val bound = stream.size.toLong / (cap + 1)
      val mustHave = exact.filter(_._2 > bound).keys.toSet
      val got = stream.toDF("w").repartition(parts)
        .agg(FreqSketch.misraGries(col("w"), cap).as("cand"))
        .head().getSeq[String](0).toSet
      assert(got.size <= cap, s"$name cap=$cap parts=$parts overflow")
      assert(mustHave.subsetOf(got),
        s"$name cap=$cap parts=$parts evicted ${mustHave -- got}")
    }
  }

  test("heavyHitters equals the exact top-k with exact counts on a " +
    "skewed corpus, independent of partitioning") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(73)
    // 60 docs over a 30-token vocabulary, heavily skewed
    val docs = (0 until 60).map { i =>
      val body = Seq.fill(40)(s"w${math.min(rnd.nextInt(30), rnd.nextInt(30))}")
      (i.toLong, body.mkString(" "))
    }.toDF("doc_id", "text")
    val exact = graft.scale.TextAnalysis.heavyHitters(docs, k = 5, capacity = 64)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    // reference: plain exact count + (cnt DESC, token ASC) rank
    val ref = docs.select(explode(graft.functions.PortableFuncs.words(col("text"))).as("w"))
      .groupBy("w").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (w, c) => (-c, w) }.take(5).zipWithIndex
      .map { case ((w, c), i) => (i + 1, w, c) }.toSeq
    assert(exact === ref)
    val reparted = graft.scale.TextAnalysis.heavyHitters(
      docs.repartition(7), k = 5, capacity = 64)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(reparted === ref)
  }

  test("heavyHitters RAISES when capacity cannot certify exactness " +
    "(near-uniform counts below N/capacity) instead of publishing") {
    val spark2 = spark
    import spark2.implicits._
    // 64 tokens, uniform ~15 occurrences each: N=960, N/cap at cap=4
    // is 240 — no token clears it, the guard must fire
    val docs = (0 until 60).map { i =>
      (i.toLong, (0 until 16).map(j => s"u${(i + j * 4) % 64}").mkString(" "))
    }.toDF("doc_id", "text")
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    // cap 4: uniform ties make a merge's (cap+1)-th-largest subtraction
    // zero out whole buffers — the SHORT-BOARD guard must fire (an
    // empty board has no row for the per-row check to reject)
    val e = intercept[Exception] {
      graft.scale.TextAnalysis.heavyHitters(docs, k = 3, capacity = 4).collect()
    }
    assert(messages(e).exists(_.contains("capacity 4 too small")),
      s"expected the guard message, got: ${messages(e)}")
    // PER-ROW guard: 3 heavies at count 115 with N = 960 and cap 8 sit
    // INSIDE the (N/(cap+1), N/cap] = (106.7, 120] window — guaranteed
    // to be candidates (above the MG retention bound), guaranteed to
    // fill the board, but below the certification threshold
    val rnd2 = new scala.util.Random(79)
    val stream = rnd2.shuffle(
      (0 until 3).flatMap(h => Seq.fill(115)(s"h$h")) ++
        (0 until 615).map(j => s"f${j % 61}"))
    val docs2 = stream.grouped(16).zipWithIndex
      .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val e2 = intercept[Exception] {
      graft.scale.TextAnalysis.heavyHitters(docs2, k = 3, capacity = 8).collect()
    }
    assert(messages(e2).exists(m => m.contains("capacity 8 too small")
        && m.contains("does not clear")),
      s"expected the per-row guard message, got: ${messages(e2)}")
  }
}
