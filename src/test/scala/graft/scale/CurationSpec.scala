package graft.scale

import graft.SparkSpec
import graft.{Tables => T}
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("stratified sample: per-stratum fractions, deterministic across runs") {
    val docs = T.documents(spark, sf)
    val fr = Map("en" -> 0.5, "de" -> 0.1)
    val s1 = Curation.stratifiedSample(docs, "doc_id", fr, "lang")
    val s2 = Curation.stratifiedSample(docs, "doc_id", fr, "lang")
    assert(s1.select("doc_id").collect().map(_.getLong(0)).sorted
      === s2.select("doc_id").collect().map(_.getLong(0)).sorted)
    val counts = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // unselected strata are dropped entirely
    assert(counts.keySet.subsetOf(Set("en", "de")))
    // en keeps roughly half (hash-uniform; loose bounds)
    val enRatio = counts.getOrElse("en", 0L).toDouble / totals("en")
    assert(enRatio > 0.3 && enRatio < 0.7, s"en ratio $enRatio")
  }

  test("per-group cap keeps at most k rows per group, deterministically") {
    val docs = T.documents(spark, sf)
    val capped = Curation.perGroupCap(docs, "lang", "doc_id", 5)
    val over = capped.groupBy("lang").count().filter(col("count") > 5).count()
    assert(over === 0)
    assert(capped.columns === docs.columns) // helper column dropped
  }

  test("diversity sample picks exactly one representative per bucket") {
    val reps = Curation.diversitySample(T.embeddings(spark, sf))
    assert(reps.groupBy("bucket").count().filter(col("count") > 1).count() === 0)
    assert(reps.count() > 1)
  }

  test("sequencePack: contiguous global token intervals, correct chunk " +
    "spans, and partition-count independence") {
    val spark2 = spark
    import spark2.implicits._
    // char lengths chosen so toks = ceil(len/4) are known: 10→3, 8→2, 99→25
    val docs = Seq(
      (1L, "x" * 10), (2L, "y" * 8), (3L, "z" * 99), (4L, ""), (5L, "w" * 4)
    ).toDF("doc_id", "text")
    val out = Curation.sequencePack(docs, maxTokens = 10, partitions = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // doc 4 (zero tokens) is excluded; intervals tile [0, total)
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L, 5L))
    assert(out.head._3 === 0L) // first doc starts at 0
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 === b._3, s"interval gap between ${a._1} and ${b._1}")
    }
    // doc 1: toks 3, [0,3) → chunk 0 only; doc 3: toks 25, [5,30) →
    // chunks 0..2 with maxTokens 10
    assert(out(0) === ((1L, 3L, 0L, 3L, 0L, 0L, 1L)))
    assert(out(2) === ((3L, 25L, 5L, 30L, 0L, 2L, 3L)))
    // the distributed prefix sum is partition-count independent
    val out7 = Curation.sequencePack(docs, maxTokens = 10, partitions = 7)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out7.toSeq === out.toSeq)
  }

  test("mixtureSample solves per-stratum rates from the target mix: " +
    "over-represented strata downsample, scarce strata keep everything") {
    val spark2 = spark
    import spark2.implicits._
    // 80 en / 20 de, target 50/50 → rate_en = 0.5·100/80 = 0.625,
    // rate_de = min(1, 0.5·100/20) = 1.0
    val docs = ((1 to 80).map(i => (i.toLong, "en")) ++
      (81 to 100).map(i => (i.toLong, "de"))).toDF("doc_id", "lang")
    val out = Curation.mixtureSample(docs,
      Map("en" -> 0.5, "de" -> 0.5), "lang", "doc_id")
    val rates = out.select("lang", "rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("de") === 1.0)
    assert(rates("en") === 0.625)
    assert(out.filter(col("lang") === "de").count() === 20) // rate 1: all kept
    val en = out.filter(col("lang") === "en").count()
    assert(en > 0 && en < 80) // genuinely downsampled
    // hash-deterministic: identical set on rerun
    val rerun = Curation.mixtureSample(docs,
      Map("en" -> 0.5, "de" -> 0.5), "lang", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rerun === out.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("kmeans assigns every vector to one of k clusters, deterministically") {
    val emb = T.embeddings(spark, sf).filter(col("vec_id") < 300)
    val a1 = Curation.kmeans(emb, k = 4, iters = 2)
    assert(a1.count() === 300)
    val clusters = a1.select("cluster").distinct().collect().map(_.getInt(0)).sorted
    assert(clusters.forall(c => c >= 0 && c < 4))
    assert(clusters.length > 1) // data actually separates
    val a2 = Curation.kmeans(emb, k = 4, iters = 2)
    assert(a1.orderBy("vec_id").collect().toSeq === a2.orderBy("vec_id").collect().toSeq)
  }

  test("dsirWeights equals a brute-force bucket-ratio reference, keeps " +
    "target-like docs, drops raw-exclusive docs, and scores zero-feature " +
    "docs neutrally") {
    val spark2 = spark
    import spark2.implicits._
    // target (en) docs speak one phrase-world, de docs another, with a
    // bridge doc mixing both and a one-word doc with zero bigrams
    val enBody = "alpha beta gamma alpha beta"
    val deBody = "zulu yankee xray zulu yankee"
    val corpus = (
      (0 until 6).map(i => (i.toLong, "en", enBody)) ++
      (6 until 12).map(i => (i.toLong, "de", deBody)) ++
      Seq((12L, "de", s"$enBody $deBody"), (13L, "en", "solo"))
    ).toDF("doc_id", "lang", "text")
    // 64 buckets: the +nB Laplace mass stays proportionate to this toy
    // corpus (at the gate SFs, corpus totals dwarf the production 1024)
    val nB = 64
    val got = Curation.dsirWeights(corpus, targetLang = "en", nBuckets = nB)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5)))).toMap
    // brute reference: same tokenizer (texts pre-normalized), same md5
    // bucket hash, same ratio parenthesization, same in-order fold
    def bucket(g: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(g.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      (java.lang.Long.parseLong(hex, 16) % nB).toInt
    }
    val rows = corpus.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2).split(" ").toSeq))
    def bigrams(ws: Seq[String]): Seq[String] =
      if (ws.size < 2) Nil else ws.zip(ws.tail).map(p => s"${p._1} ${p._2}")
    val feats = rows.flatMap { case (_, l, ws) => bigrams(ws).map(g => (l, bucket(g))) }
    val rawTot = feats.size.toLong
    val tgtTot = feats.count(_._1 == "en").toLong
    val rc = feats.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tc = feats.filter(_._1 == "en").groupBy(_._2).view.mapValues(_.size.toLong).toMap
    def ratio(b: Int): Double =
      ((tc.getOrElse(b, 0L) + 1).toDouble * (rawTot + nB)) /
        ((rc.getOrElse(b, 0L) + 1).toDouble * (tgtTot + nB))
    rows.foreach { case (id, _, ws) =>
      val bgSeq = bigrams(ws)
      val sum = bgSeq.foldLeft(0.0)((acc, g) => acc + ratio(bucket(g)))
      val avg = sum / math.max(bgSeq.size, 1)
      val (n, s, a, k) = got(id)
      assert(n === bgSeq.size, s"doc $id n_features")
      assert(s === sum, s"doc $id sum_ratio")
      assert(a === avg, s"doc $id avg_ratio")
      assert(k === (avg > 1.0), s"doc $id keep")
    }
    // direction: en-exclusive phrases keep, de-exclusive drop, the
    // zero-feature doc is neutral-false
    assert(got(0L)._4 && !got(6L)._4)
    assert(got(13L) === ((0, 0.0, 0.0, false)))
  }

  test("budgetSelect keeps the best docs within the token budget: " +
    "partition count never changes the cut, the crossing doc is out") {
    val spark2 = spark
    import spark2.implicits._
    // quality is dominated by the length term at these sizes: more
    // words => higher quality, and toks = ceil(chars/4)
    val docs = (1L to 40L).map { i =>
      val n = 5 + (i % 7).toInt * 12
      (i, (1 to n).map(k => s"w${i}x$k").mkString(" "))
    }.toDF("doc_id", "text")
    val budget = 600L
    val wide = Curation.budgetSelect(docs, budget, partitions = 8).collect()
    val narrow = Curation.budgetSelect(docs, budget, partitions = 1).collect()
    // the distributed offsets reproduce the single-partition window
    assert(wide.map(_.toSeq).toSet === narrow.map(_.toSeq).toSet)
    assert(wide.nonEmpty && wide.length < 40)
    assert(wide.map(_.getLong(3)).max <= budget)
    // the selection is the exact prefix of the unbounded quality order,
    // and the first doc beyond the cut would cross the budget
    val all = Curation.budgetSelect(docs, Long.MaxValue, partitions = 8)
      .collect().sortBy(_.getLong(3))
    assert(all.take(wide.length).map(_.getLong(0)).toSet ===
      wide.map(_.getLong(0)).toSet)
    all.drop(wide.length).headOption
      .foreach(r => assert(r.getLong(3) > budget))
    // a zero-token doc never appears even with an unbounded budget
    val withEmpty = docs.union(Seq((99L, "")).toDF("doc_id", "text"))
    val sel = Curation.budgetSelect(withEmpty, Long.MaxValue).collect()
    assert(!sel.exists(_.getLong(0) == 99L) && sel.length === 40)
  }

  test("sourceDiversity: a monoculture scores gini 0 / eff 1, a uniform " +
    "k-language source scores (k-1)/k and eff k") {
    val spark2 = spark
    import spark2.implicits._
    val docs = (
      (1 to 8).map(i => (i.toLong, "mono", "en")) ++        // 1 language
      (9 to 16).map(i => (i.toLong, "quad",                 // 4 × 2 docs
        Seq("en", "de", "fr", "es")((i - 9) % 4))) ++
      Seq((17L, "skew", "en"), (18L, "skew", "en"),
        (19L, "skew", "en"), (20L, "skew", "de"))           // 3:1 split
    ).toDF("doc_id", "source", "lang")
    val out = Curation.sourceDiversity(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(out("mono") === ((8L, 1L, 0.0, 1.0)))
    assert(out("quad") === ((8L, 4L, 0.75, 4.0)))
    // skew: p = (3/4, 1/4) → Σp² = 10/16 → gini .375, eff 1.6
    assert(out("skew") === ((4L, 2L, 0.375, 1.6)))
  }

  test("modalityIntegrity counts dangling and duplicate ids on both " +
    "sides; a clean aligned corpus reads consistent") {
    val spark2 = spark
    import spark2.implicits._
    def vec(i: Int) = Array.fill(4)(i.toFloat)
    // doc 3 has no vector; vec 9 has no doc; doc 2 is duplicated;
    // vec 1 is duplicated
    val docs = Seq((1L, "a"), (2L, "b"), (2L, "b2"), (3L, "c"))
      .toDF("doc_id", "text")
    val emb = Seq((1L, vec(1)), (1L, vec(1)), (2L, vec(2)), (9L, vec(9)))
      .toDF("vec_id", "embedding")
    val r = Curation.modalityIntegrity(docs, emb).head()
    assert(r.getLong(0) === 4L && r.getLong(1) === 4L)   // raw rows
    assert(r.getLong(2) === 2L)                          // ids 1 and 2 paired
    assert(r.getLong(3) === 1L && r.getLong(4) === 1L)   // doc 3 / vec 9
    assert(r.getLong(5) === 1L && r.getLong(6) === 1L)   // dup doc 2 / vec 1
    assert(!r.getBoolean(7))
    val clean = Curation.modalityIntegrity(
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text"),
      Seq((1L, vec(1)), (2L, vec(2))).toDF("vec_id", "embedding")).head()
    assert(clean.getBoolean(7) && clean.getLong(2) === 2L)
  }

  test("selectionMixture: token-weighted shares of the selected set " +
    "reconcile with budgetSelect, targets and devs are exact") {
    val spark2 = spark
    import spark2.implicits._
    // quality descends with doc_id; toks fixed at 10 -> budget 40
    // keeps docs 1-4 (two en, one de, one fr)
    val scored = Seq(
      (1L, 0.9, 10L, "en"), (2L, 0.8, 10L, "en"), (3L, 0.7, 10L, "de"),
      (4L, 0.6, 10L, "fr"), (5L, 0.5, 10L, "de"), (6L, 0.4, 10L, "zh")
    ).toDF("doc_id", "quality", "toks", "lang")
    val out = Curation.selectionMixture(scored, budget = 40L,
      target = Map("en" -> 0.3, "de" -> 0.2, "fr" -> 0.2, "zh" -> 0.3))
      .collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("sel_toks"),
          r.getAs[Double]("share"), r.getAs[Double]("target"),
          r.getAs[Double]("dev"))).toMap
    assert(out.keySet === Set("en", "de", "fr"))
    assert(out("en") === ((2L, 20L, 0.5, 0.3, 0.5 - 0.3)))
    assert(out("de") === ((1L, 10L, 0.25, 0.2, 0.25 - 0.2)))
    assert(out("fr") === ((1L, 10L, 0.25, 0.2, 0.25 - 0.2)))
    // shares of the selected set sum to 1
    assert(math.abs(out.values.map(_._3).sum - 1.0) < 1e-9)
  }

  test("temperatureMixture: τ=0.5 sqrt-rebalanced shares, boosts, and " +
    "a zero-token language") {
    val spark2 = spark
    import spark2.implicits._
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    // toks = ceil(len/4): en 360→90, de 40→10, zh ""→0; total 100
    val docs = Seq(
      (1L, "a" * 360, "en"), (2L, "b" * 40, "de"), (3L, "", "zh")
    ).toDF("doc_id", "text", "lang")
    val rows = Curation.temperatureMixture(docs).collect()
    val out = rows.map(r => r.getAs[String]("lang") ->
      (r.getAs[Long]("toks"), r.getAs[Double]("share"),
        r.getAs[Double]("target_share"),
        if (r.isNullAt(r.fieldIndex("boost"))) None
        else Some(r.getAs[Double]("boost")))).toMap
    assert(out.keySet === Set("en", "de", "zh"))
    // recompute the exact chain: r6'd sqrt weights, micro-integer sum
    // (= the decimal exact-sum accumulator), r6'd normalized shares
    val mEn = math.floor(math.sqrt(0.9) * 1e6 + 0.5)
    val mDe = math.floor(math.sqrt(0.1) * 1e6 + 0.5)
    val wtot = (mEn + mDe) / 1e6
    val tsEn = r6(mEn / 1e6 / wtot)
    val tsDe = r6(mDe / 1e6 / wtot)
    assert(out("en") === ((90L, 0.9, tsEn, Some(r6(tsEn / 0.9)))))
    assert(out("de") === ((10L, 0.1, tsDe, Some(r6(tsDe / 0.1)))))
    // sqrt-sampling lifts the low-resource language: boost > 1 for de,
    // < 1 for en
    assert(out("de")._4.get > 1.0 && out("en")._4.get < 1.0)
    // zero-token lang: zero share, zero target, no boost (undefined)
    assert(out("zh") === ((0L, 0.0, 0.0, None)))
    // rebalanced shares still sum to ~1
    assert(math.abs(rows.map(_.getAs[Double]("target_share")).sum - 1.0)
      < 2e-6)
  }

  test("temperatureSweep: τ=1 is the raw mixture, τ=0.5 matches the " +
    "q138 board, τ=0.25 flattens hardest") {
    val spark2 = spark
    import spark2.implicits._
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    // toks: en 90, de 10 (total 100) — same fixture as q138's spec
    val docs = Seq(
      (1L, "a" * 360, "en"), (2L, "b" * 40, "de")
    ).toDF("doc_id", "text", "lang")
    val rows = Curation.temperatureSweep(docs).collect()
    assert(rows.length === 6) // 2 langs × 3 temperatures
    val out = rows.map(r => (r.getAs[Double]("tau"),
      r.getAs[String]("lang")) ->
      (r.getAs[Double]("share"), r.getAs[Double]("target_share"),
        r.getAs[Double]("boost"))).toMap
    // τ=1: target == share, boost == 1 (r6-exactly)
    assert(out((1.0, "en")) === ((0.9, 0.9, 1.0)))
    assert(out((1.0, "de")) === ((0.1, 0.1, 1.0)))
    // τ=0.5: identical numbers to the q138 board on the same input
    val q138 = Curation.temperatureMixture(docs).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Double]("target_share"), r.getAs[Double]("boost"))).toMap
    assert(out((0.5, "en")) === ((0.9, q138("en")._1, q138("en")._2)))
    assert(out((0.5, "de")) === ((0.1, q138("de")._1, q138("de")._2)))
    // τ=0.25: recompute the double-sqrt chain exactly
    val mEn = math.floor(math.sqrt(math.sqrt(0.9)) * 1e6 + 0.5)
    val mDe = math.floor(math.sqrt(math.sqrt(0.1)) * 1e6 + 0.5)
    val wtot = (mEn + mDe) / 1e6
    assert(out((0.25, "en"))._2 === r6(mEn / 1e6 / wtot))
    assert(out((0.25, "de"))._2 === r6(mDe / 1e6 / wtot))
    // lower τ lifts the low-resource lang monotonically
    assert(out((0.25, "de"))._3 > out((0.5, "de"))._3)
    assert(out((0.5, "de"))._3 > out((1.0, "de"))._3)
  }

  test("batchPadding: exact padded-token accounting, length-sorting " +
    "recovers the waste, distributed rank matches the global order") {
    val spark2 = spark
    import spark2.implicits._
    // toks alternate 1/100: natural batches pair a short with a long
    val docs = Seq(
      (1L, "a" * 4), (2L, "b" * 400), (3L, "a" * 4),
      (4L, "b" * 400), (5L, "a" * 4)
    ).toDF("doc_id", "text")
    val out = Curation.batchPadding(docs, batchSize = 2, partitions = 3)
      .collect().map(r => r.getAs[String]("strategy") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_batches"),
          r.getAs[Long]("real_toks"), r.getAs[Long]("padded_toks"),
          r.getAs[Long]("pad_toks"), r.getAs[Double]("pad_frac"))).toMap
    // natural (doc_id order): [1,100] [1,100] [1] → padded 200+200+1
    assert(out("1_natural") ===
      ((5L, 3L, 203L, 401L, 198L, math.round(198.0 / 401 * 1e4) / 1e4)))
    // sorted (toks order): [1,1] [1,100] [100] → padded 2+200+100
    assert(out("2_length_sorted") ===
      ((5L, 3L, 203L, 302L, 99L, math.round(99.0 / 302 * 1e4) / 1e4)))
  }

  test("curriculumPhases: percentile_disc-equivalent quartile breaks, " +
    "zero-token docs excluded, exact phase accounting") {
    val spark2 = spark
    import spark2.implicits._
    // 8 scored docs, qualities 0.1..0.8 — breaks land at 0.2/0.4/0.6
    // (smallest value whose cum count reaches ceil(p·8/100))
    val scored = ((1 to 8).map(i => (i.toLong, i / 10.0, i * 10L)) :+
      ((9L, 0.05, 0L))) // zero-token: carries no signal, excluded
      .toDF("doc_id", "quality", "toks")
    val out = Curation.curriculumPhasesFrom(scored).collect()
      .map(r => r.getAs[String]("phase") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("phase_toks"),
          r.getAs[Double]("min_quality"), r.getAs[Double]("max_quality")))
      .toMap
    assert(out === Map(
      "1_q1" -> ((2L, 30L, 0.1, 0.2)),
      "2_q2" -> ((2L, 70L, 0.3, 0.4)),
      "3_q3" -> ((2L, 110L, 0.5, 0.6)),
      "4_q4" -> ((2L, 150L, 0.7, 0.8))))
  }

  test("shardPlan: docs land whole in the shard where they start, an " +
    "oversized doc leaves gap shard-ids, totals account every token") {
    val spark2 = spark
    import spark2.implicits._
    // toks 3, 3, 10, 3 at shard target 4: cum starts 0, 3, 6, 16 →
    // shards 0, 0, 1, 4 (shards 2 and 3 are the gap the big doc ate)
    val docs = Seq(
      (1L, "a" * 12), (2L, "b" * 12), (3L, "c" * 40), (4L, "d" * 12)
    ).toDF("doc_id", "text")
    val out = Curation.shardPlan(docs, shardTokens = 4, partitions = 2)
      .collect().map(r => r.getAs[Long]("shard_id") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("shard_toks"),
          r.getAs[Long]("dev_toks"), r.getAs[Double]("fill"),
          r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc"))).toMap
    assert(out.keySet === Set(0L, 1L, 4L)) // 2 and 3 are gaps
    assert(out(0L) === ((2L, 6L, 2L, 1.5, 1L, 2L)))
    assert(out(1L) === ((1L, 10L, 6L, 2.5, 3L, 3L)))
    assert(out(4L) === ((1L, 3L, -1L, 0.75, 4L, 4L)))
    // every token lands in exactly one shard
    assert(out.values.map(_._2).sum === 19L)
  }

  test("snapshotQualityDrift: statuses classify the full-outer compare, " +
    "removed docs score on their prev text, means are exact") {
    val spark2 = spark
    import spark2.implicits._
    // hand-computable qualities: "" → 0.2, "aaaa" → 0.205,
    // "the the the the" → 0.52 (all-stopword)
    val prev = Seq(
      (1L, "aaaa"), (2L, "the the the the"), (3L, "")
    ).toDF("doc_id", "text")
    val cur = Seq(
      (2L, "the the the the"), (3L, "aaaa"), (4L, "")
    ).toDF("doc_id", "text")
    val out = Curation.snapshotQualityDrift(prev, cur).collect()
      .map(r => r.getAs[String]("status") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_toks"),
          r.getAs[Double]("mean_quality"), r.getAs[Double]("mean_toks"))).toMap
    assert(out === Map(
      "added" -> ((1L, 0L, 0.2, 0.0)),       // doc 4, current text
      "removed" -> ((1L, 1L, 0.205, 1.0)),   // doc 1, PREV text
      "changed" -> ((1L, 1L, 0.205, 1.0)),   // doc 3, current text
      "unchanged" -> ((1L, 4L, 0.52, 4.0)))) // doc 2
  }

  test("splitBalance: cells reconcile with hashSplit, shares sum to 1 " +
    "per split, global shares are split-invariant") {
    val docs = T.documents(spark, sf)
    val out = Curation.splitBalance(docs).collect()
    // cell counts reconcile with an independent hashSplit join
    val expect = Curation.hashSplit(docs).join(docs, "doc_id")
      .groupBy("split", "lang").count().collect()
      .map(r => (r.getAs[String]("split"), r.getAs[String]("lang")) ->
        r.getAs[Long]("count")).toMap
    assert(out.map(r => (r.getAs[String]("split"), r.getAs[String]("lang")) ->
      r.getAs[Long]("n_docs")).toMap === expect)
    // within each split the language shares sum to ~1
    out.groupBy(_.getAs[String]("split")).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0)
        < rows.length * 1e-6)
    }
    // a language's global share is the same number in every split row
    out.groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Double]("global_share")).distinct.length === 1)
    }
    // dev is exactly share − global_share
    out.foreach { r =>
      assert(r.getAs[Double]("dev") ===
        r.getAs[Double]("share") - r.getAs[Double]("global_share"))
    }
  }

  test("hashSplit: deterministic, exhaustive, roughly proportional — " +
    "and re-weighting only shrinks/grows split intervals (no churn " +
    "between untouched boundaries)") {
    val docs = T.documents(spark, sf)
    val a = Curation.hashSplit(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Curation.hashSplit(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)                        // rerun-stable
    assert(a.size === docs.count())        // every doc assigned once
    val shares = a.values.groupBy(identity).view
      .mapValues(_.size.toDouble / a.size).toMap
    assert(shares("train") > 0.7 && shares("train") < 0.9)
    assert(shares.values.sum === 1.0)
    // shrinking train 0.8→0.7 may move train docs out, but never moves
    // a doc INTO train: [0, 0.7) ⊂ [0, 0.8)
    val c = Curation.hashSplit(docs,
        splits = Seq("train" -> 0.7, "val" -> 0.2, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    c.foreach { case (id, s) => if (s == "train") assert(a(id) === "train") }
    // fractions must sum to 1
    intercept[IllegalArgumentException] {
      Curation.hashSplit(docs, splits = Seq("train" -> 0.5, "val" -> 0.1))
    }
  }

  test("epochAllocation: needs, epoch caps, shortfall and the zero-avail " +
    "guard on a hand-computed fixture") {
    val spark2 = spark
    import spark2.implicits._
    // toks = ceil(len/4): en 100, de 10, fr 5, zz 0
    val docs = Seq(
      (1L, "en", "a" * 400), (2L, "de", "b" * 40),
      (3L, "fr", "c" * 20), (4L, "zz", "")
    ).toDF("doc_id", "lang", "text")
    val out = Curation.epochAllocation(docs, budget = 100L,
        target = Map("en" -> 0.5, "de" -> 0.5), maxEpochs = 2)
      .collect().map(r => r.getAs[String]("lang") -> r).toMap
    def row(l: String) = {
      val r = out(l)
      (r.getAs[Long]("avail_toks"), r.getAs[Double]("need_toks"),
        Option(r.getAs[java.lang.Double]("epochs_frac")).map(_.toDouble),
        Option(r.getAs[java.lang.Long]("planned_epochs")).map(_.toLong),
        r.getAs[Double]("shortfall_toks"),
        Option(r.getAs[java.lang.Boolean]("oversampled")).map(_.booleanValue))
    }
    // en: need 50 of 100 avail -> half an epoch, no shortfall
    assert(row("en") === ((100L, 50.0, Some(0.5), Some(1L), 0.0, Some(false))))
    // de: need 50 of 10 avail -> frac 5, capped at 2 epochs,
    // shortfall 50 - 2*10 = 30
    assert(row("de") === ((10L, 50.0, Some(5.0), Some(2L), 30.0, Some(true))))
    // fr: not in the target -> zero need, zero epochs
    assert(row("fr") === ((5L, 0.0, Some(0.0), Some(0L), 0.0, Some(false))))
    // zz: zero available tokens -> NULL epochs, not a division artifact
    assert(row("zz") === ((0L, 0.0, None, None, 0.0, None)))
  }

  test("packEfficiency: the 1-row dashboard reconciles with a " +
    "hand-packed fixture") {
    val spark2 = spark
    import spark2.implicits._
    // toks = ceil(len/4): 3, 2, 25, 0 (excluded), 1; maxTokens 10 →
    // stream [0,31): doc3 spans chunks 0-2 (split), 4 chunks total
    val docs = Seq(
      (1L, "x" * 10), (2L, "y" * 8), (3L, "z" * 99), (4L, ""), (5L, "w" * 4)
    ).toDF("doc_id", "text")
    val r = Curation.packEfficiency(docs, maxTokens = 10, partitions = 2)
      .head()
    assert(r.getAs[Long]("n_docs") === 4L)
    assert(r.getAs[Long]("total_tokens") === 31L)
    assert(r.getAs[Long]("n_chunks") === 4L)
    assert(r.getAs[Long]("n_split_docs") === 1L)
    assert(r.getAs[Long]("max_chunks_per_doc") === 3L)
    assert(r.getAs[Double]("fill_ratio") ===
      math.floor(31.0 / 40 * 1e6 + 0.5) / 1e6)
  }

  test("chunkSpans: overlapping windows tile each document — every " +
    "token covered, stride spacing, truncated tail, zero-token docs " +
    "excluded") {
    val spark2 = spark
    import spark2.implicits._
    // 10 words, chunkSize 4, stride 3 → starts 0,3,6,9:
    //   [0,4) [3,7) [6,10) [9,10)
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")),
      (2L, "only two"),     // one truncated chunk [0,2)
      (3L, "")              // zero words → no rows
    ).toDF("doc_id", "text")
    val out = Curation.chunkSpans(docs, chunkSize = 4, stride = 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_idx"),
        r.getAs[Long]("tok_start"), r.getAs[Long]("tok_end"),
        r.getAs[Long]("n_toks"))).sortBy(t => (t._1, t._2))
    assert(out === Seq(
      (1L, 0, 0L, 4L, 4L), (1L, 1, 3L, 7L, 4L),
      (1L, 2, 6L, 10L, 4L), (1L, 3, 9L, 10L, 1L),
      (2L, 0, 0L, 2L, 2L)))
    // coverage: chunk unions tile [0, n) for every doc
    out.groupBy(_._1).foreach { case (_, cs) =>
      val sorted = cs.sortBy(_._3)
      assert(sorted.head._3 === 0L)
      sorted.sliding(2).foreach { w =>
        if (w.length == 2) assert(w(1)._3 <= w(0)._4, "gap between chunks")
      }
    }
    intercept[IllegalArgumentException] {
      Curation.chunkSpans(docs, chunkSize = 4, stride = 5)
    }
  }

  test("snapshotDiff classifies added/removed/changed/unchanged and " +
    "the summary rolls them up") {
    val spark2 = spark
    import spark2.implicits._
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val cur = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val statuses = Curation.snapshotDiff(prev, cur).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(statuses === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
    val summary = Curation.snapshotDiffSummary(prev, cur).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary === Map("removed" -> 1L, "unchanged" -> 1L,
      "changed" -> 1L, "added" -> 1L))
  }

  test("cellBalancedSelect caps each embedding cell at k and keeps its " +
    "highest-quality docs (quality DESC, doc_id ASC ties)") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(13)
    // two well-separated anchor directions -> 2 occupied cells (cents
    // are the first nCells=2 vectors, one per anchor)
    val a0 = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val a1 = a0.map(-_)
    val emb = (0 until 12).map { i =>
      val a = if (i % 2 == 0) a0 else a1
      (i.toLong, a.map(x => x + rnd.nextFloat() * 0.05f))
    }.toDF("vec_id", "embedding")
    // doc i quality rises with word count (the q34 length term)
    val docs = (0 until 12).map { i =>
      (i.toLong, Seq.fill(5 + 8 * i)("the data").mkString(" "), "en", "s")
    }.toDF("doc_id", "text", "lang", "source")
    val out = Curation.cellBalancedSelect(docs, emb, nCells = 2, k = 3)
      .collect()
      .map(r => (r.getAs[Long]("cell_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Double]("quality")))
    val byCell = out.groupBy(_._1)
    assert(byCell.keySet === Set(0L, 1L))
    val quals = TextAnalysis.qualityScore(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
    byCell.foreach { case (cell, rows) =>
      assert(rows.length === 3, s"cap must bind in cell $cell")
      // the kept docs are the cell's top-quality members in order
      val members = (0 until 12).map(_.toLong)
        .filter(i => (i % 2 == 0) == (cell == 0L))
      val expect = members.sortBy(i => (-quals(i), i)).take(3)
      assert(rows.sortBy(_._2).map(_._3).toSeq === expect,
        s"cell $cell selection")
      rows.foreach { case (_, _, id, q) => assert(q === quals(id)) }
    }
  }

  test("shardMixing: per-shard source concentration with hand-computed " +
    "Simpson index and deterministic dominant-source tie-break") {
    val spark2 = spark
    import spark2.implicits._
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    // every text is 13 chars → 4 toks; shardTokens = 8 → cum ends
    // 4/8/12/16 → docs 1,2 land in shard 0 and docs 3,4 in shard 1
    def t13(i: Int) = f"aaaa bbb cc$i%02d"
    val docs = Seq(
      (1L, t13(1), "A"), (2L, t13(2), "B"),
      (3L, t13(3), "A"), (4L, t13(4), "A")
    ).toDF("doc_id", "text", "source")
    val out = Curation.shardMixing(docs, shardTokens = 8, partitions = 2)
      .collect().map(r => r.getAs[Long]("shard_id") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_sources"),
          r.getAs[String]("top_source"), r.getAs[Double]("top_share"),
          r.getAs[Double]("simpson")))).toMap
    // shard 0: A and B tied at 1 — tie breaks to the lexicographically
    // LAST source; Simpson (1² + 1²)/2² = 0.5
    assert(out(0L) === ((2L, 2L, "B", 0.5, 0.5)))
    // shard 1: pure-A shard reads as maximum concentration
    assert(out(1L) === ((2L, 1L, "A", 1.0, 1.0)))
    // reconciliation: q168 reads the SAME shards q159 publishes —
    // identical shard ids and per-shard doc counts
    val plan = Curation.shardPlan(docs, shardTokens = 8, partitions = 2)
      .collect().map(r => r.getAs[Long]("shard_id") ->
        r.getAs[Long]("n_docs")).toMap
    assert(plan === out.map { case (k, v) => k -> v._1 })
  }

  test("writeSharded → shardAudit round-trip: the on-disk layout matches " +
    "the q159 manifest shard for shard (one file each); a tampered " +
    "layout — deleted shard, stray extra shard — is flagged, never " +
    "swallowed") {
    import java.nio.file.{Files, Path}
    import scala.jdk.CollectionConverters._
    val docs = T.documents(spark, sf)
    val root = Files.createTempDirectory("graft-shards")
    val dir = root.toString + "/corpus"
    Curation.writeSharded(docs, dir, shardTokens = 4096)
    val plan = Curation.shardPlan(docs, shardTokens = 4096)
      .localCheckpoint() // freeze: the audit reads it twice
    val audit = Curation.shardAudit(spark, dir, plan).collect()
    assert(audit.nonEmpty)
    assert(audit.length === plan.count().toInt,
      "full outer join must line up 1:1 on an untampered layout")
    assert(audit.forall(_.getAs[Boolean]("ok")),
      s"unreconciled shards: ${audit.filterNot(_.getAs[Boolean]("ok")).toSeq}")
    // every shard is exactly one physical file
    assert(audit.forall(_.getAs[Long]("n_files") === 1L))
    // --- tamper 1: delete one shard directory (data loss) ---
    val victim = audit.map(_.getAs[Long]("shard_id")).min
    val victimDir = java.nio.file.Paths.get(dir, s"shard_id=$victim")
    Files.walk(victimDir).iterator().asScala.toSeq.reverse
      .foreach(p => Files.delete(p))
    // --- tamper 2: plant a stray shard the plan never published ---
    val stray = audit.map(_.getAs[Long]("shard_id")).max + 1000L
    docs.limit(3).withColumn("shard_id", lit(stray))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("shard_id").parquet(dir)
    val audit2 = Curation.shardAudit(spark, dir, plan).collect()
    val bad = audit2.filterNot(_.getAs[Boolean]("ok"))
      .map(_.getAs[Long]("shard_id")).toSet
    assert(bad === Set(victim, stray),
      s"expected exactly the tampered shards flagged, got $bad")
    // untampered shards still reconcile
    assert(audit2.count(_.getAs[Boolean]("ok")) === audit.length - 1)
  }
}
