package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  def docs = {
    val spark2 = spark
    import spark2.implicits._
    Seq(
      // heavy in de profile n-grams (sch/ich/ung/ei): → de
      (1L, "schneller schein bereich zeichnung schwingung ein", "de"),
      // heavy in en profile n-grams (th/ing/wh/ow): → en
      (2L, "the thing which grows throws down the window showing", "en"),
      // empty-ish: all scores 0 → fixed-order tie-break picks en
      (3L, "zzz", "zh")
    ).toDF("doc_id", "text", "lang")
  }

  test("char-n-gram language ID picks the profile-dominant language, " +
    "with deterministic tie-break") {
    val conf = TextAnalysis.langNgramConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(conf === Map(("de", "de") -> 1L, ("en", "en") -> 1L, ("zh", "en") -> 1L))
  }

  test("word-level and char-level ID agree on clearly-marked text") {
    val pred = TextAnalysis.langId(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    // doc 2 carries English stopwords too; doc 1 has no de stopwords in
    // this sample so word-level falls back to the tie-break
    assert(pred(2L) === "en")
  }

  test("gopher rules: bullet/ellipsis/symbol signals fire on crafted docs " +
    "and the pass flag applies the published thresholds") {
    val spark2 = spark
    import spark2.implicits._
    val goodBody = (1 to 60).map(i => s"the word number$i is that it")
      .mkString(" ")
    val crafted = Seq(
      // 60×7 = 420 words, stopword-rich, no symbols → passes
      (1L, goodBody, "en"),
      // mostly bullet lines → bullet_frac ≥ 0.9 → fails
      (2L, "- one\n- two\n- three\n- four\n- five\n- six\n- seven\n- eight\n- nine\nten", "en"),
      // every line trails an ellipsis → ellipsis_frac = 1 → fails
      (3L, "to be continued...\nmore soon...", "en"),
      // short doc → n_words < 50 → fails
      (4L, "the and of it", "en")
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.gopherRules(crafted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("gopher_pass"))
    assert(out(2L).getAs[Double]("bullet_frac") === 0.9)
    assert(!out(2L).getAs[Boolean]("gopher_pass"))
    assert(out(3L).getAs[Double]("ellipsis_frac") === 1.0)
    assert(!out(3L).getAs[Boolean]("gopher_pass"))
    assert(out(4L).getAs[Int]("n_words") === 4)
    assert(!out(4L).getAs[Boolean]("gopher_pass"))
  }

  test("repetition: bigram duplicate and top-share math, zero-filled " +
    "for docs too short to have bigrams") {
    val spark2 = spark
    import spark2.implicits._
    val crafted = Seq(
      // ws = a b a b a b → bigrams: ab ba ab ba ab (5 total, 2 distinct,
      // top 'a b'×3, all 5 are repeats)
      (1L, "a b a b a b", "en"),
      // all distinct bigrams
      (2L, "one two three four", "en"),
      // single word → no bigrams
      (3L, "solo", "en")
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.repetition(crafted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_bigrams") === 5L)
    assert(out(1L).getAs[Long]("n_distinct") === 2L)
    assert(out(1L).getAs[Double]("dup_bigram_frac") === 1.0)
    assert(out(1L).getAs[Double]("top_bigram_frac") === 0.6)
    assert(out(2L).getAs[Double]("dup_bigram_frac") === 0.0)
    assert(out(3L).getAs[Long]("n_bigrams") === 0L)
    assert(out(3L).getAs[Double]("top_bigram_frac") === 0.0)
  }

  test("longestRepetition: null text is 0 words, not size(null) = -1") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, "a b a b a b"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.longestRepetition(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_words"), r.getAs[Int]("max_rep"),
          r.getAs[Double]("rep_frac"))).toMap
    // the oracle states n_words = 0 for a null document (COALESCE to
    // the empty list on both engines); -1 here would flip its hash
    assert(out(2L) === ((0, 0, 0.0)))
    assert(out(1L)._1 === 6 && out(1L)._2 === 4)
  }

  test("tfidf: corpus-rare terms outrank ubiquitous ones; ranks are " +
    "per-doc, deterministic, and capped at k") {
    val spark2 = spark
    import spark2.implicits._
    val crafted = Seq(
      (1L, "common common rare common", "en"),
      (2L, "common common common", "en"),
      (3L, "common unique", "en")
    ).toDF("doc_id", "text", "lang")
    val rows = TextAnalysis.tfidfTop(crafted, k = 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rk")) ->
        (r.getAs[String]("term"), r.getAs[Long]("tf"), r.getAs[Long]("df")))
      .toMap
    // 'rare' (df=1) beats 'common' (df=3) in doc 1 despite lower tf
    assert(rows((1L, 1))._1 === "rare")
    assert(rows((1L, 2))._1 === "common")
    assert(rows((3L, 1))._1 === "unique")
    // doc 2 has only one term
    assert(!rows.contains((2L, 2)))
    assert(rows((2L, 1)) === (("common", 3L, 3L)))
  }

  test("bm25: more query-term hits rank higher; term-free docs excluded; " +
    "top-k bounded") {
    val spark2 = spark
    import spark2.implicits._
    val crafted = Seq(
      (1L, "spark join query spark join query", "en"),
      (2L, "spark filler filler filler filler filler", "en"),
      (3L, "nothing relevant here at all truly", "en"),
      (4L, "query filler filler filler filler filler", "en")
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.bm25(crafted, k = 3).collect()
    val ids = out.map(_.getAs[Long]("doc_id")).toSeq
    assert(ids.head === 1L)          // all three terms, highest score
    assert(!ids.contains(3L))        // no query terms → excluded
    assert(ids.size === 3)
    // 'query' is rarer than 'spark'? equal df here (1 each beyond doc1) —
    // scores must at least be monotone in the sort order
    val scores = out.map(_.getAs[Double]("bm25")).toSeq
    assert(scores === scores.sorted.reverse)
  }

  test("curationGate: shuffle-free repetition signals equal the groupBy " +
    "formulation, and the joint flag is gopher ∧ repetition") {
    val spark2 = spark
    import spark2.implicits._
    val loop = ("spam ham " * 40).trim                  // one bigram dominates
    val clean = ("the quick brown fox jumps over the lazy dog and it " +
      "was for a good reason that all of those words keep going in " +
      "sentences full of normal varied prose about many different things " +
      "with the usual mix of it is that was for and to in the end") // > 50 words
    val docs = Seq(
      (1L, clean), (2L, loop), (3L, "short"), (4L, "")
    ).toDF("doc_id", "text")
    val gate = TextAnalysis.curationGate(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // cross-check the sorted-run fold against the shuffle formulation
    val rep = TextAnalysis.repetition(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3), r.getDouble(4))).toMap
    for (id <- Seq(1L, 2L, 3L, 4L)) {
      assert(gate(id).getLong(2) === rep(id)._1, s"n_bigrams doc $id")
      assert(gate(id).getDouble(3) === rep(id)._2, s"dup_bigram_frac doc $id")
      assert(gate(id).getDouble(4) === rep(id)._3, s"top_bigram_frac doc $id")
    }
    // and the gopher flag against gopherRules
    val gp = TextAnalysis.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("gopher_pass")).toMap
    for (id <- Seq(1L, 2L, 3L, 4L))
      assert(gate(id).getBoolean(1) === gp(id), s"gopher_pass doc $id")
    // the loop doc fails repetition outright, so its keep flag is false
    assert(!gate(2L).getBoolean(5))
    assert(!gate(2L).getAs[Boolean]("keep"))
    // keep ≡ gopher_pass ∧ rep_pass on every row
    for (id <- Seq(1L, 2L, 3L, 4L))
      assert(gate(id).getAs[Boolean]("keep") ===
        (gate(id).getBoolean(1) && gate(id).getBoolean(5)), s"keep doc $id")
  }

  test("piiScan counts and redacts each pattern type; clean text untouched") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (1L, "contact alice@example.com or bob@test.org, call 555-123-4567"),
      (2L, "server at 10.0.0.1 leaked card 4111111111111111 yesterday"),
      (3L, "perfectly clean prose with no identifiers at all")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiScan(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("n_emails") === 2)
    assert(out(1L).getAs[Int]("n_phones") === 1)
    assert(out(1L).getAs[Boolean]("any_pii"))
    val red1 = out(1L).getAs[String]("redacted")
    assert(red1.contains("<EMAIL>") && red1.contains("<PHONE>") &&
      !red1.contains("alice@") && !red1.contains("555-123"))
    assert(out(2L).getAs[Int]("n_ips") === 1)
    assert(out(2L).getAs[Int]("n_cards") === 1)
    val red2 = out(2L).getAs[String]("redacted")
    assert(red2.contains("<IP>") && red2.contains("<CARD>") &&
      !red2.contains("4111111111111111"))
    assert(!out(3L).getAs[Boolean]("any_pii"))
    assert(out(3L).getAs[String]("redacted") ===
      "perfectly clean prose with no identifiers at all")
  }

  test("classifierScore equals a driver-side recomputation with the same " +
    "hash and weights; wordless docs are excluded") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (1L, "the quick brown fox"), (2L, "spark join query"), (3L, "...")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.classifierScore(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(!out.contains(3L), "no-word doc excluded")
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 15), 16)
    }
    def expected(text: String): (Int, Double, Boolean) = {
      val ws = text.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .replaceAll(" +", " ").trim.split(" ").filter(_.nonEmpty)
      val sum = ws.foldLeft(0.0)((acc, w) => acc +
        TextAnalysis.classifierWeights((h60(w) % TextAnalysis.ClassifierBuckets).toInt))
      (ws.length,
        BigDecimal(sum / ws.length).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        sum > 0)
    }
    assert(out(1L) === expected("the quick brown fox"))
    assert(out(2L) === expected("spark join query"))
  }

  test("vocabCoverage ranks by frequency and its cumulative share " +
    "reaches 1.0 over the full vocabulary") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (1L, "alpha alpha alpha beta beta gamma"),
      (2L, "alpha beta delta")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.vocabCoverage(docs, topK = 10).orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // alpha 4, beta 3, delta 1, gamma 1 (ties alphabetical)
    assert(out.map(t => (t._2, t._3)).toSeq ===
      Seq(("alpha", 4L), ("beta", 3L), ("delta", 1L), ("gamma", 1L)))
    assert(out.head._4 === 0.444444) // round(4/9, 6)
    assert(out.last._4 === 1.0)
    // topK cutting THROUGH the cnt=1 tie group: the UTF8-asc tiebreak
    // decides who survives (delta in, gamma out) — and the cumulative
    // share still reads ranks 1..3 only
    val cut = TextAnalysis.vocabCoverage(docs, topK = 3).orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(cut.map(t => (t._2, t._3)).toSeq ===
      Seq(("alpha", 4L), ("beta", 3L), ("delta", 1L)))
    assert(cut.last._4 === 0.888889) // round(8/9, 6)
  }

  test("corpusReport aggregates agree with its constituent operators") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val r = TextAnalysis.corpusReport(docs).collect().head
    assert(r.getAs[Long]("n_docs") === docs.count())
    assert(r.getAs[Long]("n_keep") ===
      TextAnalysis.curationGate(docs).filter(col("keep")).count())
    assert(r.getAs[Long]("n_pii") ===
      TextAnalysis.piiScan(docs).filter(col("any_pii")).count())
    assert(r.getAs[Long]("n_dup_groups") ===
      Dedup.exactDedup(docs).filter(col("n_copies") > 1).count())
    assert(r.getAs[Double]("keep_rate") >= 0.0 && r.getAs[Double]("keep_rate") <= 1.0)
  }

  test("tokenDrift surfaces source-exclusive tokens first, applies the " +
    "minCount floor, and breaks ratio ties by token ASC") {
    val spark2 = spark
    import spark2.implicits._
    // two sources, 50/50 token mass; "zebra" and "yak" are exclusive to
    // src_a (ratio = total/src_tot = 2.0, the max), "rare" appears only
    // twice (< minCount=3) and must not chart; shared filler is ratio 1
    val shared = (1 to 10).map(i => s"common$i").mkString(" ")
    val corpus = Seq(
      (1L, s"zebra zebra zebra yak yak yak rare rare $shared", "src_a"),
      (2L, s"$shared $shared", "src_a"),
      (3L, s"$shared $shared $shared", "src_b"),
      (4L, shared, "src_b")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.tokenDrift(corpus, k = 3, minCount = 3L).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // src_a rank 1/2: the exclusive tokens, tie broken yak < zebra
    assert(out(("src_a", 1))._1 === "yak")
    assert(out(("src_a", 2))._1 === "zebra")
    // exclusive ⇒ cnt == corp_cnt and ratio == total/src_tot exactly
    val (_, yakCnt, yakCorp, yakRatio) = out(("src_a", 1))
    assert(yakCnt === 3L && yakCorp === 3L)
    assert(yakRatio > 1.0)
    // "rare" (cnt=2 < minCount) never appears at any rank
    assert(!out.values.exists(_._1 == "rare"))
    // every charted ratio is >= its source's later ranks (ordering holds)
    Seq("src_a", "src_b").foreach { s =>
      val rs = out.collect { case ((`s`, rk), v) => (rk, v._4) }.toSeq.sortBy(_._1)
      assert(rs === rs.sortBy(-_._2) ||
        rs.map(_._2).sliding(2).forall(p => p.head >= p.last))
    }
  }

  test("clusterTopics names planted embedding clusters by their " +
    "exclusive vocabulary, shared filler stays off the board") {
    val spark2 = spark
    import spark2.implicits._
    // two well-separated directions; vec 0/1 are the seed centroids
    // (the seed contract: first nCells vec_ids), members lean to one
    def v(x: Float, y: Float) = Array(x, y, 0.1f, 0.1f)
    val emb = Seq(
      (0L, v(1f, 0f)), (1L, v(0f, 1f)),
      (2L, v(0.9f, 0.1f)), (3L, v(0.95f, 0.05f)),
      (4L, v(0.1f, 0.9f)), (5L, v(0.05f, 0.95f))
    ).toDF("vec_id", "embedding")
    val shared = (1 to 8).map(i => s"common$i").mkString(" ")
    val aText = s"apple apple apple banana banana banana $shared"
    val bText = s"zebra zebra zebra yak yak yak $shared"
    val docs = Seq(
      (0L, aText), (2L, aText), (3L, aText),
      (1L, bText), (4L, bText), (5L, bText)
    ).toDF("doc_id", "text")
    val out = TextAnalysis.clusterTopics(docs, emb, nCells = 2, k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    // cluster 0 (the x-direction) is named by its exclusive tokens,
    // ratio ties broken token ASC: apple before banana
    assert(out((0L, 1)) === "apple" && out((0L, 2)) === "banana")
    assert(out((1L, 1)) === "yak" && out((1L, 2)) === "zebra")
    // the shared filler (ratio 1) never out-ranks exclusive vocabulary
    assert(!out.values.exists(_.startsWith("common")))
  }

  test("collocations surfaces the planted phrase first and matches a " +
    "brute-force lift reference exactly") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(89)
    val filler = Vector("the", "of", "and", "data", "model", "train")
    // "santa monica" ALWAYS adjacent (the planted phrase); filler words
    // pair arbitrarily, so their lifts hover near 1
    val corpus = (0 until 30).map { i =>
      val body = (0 until 12).flatMap { _ =>
        if (rnd.nextInt(4) == 0) Seq("santa", "monica")
        else Seq(filler(rnd.nextInt(filler.size)))
      }
      (i.toLong, body.mkString(" "))
    }.toDF("doc_id", "text")
    val got = TextAnalysis.collocations(corpus, k = 10, minCount = 5L)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).sortBy(_._1)
    // brute reference over the same tokenization (texts are already
    // normalized lowercase words)
    val docsW = corpus.collect().map(_.getString(1).split(" ").toSeq)
    val uni = docsW.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = uni.values.sum
    val bgAll = docsW.flatMap(ws => ws.zip(ws.tail).map(p => s"${p._1} ${p._2}"))
    val bc = bgAll.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val b = bgAll.size.toLong
    val ref = bc.filter(_._2 >= 5L).map { case (bg, cab) =>
      val Array(wa, wb) = bg.split(" ")
      (bg, cab, uni(wa), uni(wb),
        (cab.toDouble * n * n) / (b.toDouble * uni(wa) * uni(wb)))
    }.toSeq.sortBy { case (bg, _, _, _, lift) => (-lift, bg) }.take(10)
      .zipWithIndex
      .map { case ((bg, cab, ca, cb, lift), i) => (i + 1, bg, cab, ca, cb, lift) }
    assert(got.toSeq === ref)
    // the planted phrase leads: always-adjacent ⇒ lift well above the
    // independence baseline every filler pair sits near
    assert(got.head._2 === "santa monica", s"board: ${got.toSeq}")
    assert(got.head._6 > 2.0)
  }

  test("filterFunnel: one doc drops at each stage, counts/tokens/rates " +
    "walk down the board") {
    val spark2 = spark
    import spark2.implicits._
    // a 60-word gate-passing body: distinct bigrams, 30 stopword hits,
    // avg word length 3.0, zero punctuation
    val good = (1 to 15)
      .map(i => f"the w$i%02d and x$i%02d").mkString(" ")
    val funnel = Seq(
      1L -> good,                                  // survives everything
      2L -> "",                                    // out at 2_nonempty
      3L -> (1 to 60).map(i => f"xq$i%02d").mkString(" "), // no stopwords → gopher
      4L -> Seq.fill(30)("the cat").mkString(" "), // repetitive → repetition
      5L -> ("the the " +                          // comma-heavy → quality < 0.5
        (1 to 58).map(i => f"w$i%02d ,,").mkString(" ")),
      6L -> (good + " contact me at john@example.com now"), // PII
      7L -> good                                   // exact dup of 1 → dedup
    ).toDF("doc_id", "text")
    val out = TextAnalysis.filterFunnel(funnel).collect()
      .sortBy(_.getAs[Int]("stage_idx"))
    assert(out.map(_.getAs[String]("stage")).toSeq === Seq("1_ingested",
      "2_nonempty", "3_gopher", "4_repetition", "5_quality", "6_pii",
      "7_exact_dedup"))
    assert(out.map(_.getAs[Long]("n_docs")).toSeq ===
      Seq(7L, 6L, 5L, 4L, 3L, 2L, 1L))
    // survival is vs ingested, step is vs the previous stage
    def r4(x: Double) = math.round(x * 1e4) / 1e4
    assert(out.map(_.getAs[Double]("survival_rate")).toSeq ===
      Seq(1.0, r4(6.0 / 7), r4(5.0 / 7), r4(4.0 / 7), r4(3.0 / 7),
        r4(2.0 / 7), r4(1.0 / 7)))
    assert(out.map(_.getAs[Double]("step_keep_rate")).toSeq ===
      Seq(1.0, r4(6.0 / 7), r4(5.0 / 6), r4(4.0 / 5), r4(3.0 / 4),
        r4(2.0 / 3), r4(1.0 / 2)))
    // token accounting: stage 1 holds the whole corpus, the final
    // stage exactly the one surviving doc
    val toks = funnel.select(sum(ceil(length(col("text")) / 4)))
      .first().getLong(0)
    assert(out.head.getAs[Long]("n_toks") === toks)
    assert(out.last.getAs[Long]("n_toks") ===
      math.ceil(good.length / 4.0).toLong)
    // monotone: a funnel can only shrink
    val docsSeq = out.map(_.getAs[Long]("n_docs")).toSeq
    assert(docsSeq === docsSeq.sorted.reverse)
  }

  test("gateAgreement: a balanced 2x2 yields kappa 0, identical gates " +
    "yield kappa 1") {
    val spark2 = spark
    import spark2.implicits._
    val good = (1 to 15)
      .map(i => f"the w$i%02d and x$i%02d").mkString(" ")  // both pass
    val gateOnly = "the the " +                 // gopher+rep pass, quality .454
      (1 to 58).map(i => f"w$i%02d ,,").mkString(" ")
    val qualityOnly = ((1 to 7)                 // 30 words: quality exactly .5,
      .map(i => f"the w$i%02d and x$i%02d") :+ "the w08")  // gopher n<50 fails
      .mkString(" ")
    val docs = Seq(
      1L -> good, 2L -> gateOnly, 3L -> qualityOnly, 4L -> ""
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gateAgreement(docs).collect().head
    assert((r.getAs[Long]("n_docs"), r.getAs[Long]("both_pass"),
      r.getAs[Long]("gate_only"), r.getAs[Long]("quality_only"),
      r.getAs[Long]("neither")) === ((4L, 1L, 1L, 1L, 1L)))
    // po = 1/2, pe = (1/2)(1/2)+(1/2)(1/2) = 1/2 → zero chance-corrected
    // agreement despite 50% raw agreement
    assert(r.getAs[Double]("p_obs") === 0.5)
    assert(r.getAs[Double]("p_chance") === 0.5)
    assert(r.getAs[Double]("kappa") === 0.0)
    // perfectly-aligned gates: κ = 1
    val aligned = Seq(1L -> good, 2L -> "").toDF("doc_id", "text")
    val r2 = TextAnalysis.gateAgreement(aligned).collect().head
    assert(r2.getAs[Double]("p_obs") === 1.0)
    assert(r2.getAs[Double]("kappa") === 1.0)
  }

  test("bpeFertility: global merges, per-language application — the " +
    "served language compresses, the unserved one keeps fertility 1:1") {
    val spark2 = spark
    import spark2.implicits._
    // en reuses the q139/q142 fixture (merges th→A, Ae→B, Aa→C);
    // xx is single-char words: no pairs, untouched by every merge
    val docs = Seq(
      (1L, "the the the", "en"), (2L, "then than at", "en"),
      (3L, "z z z z", "xx")
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.bpeFertility(docs, iters = 3, minCount = 1L)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("raw_chars"),
          r.getAs[Long]("merged_symbols"), r.getAs[Double]("fert_raw"),
          r.getAs[Double]("fert_merged"), r.getAs[Double]("saved_frac"))).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // en: the×3→B(1), then→Bn(2), than→Cn(2), at(2) = 9 symbols of 19
    assert(out("en") === ((6L, 19L, 9L,
      r6(19.0 / 6), r6(9.0 / 6), r6(10.0 / 19))))
    // xx: no merge applies — fertility stays exactly 1 char/word
    assert(out("xx") === ((4L, 4L, 4L, 1.0, 1.0, 0.0)))
  }

  test("curationGate plans zero exchanges — the joint filter runs scan-side") {
    val df = TextAnalysis.curationGate(
      graft.Tables.documents(spark, "/root/testdata/sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    // widen's round-robin repartition is layout-only; beyond it there
    // must be NO hashpartitioning exchange (no groupBy/join anywhere)
    assert(!plan.contains("hashpartitioning"),
      s"expected no aggregation/join shuffle in:\n$plan")
  }

  test("lengthHistogram: exact power-of-two boundaries, per-lang shares") {
    val spark2 = spark
    import spark2.implicits._
    def text(n: Int) = Seq.fill(n)("w").mkString(" ")
    val df = Seq(
      (1L, text(1), "en"),   // bucket_lo 1 (1 ≤ t < 2)
      (2L, text(2), "en"),   // bucket_lo 2 — lower boundary inclusive
      (3L, text(3), "en"),   // bucket_lo 2 — upper boundary exclusive
      (4L, text(4), "en"),   // bucket_lo 4
      (5L, text(64), "en"),  // bucket_lo 64
      (6L, text(63), "fr"),  // bucket_lo 32
      (7L, "   ", "fr")      // zero tokens → excluded
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.lengthHistogram(df).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("bucket_lo")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("share"))).toMap
    assert(out === Map(
      ("en", 1L) -> ((1L, 0.2)),
      ("en", 2L) -> ((2L, 0.4)),
      ("en", 4L) -> ((1L, 0.2)),
      ("en", 64L) -> ((1L, 0.2)),
      ("fr", 32L) -> ((1L, 1.0))))
    // shares sum to 1 within every language
    val sums = TextAnalysis.lengthHistogram(df).collect()
      .groupBy(_.getAs[String]("lang"))
      .view.mapValues(_.map(_.getAs[Double]("share")).sum).toMap
    assert(sums.values.forall(s => math.abs(s - 1.0) < 1e-12))
  }

  test("sourceQuality reconciles with per-doc q34 quality") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs on", "en", "a"),
      (2L, "x. y. z. w.", "en", "a"),  // punct-heavy, short → low quality
      (3L, "the data of the table in the row of it that was a", "en", "b")
    ).toDF("doc_id", "text", "lang", "source")
    // reference: mean/gate from qualityScore's own per-doc column
    val perDoc = TextAnalysis.qualityScore(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
    val out = TextAnalysis.sourceQuality(df).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("mean_quality"),
          r.getAs[Long]("n_good"), r.getAs[Double]("good_share"))).toMap
    val aMean = (perDoc(1L) + perDoc(2L)) / 2
    assert(math.abs(out("a")._2 - aMean) < 5e-5)
    assert(out("a")._1 === 2L)
    assert(out("a")._3 === Seq(perDoc(1L), perDoc(2L)).count(_ >= 0.5))
    assert(out("b") === ((1L, perDoc(3L), if (perDoc(3L) >= 0.5) 1L else 0L,
      if (perDoc(3L) >= 0.5) 1.0 else 0.0)))
  }

  test("sourcePii reconciles with per-doc piiScan and rates divide " +
    "exactly") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (1L, "reach me at bob@example.com or 555-123-4567", "en", "a"),
      (2L, "clean text with no identifiers at all", "en", "a"),
      (3L, "server 10.0.0.1 and card 4111111111111111", "en", "b"),
      (4L, "also clean", "en", "b"),
      (5L, "two mails x@y.io z@w.co", "en", "b")
    ).toDF("doc_id", "text", "lang", "source")
    val perDoc = TextAnalysis.piiScan(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_emails"), r.getAs[Boolean]("any_pii"))).toMap
    val out = TextAnalysis.sourcePii(df).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_pii_docs"),
          r.getAs[Long]("tot_emails"), r.getAs[Double]("pii_rate"))).toMap
    assert(out("a") === ((2L, 1L, 1L, 0.5)))
    assert(out("b") === ((3L, 2L, 2L, 0.6667)))
    // totals are the sum of the per-doc scan's counts
    assert(out("a")._3 === perDoc(1L)._1 + perDoc(2L)._1)
    assert(out("b")._3 === Seq(3L, 4L, 5L).map(perDoc(_)._1).sum)
  }

  test("scoreCalibration reconciles with the q74 and q34 boards and " +
    "flags monotonicity per bucket") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(5)
    val vocab = Seq("the", "data", "table", "row", "query", "spark",
      "join", "fast", "slow", "clean")
    val df = (1L to 40L).map { i =>
      (i, Seq.fill(5 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "), "en", "a")
    }.toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.scoreCalibration(df).collect()
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("mean_score"),
          r.getAs[Double]("mean_quality"), r.getAs[Boolean]("monotone_ok")))
      .toMap
    // reference: aggregate the q74 scores and q34 qualities directly
    val scores = TextAnalysis.classifierScore(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    val quals = TextAnalysis.qualityScore(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
    def bucketOf(s: Double) =
      math.min(math.max(math.floor((s + 1.0) * 5.0).toLong, 0L), 9L)
    val ref = scores.groupBy { case (id, s) => bucketOf(s) }
      .view.mapValues { m =>
        val ids = m.keys.toSeq
        def r4(x: Double) = math.floor(x * 10000d + 0.5d) / 10000d
        (ids.size.toLong,
          r4(ids.map(scores).map(BigDecimal(_)).sum.toDouble / ids.size),
          r4(ids.map(quals).map(BigDecimal(_)).sum.toDouble / ids.size))
      }.toMap
    assert(out.keySet === ref.keySet)
    ref.foreach { case (b, (n, ms, mq)) =>
      assert(out(b)._1 === n, s"bucket $b n")
      assert(out(b)._2 === ms, s"bucket $b mean_score")
      assert(out(b)._3 === mq, s"bucket $b mean_quality")
    }
    // the flag restates the lag comparison over bucket order
    val ordered = out.toSeq.sortBy(_._1)
    ordered.zipWithIndex.foreach { case ((b, (_, _, mq, ok)), i) =>
      val expected = i == 0 || mq >= ordered(i - 1)._2._3
      assert(ok === expected, s"bucket $b monotone_ok")
    }
  }

  test("bpeMerges counts word-weighted adjacent pairs, keeps in-word " +
    "duplicates, and ranks (cnt DESC, pair ASC)") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      // "aaa" → pairs aa,aa (duplicate kept) per occurrence; ×3 docs
      (1L, "aaa bc", "en"),
      (2L, "aaa bc", "en"),
      (3L, "aaa cb", "en"),
      (4L, "x", "en")        // 1-char word contributes no pair
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.bpeMerges(df, k = 10, minCount = 1L).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("pair"),
        r.getAs[Long]("cnt")))
    // aa: 2 per "aaa" × 3 = 6; bc ×2; cb ×1
    assert(out === Seq((1, "aa", 6L), (2, "bc", 2L), (3, "cb", 1L)))
    // minCount floor drops the singleton pair
    val floored = TextAnalysis.bpeMerges(df, k = 10, minCount = 2L).collect()
      .map(_.getAs[String]("pair"))
    assert(floored === Seq("aa", "bc"))
  }

  test("bpeApply: actual non-overlapping applications vs the q129 " +
    "estimate — run-heavy pairs show overlap excess, clean pairs none") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      // "aaaa" estimate counts aa 3×/occurrence; one left-to-right
      // pass applies it twice ("aaaa" -> "@@")
      (1L, "aaaa bc", "en"),
      (2L, "aaaa bc", "en"),
      (3L, "abca cb", "en")
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.bpeApply(df, k = 10, minCount = 1L).collect()
      .map(r => r.getAs[String]("pair") ->
        (r.getAs[Long]("est_cnt"), r.getAs[Long]("n_applications"),
          r.getAs[Long]("n_words"), r.getAs[Long]("overlap_excess"))).toMap
    // aa: est = 3×2 = 6, actual = 2×2 = 4, one distinct word touched
    assert(out("aa") === ((6L, 4L, 1L, 2L)))
    // bc: est = 2 ("aaaa bc"×2) + 1 ("abca") = 3, actual = 3, no runs
    assert(out("bc") === ((3L, 3L, 2L, 0L)))
    // every pair: actual ≤ estimate
    out.values.foreach { case (est, act, _, excess) =>
      assert(act <= est && excess === est - act)
    }
  }

  test("bpeLoop: three mine→apply→re-mine rounds — merged symbols feed " +
    "later pairs, decoded spellings expand through the chain") {
    val spark2 = spark
    import spark2.implicits._
    // vocab: the×3, then×1, than×1, at×1
    //   iter 1: th:5 he:4 en:1 ha:1 an:1 at:1       → th (5)
    //   rewrite A=th: Ae×3, Aen, Aan, at
    //   iter 2: Ae:4 en:1 Aa:1 an:1 at:1            → Ae (4) = "the"
    //   rewrite B=Ae: B×3, Bn, Aan, at
    //   iter 3: Bn:1 Aa:1 an:1 at:1 — tie at 1      → Aa ('A' < 'a')
    val docs = Seq(
      (1L, "the the the", "en"), (2L, "then than at", "en")
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.bpeLoop(docs, iters = 3, minCount = 1L).collect()
      .map(r => (r.getAs[Int]("iter"), r.getAs[String]("pair"),
        r.getAs[String]("decoded"), r.getAs[Long]("cnt")))
    assert(out === Seq(
      (1, "th", "th", 5L),
      (2, "Ae", "the", 4L),
      (3, "Aa", "tha", 1L)))
    // the guard raises when a round has no pair above the floor
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.bpeLoop(docs, iters = 3, minCount = 2L)
    }
    assert(e.getMessage.contains("no pair meets minCount"))
  }

  test("bpeCompression: per-iteration symbol totals shrink by the " +
    "merge's actual application count; ratio is the r6'd division") {
    val spark2 = spark
    import spark2.implicits._
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    // same corpus as the bpeLoop fixture: the×3, then, than, at
    //   base: 3·3 + 4 + 4 + 2 = 19 symbols
    //   merge th→A: Ae×3(6) Aen(3) Aan(3) at(2) = 14, saved 5
    //   merge Ae→B: B×3(3) Bn(2) Aan(3) at(2) = 10, saved 4
    //   merge Aa→C: B×3(3) Bn(2) Cn(2) at(2) = 9,  saved 1
    val docs = Seq(
      (1L, "the the the", "en"), (2L, "then than at", "en")
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.bpeCompression(docs, iters = 3, minCount = 1L)
      .collect()
      .map(r => (r.getAs[Int]("iter"), Option(r.getAs[String]("pair")),
        r.getAs[Long]("total_symbols"), r.getAs[Long]("saved"),
        r.getAs[Double]("ratio")))
    assert(out === Seq(
      (0, None, 19L, 0L, 1.0),
      (1, Some("th"), 14L, 5L, r6(14.0 / 19)),
      (2, Some("Ae"), 10L, 4L, r6(10.0 / 19)),
      (3, Some("Aa"), 9L, 1L, r6(9.0 / 19))))
    // totals tile: every saved symbol is accounted for
    assert(out.map(_._4).sum === 19L - 9L)
  }

  test("lmFluency: bigram LM trained on the train split scores every doc " +
    "with exact smoothed probabilities; OOV maps to <unk>") {
    val spark2 = spark
    import spark2.implicits._
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    // ids 1/2/4 hash to the train split, 3 to test, 5 to val (md5
    // consistent hashing — the same assignment q140 publishes)
    val docs = Seq(
      (1L, "a b a b c"), (2L, "a b a b c"), (4L, "a b a b c"),
      (3L, "a b a b c"), // test: scored by a model that never saw it
      (5L, "z b")        // val: OOV context
    ).toDF("doc_id", "text")
    // sanity: the fixture's split assumption holds under q140
    val split = Curation.hashSplit(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(split === Map(1L -> "train", 2L -> "train", 4L -> "train",
      3L -> "test", 5L -> "val"))
    // train LM (k=3 train docs, vocabSize=2): unigrams a:6 b:6 c:3 →
    // vocab {a,b}, unk_cnt=3; bigrams "a b":6 "b a":3 "b <unk>":3
    val out = TextAnalysis.lmFluency(docs, vocabSize = 2, maxBigrams = 100)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_hits"),
          r.getAs[Long]("n_unk_ctx"), r.getAs[Double]("hit_rate"),
          r.getAs[Double]("mean_p"))).toMap
    // "a b a b c": bigrams (a b)(b a)(a b)(b c→b <unk>), all in model;
    // denominators c1+V+1 = 6+3 = 9
    val p9 = Seq(7.0 / 9, 4.0 / 9, 7.0 / 9, 4.0 / 9)
      .map(p => math.floor(p * 1e9 + 0.5))
    val meanP = r6(p9.sum / (4 * 1e9))
    for (id <- Seq(1L, 2L, 3L, 4L))
      assert(out(id) === ((4L, 4L, 0L, 1.0, meanP)), s"doc $id")
    // "z b": one bigram "<unk> b" — unseen (train had no unk context);
    // p = (0+1)/(unk_cnt+3) = 1/6
    assert(out(5L) === ((1L, 0L, 1L, 0.0,
      r6(math.floor(1.0 / 6 * 1e9 + 0.5) / 1e9))))
  }

  test("lmFluency property: 40 random docs match an independent Scala " +
    "reference (split, vocab/bigram cutoffs, smoothing, rounding)") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val docs = (1L to 40L).map { id =>
      (id, Seq.fill(rnd.nextInt(7))(alphabet(rnd.nextInt(alphabet.size)))
        .mkString(" "))
    }
    val V = 3; val B = 5
    // ---- independent reference ----
    def u(id: Long): Double = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16) / math.pow(2, 60)
    val toks = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
    val train = docs.map(_._1).filter(id => u(id) < 0.8)
    val wordCnt = train.flatMap(toks).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val vocab = wordCnt.toSeq.sortBy { case (w, c) => (-c, w) }.take(V).toMap
    val unkCnt = wordCnt.values.sum - vocab.values.sum
    def m(w: String) = if (vocab.contains(w)) w else "<unk>"
    val bigCnt = train.flatMap(id => toks(id).sliding(2).filter(_.size == 2)
        .map(p => s"${m(p.head)} ${m(p(1))}"))
      .groupBy(identity).map { case (b, bs) => b -> bs.size.toLong }
      .toSeq.sortBy { case (b, c) => (-c, b) }.take(B).toMap
    def p9(c2: Long, c1: Long): Long =
      math.floor((c2 + 1).toDouble / (c1 + V + 1).toDouble * 1e9 + 0.5).toLong
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val expected = docs.flatMap { case (id, _) =>
      val ws = toks(id)
      if (ws.size < 2) None else {
        val bgs = ws.sliding(2).toSeq.map(p => (m(p.head), m(p(1)),
          vocab.getOrElse(p.head, unkCnt)))
        val n = bgs.size.toLong
        val hits = bgs.count { case (a, b, _) => bigCnt.contains(s"$a $b") }
        val unk = bgs.count(_._1 == "<unk>")
        val sp9 = bgs.map { case (a, b, c1) =>
          p9(bigCnt.getOrElse(s"$a $b", 0L), c1) }.sum
        Some(id -> ((n, hits.toLong, unk.toLong,
          r6(hits.toDouble / n), r6(sp9.toDouble / (n.toDouble * 1e9)))))
      }
    }.toMap
    // ---- engine ----
    val out = TextAnalysis.lmFluency(docs.toDF("doc_id", "text"),
        vocabSize = V, maxBigrams = B)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_hits"),
          r.getAs[Long]("n_unk_ctx"), r.getAs[Double]("hit_rate"),
          r.getAs[Double]("mean_p")))).toMap
    assert(out === expected)
    // the random corpus actually exercises the interesting paths
    assert(expected.values.exists(_._3 > 0), "no unk contexts generated")
    assert(expected.values.exists(v => v._2 < v._1), "no bigram misses")
  }

  test("lmBackoff property: 40 random docs match an independent Scala " +
    "reference (MLE hits with the shipped-table cutoff, exact 2/5 " +
    "unigram backoff, fixed-point rounding)") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(47)
    val alphabet = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val docs = (1L to 40L).map { id =>
      (id, Seq.fill(rnd.nextInt(7))(alphabet(rnd.nextInt(alphabet.size)))
        .mkString(" "))
    }
    val V = 3; val B = 5
    // ---- independent reference (the q162 property-test discipline) ----
    def u(id: Long): Double = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16) / math.pow(2, 60)
    val toks = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
    val train = docs.map(_._1).filter(id => u(id) < 0.8)
    val wordCnt = train.flatMap(toks).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val vocab = wordCnt.toSeq.sortBy { case (w, c) => (-c, w) }.take(V).toMap
    val tTot = wordCnt.values.sum
    val unkCnt = tTot - vocab.values.sum
    def m(w: String) = if (vocab.contains(w)) w else "<unk>"
    def uniCnt(w: String) = vocab.getOrElse(w, unkCnt)
    val bigCnt = train.flatMap(id => toks(id).sliding(2).filter(_.size == 2)
        .map(p => s"${m(p.head)} ${m(p(1))}"))
      .groupBy(identity).map { case (b, bs) => b -> bs.size.toLong }
      .toSeq.sortBy { case (b, c) => (-c, b) }.take(B).toMap
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    def s9(w1: String, w2: String): (Boolean, Long) =
      bigCnt.get(s"${m(w1)} ${m(w2)}") match {
        case Some(c2) => (true, math.floor(
          c2.toDouble / uniCnt(w1).toDouble * 1e9 + 0.5).toLong)
        case None => (false, math.floor(
          (2L * uniCnt(w2)).toDouble / (5L * tTot).toDouble * 1e9 + 0.5)
          .toLong)
      }
    val expected = docs.flatMap { case (id, _) =>
      val ws = toks(id)
      if (ws.size < 2) None else {
        val scs = ws.sliding(2).toSeq.map(p => s9(p.head, p(1)))
        val n = scs.size.toLong
        val hits = scs.count(_._1).toLong
        Some(id -> ((n, hits, n - hits, r6(hits.toDouble / n),
          r6(scs.map(_._2).sum.toDouble / (n.toDouble * 1e9)))))
      }
    }.toMap
    // ---- engine ----
    val out = TextAnalysis.lmBackoff(docs.toDF("doc_id", "text"),
        vocabSize = V, maxBigrams = B)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_hits"),
          r.getAs[Long]("n_backoff"), r.getAs[Double]("hit_rate"),
          r.getAs[Double]("mean_s")))).toMap
    assert(out === expected)
    // the random corpus exercises BOTH scoring paths and the unk bucket
    assert(expected.values.exists(_._2 > 0), "no model hits generated")
    assert(expected.values.exists(_._3 > 0), "no backoffs generated")
    assert(docs.exists { case (_, t) =>
      t.split(" ").filter(_.nonEmpty).exists(!vocab.contains(_)) },
      "no out-of-vocab tokens generated")
  }

  test("q162 ↔ q171 reconciliation: same gate geometry ⇒ identical " +
    "per-doc bigram and model-hit counts (only the scores differ)") {
    val spark2 = spark
    import spark2.implicits._
    // both boards ship the top-V vocab + top-B bigram table built the
    // same way, and 'hit' means the same thing (bigram in the shipped
    // table) — n_bigrams and n_hits must agree doc for doc, which
    // pins the two independent model builds against each other
    val rnd = new scala.util.Random(53)
    val alphabet = Vector("aa", "bb", "cc", "dd", "ee")
    val docs = (1L to 30L).map { id =>
      (id, Seq.fill(2 + rnd.nextInt(8))(alphabet(rnd.nextInt(alphabet.size)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_hits")))).toMap
    val fl = key(TextAnalysis.lmFluency(docs, vocabSize = 3, maxBigrams = 4))
    val bo = key(TextAnalysis.lmBackoff(docs, vocabSize = 3, maxBigrams = 4))
    assert(fl === bo)
    assert(fl.nonEmpty)
  }

  test("domainReweight boosts the source the LM finds least fluent, " +
    "with an exactly-normalized weight column") {
    val spark2 = spark
    import spark2.implicits._
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    // the lmFluency fixture with sources: S1 = fluent (its docs ARE
    // the train slice), S2 = one OOV-heavy val doc
    val docs = Seq(
      (1L, "a b a b c", "S1"), (2L, "a b a b c", "S1"),
      (4L, "a b a b c", "S1"), (3L, "a b a b c", "S1"),
      (5L, "z b", "S2")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.domainReweight(docs, vocabSize = 2,
        maxBigrams = 100, alpha = 10d)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    // hand-derived LM (same as the lmFluency spec): per fluent doc
    // sp9 = 2·p9(7/9) + 2·p9(4/9); the OOV doc scores p9(1/6)
    def p9(p: Double): Long = math.floor(p * 1e9 + 0.5).toLong
    val spDoc = 2 * p9(7.0 / 9) + 2 * p9(4.0 / 9)
    val s1Mean = r6(4.0 * spDoc / (16 * 1e9))
    val s2Mean = r6(p9(1.0 / 6).toDouble / 1e9)
    val corpusMean = r6((4.0 * spDoc + p9(1.0 / 6)) / (17 * 1e9))
    assert(out("S1").getAs[Double]("mean_p") === s1Mean)
    assert(out("S2").getAs[Double]("mean_p") === s2Mean)
    // S1 is ABOVE the corpus mean → zero excess, weight ∝ share
    assert(out("S1").getAs[Double]("excess") === 0.0)
    val s2Excess = math.max(0.0, corpusMean - s2Mean)
    assert(out("S2").getAs[Double]("excess") === r6(s2Excess))
    val w1 = r6(20.0 / 22 * (1.0 + 10.0 * 0.0))
    val w2 = r6(2.0 / 22 * (1.0 + 10.0 * s2Excess))
    assert(out("S1").getAs[Double]("raw_weight") === w1)
    assert(out("S2").getAs[Double]("raw_weight") === w2)
    // normalized: exact-decimal sum of the r6 raw weights
    val wtot = (BigDecimal(w1).setScale(6, BigDecimal.RoundingMode.HALF_UP) +
      BigDecimal(w2).setScale(6, BigDecimal.RoundingMode.HALF_UP)).toDouble
    assert(out("S1").getAs[Double]("weight") === r6(w1 / wtot))
    assert(out("S2").getAs[Double]("weight") === r6(w2 / wtot))
    // the boost is real: S2's weight share exceeds its token share
    assert(out("S2").getAs[Double]("weight") >
      out("S2").getAs[Double]("share"))
  }

  test("domainReweight keeps a bigram-less source on the board: " +
    "NULL mean_p, zero excess, share-only weight, weights sum to 1") {
    val spark2 = spark
    import spark2.implicits._
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    // S3's docs all have < 2 tokens → zero bigram rows; before the
    // left-join fix it vanished from the output while its tokens
    // still inflated toks_total, so published weights summed < 1
    val docs = Seq(
      (1L, "a b a b c", "S1"), (2L, "a b a b c", "S1"),
      (4L, "a b a b c", "S1"), (3L, "a b a b c", "S1"),
      (5L, "z b", "S2"),
      (6L, "q", "S3"), (7L, "r", "S3")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.domainReweight(docs, vocabSize = 2,
        maxBigrams = 100, alpha = 10d)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out.keySet === Set("S1", "S2", "S3"))
    val s3 = out("S3")
    assert(s3.getAs[Long]("n_bigrams") === 0L)
    assert(s3.isNullAt(s3.fieldIndex("mean_p")))
    assert(s3.getAs[Double]("excess") === 0.0)
    // share-only weight: 2 tokens of 24 total, no boost
    assert(s3.getAs[Double]("share") === r6(2.0 / 24))
    assert(s3.getAs[Double]("raw_weight") === r6(2.0 / 24))
    // the published mixture is a distribution again
    val wsum = out.values.map(r =>
      BigDecimal(r.getAs[Double]("weight"))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    assert(math.abs(wsum - 1.0) <= 3e-6)
  }

  test("signalCorrelation property: random scored frames match an " +
    "independent BigInt moment reference") {
    val spark2 = spark
    import spark2.implicits._
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    def s4(x: Double): Long = math.floor(x * 10000d + 0.5d).toLong
    val rnd = new scala.util.Random(11)
    def r4(): Double = rnd.nextInt(10000) / 10000.0
    val rows = (1 to 50).map { i =>
      (i.toLong, if (i % 2 == 0) "A" else "B",
        rnd.nextInt(200), r4(), r4(), r4())
    }
    val scored = rows
      .toDF("doc_id", "source", "n_words", "stop_ratio", "punct_ratio",
        "quality")
    val sigNames = Seq("n_words", "stop_ratio", "punct_ratio", "quality")
    // independent reference: BigInt moments, double cast, sqrt, r6
    val expected = rows.groupBy(_._2).flatMap { case (src, rs) =>
      val vecs = rs.map(r =>
        Seq(r._3.toLong, s4(r._4), s4(r._5), s4(r._6)))
      val n = BigInt(vecs.size)
      for {
        i <- sigNames.indices; j <- i + 1 until sigNames.size
      } yield {
        val xs = vecs.map(v => BigInt(v(i))); val ys = vecs.map(v => BigInt(v(j)))
        val sx = xs.sum; val sy = ys.sum
        val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
        val sxx = xs.map(a => a * a).sum; val syy = ys.map(b => b * b).sum
        val num = (n * sxy - sx * sy).toDouble
        val denx = (n * sxx - sx * sx).toDouble
        val deny = (n * syy - sy * sy).toDouble
        val corr = if (denx > 0 && deny > 0)
          Some(r6(num / (math.sqrt(denx) * math.sqrt(deny)))) else None
        (src, sigNames(i), sigNames(j)) -> corr
      }
    }
    val out = TextAnalysis.signalCorrelationFrom(scored).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("sig_a"),
        r.getAs[String]("sig_b")) ->
        Option(r.getAs[java.lang.Double]("corr")).map(_.toDouble)).toMap
    assert(out === expected.toMap)
    assert(out.size === 12) // 2 sources x C(4,2)
  }

  test("signalCorrelation: exact moments give r=1 on a linear pair and " +
    "NULL on zero-variance signals") {
    val spark2 = spark
    import spark2.implicits._
    // no stopwords, punctuation or digits → stop/punct signals are
    // constant 0 (zero variance → NULL corr) and quality is LINEAR in
    // n_words: q = 0.005·nw + 0.2 → s_quality = 2050/2100/2150 against
    // s_n_words = 1/2/3 → Pearson r = 1 exactly
    val docs = Seq(
      (1L, "alpha", "P"),
      (2L, "beta gamma", "P"),
      (3L, "delta epsilon zeta", "P")
    ).toDF("doc_id", "text", "source")
    val rows = TextAnalysis.signalCorrelation(docs).collect()
    assert(rows.length === 6) // C(4,2) pairs for the one source
    val m = rows.map(r => (r.getAs[String]("sig_a"), r.getAs[String]("sig_b"))
      -> Option(r.getAs[java.lang.Double]("corr")).map(_.toDouble)).toMap
    assert(rows.forall(_.getAs[Long]("n_docs") == 3L))
    assert(m(("n_words", "quality")) === Some(1.0))
    // every pair touching a constant signal is NULL, not 0
    for (p <- Seq(("n_words", "stop_ratio"), ("n_words", "punct_ratio"),
      ("stop_ratio", "punct_ratio"), ("stop_ratio", "quality"),
      ("punct_ratio", "quality")))
      assert(m(p) === None, s"pair $p")
  }
}
