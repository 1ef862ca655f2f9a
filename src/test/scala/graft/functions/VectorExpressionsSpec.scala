package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {

  def df = {
    val spark2 = spark
    import spark2.implicits._
    Seq(
      (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (2L, Array(1.0, 0.0), Array(0.0, 1.0)),
      (3L, Array(2.0, 0.0), Array(4.0, 0.0))
    ).toDF("id", "a", "b")
  }

  // reference implementation: the interpreted HOF fold the native
  // expressions replaced — kept here to pin bit-identical accumulation
  def foldDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  test("ArrayDot matches the built-in fold bit-for-bit") {
    val rows = df.select(
      VectorExpressions.dot(col("a"), col("b")).as("fast"),
      foldDot(col("a"), col("b")).as("slow")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("ArrayCosine matches the composed expression bit-for-bit") {
    val rows = df.select(
      VectorExpressions.cosineFused(col("a"), col("b")).as("fast"),
      (foldDot(col("a"), col("b")) /
        (sqrt(foldDot(col("a"), col("a"))) * sqrt(foldDot(col("b"), col("b"))))).as("slow"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("ArraySquaredL2 matches the built-in fold bit-for-bit, incl. random arrays") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (0 until 50).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextDouble() * 4 - 2),
        Array.fill(16)(rnd.nextDouble() * 4 - 2)))
      .toDF("id", "a", "b")
    val got = rows.select(
      VectorExpressions.squaredL2(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v).as("slow")).collect()
    got.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  // r21 float-reading kernels: a float32 element widened in-register
  // must produce the BIT-IDENTICAL double the former cast-the-array
  // plan produced, for every kernel and every float/double side mix
  test("float-reading kernels are bit-identical to the cast-array plan") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(43)
    val rows = (0 until 64).map { i =>
      val a = Array.fill(16)((rnd.nextDouble() * 4 - 2).toFloat)
      val b = Array.fill(16)((rnd.nextDouble() * 4 - 2).toFloat)
      (i.toLong, a, b)
    }.toDF("id", "fa", "fb")
    import graft.functions.PortableFuncs.toDoubleArray
    val cells = (0 until 4).map(k =>
      k.toLong -> Seq.fill(16)(rnd.nextDouble() * 2 - 1)).toSeq
    val got = rows.select(
      VectorExpressions.dot(col("fa"), col("fb")).as("dot_ff"),
      VectorExpressions.dot(toDoubleArray(col("fa")), toDoubleArray(col("fb"))).as("dot_dd"),
      VectorExpressions.dot(col("fa"), toDoubleArray(col("fb"))).as("dot_fd"),
      VectorExpressions.cosineFused(col("fa"), col("fb")).as("cos_ff"),
      VectorExpressions.cosineFused(toDoubleArray(col("fa")), toDoubleArray(col("fb"))).as("cos_dd"),
      VectorExpressions.squaredL2(col("fa"), col("fb")).as("l2_ff"),
      VectorExpressions.squaredL2(toDoubleArray(col("fa")), toDoubleArray(col("fb"))).as("l2_dd"),
      VectorExpressions.argMaxCosine(col("fa"), cells).as("am_f"),
      VectorExpressions.argMaxCosine(toDoubleArray(col("fa")), cells).as("am_d"),
      VectorExpressions.argMax2Cosine(col("fa"), cells).as("am2_f"),
      VectorExpressions.argMax2Cosine(toDoubleArray(col("fa")), cells).as("am2_d")
    ).collect()
    got.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1))
      assert(r.getDouble(0) === r.getDouble(2))
      assert(r.getDouble(3) === r.getDouble(4))
      assert(r.getDouble(5) === r.getDouble(6))
      assert(r.getLong(7) === r.getLong(8))
      assert(r.getLong(9) === r.getLong(10))
    }
  }

  test("SimHash60 kernel matches the md5-derived composed form") {
    val spark2 = spark
    import spark2.implicits._
    import graft.functions.PortableFuncs.{portableHash60, words}
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "lorem ipsum dolor sit amet"), (3L, "x")).toDF("doc_id", "text")
    // per-word 60-bit hash parity: high 60 bits of md5 == conv(substr(md5,1,15),16,10)
    val wordHashes = docs.select(explode(words(col("text"))).as("w"))
      .select(col("w"), portableHash60(col("w")).as("expected")).collect()
    wordHashes.foreach { r =>
      assert(SimHashKernel.hash60(r.getString(0).getBytes("UTF-8")) === r.getLong(1))
    }
    // full signature parity vs a scala-side reference fold
    val sigs = docs.select(col("doc_id"),
        SimHashExpression.simhash60(words(col("text"))).as("sh")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = wordsOf("the quick brown fox jumps over the lazy dog")
    assert(sigs(1L) === refSimhash(ref))
  }

  def wordsOf(s: String): Seq[String] = s.split(" ").toSeq
  def refSimhash(ws: Seq[String]): Long = {
    val counters = new Array[Int](60)
    ws.foreach { w =>
      val h = SimHashKernel.hash60(w.getBytes("UTF-8"))
      (0 until 60).foreach(b =>
        if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1)
    }
    (0 until 60).foldLeft(0L)((acc, b) => if (counters(b) > 0) acc | (1L << b) else acc)
  }

  test("MinHash kernel matches the composed explode+min(md5) form") {
    val spark2 = spark
    import spark2.implicits._
    import graft.functions.PortableFuncs.{shinglesFromWords, words}
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four")).toDF("doc_id", "text")
    // composed reference: explode distinct shingles, 4 min(md5("i|"++sh))
    val sh = docs.select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"),
        explode(array_distinct(shinglesFromWords(col("ws"), 4))).as("sh"))
    val composed = sh.groupBy(col("doc_id"))
      .agg((0 until 4).map(i =>
        min(md5(concat(lit(s"$i|"), col("sh")))).as(s"m$i")).head,
        (1 until 4).map(i =>
          min(md5(concat(lit(s"$i|"), col("sh")))).as(s"m$i")): _*)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getString)).toMap
    // kernel form
    val kernel = docs.select(col("doc_id"),
        MinHashExpression.minhashSig(words(col("text")), 4, 4).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(kernel(1L) === composed(1L))
    assert(kernel(2L) === composed(2L))
    // band hashes = md5 of concatenated per-band minima
    val bands = docs.select(col("doc_id"),
        MinHashExpression.minhashBandHashes(words(col("text")), 4, 4, 2).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val expected = composed(1L).grouped(2).map(g =>
      MinHashKernel.md5Hex(g.mkString.getBytes("UTF-8"))).toSeq
    assert(bands(1L) === expected)
  }

  test("cosine values are correct: orthogonal=0, parallel=1") {
    val m = df.select(col("id"), VectorExpressions.cosineFused(col("a"), col("b")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(2L) === 0.0)
    assert(m(3L) === 1.0)
  }

  test("PqAssign matches the composed slice+argmin form bit-for-bit, " +
    "with lowest-code tie-break, and participates in codegen") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(23)
    val M = 4; val K = 5; val sd = 3
    val book: Seq[Seq[Seq[Double]]] =
      Seq.tabulate(M, K, sd)((_, _, _) => rnd.nextDouble() * 2 - 1)
    val vecs = (0 until 40).map(i =>
      (i.toLong, Array.fill(M * sd)(rnd.nextDouble() * 2 - 1)))
      .toDF("id", "v")
    // composed reference: slice each subspace, argmin squared-L2 over
    // the literal book via array_min of (d, k) structs
    val bookLit = typedLit(book)
    val composed = transform(
      array((0 until M).map(m => slice(col("v"), m * sd + 1, sd)): _*),
      (sv, m) => array_min(transform(element_at(bookLit, m + lit(1)),
        (cv, kk) => struct(
          aggregate(zip_with(sv, cv, (x, y) => (x - y) * (x - y)),
            lit(0.0), (acc, d) => acc + d).as("d"),
          kk.as("k")))))
    val rows = vecs.select(
      VectorExpressions.pqAssign(col("v"), book).as("fast"),
      composed.as("slow")).collect()
    rows.foreach(r => assert(r.getSeq[org.apache.spark.sql.Row](0) ===
      r.getSeq[org.apache.spark.sql.Row](1)))
    // tie-break: two identical centroids -> equal distances -> lowest k
    val tied: Seq[Seq[Seq[Double]]] = Seq(Seq(Seq(1.0, 1.0), Seq(1.0, 1.0)))
    val t = Seq((0L, Array(1.0, 1.0))).toDF("id", "v")
      .select(VectorExpressions.pqAssign(col("v"), tied).as("a"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(t.head.getInt(1) === 0 && t.head.getDouble(0) === 0.0)
    // stays inside WholeStageCodegen on a file-backed scan — the
    // repartition keeps the interpreted-HOF double cast (a
    // CodegenFallback) in its own Project below the exchange, as in
    // the production paths where the cast rides the scan projection
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(transform(col("embedding"), _.cast("double")).as("v"))
      .repartition(2)
    val fullBook: Seq[Seq[Seq[Double]]] =
      Seq.tabulate(16, 32, 4)((_, _, _) => rnd.nextDouble())
    val q = emb.select(VectorExpressions.pqAssign(col("v"), fullBook))
    q.collect() // AQE finalizes codegen stages only on execution
    val plan = q.queryExecution.executedPlan.toString
    // '*(n)' marks a WholeStageCodegen stage; under AQE the tree is
    // indented ('+- *(2) Project [pq_assign...'), so match within-line
    assert(plan.linesIterator.exists(l =>
      l.contains("pq_assign") && l.trim.stripPrefix("+- ").startsWith("*(")))
  }

  test("ArgMaxCosine matches the broadcast-join max_by form bit-for-bit, " +
    "with lowest-cell tie-break, preserving non-contiguous cell ids") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(31)
    // non-contiguous ids on purpose: numbering must carry the pairs
    val cells: Seq[(Long, Seq[Double])] = Seq(0L, 1L, 3L, 7L).map(id =>
      id -> Seq.fill(8)(rnd.nextDouble() * 2 - 1))
    val vecs = (0 until 60).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextDouble() * 2 - 1))).toDF("vec_id", "v")
    val centsDf = cells.map { case (id, cv) => (id, cv.toArray) }.toDF("cell_id", "cv")
    // composed reference: the former broadcast-join + max_by aggregate
    val composed = vecs.join(broadcast(centsDf))
      .select(col("vec_id"), col("cell_id"),
        (VectorExpressions.dot(col("v"), col("cv")) /
          (sqrt(VectorExpressions.dot(col("v"), col("v"))) *
            sqrt(VectorExpressions.dot(col("cv"), col("cv"))))).as("cos"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cell_id"), struct(col("cos"), -col("cell_id"))).as("cell_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kernel = vecs.select(col("vec_id"),
        VectorExpressions.argMaxCosine(col("v"), cells).as("cell_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernel === composed)
    // tie-break: duplicated centroid -> exactly equal cosines -> lowest id
    val tied: Seq[(Long, Seq[Double])] =
      Seq(5L -> Seq(1.0, 2.0), 9L -> Seq(1.0, 2.0))
    val t = Seq((0L, Array(0.5, -0.25))).toDF("vec_id", "v")
      .select(VectorExpressions.argMaxCosine(col("v"), tied)).head().getLong(0)
    assert(t === 5L)
  }

  test("argMax2Cosine returns the rank-2 cell under the ROW_NUMBER " +
    "(cos DESC, cell_id ASC) order, including both tie positions") {
    val spark2 = spark
    import spark2.implicits._
    def second(v: Array[Double], cells: Seq[(Long, Seq[Double])]): Long =
      Seq((0L, v)).toDF("vec_id", "v")
        .select(VectorExpressions.argMax2Cosine(col("v"), cells))
        .head().getLong(0)
    // plain ranking: v = (1, 0); cos to c0 = 1, c1 = .707, c2 = 0
    val plain: Seq[(Long, Seq[Double])] = Seq(
      0L -> Seq(2.0, 0.0), 1L -> Seq(1.0, 1.0), 2L -> Seq(0.0, 3.0))
    assert(second(Array(1.0, 0.0), plain) === 1L)
    // tie AT RANK 1 (two best cells equal): rank 1 = lower id, rank 2
    // = the higher-id twin — the rn = 2 row of the oracle's ordering
    val tieTop: Seq[(Long, Seq[Double])] = Seq(
      3L -> Seq(1.0, 1.0), 8L -> Seq(2.0, 2.0), 9L -> Seq(1.0, 0.0))
    assert(second(Array(1.0, 1.0), tieTop) === 8L)
    // tie AT RANK 2 (two runner-up cells equal): lower id wins rank 2
    val tieSecond: Seq[(Long, Seq[Double])] = Seq(
      1L -> Seq(1.0, 0.0), 4L -> Seq(1.0, 1.0), 6L -> Seq(2.0, 2.0))
    assert(second(Array(1.0, 0.0), tieSecond) === 4L)
    // unsorted constructor input ranks identically (internal sort)
    assert(second(Array(1.0, 0.0),
      Seq(plain(2), plain(0), plain(1))) === 1L)
    // a zero-norm centroid is rejected at CONSTRUCTION — the one input
    // class whose NaN cosines could diverge from the SQL rank-2 order
    // can never reach evaluation
    val zeroCent = intercept[IllegalArgumentException] {
      second(Array(1.0, 0.0),
        Seq(0L -> Seq(1.0, 0.0), 1L -> Seq(0.0, 0.0)))
    }
    assert(zeroCent.getMessage.contains("nonzero-norm centroids"))
    // agreement with an independent composed ranking on random draws
    val rnd = new scala.util.Random(7)
    val cells: Seq[(Long, Seq[Double])] = Seq(0L, 2L, 5L, 11L).map(id =>
      id -> Seq.fill(6)(rnd.nextDouble() * 2 - 1))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    for (_ <- 0 until 40) {
      val v = Array.fill(6)(rnd.nextDouble() * 2 - 1)
      val want = cells.map { case (id, cv) => (id, cos(v.toSeq, cv)) }
        .sortBy { case (id, c) => (-c, id) }(
          Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
        .apply(1)._1
      assert(second(v, cells) === want)
    }
  }

  test("null inputs yield null, and the expression participates in codegen") {
    val spark2 = spark
    import spark2.implicits._
    val withNull = Seq((Some(Array(1.0)), None: Option[Array[Double]]))
      .toDF("a", "b")
    assert(withNull.select(VectorExpressions.dot(col("a"), col("b")))
      .head().isNullAt(0))
    // the generated plan stays inside WholeStageCodegen (no fallback) —
    // use a file-backed scan so ConvertToLocalRelation can't pre-evaluate
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(transform(col("embedding"), _.cast("double")).as("v"))
    val plan = emb.select(VectorExpressions.cosineFused(col("v"), col("v")))
      .queryExecution.executedPlan.toString
    // '*(n)' prefixes mark WholeStageCodegen stages in the plan string;
    // the array_cosine projection must carry one (no codegen fallback)
    assert(plan.linesIterator.exists(l =>
      l.contains("array_cosine") && l.trim.startsWith("*(")))
  }
}
