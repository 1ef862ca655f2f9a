package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LongestDupRunSpec extends SparkSpec {

  /** Brute-force reference: max common prefix over every suffix pair. */
  private def brute(ws: Seq[String]): Int = {
    var best = 0
    for (i <- ws.indices; j <- ws.indices if i < j) {
      var k = 0
      while (i + k < ws.length && j + k < ws.length && ws(i + k) == ws(j + k)) k += 1
      if (k > best) best = k
    }
    best
  }

  test("suffix automaton equals the brute-force suffix-pair LCP on " +
    "random arrays (overlap included)") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(23)
    // small vocabularies force heavy repetition and overlapping runs
    val cases = (0 until 60).map { i =>
      val vocab = 2 + rnd.nextInt(5)
      val n = 1 + rnd.nextInt(40)
      (i.toLong, Seq.fill(n)(s"w${rnd.nextInt(vocab)}"))
    }
    val out = cases.toDF("id", "ws")
      .select(col("id"), PortableFuncs.longestDupRun(col("ws")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    cases.foreach { case (id, ws) =>
      assert(out(id) === brute(ws), s"case $id: $ws")
    }
  }

  test("edge semantics: empty/single/no-repeat arrays are 0, full " +
    "repetition counts overlapping runs, null array is null") {
    val spark2 = spark
    import spark2.implicits._
    def run(ws: Seq[String]): Int =
      Seq(Tuple1(ws)).toDF("ws")
        .select(PortableFuncs.longestDupRun(col("ws"))).head().getInt(0)
    assert(run(Seq.empty) === 0)
    assert(run(Seq("a")) === 0)
    assert(run(Seq("a", "b", "c")) === 0)
    // "x x x": "x x" occurs at 0 and 1 (overlapping) → 2
    assert(run(Seq("x", "x", "x")) === 2)
    assert(run(Seq("a", "a", "b", "a", "a", "b", "a")) === 4) // "a a b a"
    val n = Seq(Tuple1(None: Option[Seq[String]])).toDF("ws")
      .select(PortableFuncs.longestDupRun(col("ws"))).head()
    assert(n.isNullAt(0))
  }

  test("longest_dup_run stays inside whole-stage codegen over a file scan") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = docs.select(PortableFuncs.longestDupRun(
        PortableFuncs.words(col("text"))).as("r"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("longest_dup_run") && l.trim.startsWith("*(")),
      s"longest_dup_run fell out of codegen:\n$plan")
  }
}
