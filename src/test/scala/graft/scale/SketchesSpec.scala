package graft.scale

import graft.SparkSpec
import graft.{Tables => T}
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.01"

  test("HLL distinct profile within rsd of exact") {
    val li = T.lineitem(spark, sf)
    val approx = Sketches.distinctProfile(li, col("l_returnflag"), col("l_orderkey"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_orderkey").as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e).toDouble / e < 0.1,
        s"$k: approx=${approx(k)} exact=$e")
    }
  }

  test("hllAudit certifies the sketch against exact per-lang distincts") {
    val out = Sketches.hllAudit(T.documents(spark, sf)).collect()
    assert(out.length === 5, "one row per lang")
    out.foreach { r =>
      assert(r.getBoolean(3), s"lang ${r.getString(0)} outside tolerance")
      assert(r.getLong(2) <= r.getLong(1), "distinct ≤ rows")
    }
    // duplicate-heavy input: exact distinct must not count copies, and
    // the sketch must still land inside the gate
    val spark2 = spark
    import spark2.implicits._
    val dup = (1 to 300).map(i => (i.toLong, s"t${i % 7}", "en"))
      .toDF("doc_id", "text", "lang")
    val row = Sketches.hllAudit(dup).collect().head
    assert(row.getLong(2) === 7L && row.getBoolean(3))
  }

  test("approximate quantiles bracket the exact median") {
    val q = Sketches.quantileProfile(T.orders(spark, sf), "o_totalprice")
    assert(q(0.5) > 0 && q(0.9) >= q(0.5) && q(0.99) >= q(0.9))
  }

  test("frequent items surfaces the hot key") {
    val spark2 = spark
    import spark2.implicits._
    val df = ((1 to 900).map(_ => "hot") ++ (1 to 100).map(i => s"k$i")).toDF("key")
    assert(Sketches.frequentItems(df, "key", 0.5).contains("hot"))
  }

  test("bloom-prefiltered join equals the plain join") {
    val orders = T.orders(spark, sf)
    val bigCust = T.customer(spark, sf).filter(col("c_acctbal") > 9000)
      .select("c_custkey")
    val plain = orders.join(bigCust, col("o_custkey") === col("c_custkey"))
      .count()
    val viaBloom = Sketches.bloomPrefilteredJoin(
      orders.withColumnRenamed("o_custkey", "c_custkey"), bigCust, "c_custkey")
      .count()
    assert(viaBloom === plain)
  }

  test("quantileAudit: exact percentiles equal a sort reference on " +
    "random skewed groups, the GK verdict certifies, and a constant " +
    "column degenerates cleanly") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(97)
    // skewed lengths: mostly small, a heavy tail, plus a constant group
    val rows =
      (0 until 400).map { i =>
        val lang = if (i % 3 == 0) "en" else "de"
        val len = if (rnd.nextInt(10) == 0) 5000L + rnd.nextInt(5000)
                  else 10L + rnd.nextInt(200)
        (i.toLong, lang, len)
      } ++ (400 until 430).map(i => (i.toLong, "zz", 77L))
    val docs = rows.toDF("doc_id", "lang", "n_chars").repartition(7)
    val got = Sketches.quantileAudit(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))).toMap
    // disc percentile reference: smallest value at rank ceil(p·n/100)
    def ref(vals: Seq[Long], p: Int): Long = {
      val s = vals.sorted
      s(((vals.size * p + 99) / 100) - 1)
    }
    for ((lang, vals0) <- rows.groupBy(_._2)) {
      val vals = vals0.map(_._3)
      val (n, p50, p90, p99, ok) = got(lang)
      assert(n === vals.size, s"$lang n")
      assert((p50, p90, p99) ===
        ((ref(vals, 50), ref(vals, 90), ref(vals, 99))), s"$lang percentiles")
      assert(ok, s"$lang GK sketch violated its rank bound")
    }
    assert(got("zz")._2 === 77L && got("zz")._4 === 77L)
  }
}
