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
}
