package graft.scale

import graft.SparkSpec
import graft.{Tables => T}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class LayoutSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("partitioned write prunes directories at read time") {
    val dir = Files.createTempDirectory("graft-layout").toString + "/docs"
    Layout.writePartitioned(T.documents(spark, sf), dir, "lang")
    // directory layout: one dir per lang value
    val langs = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.contains("lang=")).length
    assert(langs > 1)
    val pruned = spark.read.parquet(dir).filter(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"expected partition pruning in:\n$plan")
    assert(pruned.count() ===
      T.documents(spark, sf).filter(col("lang") === "en").count())
  }

  test("salted join equals the plain join on skewed data") {
    val spark2 = spark
    import spark2.implicits._
    // 90% of rows share one hot key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) s"k$i" else "hot", i.toLong))
      .toDF("key", "v")
    val small = Seq(("hot", "H"), ("k10", "A"), ("k20", "B")).toDF("key", "name")
    val plain = big.join(small, Seq("key")).groupBy("key")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Layout.saltedJoin(big, small, "key", salts = 8).groupBy("key")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("salted aggregation equals the plain aggregation") {
    val spark2 = spark
    import spark2.implicits._
    val df = (1 to 1000).map(i => (if (i % 5 == 0) "cold" else "hot", i.toDouble))
      .toDF("key", "v")
    val plain = df.groupBy("key").agg(count(lit(1)).as("n"), sum("v").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Layout.saltedCountSum(df, col("key"), col("v"), salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted === plain)
  }

  test("range-partitioned sorted write: files are range-ordered and sorted") {
    val dir = Files.createTempDirectory("graft-sorted").toString + "/orders"
    Layout.writeSorted(T.orders(spark, sf).select("o_orderkey", "o_totalprice"),
      dir, "o_orderkey", partitions = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() === T.orders(spark, sf).count())
  }

  test("zValue interleaves bits (reference check) and z-ordered files " +
    "prune on BOTH dimensions where a one-column sort prunes on one") {
    val spark2 = spark
    import spark2.implicits._
    // reference Morton implementation to pin the kernel against
    def zRef(x0: Long, y0: Long): Long = {
      val x = x0 & 0xffffffffL; val y = y0 & 0xffffffffL
      var z = 0L
      (0 until 32).foreach { b =>
        z |= ((x >> b) & 1L) << (2 * b)
        z |= ((y >> b) & 1L) << (2 * b + 1)
      }
      z
    }
    // last three pin the whole-Long domain: a negative input (pre-1970
    // epoch second: masked to its low 32 bits, bit 31 set ⇒ z < 0 via
    // the wrapping 1L << 63 term) and a > 32-bit input (post-2106
    // second: wraps) — the q107 oracle restates exactly these
    // semantics in DuckDB (Skew.scala)
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (12345L, 67890L),
      (0xffffffffL, 0L), (0L, 0x7fffffffL), (0x12345678L, 0x0fedcba9L),
      (5L, -1L), (9L, 0xaaaaaaaaL), (11L, 0x100000005L))
    val got = pts.toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === pts.map { case (x, y) => zRef(x, y) })

    // a 32×32 grid written z-ordered in 8 files: a filter on a narrow
    // x-range (any y) AND a narrow y-range (any x) must each skip
    // files by per-file min/max — the two-predicate pruning a plain
    // sort-by-x cannot give for y
    val grid = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y))
      .toDF("x", "y")
    val dir = Files.createTempDirectory("graft-zorder").toString + "/grid"
    Layout.writeZOrdered(grid, dir, col("x"), col("y"), partitions = 8)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    assert(files.size >= 4, s"expected several files, got ${files.size}")
    def filesHit(pred: org.apache.spark.sql.Column): Int =
      files.count(f => spark.read.parquet(f).filter(pred).limit(1)
        .collect().nonEmpty)
    assert(filesHit(col("x") < 4) < files.size,
      "x-range filter should skip some z-ordered files")
    assert(filesHit(col("y") < 4) < files.size,
      "y-range filter should skip some z-ordered files")
    // and nothing was lost
    assert(spark.read.parquet(dir).count() === 32L * 32L)
  }

  test("bucketed tables join without a shuffle") {
    // a fresh in-memory catalog + a leftover warehouse dir from a prior
    // JVM collide on CREATE: drop both before saving
    Seq("b_orders", "b_lines").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq
          .reverse.foreach(java.nio.file.Files.delete)
      }
    }
    Layout.saveBucketed(T.orders(spark, sf).select("o_orderkey", "o_totalprice"),
      "b_orders", "o_orderkey", buckets = 4)
    Layout.saveBucketed(T.lineitem(spark, sf)
        .selectExpr("l_orderkey AS o_orderkey", "l_quantity"),
      "b_lines", "o_orderkey", buckets = 4)
    // force SMJ path so the bucketing (not a broadcast) carries the join
    val joined = spark.table("b_orders").hint("merge")
      .join(spark.table("b_lines"), "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join:\n$plan")
    assert(joined.count() === T.lineitem(spark, sf).count())
  }

  test("widen decides from the LOGICAL plan: small file scans get a " +
    "repartition, already-parallel scans pass through untouched") {
    val docs = T.documents(spark, sf)
    // tiny file at sf0.001 → estimated partitions < cores → repartition
    val widened = Layout.widen(docs)
    assert(widened.queryExecution.logical.toString.contains("Repartition"),
      "small scan must be widened")
    // same file with a 1 KB split size estimates >= cores → no-op (this
    // is the 100 TB case: input partitions already ≥ parallelism)
    val prev = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1k")
    try {
      val untouched = Layout.widen(T.documents(spark, sf))
      assert(!untouched.queryExecution.logical.toString.contains("Repartition"),
        "wide scan must pass through without a repartition")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.files.maxPartitionBytes", v)
      case None => spark.conf.unset("spark.sql.files.maxPartitionBytes")
    }
    // correctness is layout-independent either way
    assert(widened.count() === docs.count())
  }

  test("skew profile surfaces hot keys with shares") {
    val spark2 = spark
    import spark2.implicits._
    val df = (1 to 100).map(i => if (i <= 80) "hot" else s"k$i").toDF("key")
    val top = Layout.skewProfile(df, col("key"), 3).collect()
    assert(top.head.getString(0) === "hot")
    assert(top.head.getDouble(2) === 0.8)
  }
}
