package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import java.time.LocalDateTime
import scala.jdk.CollectionConverters._

/** Seeded adversarial corpus generator for the differential fuzz gate
  * (round-18 prescription): the 184 Spark/DuckDB oracle pairs had only
  * ever agreed on the driver's ONE fixed parquet draw, and randomized
  * inputs are the one evidence class that catches data-dependent
  * divergence — per-row rounding ties, ORDER-BY tie-break order,
  * null-vs-empty aggregation — that a fixed corpus structurally cannot.
  *
  * Writes the full 10-table gate corpus (schemas byte-matched to the
  * driver's testdata: int32 vs int64 keys, TIMESTAMP_NTZ micros — see
  * `SchemaCanary.expected`) with the adversarial draws the prescription
  * names:
  *  - TIES on every ORDER-BY-able key: numeric columns draw from tiny
  *    value domains, timestamps from small pools (exact duplicates,
  *    window-boundary instants), so every sort/rank/limit/top-k faces
  *    tied keys;
  *  - EMPTY PARTITIONS: every table is written with more partitions
  *    than some have rows;
  *  - SINGLE-ROW TABLES: `seed % 3 == 0` selects the tiny profile
  *    (1-2 rows per table) — the degenerate-cardinality stress;
  *  - ALL-IDENTICAL EMBEDDINGS: a block of exact copies (cosine = 1.0
  *    ties for every ANN/near-dup gate) plus epsilon-perturbed
  *    near-copies;
  *  - ZERO-WEIGHT MAPS: the events `props` JSON is zero-heavy;
  *  - exact-duplicate / near-duplicate / shared-span documents, plus
  *    degenerate texts (empty, one char, below-shingle word counts,
  *    doubled/leading whitespace);
  *  - a few DANGLING foreign keys (inner/semi joins must drop them
  *    identically in both engines).
  *
  * Driver-side row synthesis is deliberate: this is a CORRECTNESS tool
  * producing sf0.001-scale corpora under tight distributional control,
  * not a data-plane operator — nothing here runs at 100 TB. Fully
  * deterministic per seed (one `scala.util.Random(seed)`, no wall
  * clock), so a red seed is a permanent repro command.
  */
object FuzzGen {

  private val Regions = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
  private val Segments = Seq("FURNITURE", "MACHINERY", "BUILDING", "HOUSEHOLD", "AUTOMOBILE")
  private val Priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val PartTypes = Seq("ECONOMY", "PROMO", "LARGE", "MEDIUM", "STANDARD", "SMALL")
  private val EventTypes = Seq("error", "signup", "purchase", "view", "click")
  private val Langs = Seq("es", "zh", "de", "fr", "en")
  private val Vocab = Seq("the", "fast", "key", "order", "sort", "table", "scan",
    "merge", "part", "window", "small", "hash", "join", "batch", "stream",
    "spark", "dup", "plan", "row", "shard", "pack", "chunk", "span", "token")

  // tie domains: every ORDER-BY-able numeric draws from a handful of
  // values so ranks/limits/top-ks face ties on EVERY corpus
  private val AcctBals = Seq(-500.0, 0.0, 123.45, 123.45, 5000.0, 9999.99)
  private val TotalPrices = Seq(100.0, 100.0, 250.5, 999.99, 1234.56, 50000.0)
  private val RetailPrices = Seq(9.99, 9.99, 100.0, 555.5, 901.0)
  private val ExtPrices = Seq(10.0, 10.0, 55.25, 123.125, 999.0, 2500.5)
  private val Discounts = Seq(0.0, 0.0, 0.05, 0.1)
  private val Taxes = Seq(0.0, 0.08)
  private val EventValues = Seq(0.0, 0.0, 0.5, 1.25, 2.5, 2.5, 100.0)
  private val PropKs = Seq(0, 0, 0, 1, 12, 50, 87, 99) // zero-weight heavy

  private def ntz = TimestampNTZType

  /** Small pools of distinct instants → heavy timestamp ties, with
    * exact window boundaries (midnights, top-of-hour) represented. */
  private def tsPool(rnd: scala.util.Random, n: Int): IndexedSeq[LocalDateTime] = {
    val boundaries = IndexedSeq(
      LocalDateTime.of(2024, 1, 1, 0, 0, 0),
      LocalDateTime.of(2024, 1, 5, 0, 0, 0),
      LocalDateTime.of(2024, 1, 15, 12, 0, 0),
      LocalDateTime.of(2024, 1, 30, 23, 0, 0))
    boundaries ++ IndexedSeq.fill(math.max(0, n - boundaries.size)) {
      LocalDateTime.of(2024, 1, 1 + rnd.nextInt(30), rnd.nextInt(24),
        rnd.nextInt(60), rnd.nextInt(60), rnd.nextInt(1000000) * 1000)
    }
  }

  private def datePool(rnd: scala.util.Random, n: Int): IndexedSeq[LocalDateTime] = {
    val boundaries = IndexedSeq(
      LocalDateTime.of(1995, 1, 1, 0, 0, 0),
      LocalDateTime.of(2000, 1, 1, 0, 0, 0),
      LocalDateTime.of(2001, 11, 4, 0, 0, 0))
    boundaries ++ IndexedSeq.fill(math.max(0, n - boundaries.size)) {
      LocalDateTime.of(1995 + rnd.nextInt(7), 1 + rnd.nextInt(12),
        1 + rnd.nextInt(28), 0, 0, 0)
    }
  }

  private def pick[A](rnd: scala.util.Random, xs: Seq[A]): A =
    xs(rnd.nextInt(xs.size))

  /** Generate and write the 10-table corpus for `seed` under `dir`. */
  def write(spark: SparkSession, seed: Long, dir: String): Unit = {
    val rnd = new scala.util.Random(seed)
    val tiny = seed % 3 == 0

    def save(name: String, rows: Seq[Row], schema: StructType): Unit =
      // more partitions than small tables have rows → empty partitions
      // reach both the written files and every downstream computation
      spark.createDataFrame(rows.asJava, schema).repartition(4)
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")

    // ---- dimension tables -------------------------------------------
    val nRegion = if (tiny) 1 else 5
    save("region", (0 until nRegion).map(i => Row(i, Regions(i))),
      StructType(Seq(StructField("r_regionkey", IntegerType, nullable = false),
        StructField("r_name", StringType, nullable = false))))

    val nNation = if (tiny) 1 else 25
    save("nation", (0 until nNation).map(i =>
      Row(i, s"NATION_$i", rnd.nextInt(nRegion))),
      StructType(Seq(StructField("n_nationkey", IntegerType, nullable = false),
        StructField("n_name", StringType, nullable = false),
        StructField("n_regionkey", IntegerType, nullable = false))))

    val nCust = if (tiny) 1 else 150
    save("customer", (0 until nCust).map { i =>
      // a few dangling nation keys: joins must drop them identically
      val nk = if (!tiny && i % 47 == 46) nNation + 3 else rnd.nextInt(nNation)
      Row(i.toLong, f"Customer#$i%09d", nk, pick(rnd, AcctBals), pick(rnd, Segments))
    }, StructType(Seq(StructField("c_custkey", LongType, nullable = false),
      StructField("c_name", StringType, nullable = false),
      StructField("c_nationkey", IntegerType, nullable = false),
      StructField("c_acctbal", DoubleType, nullable = false),
      StructField("c_mktsegment", StringType, nullable = false))))

    val nSupp = if (tiny) 1 else 10
    save("supplier", (0 until nSupp).map(i =>
      Row(i.toLong, f"Supplier#$i%09d", rnd.nextInt(nNation), pick(rnd, AcctBals))),
      StructType(Seq(StructField("s_suppkey", LongType, nullable = false),
        StructField("s_name", StringType, nullable = false),
        StructField("s_nationkey", IntegerType, nullable = false),
        StructField("s_acctbal", DoubleType, nullable = false))))

    val nPart = if (tiny) 1 else 200
    save("part", (0 until nPart).map { i =>
      Row(i.toLong, s"${pick(rnd, Vocab)} ${pick(rnd, Vocab)}",
        s"Brand#${1 + rnd.nextInt(25)}", pick(rnd, PartTypes),
        pick(rnd, Seq(1, 5, 5, 10, 23, 50)), pick(rnd, RetailPrices))
    }, StructType(Seq(StructField("p_partkey", LongType, nullable = false),
      StructField("p_name", StringType, nullable = false),
      StructField("p_brand", StringType, nullable = false),
      StructField("p_type", StringType, nullable = false),
      StructField("p_size", IntegerType, nullable = false),
      StructField("p_retailprice", DoubleType, nullable = false))))

    // ---- fact tables ------------------------------------------------
    val nOrders = if (tiny) 2 else 1500
    val odates = datePool(rnd, 40)
    save("orders", (0 until nOrders).map { i =>
      val ck = if (!tiny && i % 211 == 210) nCust + 9L else rnd.nextInt(nCust).toLong
      Row(i.toLong, ck, pick(rnd, Seq("F", "P", "O")), pick(rnd, TotalPrices),
        pick(rnd, odates), pick(rnd, Priorities))
    }, StructType(Seq(StructField("o_orderkey", LongType, nullable = false),
      StructField("o_custkey", LongType, nullable = false),
      StructField("o_orderstatus", StringType, nullable = false),
      StructField("o_totalprice", DoubleType, nullable = false),
      StructField("o_orderdate", ntz, nullable = false),
      StructField("o_orderpriority", StringType, nullable = false))))

    val nLine = if (tiny) 1 else 6000
    val sdates = datePool(rnd, 60)
    save("lineitem", (0 until nLine).map { i =>
      val ok = if (!tiny && i % 499 == 498) nOrders + 17L else rnd.nextInt(nOrders).toLong
      Row(ok, rnd.nextInt(nPart).toLong, rnd.nextInt(nSupp).toLong,
        1 + rnd.nextInt(7), (1 + rnd.nextInt(5)).toDouble,
        pick(rnd, ExtPrices), pick(rnd, Discounts), pick(rnd, Taxes),
        pick(rnd, Seq("N", "A", "R")), pick(rnd, Seq("O", "F")),
        pick(rnd, sdates))
    }, StructType(Seq(StructField("l_orderkey", LongType, nullable = false),
      StructField("l_partkey", LongType, nullable = false),
      StructField("l_suppkey", LongType, nullable = false),
      StructField("l_linenumber", IntegerType, nullable = false),
      StructField("l_quantity", DoubleType, nullable = false),
      StructField("l_extendedprice", DoubleType, nullable = false),
      StructField("l_discount", DoubleType, nullable = false),
      StructField("l_tax", DoubleType, nullable = false),
      StructField("l_returnflag", StringType, nullable = false),
      StructField("l_linestatus", StringType, nullable = false),
      StructField("l_shipdate", ntz, nullable = false))))

    val nEvents = if (tiny) 1 else 1000
    val epool = tsPool(rnd, 25) // 25 distinct instants over 1000 rows: heavy ties
    save("events", (0 until nEvents).map { i =>
      Row(i.toLong, pick(rnd, epool), rnd.nextInt(20).toLong,
        pick(rnd, EventTypes), pick(rnd, EventValues),
        s"""{"k": ${pick(rnd, PropKs)}}""")
    }, StructType(Seq(StructField("event_id", LongType, nullable = false),
      StructField("ts", ntz, nullable = false),
      StructField("user_id", LongType, nullable = false),
      StructField("event_type", StringType, nullable = false),
      StructField("value", DoubleType, nullable = false),
      StructField("props", StringType, nullable = false))))

    // ---- documents: dup / near-dup / shared-span / degenerate -------
    val nDocs = if (tiny) 1 else 400
    val sharedSpan = (0 until 12).map(_ => pick(rnd, Vocab)).mkString(" ")
    val texts = scala.collection.mutable.ArrayBuffer[String]()
    (0 until nDocs).foreach { i =>
      val t =
        if (i >= 8 && rnd.nextDouble() < 0.25) texts(rnd.nextInt(texts.size)) // exact dup
        else if (i >= 8 && rnd.nextDouble() < 0.12) { // near-dup: one word swapped
          val ws = texts(rnd.nextInt(texts.size)).split(" ")
          if (ws.nonEmpty) { ws(rnd.nextInt(ws.length)) = pick(rnd, Vocab); ws.mkString(" ") }
          else ""
        } else {
          val len = 4 + rnd.nextInt(37)
          val body = (0 until len).map(_ => pick(rnd, Vocab)).mkString(" ")
          if (rnd.nextDouble() < 0.15) s"$sharedSpan $body" else body // shared span
        }
      texts += t
    }
    if (!tiny) {
      // fixed degenerate tail: empty, single char, below-shingle word
      // counts, doubled / leading / trailing whitespace
      texts ++= Seq("", "x", "a b c", "the  fast  order", " spark join ",
        "token token token token token token token token")
    }
    save("documents", texts.zipWithIndex.map { case (t, i) =>
      Row(i.toLong, t, pick(rnd, Langs),
        if (!tiny && i == 3) "src_rare" else s"src${rnd.nextInt(20)}",
        t.length.toLong)
    }.toSeq, StructType(Seq(StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false),
      StructField("lang", StringType, nullable = false),
      StructField("source", StringType, nullable = false),
      StructField("n_chars", LongType, nullable = false))))

    // ---- embeddings: identical block + epsilon near-dups + random ---
    val dim = 64
    val nVec = if (tiny) 1 else 400
    def randVec(): Array[Float] =
      Array.fill(dim)((rnd.nextGaussian() * 0.12).toFloat)
    val anchor = randVec()
    save("embeddings", (0 until nVec).map { i =>
      val v: Array[Float] =
        // failed-encode zeros: i==7 sits BELOW IvfCells=16, so every
        // seed-centroid draw faces a zero-norm SEED candidate (the
        // r19 ADVICE gap: FuzzGen's zeros at 150/300 could never
        // reach the cents CTE) — both engines must exclude it
        if (!tiny && (i == 7 || i == 150 || i == 300))
          Array.fill(dim)(0.0f)
        else if (!tiny && i < 20) anchor.clone() // ALL-IDENTICAL block
        else if (!tiny && i < 30) { // epsilon near-copies of the anchor
          val c = anchor.clone(); c(i % dim) = c(i % dim) + 1e-6f; c
        } else randVec()
      Row(i.toLong, v.toSeq, rnd.nextInt(10))
    }, StructType(Seq(StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false),
      StructField("label", IntegerType, nullable = false))))
  }

  /** `runMain graft.tools.FuzzGen <seed> <dir>` — one corpus. */
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: FuzzGen <seed> <dir>")
    val spark = graft.Verify.session()
    write(spark, args(0).toLong, args(1))
    spark.stop()
  }
}
