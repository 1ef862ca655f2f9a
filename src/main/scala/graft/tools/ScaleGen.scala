package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Local larger-SF corpus generator for OPTIMIZATION measurement
  * (round-21 VERDICT item 2: "re-measure at a larger SF — at sf0.1
  * every board is stage-dispatch-bound (~100–300 ms/stage floor) and
  * kernel- and shuffle-level wins are invisible").
  *
  * The driver's generator is not published, so this builds a corpus
  * with the SAME schemas (SchemaCanary-checked on first Verify) and
  * measured-matched distributions, at `mult`× the sf0.1 row counts:
  *
  *  - Relational tables + events are TILED from the template dir:
  *    copy `c` is the template universe with every key offset by
  *    `c * (maxKey+1)`. This preserves every literal-predicate
  *    selectivity, join fan-out, group-size and date-range property
  *    of the driver's data EXACTLY — a synthesized variant would have
  *    to re-discover each of the 184 queries' filter constants.
  *    region/nation are fixed-size dimensions (as in TPC-H) and are
  *    copied once, so tiled customers/suppliers reference them as the
  *    template does.
  *  - documents / embeddings are SYNTHESIZED (tiling would give every
  *    doc `mult-1` exact cross-copy duplicates and every vector
  *    `mult-1` cosine-1.0 twins — the dedup/ANN boards would measure
  *    a corpus 90 % duplicate instead of the template's ~0.3 %):
  *    texts are uniform 8..100-word draws from the template's own
  *    31-word vocabulary with the template's exact-dup rate
  *    (~16/5000 docs in groups of 2, via a content-seed redirect);
  *    embeddings are unit-normalized 64-dim Box–Muller gaussians
  *    (the template's vectors are all unit-norm and all distinct)
  *    with uniform labels 0..9. All hash-derived (xxhash64), fully
  *    deterministic, no rand() (guide §2.5: retried tasks must
  *    reproduce the same rows).
  *
  * Diagnostic tool, not a data-plane operator: nothing here is a
  * declared query, and the corpus lives outside /root/testdata (the
  * driver's dirs are read-only). The DuckDB oracle (tools/check.py)
  * runs against the generated dir like any other corpus, so
  * result-identity of a restructured query can be proven AT the
  * measurement SF, not just at the driver's.
  *
  * Usage: `tools/run_main.sh graft.tools.ScaleGen <mult> <outDir>
  * [templateDir]` (template defaults to /root/testdata/sf0.1).
  */
object ScaleGen {

  private def tile(spark: SparkSession, df: DataFrame, mult: Int,
                   keyCols: Map[String, Long]): DataFrame = {
    val copies = spark.range(mult).toDF("__copy")
    val tiled = df.crossJoin(copies)
    val projected = df.columns.map { c =>
      keyCols.get(c) match {
        case Some(span) => (col(c) + col("__copy") * lit(span)).as(c)
        case None => col(c)
      }
    }
    tiled.select(projected.toIndexedSeq: _*)
  }

  /** uniform in (0,1), deterministic per (salt, id, j) */
  private def u(salt: Int, id: org.apache.spark.sql.Column, j: org.apache.spark.sql.Column) =
    (pmod(xxhash64(lit(salt), id, j), lit(1000000007L)).cast("double") + lit(0.5)) /
      lit(1000000007.0)

  def write(spark: SparkSession, mult: Int, outDir: String,
            templateDir: String): Unit = {
    require(mult >= 1, s"mult must be >= 1, got $mult")
    def tmpl(t: String) = spark.read.parquet(s"$templateDir/$t.parquet")
    def save(df: DataFrame, t: String): Unit = {
      // one file per table, like the driver's layout (scan-split shape
      // at the new SF then degrades exactly as real growth would)
      df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[scalegen] wrote $t")
    }
    def span(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L

    // ---- fixed dimensions: copied once --------------------------------
    save(tmpl("region"), "region")
    save(tmpl("nation"), "nation")

    // ---- tiled relational universe ------------------------------------
    val cust = tmpl("customer"); val nCust = span(cust, "c_custkey")
    save(tile(spark, cust, mult, Map("c_custkey" -> nCust)), "customer")
    val supp = tmpl("supplier"); val nSupp = span(supp, "s_suppkey")
    save(tile(spark, supp, mult, Map("s_suppkey" -> nSupp)), "supplier")
    val part = tmpl("part"); val nPart = span(part, "p_partkey")
    save(tile(spark, part, mult, Map("p_partkey" -> nPart)), "part")
    val ord = tmpl("orders"); val nOrd = span(ord, "o_orderkey")
    save(tile(spark, ord, mult,
      Map("o_orderkey" -> nOrd, "o_custkey" -> nCust)), "orders")
    save(tile(spark, tmpl("lineitem"), mult,
      Map("l_orderkey" -> nOrd, "l_partkey" -> nPart, "l_suppkey" -> nSupp)),
      "lineitem")
    val ev = tmpl("events")
    val nEv = span(ev, "event_id"); val nUsers = span(ev, "user_id")
    save(tile(spark, ev, mult,
      Map("event_id" -> nEv, "user_id" -> nUsers)), "events")

    // ---- synthesized documents ----------------------------------------
    // vocabulary = the template's own word universe (measured: 31 words),
    // sorted for determinism
    val vocab: Seq[String] = tmpl("documents")
      .select(explode(split(trim(col("text")), " ")).as("w"))
      .where(length(col("w")) > 0).distinct()
      .collect().map(_.getString(0)).sorted.toIndexedSeq
    require(vocab.nonEmpty, "template documents yielded an empty vocabulary")
    val vocabCol = array(vocab.map(lit): _*)
    val nDocsT = tmpl("documents").count()
    val nDocs = nDocsT * mult
    // exact-dup redirect at the template's measured rate (16/5000 docs
    // in dup groups => ~1/312 docs draw the previous doc's content seed)
    val docs = spark.range(nDocs).toDF("doc_id")
      .withColumn("cseed",
        when(col("doc_id") > 0 &&
          pmod(xxhash64(lit(1), col("doc_id")), lit(312L)) === 0,
          col("doc_id") - 1).otherwise(col("doc_id")))
      .withColumn("nw",
        (pmod(xxhash64(lit(2), col("cseed")), lit(93L)) + 8).cast("int"))
      .withColumn("text",
        concat(array_join(transform(sequence(lit(1), col("nw")),
          j => element_at(vocabCol,
            (pmod(xxhash64(lit(3), col("cseed"), j), lit(vocab.size.toLong))
              + 1).cast("int"))), " "), lit(" ")))
      .withColumn("lang", element_at(
        // measured template mix: en ~41 %, zh/es/fr/de ~15 % each
        array((Seq.fill(8)("en") ++ Seq("zh", "zh", "zh", "es", "es", "es",
          "fr", "fr", "fr", "de", "de", "de")).map(lit): _*),
        (pmod(xxhash64(lit(4), col("doc_id")), lit(20L)) + 1).cast("int")))
      .withColumn("source",
        concat(lit("src"), pmod(xxhash64(lit(5), col("doc_id")), lit(20L))))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
    save(docs, "documents")

    // ---- synthesized embeddings ----------------------------------------
    val dim = tmpl("embeddings")
      .select(size(col("embedding"))).head.getInt(0)
    val nVec = tmpl("embeddings").count() * mult
    val emb = spark.range(nVec).toDF("vec_id")
      .withColumn("g", transform(sequence(lit(0), lit(dim - 1)), j =>
        // Box–Muller from two hash-derived uniforms
        sqrt(lit(-2.0) * log(u(6, col("vec_id"), j))) *
          cos(lit(2.0 * math.Pi) * u(7, col("vec_id"), j))))
      .withColumn("nrm", sqrt(aggregate(col("g"), lit(0.0),
        (acc, x) => acc + x * x)))
      .withColumn("embedding",
        transform(col("g"), x => (x / col("nrm")).cast("float")))
      .withColumn("label",
        pmod(xxhash64(lit(8), col("vec_id")), lit(10L)).cast("int"))
      .select("vec_id", "embedding", "label")
    save(emb, "embeddings")
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2 || args.length == 3,
      "usage: ScaleGen <mult> <outDir> [templateDir]")
    val spark = graft.Verify.session()
    write(spark, args(0).toInt, args(1),
      if (args.length == 3) args(2) else "/root/testdata/sf0.1")
    spark.stop()
  }
}
