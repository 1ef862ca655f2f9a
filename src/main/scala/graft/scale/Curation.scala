package graft.scale

import graft.{QueryModule, Tables => T}
import graft.functions.PortableFuncs._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: sampling,
  * per-group caps, representative selection, and k-means clustering —
  * the "shape the dataset" layer that runs after dedup/quality at
  * 100 TB.
  *
  * Determinism: every sampler here is hash- or id-ordered, never
  * `rand()` — reruns and retries pick the same rows, which a lazy
  * engine requires (a task retry re-executes the sample).
  */
object Curation extends QueryModule {

  /** Deterministic per-stratum downsample: keep ~fraction of each
    * group, selected by a uniform md5 hash of the id (stable across
    * runs/retries, unlike sampleBy's seeded-but-order-dependent
    * Bernoulli on recomputed partitions). */
  def stratifiedSample(df: DataFrame, idCol: String,
                       fractions: Map[String, Double],
                       strataCol: String): DataFrame = {
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    // portableHash60 / 2^60 is uniform in [0,1)
    df.filter(portableHash60(col(idCol).cast("string")).cast("double")
      / lit((1L << 60).toDouble) < frac)
  }

  /** Cap every group at `k` rows, keeping the hash-smallest ids — a
    * deterministic distributed reservoir (per-source caps, dedup-
    * cluster representatives). One shuffle by group. */
  def perGroupCap(df: DataFrame, groupCol: String, idCol: String,
                  k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(portableHash60(col(idCol).cast("string")).asc, col(idCol).asc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** Diversity sampling: one representative per LSH bucket (the
    * hash-partitioned analogue of farthest-point sampling — buckets
    * partition the embedding space by random hyperplanes, so one pick
    * per bucket spreads the sample). */
  def diversitySample(emb: DataFrame): DataFrame = {
    val buckets = Similarity.lshBuckets(emb)
    val w = Window.partitionBy(col("bucket")).orderBy(col("vec_id").asc)
    buckets.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("bucket"), col("vec_id").as("rep_id"))
  }

  /** Lloyd's k-means over the embedding column: deterministic init
    * (first k vectors), `iters` rounds of assign (broadcast centroids,
    * argmax cosine) + recompute (mean per cluster). Each round is one
    * broadcast join + one hash-aggregate over the corpus — O(iters)
    * passes, no pairwise blowup. Returns (vec_id, cluster). */
  def kmeans(emb: DataFrame, k: Int = 8, iters: Int = 3): DataFrame = {
    val spark = emb.sparkSession
    val vecs = Layout.widen(emb)
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
      .cache()
    var centroids: Array[(Int, Seq[Double])] = vecs
      .filter(col("vec_id") < k).orderBy("vec_id").collect()
      .zipWithIndex.map { case (r, i) => i -> r.getSeq[Double](1) }

    def assignTo(cents: Array[(Int, Seq[Double])]): DataFrame = {
      val centArr = cents.map { case (cid, cv) =>
        struct(lit(cid).as("cid"), array(cv.map(lit): _*).as("cv"))
      }
      val exploded = vecs.select(col("vec_id"), col("v"),
        explode(array(centArr: _*)).as("c"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos").desc, col("cluster").asc)
      exploded
        .select(col("vec_id"), col("v"), col("c.cid").as("cluster"),
          (dotProduct(col("v"), col("c.cv")) /
            (l2Norm(col("v")) * l2Norm(col("c.cv")))).as("cos"))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select(col("vec_id"), col("v"), col("cluster"))
    }

    (1 to iters).foreach { _ =>
      val assigned = assignTo(centroids)
      val dim = centroids.head._2.length
      centroids = assigned.groupBy(col("cluster"))
        .agg(array((0 until dim).map(i =>
          avg(element_at(col("v"), i + 1))): _*).as("cv"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1))
        .sortBy(_._1)
    }
    val out = assignTo(centroids).select(col("vec_id"), col("cluster"))
    vecs.unpersist()
    out
  }

  // ---- driver-gate queries ----

  private val SampleFractions = Map(
    "en" -> 0.1, "de" -> 0.5, "fr" -> 0.3, "es" -> 0.2, "zh" -> 0.05)

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q57_stratified_sample" -> ((s, d) =>
      stratifiedSample(T.documents(s, d), "doc_id", SampleFractions, "lang")
        .select(col("doc_id"), col("lang"))),
    "q58_group_cap" -> ((s, d) =>
      perGroupCap(T.documents(s, d), "lang", "doc_id", k = 15)
        .select(col("doc_id"), col("lang")))
  )

  // hash := high 60 bits of md5(id) — identical to portableHash60
  private val hashSql =
    "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)"

  override val oracle: Map[String, String] = Map(
    "q57_stratified_sample" -> {
      val cases = SampleFractions
        .map { case (l, f) => s"WHEN '$l' THEN $f" }.mkString(" ")
      s"""SELECT doc_id, lang FROM documents
         |WHERE CAST($hashSql AS DOUBLE) / 1152921504606846976.0
         |  < (CASE lang $cases ELSE 0.0 END)""".stripMargin
    },
    "q58_group_cap" ->
      s"""SELECT doc_id, lang FROM (
         |  SELECT doc_id, lang,
         |    ROW_NUMBER() OVER (PARTITION BY lang
         |      ORDER BY $hashSql ASC, doc_id ASC) AS rn
         |  FROM documents) WHERE rn <= 15""".stripMargin
  )
}
