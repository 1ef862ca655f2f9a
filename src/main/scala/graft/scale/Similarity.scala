package graft.scale

import graft.{QueryModule, Tables => T}
import graft.functions.PortableFuncs._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (BASELINE north star —
  * no reference counterpart): brute-force cosine top-k as the exact
  * baseline, random-hyperplane LSH bucketing as the 100 TB scale path.
  *
  * Scale design:
  *  - brute-force kNN broadcasts the (small) query set and makes ONE
  *    pass over the corpus — a BroadcastNestedLoopJoin followed by a
  *    per-query top-k window; the corpus is never shuffled by vector,
  *    only the (query × k) result rows move;
  *  - LSH bucketing reduces candidate generation to an equality
  *    shuffle on a 16-bit bucket id — O(corpus) shuffle volume of
  *    short keys instead of O(corpus²) pairs;
  *  - hyperplanes are deterministic (md5-derived), embedded as plan
  *    literals, so the same buckets come out of any engine — the
  *    DuckDB oracle re-derives them from the same literals.
  */
object Similarity extends QueryModule {

  val Dim = 64
  val NumPlanes = 8
  val TopK = 5

  /** Deterministic pseudo-random hyperplanes: component (p,d) is
    * hash60("p_d") - 2^59 (zero-mean uniform), exactly reproducible
    * from md5 in any engine; embedded below as literals in both the
    * Spark plan and the oracle SQL.
    */
  val planes: Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until NumPlanes).map { p =>
      (0 until Dim).map { d =>
        val hex = md.digest(s"${p}_${d}".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 15)
        (java.lang.Long.parseLong(hex, 16) - (1L << 59)).toDouble
      }
    }
  }

  private def planeLit(p: Int): Column =
    array(planes(p).map(lit): _*)

  /** vec_id + 8-bit LSH bucket: bit p = sign(v · plane_p). */
  def lshBuckets(emb: DataFrame): DataFrame = {
    val v = toDoubleArray(col("embedding"))
    val bucket = (0 until NumPlanes).map { p =>
      when(dotProduct(v, planeLit(p)) > 0d, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)
    emb.select(col("vec_id"), bucket.as("bucket"))
  }

  /** Exact brute-force cosine top-k: queries (vec_id < nQueries) against
    * the whole corpus. The query side is broadcast; corpus scanned once. */
  def knnBrute(emb: DataFrame, nQueries: Long = 8L, k: Int = TopK): DataFrame = {
    val corpus = Layout.widen(emb).select(col("vec_id").as("c_id"),
      toDoubleArray(col("embedding")).as("cv"))
      .withColumn("cn", l2Norm(col("cv")))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), toDoubleArray(col("embedding")).as("qv"))
      .withColumn("qn", l2Norm(col("qv")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id").asc)
    corpus.join(broadcast(queries), col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (dotProduct(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), round(col("cos"), 4).as("cos"), col("rank"))
  }

  /** ANN via LSH: candidates = same-bucket corpus vectors; then exact
    * cosine re-rank, top-3 per query. The equality join on `bucket`
    * is the scale path — no cross product ever forms. */
  def annLsh(emb: DataFrame, nQueries: Long = 50L, k: Int = 3): DataFrame = {
    val withBucket = lshBuckets(Layout.widen(emb))
      .join(emb, "vec_id")
      .select(col("vec_id"), col("bucket"), toDoubleArray(col("embedding")).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
    val q = withBucket.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("bucket"),
        col("v").as("qv"), col("nrm").as("qn"))
    val c = withBucket.select(col("vec_id").as("c_id"), col("bucket"),
      col("v").as("cv"), col("nrm").as("cn"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id").asc)
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (dotProduct(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), round(col("cos"), 4).as("cos"), col("rank"))
  }

  // ---- driver-gate query registry ----

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_knn_brute" -> ((s, d) => knnBrute(T.embeddings(s, d))),
    "q31_lsh_buckets" -> ((s, d) => lshBuckets(T.embeddings(s, d))),
    "q32_ann_lsh" -> ((s, d) => annLsh(T.embeddings(s, d)))
  )

  /** DuckDB literal list for plane p, identical doubles to the plan. */
  private def planeSql(p: Int): String =
    planes(p).map(v => f"$v%.1f").mkString("[", ", ", "]")

  private val bucketSql: String = (0 until NumPlanes).map { p =>
    s"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), ${planeSql(p)}) > 0 THEN ${1L << p} ELSE 0 END)"
  }.mkString(" + ")

  override val oracle: Map[String, String] = Map(
    "q30_knn_brute" ->
      s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM c),
         |pairs AS (
         |  SELECT q.vec_id AS q_id, t.vec_id AS c_id,
         |    list_dot_product(q.v, t.v) / (q.nrm * t.nrm) AS cos
         |  FROM n q JOIN n t ON q.vec_id < 8 AND t.vec_id <> q.vec_id),
         |ranked AS (
         |  SELECT q_id, c_id, cos,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS INTEGER) AS rank
         |  FROM pairs)
         |SELECT q_id, c_id, ROUND(cos, 4) AS cos, rank
         |FROM ranked WHERE rank <= $TopK""".stripMargin,
    "q31_lsh_buckets" ->
      s"SELECT vec_id, CAST($bucketSql AS BIGINT) AS bucket FROM embeddings",
    "q32_ann_lsh" ->
      s"""WITH b AS (
         |  SELECT vec_id, CAST($bucketSql AS BIGINT) AS bucket,
         |    CAST(embedding AS DOUBLE[]) AS v,
         |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
         |  FROM embeddings),
         |pairs AS (
         |  SELECT q.vec_id AS q_id, t.vec_id AS c_id,
         |    list_dot_product(q.v, t.v) / (q.nrm * t.nrm) AS cos
         |  FROM b q JOIN b t ON q.bucket = t.bucket
         |  WHERE q.vec_id < 50 AND t.vec_id <> q.vec_id),
         |ranked AS (
         |  SELECT q_id, c_id, cos,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS INTEGER) AS rank
         |  FROM pairs)
         |SELECT q_id, c_id, ROUND(cos, 4) AS cos, rank
         |FROM ranked WHERE rank <= 3""".stripMargin
  )
}
