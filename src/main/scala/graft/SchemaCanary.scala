package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Schema-drift canary: assert every gate table still loads through its
  * [[Tables]] loader and projects its expected columns with acceptable
  * types — loudly naming the table, column, and ACTUAL type on mismatch.
  *
  * Motivation (round 10): the driver regenerated the testdata mid-round
  * and `events.ts` flipped TIMESTAMP(NANOS) → TIMESTAMP_NTZ(micros);
  * the stale hard-coded conversion broke 15 gate queries and the first
  * signal was the gate itself. This preflight turns that class of
  * breakage into a one-minute local failure. The model is the
  * reference's header-driven tolerance (SURVEY §1.1, `csv.DictReader`):
  * adapt to what the file declares, and when adaptation is impossible,
  * fail with the file's actual declaration in the message.
  *
  * Acceptable-type sets are deliberately wide where loaders adapt
  * (int32/int64 keys, NTZ/LTZ dates) and exact where queries depend on
  * the normalized type (events.ts must come out session-zone TIMESTAMP).
  */
object SchemaCanary {

  private val I: Set[DataType] = Set(IntegerType, LongType)
  private val D: Set[DataType] = Set(DoubleType)
  private val S: Set[DataType] = Set(StringType)
  // date-like columns: queries compare against to_timestamp literals and
  // both NTZ and LTZ coerce consistently with the DuckDB oracle under a
  // UTC session (verified by the hash gate each round)
  private val T: Set[DataType] = Set(TimestampType, TimestampNTZType, DateType)
  private val VEC: Set[DataType] = Set(ArrayType(FloatType), ArrayType(DoubleType),
    ArrayType(FloatType, containsNull = true), ArrayType(DoubleType, containsNull = true))

  /** table → (loader, required column → acceptable post-load types). */
  val expected: Map[String, (((SparkSession, String) => org.apache.spark.sql.DataFrame),
                             Map[String, Set[DataType]])] = Map(
    "region" -> ((Tables.region _, Map("r_regionkey" -> I, "r_name" -> S))),
    "nation" -> ((Tables.nation _, Map("n_nationkey" -> I, "n_name" -> S, "n_regionkey" -> I))),
    "customer" -> ((Tables.customer _, Map(
      "c_custkey" -> I, "c_name" -> S, "c_nationkey" -> I,
      "c_acctbal" -> D, "c_mktsegment" -> S))),
    "supplier" -> ((Tables.supplier _, Map(
      "s_suppkey" -> I, "s_name" -> S, "s_nationkey" -> I, "s_acctbal" -> D))),
    "part" -> ((Tables.part _, Map(
      "p_partkey" -> I, "p_name" -> S, "p_brand" -> S, "p_type" -> S,
      "p_size" -> I, "p_retailprice" -> D))),
    "orders" -> ((Tables.orders _, Map(
      "o_orderkey" -> I, "o_custkey" -> I, "o_orderstatus" -> S,
      "o_totalprice" -> D, "o_orderdate" -> T, "o_orderpriority" -> S))),
    "lineitem" -> ((Tables.lineitem _, Map(
      "l_orderkey" -> I, "l_partkey" -> I, "l_suppkey" -> I, "l_linenumber" -> I,
      "l_quantity" -> D, "l_extendedprice" -> D, "l_discount" -> D, "l_tax" -> D,
      "l_returnflag" -> S, "l_linestatus" -> S, "l_shipdate" -> T))),
    // ts EXACT TimestampType: the loader's whole job is normalizing
    // nanos-long / NTZ-micros / LTZ inputs to the session-zone type the
    // query literals compare against
    "events" -> ((Tables.events _, Map(
      "event_id" -> I, "ts" -> Set[DataType](TimestampType), "user_id" -> I,
      "event_type" -> S, "value" -> D, "props" -> S))),
    "documents" -> ((Tables.documents _, Map(
      "doc_id" -> I, "text" -> S, "lang" -> S, "source" -> S, "n_chars" -> I))),
    "embeddings" -> ((Tables.embeddings _, Map(
      "vec_id" -> I, "embedding" -> VEC, "label" -> I)))
  )

  /** Drift messages for one table under `dir`; empty = healthy. */
  def driftFor(spark: SparkSession, dir: String, table: String): Seq[String] = {
    val (loader, cols) = expected(table)
    try {
      val schema = loader(spark, dir).schema
      cols.toSeq.sortBy(_._1).flatMap { case (c, ok) =>
        schema.find(_.name == c) match {
          case None =>
            Seq(s"DRIFT $table.$c: column MISSING (file has: ${schema.fieldNames.mkString(", ")})")
          case Some(f) if !ok(f.dataType) =>
            Seq(s"DRIFT $table.$c: type is ${f.dataType.sql}, expected one of ${ok.map(_.sql).mkString("/")}")
          case _ => Nil
        }
      }
    } catch {
      case e: Throwable =>
        Seq(s"DRIFT $table: loader failed — ${e.getClass.getSimpleName}: ${e.getMessage}")
    }
  }

  /** Full-directory preflight: all tables, all drift messages. */
  def drift(spark: SparkSession, dir: String): Seq[String] =
    expected.keys.toSeq.sorted.flatMap(driftFor(spark, dir, _))
}
