package graft.scale

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.functions.PortableFuncs.portableRound

/** Physical-layout and skew tooling for 100 TB operation — the pieces
  * that decide whether a plan that works at sf0.1 still works at
  * 1000 executors:
  *
  *  - **partitioned layout**: coarse, low-cardinality keys (date,
  *    lang, category) become directory partitions so partition pruning
  *    eliminates whole files before the scan;
  *  - **salted joins**: a handful of hot keys (the "null key" user,
  *    the viral document) otherwise send one reducer 1000× the median
  *    partition; salting fans the hot side over `salts` sub-keys and
  *    replicates the small side to match — shuffle stays balanced at
  *    the cost of `salts`× the small side;
  *  - **repartition-by-range** for sorted outputs: balanced output
  *    files with global order, without a single-partition sort.
  *
  * AQE (on by default in Spark 4) already splits skewed *shuffle
  * partitions* for sort-merge joins; explicit salting still matters
  * when the skew is in the *keys themselves* (AQE cannot split one
  * giant key group for aggregations or windows).
  */
object Layout {

  /** Widen parallelism for compute-heavy per-row stages when the
    * source is under-partitioned (e.g. a single-row-group parquet file
    * scans as ONE task, serializing all downstream rowside work). A
    * cheap round-robin shuffle of the narrow input buys full-cluster
    * parallelism; at real scale input partitions ≥ cores and this is a
    * no-op.
    *
    * The partition count is ESTIMATED from the logical plan's file
    * relation (same arithmetic Spark's FilePartition packing uses), not
    * read off `df.rdd` — materializing the RDD compiles a second
    * physical plan for every widened query just to read one number
    * (driver overhead on 10+ query paths). Non-file inputs (test
    * LocalRelations, in-memory frames) just repartition: those are
    * exactly the narrow inputs widen exists for, and a round-robin
    * shuffle of an already-wide frame is layout-only. */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    estimatedScanPartitions(df) match {
      case Some(est) => if (est >= target) df else df.repartition(target)
      // no logical-plan estimate (checkpointed/DSv2/in-memory input):
      // fall back to the actual partition count — it costs the second
      // physical-plan compile this method avoids on the hot file-scan
      // paths, but an unconditional repartition here would re-shuffle
      // an already-wide input, which is worse than a driver-side compile
      case None =>
        if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
    }
  }

  /** Estimate how many scan partitions Spark will give `df`, from the
    * logical plan only. Mirrors FilePartition.maxSplitBytes: files are
    * split into byte ranges of size
    * `min(maxPartitionBytes, max(openCostInBytes, totalBytes / cores))`,
    * so the partition count is ≈ totalBytes / splitSize. Returns None
    * for plans not backed purely by file relations (no estimate
    * possible without compiling the physical plan). */
  private def estimatedScanPartitions(df: DataFrame): Option[Long] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import org.apache.spark.network.util.JavaUtils.byteStringAsBytes
    val spark = df.sparkSession
    val leaves = df.queryExecution.analyzed.collectLeaves()
    val fileRels = leaves.collect {
      case l: LogicalRelation => l.relation
    }.collect { case fs: HadoopFsRelation => fs }
    if (fileRels.isEmpty || fileRels.size != leaves.size) None
    else {
      val maxSplit = byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
      val openCost = byteStringAsBytes(
        spark.conf.get("spark.sql.files.openCostInBytes", "4MB"))
      val cores = math.max(1L, spark.sparkContext.defaultParallelism.toLong)
      val totalBytes = fileRels.map { fs =>
        fs.location.sizeInBytes + fs.location.inputFiles.length.toLong * openCost
      }.sum
      val splitSize =
        math.min(maxSplit, math.max(openCost, totalBytes / cores))
      Some(math.max(1L, (totalBytes + splitSize - 1) / math.max(1L, splitSize)))
    }
  }

  /** Write partitioned parquet: directory-level pruning on `cols`.
    * Keep cardinality coarse (≤ a few thousand dirs) — small files
    * kill 100 TB scans as surely as skew does. */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Salted aggregation for skewed group-by keys: two-phase — partial
    * aggregate on (key, salt), final aggregate on key. The hot key's
    * rows spread over `salts` reducers in phase one; phase two only
    * combines `salts` partials per key. Usable for any algebraic agg. */
  def saltedCountSum(df: DataFrame, key: Column, value: Column,
                     salts: Int = 16): DataFrame =
    df.groupBy(key.as("k"), (pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(salts))).as("salt"))
      .agg(count(lit(1)).as("pc"), sum(value).as("ps"))
      .groupBy(col("k"))
      .agg(sum(col("pc")).as("n"), sum(col("ps")).as("total"))

  /** Skew-safe inner equi-join: salt the (big, skewed) left side,
    * explode the (small) right side across all salt values. Result is
    * identical to `big.join(small, keys)`; the shuffle is balanced. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(salts)))
    val explodedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(explodedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Save a table bucketed (and sorted) by the join key: both sides of
    * a recurring join bucketed the same way join WITHOUT a shuffle —
    * the single biggest standing cost eliminated for fact⋈fact joins
    * run many times over a 100 TB table. Requires a metastore table
    * (bucket metadata lives in the catalog, not the files). */
  def saveBucketed(df: DataFrame, table: String, key: String,
                   buckets: Int = 32): Unit =
    saveBucketedBy(df, table, Seq(key), buckets)

  /** Composite-key form of [[saveBucketed]]: bucket AND sort by the
    * full join key list — e.g. the (b, bv) MinHash band index that
    * [[graft.scale.Dedup.incrementalDedup]] semi-joins every ingest
    * batch against. Bucketing on the composite key makes the recurring
    * semi-join shuffle-free on THIS side: only the arriving batch is
    * hashed across the cluster, the persisted index never moves
    * (asserted by the PlanAuditSpec bucketed-index case). */
  def saveBucketedBy(df: DataFrame, table: String, keys: Seq[String],
                     buckets: Int = 32): Unit = {
    require(keys.nonEmpty, "saveBucketedBy needs at least one bucket key")
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir
  }

  /** Range-partitioned sorted output: global order across balanced
    * files (each file internally sorted, files ordered by range). */
  def writeSorted(df: DataFrame, path: String, sortCol: String,
                  partitions: Int = 32): Unit =
    df.repartitionByRange(partitions, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Morton (Z-order) key over two dimensions: interleave the low 32
    * bits of `x` and `y` (x on even bit positions, y on odd). Rows
    * close in BOTH dimensions land close on the curve, so sorting by
    * z clusters them into the same files/row-groups — a filter on
    * either dimension (or both) then prunes by min/max statistics,
    * which a single-column sort only provides for its one column.
    * The layout move behind Delta/Iceberg `ZORDER BY` for
    * two-predicate scans (point lookups on user × time windows).
    *
    * Pure codegen'd bit arithmetic (64 shift-mask-or terms, no UDF,
    * no lambda): at 100 TB the key computes at scan speed. Inputs are
    * masked to their low 32 bits — callers with wider domains bucket
    * first (a timestamp → epoch seconds fits until 2106). */
  def zValue(x: Column, y: Column): Column = {
    val xm = x.bitwiseAND(lit(0xffffffffL))
    val ym = y.bitwiseAND(lit(0xffffffffL))
    (0 until 32).map { b =>
      shiftleft(shiftrightunsigned(xm, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftrightunsigned(ym, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)
  }

  /** Z-ordered layout: range-partition and sort by the Morton key so
    * each output file covers one compact rectangle-ish region of the
    * (x, y) space — the write side of [[zValue]]'s pruning story. */
  def writeZOrdered(df: DataFrame, path: String, x: Column, y: Column,
                    partitions: Int = 32): Unit =
    df.withColumn("_z", zValue(x, y))
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Measure per-key skew: top keys by row count with their share of
    * the table — the diagnostic you run before choosing salts. */
  def skewProfile(df: DataFrame, key: Column, topK: Int = 10): DataFrame = {
    val counts = df.groupBy(key.as("k")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n")).head().getLong(0).toDouble
    counts.orderBy(col("n").desc).limit(topK)
      .withColumn("share", portableRound(col("n") / total, 4))
  }
}
