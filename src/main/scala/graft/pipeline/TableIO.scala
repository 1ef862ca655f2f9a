package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.format.DateTimeFormatter
import java.time.{ZoneOffset, ZonedDateTime}
import scala.jdk.CollectionConverters._

/** Table I/O for the datapoint pipeline (SURVEY §2.1 S1–S12).
  *
  * Reference behaviors re-expressed for Spark:
  *  - multi-line, quote-escaped CSV cells (`csv.DictReader` reads full
  *    source files embedded in cells, `patch_dp.py:37-47`) →
  *    `multiLine=true, escape="` reads;
  *  - `csv.QUOTE_ALL` production writes (`approve_datapoint.py:153`) →
  *    `quoteAll=true`;
  *  - temp-file + `os.replace` atomic commit (`task_manager.py:97-107`
  *    and the five S5 sites) → write to a `.tmp` sibling directory,
  *    then atomic directory move;
  *  - timestamped archive snapshot before mutation
  *    (`approve_datapoint.py:56-63`).
  *
  * Scale note: CSV with multiLine=true is NOT splittable — one file is
  * one partition — so CSV stays an edge format for import/export parity
  * with the reference, and Parquet is the canonical store ([[writeParquet]]).
  * A 100 TB corpus lives as partitioned parquet; CSV appears only when
  * round-tripping the reference's own tables.
  */
object TableIO {

  /** Read a reference-style CSV (multi-line cells, embedded quotes,
    * header-driven schema — extra legacy columns are preserved). */
  def readCsv(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
    schema.fold(r.option("inferSchema", "false"))(r.schema).csv(path)
  }

  /** Write a CSV table the way the reference writes production
    * (`QUOTE_ALL`), into a single file-per-partition directory. */
  def writeCsv(df: DataFrame, path: String, quoteAll: Boolean = false): Unit =
    df.write
      .option("header", "true")
      .option("escape", "\"")
      .option("quoteAll", quoteAll.toString)
      // the CSV WRITER trims cell whitespace by default — a silent
      // mutation (the review fixture's dirty "medium\n" difficulty
      // would round-trip as "medium"); csv.writer never trims
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .mode(SaveMode.Overwrite)
      .csv(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** ORC sink/source — the other columnar interchange format a Spark
    * shop meets (Hive-era tables). Same pushdown/pruning behavior as
    * parquet; parquet stays the canonical store. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Atomic overwrite protocol (S5): stage the full rewrite in a `.tmp`
    * sibling, then swap via rename. Mirrors temp+`os.replace` at
    * `task_manager.py:97-107` at directory granularity — but directory
    * swap needs TWO renames (dest→`.old`, `.tmp`→dest), so there is a
    * brief window with no destination. Correctness contract:
    *  - mutators AND readers serialize through [[withLock]] (the CLI
    *    does), so no live process observes the window;
    *  - a crash inside the window strands the table at `.old`;
    *    [[recoverOld]] repairs that on the next locked read or write —
    *    the data is never lost, only parked.
    */
  def atomicOverwrite(df: DataFrame, dest: String, format: String = "parquet",
                      quoteAll: Boolean = false): Unit = {
    recoverOld(dest)
    val destPath = Paths.get(dest)
    val tmp = destPath.resolveSibling(destPath.getFileName.toString + ".tmp")
    deleteRecursive(tmp)
    format match {
      case "csv" => writeCsv(df, tmp.toString, quoteAll)
      case "orc" => writeOrc(df, tmp.toString)
      case _     => writeParquet(df, tmp.toString)
    }
    val old = destPath.resolveSibling(destPath.getFileName.toString + ".old")
    deleteRecursive(old)
    if (Files.exists(destPath)) Files.move(destPath, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, destPath, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursive(old)
  }

  /** Crash reconciliation for [[atomicOverwrite]]: if a writer died
    * between the two renames, the destination is missing and the whole
    * table sits at `.old` — restore it. If the destination exists, any
    * `.old`/`.tmp` leftovers are from a crash after (or before) the
    * commit point and are safe to clear. Idempotent; call under the
    * same [[withLock]] as mutations. */
  def recoverOld(dest: String): Unit = {
    val destPath = Paths.get(dest)
    val old = destPath.resolveSibling(destPath.getFileName.toString + ".old")
    if (!Files.exists(destPath)) {
      if (Files.exists(old)) Files.move(old, destPath, StandardCopyOption.ATOMIC_MOVE)
    } else {
      deleteRecursive(old)
    }
  }

  /** Timestamped backup snapshot before mutation (S9):
    * `archive/dataset_YYYYMMDD_HHMMSS[.csv]`; reference
    * `approve_datapoint.py:56-63,134-144`. Returns the snapshot path. */
  def archiveSnapshot(src: String, archiveDir: String,
                      now: ZonedDateTime = ZonedDateTime.now(ZoneOffset.UTC)): String = {
    val stamp = now.format(DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss"))
    val dest = Paths.get(archiveDir, s"dataset_$stamp")
    Files.createDirectories(Paths.get(archiveDir))
    copyRecursive(Paths.get(src), dest)
    dest.toString
  }

  /** Archive the table iff it exists (first publish has nothing to back
    * up — matches `approve_datapoint.py:134-138`'s existence check). */
  def archiveSnapshotIfExists(src: String, archiveDir: String): Option[String] =
    if (Files.exists(Paths.get(src))) Some(archiveSnapshot(src, archiveDir)) else None

  /** Recursive directory → (path, content) rows (S7); reference
    * `patch_additional_files.py:105-122` `rglob('*')`. Binary-safe via
    * Spark's binaryFile source; content decoded as UTF-8 to mirror the
    * reference's text-only file maps. */
  def readFileMap(spark: SparkSession, dir: String): DataFrame = {
    val base = Paths.get(dir).toAbsolutePath.toString
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(
        regexp_replace(col("path"), lit("^file:" + base + "/"), lit("")).as("relpath"),
        col("content").cast("string").as("content"))
  }

  /** Exclusive cross-process lock around a mutation (P1 parity;
    * reference `fcntl.flock` with 5s timeout / 10ms spin,
    * `task_manager.py:64-90`): each `PipelineCli` invocation is its own
    * JVM — exactly the reference's process-per-command model — so
    * driver-side synchronization alone can't serialize them
    * (SURVEY §7.4.2). `FileChannel.tryLock` is the JVM flock.
    */
  def withLock[T](lockFile: String, timeoutMs: Long = 5000)(body: => T): T = {
    Files.createDirectories(Paths.get(lockFile).getParent)
    val ch = java.nio.channels.FileChannel.open(Paths.get(lockFile),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    try {
      val deadline = System.currentTimeMillis() + timeoutMs
      var lock: java.nio.channels.FileLock = null
      while (lock == null) {
        lock =
          try ch.tryLock()
          catch { case _: java.nio.channels.OverlappingFileLockException => null }
        if (lock == null) {
          if (System.currentTimeMillis() > deadline)
            throw new IllegalStateException(s"could not acquire $lockFile within ${timeoutMs}ms")
          Thread.sleep(10)
        }
      }
      try body finally lock.release()
    } finally ch.close()
  }

  // ---- local-fs helpers (driver-side; table dirs are small metadata,
  //      the data inside is written by executors) ----

  private[pipeline] def deleteRecursive(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }

  private def copyRecursive(src: Path, dest: Path): Unit = {
    Files.walk(src).iterator().asScala.foreach { p =>
      val target = dest.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(target)
      else {
        Files.createDirectories(target.getParent)
        Files.copy(p, target, StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }
}
