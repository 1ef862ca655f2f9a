package graft.scale

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A decoded media asset's typed metadata (the schema a real decoder
  * would fill; the decode itself is stubbed — see [[Multimodal]]). */
case class MediaMeta(asset_id: Long, kind: String, width: Int, height: Int,
                     n_frames: Int, sample_rate: Int, duration_ms: Long,
                     byte_len: Long, content_hash: String)

/** Multimodal columns for a training-data pipeline (BASELINE north
  * star): images / audio / video ride through the engine as opaque
  * `binary` columns plus typed metadata, exactly like any other column
  * — partitioned, predicate-pushed, shuffled by key.
  *
  * The actual media decode (JPEG headers, audio resampling, video
  * frame extraction) needs native libraries that are NOT in this
  * container, so the decode kernel is a clearly-marked deterministic
  * STUB ([[stubDecode]]); everything around it — the binary schema,
  * the batched mapPartitions plumbing, partitioning, the feature
  * pipeline shape — is real and tested, and a real decoder drops in by
  * replacing one function.
  *
  * Scale notes:
  *  - assets are processed with `mapPartitions` so a real decoder
  *    amortizes per-batch init (model load, codec contexts) across the
  *    partition — same batch shape as Arrow-batched pandas UDFs;
  *  - metadata extraction is columnar where possible (byte length,
  *    hashes, magic-byte sniffing are codegen'd expressions — no JVM
  *    object churn);
  *  - binary payloads never shuffle for metadata-only queries: derive
  *    metadata first, then select narrow columns and let column
  *    pruning drop the bytes from the scan.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType), StructField("kind", StringType),
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("n_frames", IntegerType), StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType), StructField("byte_len", LongType),
    StructField("content_hash", StringType)))

  /** Build a synthetic asset table from the documents table: the text
    * bytes stand in for media payloads (deterministic, no media libs
    * needed); kind cycles image/audio/video. */
  def syntheticAssets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast(IntegerType)).as("kind"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Columnar (codegen'd) metadata that needs no decoder: size, hash,
    * magic-byte sniff. This is the fast path — runs at scan speed and
    * never leaves WholeStageCodegen. */
  def columnarMeta(assets: DataFrame): DataFrame =
    assets.select(
      col("asset_id"), col("kind"),
      length(col("payload")).cast(LongType).as("byte_len"),
      md5(col("payload")).as("content_hash"),
      substring(hex(col("payload")), 1, 8).as("magic"))

  /** STUB decode kernel — deterministic fake standing in for the real
    * native decoder (??? in spirit; returns synthetic dimensions
    * derived from the payload hash so tests are stable). A real
    * implementation replaces ONLY this function with e.g. an
    * ImageIO/ffmpeg call; the Spark plumbing around it is unchanged.
    */
  def stubDecode(assetId: Long, kind: String, payload: Array[Byte]): MediaMeta = {
    val h = java.util.Arrays.hashCode(payload).abs.toLong
    val (w, ht, frames, rate, dur) = kind match {
      case "image" => ((h % 1920 + 1).toInt, (h % 1080 + 1).toInt, 1, 0, 0L)
      case "audio" => (0, 0, 0, 16000, h % 600000)
      case _       => ((h % 1280 + 1).toInt, (h % 720 + 1).toInt, (h % 3600 + 1).toInt, 0, h % 7200000)
    }
    MediaMeta(assetId, kind, w, ht, frames, rate, dur, payload.length.toLong,
      f"${java.util.Arrays.hashCode(payload)}%08x")
  }

  /** Decode assets to typed metadata via batched mapPartitions — the
    * plumbing a real decoder uses (per-partition init, row batches in,
    * typed rows out). */
  def decode(spark: SparkSession, assets: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    assets.select(col("asset_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        // a real decoder initializes its codec context HERE, once per
        // partition, then streams the batch through it
        batch.map { case (id, kind, payload) => stubDecode(id, kind, payload) }
      }
  }

  /** Frame sampling for video assets: explode n_frames into sampled
    * frame rows (every `stride`-th frame) — the row-multiplying shape
    * of a real frame extractor, without the pixels. */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Int = 30): DataFrame =
    meta.toDF()
      .filter(col("kind") === "video" && col("n_frames") > 0)
      .select(col("asset_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Feature pipeline over decoded metadata: per-kind stats — the
    * aggregation a data-quality dashboard runs over a 100 TB corpus.
    * One hash-aggregate, no payload bytes involved (column pruning
    * drops them at the scan). */
  def corpusMediaStats(meta: Dataset[MediaMeta]): DataFrame =
    meta.toDF().groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("byte_len")).as("total_bytes"),
        avg(col("duration_ms")).as("avg_duration_ms"),
        countDistinct(col("content_hash")).as("n_unique"))
}
