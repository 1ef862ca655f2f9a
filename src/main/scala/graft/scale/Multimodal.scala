package graft.scale

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.PortableFuncs.portableRound
import org.apache.spark.sql.types._

import graft.Materialize.CoreOps

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
  * Container HEADERS decode for real (PNG/JPEG/GIF/BMP/WAV/MP4 byte
  * parses below), and IMAGE PIXEL decode is real too — the JDK
  * bundles `javax.imageio` readers for PNG/JPEG/GIF/BMP, so
  * [[decodePixelStats]] walks true decoded pixels and the q179 gate
  * hash-certifies a full encode→decode round-trip against pure byte
  * math. What remains environment-bound is AUDIO/VIDEO sample decode
  * (codec libraries the JVM does not bundle): for those, and for any
  * payload no bundled reader accepts, [[stubDecode]] is the
  * clearly-marked deterministic fallback. Feature extraction is NOT
  * stubbed: [[byteHistogramFeatures]] is a certified deterministic
  * byte-level encoder with a hash-matching DuckDB oracle (q170).
  * Everything around the seam — the binary schema, the batched
  * mapPartitions plumbing, partitioning, the feature pipeline shape —
  * is real and tested, and an audio/video decoder drops in by
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

  /** Render raw bytes as a REAL 24-bit PNG through the JDK's own
    * codec ([[javax.imageio.ImageIO]], headless-safe): pixel i of a
    * `width`-wide image carries byte i as a gray value (R=G=B=byte),
    * tail pixels pad with 0; at least one row, so empty payloads still
    * render. PNG is lossless, so the pixels survive the encode/decode
    * round-trip bit-exactly — the property the q179 gate hash-certifies
    * end-to-end (encode HERE, decode in [[decodePixelStats]], stats
    * reproduced by the oracle from the source bytes alone). */
  private[graft] def renderPng(bytes: Array[Byte], width: Int = PixelWidth): Array[Byte] = {
    val n = bytes.length
    val h = math.max(1, (n + width - 1) / width)
    val img = new java.awt.image.BufferedImage(
      width, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var i = 0
    while (i < width * h) {
      val v = if (i < n) bytes(i) & 0xff else 0
      img.setRGB(i % width, i / width, (v << 16) | (v << 8) | v)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    // an EXPLICIT in-memory image stream: ImageIO's convenience
    // overloads consult the global useCache flag and default to a
    // DISK-backed cache (a temp file created and deleted per call —
    // two filesystem round-trips per row in the q179 hot loop, and a
    // hard failure on an unwritable tmpdir). Passing the stream
    // directly sidesteps the flag entirely — no mutation of global
    // JVM state from executor task threads, no effect on other
    // ImageIO users in the same JVM.
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try javax.imageio.ImageIO.write(img, "png", ios) finally ios.close()
    bos.toByteArray
  }

  /** REAL pixel-level decode — the seam [[stubDecode]]'s scaladoc
    * called environment-bound, closed for images with the JDK's
    * bundled readers (PNG/JPEG/GIF/BMP via `javax.imageio`, no native
    * libraries, headless-safe): decode the payload, walk every pixel
    * once, return exact integer statistics
    * (width, height, per-channel sums, min/max over all channels).
    * None when no bundled reader accepts the payload (the synthetic
    * text-byte assets, truncated files) — callers fall back to the
    * header parse / [[stubDecode]], which keeps the chain total. */
  def decodePixelStats(payload: Array[Byte])
      : Option[(Int, Int, Long, Long, Long, Int, Int)] = {
    // explicit in-memory image stream — see the [[renderPng]] note.
    // ImageIO.read(ImageInputStream)'s javadoc says the caller owns
    // closing the stream, but this JDK's implementation closes it in
    // its own finally after a successful read — so close defensively
    // (covers the reader-rejected/exception paths, where the JDK does
    // NOT close) and swallow the double-close's IOException("closed").
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    val img =
      try javax.imageio.ImageIO.read(iis)
      catch { case _: Exception => null }
      finally { try iis.close() catch { case _: Exception => () } }
    if (img == null) None
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var mn = 255; var mx = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          sr += r; sg += g; sb += b
          val lo = math.min(r, math.min(g, b)); val hi = math.max(r, math.max(g, b))
          if (lo < mn) mn = lo
          if (hi > mx) mx = hi
          x += 1
        }
        y += 1
      }
      Some((w, h, sr, sg, sb, mn, mx))
    }
  }

  /** q179's image geometry: bytes per pixel row. */
  val PixelWidth: Int = 64

  /** q179: the certified real-codec pixel board — every document's
    * bytes rendered as a true PNG ([[renderPng]]) and decoded back
    * through `javax.imageio` ([[decodePixelStats]]), one row of exact
    * pixel statistics per asset. The DuckDB oracle recomputes the
    * stats from the SOURCE bytes (hex-slice CTE, the q170 machinery)
    * — a hash match certifies the whole codec round-trip: encoder,
    * decoder, padding semantics and channel order all agree
    * bit-exactly. This closes the "pixel decode is environment-bound"
    * carryover for images: the decode is the JDK's real PNG codec,
    * not a stub; what remains environment-bound is only audio/video
    * sample decode (codec libraries the JVM does not bundle).
    *
    * Scale shape: one mapPartitions pass, codec context per executor,
    * no joins, no shuffle — the board runs at scan speed, and the
    * PNG blobs live only inside the partition iterator (never
    * materialized to a column), so memory is one image at a time. */
  def pixelDecodeBoard(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val bytes = Option(text).getOrElse("")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val (w, h, sr, sg, sb, mn, mx) =
            decodePixelStats(renderPng(bytes)).getOrElse(
              sys.error(s"JDK PNG round-trip failed for asset $id"))
          (id, w, h, sr, sg, sb, mn, mx)
        }
      }
      .toDF("asset_id", "width", "height", "sum_r", "sum_g", "sum_b",
        "min_c", "max_c")
  }

  /** Columnar (codegen'd) metadata that needs no decoder: size, hash,
    * magic-byte sniff. This is the fast path — runs at scan speed and
    * never leaves WholeStageCodegen. */
  def columnarMeta(assets: DataFrame): DataFrame =
    assets.select(
      col("asset_id"), col("kind"),
      length(col("payload")).cast(LongType).as("byte_len"),
      md5(col("payload")).as("content_hash"),
      substring(hex(col("payload")), 1, 8).as("magic"))

  /** REAL image-header decode for PNG, JPEG, GIF and BMP — pure byte
    * parsing of the container headers (PNG IHDR width/height at offset
    * 16; JPEG SOFn frame header scan; GIF87a/89a logical-screen
    * descriptor; BMP BITMAPINFOHEADER/-COREHEADER, top-down negative
    * heights normalized), no native libraries. Returns None for other
    * payloads — those fall back to [[stubDecode]].
    */
  def decodeImageHeader(payload: Array[Byte]): Option[(Int, Int)] = {
    def u16(i: Int) = ((payload(i) & 0xff) << 8) | (payload(i + 1) & 0xff)
    def u32(i: Int) = ((payload(i) & 0xff) << 24) | ((payload(i + 1) & 0xff) << 16) |
      ((payload(i + 2) & 0xff) << 8) | (payload(i + 3) & 0xff)
    if (payload.length >= 24 &&
        payload.take(8).sameElements(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))) {
      // PNG: signature(8) + IHDR len(4) + "IHDR"(4) + width(4) + height(4)
      Some((u32(16), u32(20)))
    } else if (payload.length >= 4 &&
        (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8) {
      // JPEG: walk segments to the first SOFn (C0-CF except C4/C8/CC)
      var i = 2
      while (i + 9 < payload.length && (payload(i) & 0xff) == 0xff) {
        val marker = payload(i + 1) & 0xff
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          // SOF: FF Cn len(2) precision(1) height(2) width(2)
          return Some((u16(i + 7), u16(i + 5)))
        }
        i += 2 + u16(i + 2)
      }
      None
    } else if (payload.length >= 10 && payload(0) == 'G' &&
        payload(1) == 'I' && payload(2) == 'F' && payload(3) == '8' &&
        (payload(4) == '7' || payload(4) == '9') && payload(5) == 'a') {
      // GIF: 6-byte version tag, then the logical screen descriptor
      // (width u16le at 6, height u16le at 8)
      def u16le(i: Int) = (payload(i) & 0xff) | ((payload(i + 1) & 0xff) << 8)
      Some((u16le(6), u16le(8)))
    } else if (payload.length >= 26 && payload(0) == 'B' && payload(1) == 'M') {
      // BMP: 14-byte file header, then a DIB header whose first u32le
      // is its own size — 12 = COREHEADER (u16 dims), ≥ 40 = INFOHEADER
      // (i32 dims; negative height = top-down row order, dimension is
      // the magnitude)
      def u16le(i: Int) = (payload(i) & 0xff) | ((payload(i + 1) & 0xff) << 8)
      def i32le(i: Int) = (payload(i) & 0xff) | ((payload(i + 1) & 0xff) << 8) |
        ((payload(i + 2) & 0xff) << 16) | ((payload(i + 3) & 0xff) << 24)
      val dib = i32le(14)
      if (dib == 12) Some((u16le(18), u16le(20)))
      else if (dib >= 40 && payload.length >= 14 + 12)
        Some((i32le(18), math.abs(i32le(22))))
      else None
    } else None
  }

  /** REAL audio-header decode for WAV (RIFF) containers — pure chunk
    * walking, no codec libraries: find the `fmt ` chunk (channels,
    * sample rate, bits/sample) and the `data` chunk (payload length),
    * from which duration follows exactly. Returns None for non-RIFF
    * payloads — those fall back to [[stubDecode]]'s synthetic values.
    */
  def decodeWavHeader(p: Array[Byte]): Option[(Int, Int, Int, Long)] =
    wavFmtData(p).map { case ((ch, rate, bits), (_, dl)) => (rate, ch, bits, dl) }

  /** The RIFF chunk walk behind [[decodeWavHeader]] and
    * [[decodeWavSamples]]: fmt (channels, rate, bits) plus the data
    * chunk's OFFSET and length. Same malformed-container discipline
    * (Long-math advance, in-bounds data length, word alignment). */
  private def wavFmtData(p: Array[Byte])
      : Option[((Int, Int, Int), (Int, Long))] = {
    def u32le(i: Int): Long = (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
      ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
    def u16le(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    if (p.length < 44) return None
    if (!(p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
          p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E')) return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Long)] = None    // (offset, length)
    var corrupt = false
    while (!corrupt && i + 8 <= p.length && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(p, i, 4, "US-ASCII")
      val len = u32le(i + 4)
      // fmt chunk: format(2) channels(2) rate(4) byterate(4) align(2) bits(2)
      if (id == "fmt " && i + 24 <= p.length)
        fmt = Some((u16le(i + 10), u32le(i + 12).toInt, u16le(i + 22)))
      // only trust a data length the payload can actually hold — a
      // corrupt 32-bit length would otherwise yield a days-long
      // duration for a tiny file
      else if (id == "data" && len <= p.length - (i + 8)) data = Some((i + 8, len))
      // advance in Long math: a corrupt 32-bit length must not wrap to
      // a negative/zero step (infinite loop) or overflow the index —
      // treat it as a malformed container and stop walking
      val next = i.toLong + 8L + len + (len & 1L) // RIFF chunks are word-aligned
      if (next <= i || next > Int.MaxValue) corrupt = true
      else i = next.toInt
    }
    if (corrupt && (fmt.isEmpty || data.isEmpty)) return None
    for { f @ (ch, rate, bits) <- fmt; d <- data if rate > 0 && ch > 0 && bits > 0 }
      yield (f, d)
  }

  /** q180's audio geometry: sample rate of the rendered PCM. */
  val WavSampleRate: Int = 16000

  /** Render raw bytes as a REAL 16-bit PCM mono WAV: consecutive byte
    * PAIRS become little-endian signed samples (an odd tail byte gets
    * a zero high byte), under a standard 44-byte RIFF/fmt/data header
    * at [[WavSampleRate]]. PCM is uncompressed, so the samples survive
    * the render→decode round-trip bit-exactly — the property the q180
    * gate hash-certifies (render HERE, decode in
    * [[decodeWavSamples]], stats reproduced by the oracle from the
    * source bytes alone). */
  private[graft] def renderWav(bytes: Array[Byte],
                               rate: Int = WavSampleRate): Array[Byte] = {
    val n = bytes.length
    val dataLen = n + (n & 1)
    val out = new Array[Byte](44 + dataLen)
    def tag(i: Int, s: String): Unit = {
      var k = 0; while (k < s.length) { out(i + k) = s.charAt(k).toByte; k += 1 }
    }
    def u32(i: Int, v: Long): Unit = { var k = 0
      while (k < 4) { out(i + k) = ((v >> (8 * k)) & 0xff).toByte; k += 1 } }
    def u16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte }
    tag(0, "RIFF"); u32(4, 36L + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); u32(16, 16L); u16(20, 1); u16(22, 1) // PCM, mono
    u32(24, rate.toLong); u32(28, rate.toLong * 2)        // byte rate
    u16(32, 2); u16(34, 16)                               // align, bits
    tag(36, "data"); u32(40, dataLen.toLong)
    System.arraycopy(bytes, 0, out, 44, n)
    out
  }

  /** REAL PCM sample decode — closes the audio half of the decode
    * seam for UNCOMPRESSED audio, no codec library required: walk the
    * RIFF container ([[wavFmtData]]), read every 16-bit little-endian
    * signed sample, return exact integer statistics (rate, sample
    * count, sum, min, max, Σ s² — the RMS numerator, exact in a
    * Long). Mono 16-bit only (the rendered contract); multi-channel
    * or other bit depths return None and ride the header-only path —
    * as do non-RIFF payloads. Compressed audio (MP3/AAC) remains the
    * genuinely environment-bound seam. */
  def decodeWavSamples(p: Array[Byte])
      : Option[(Int, Long, Long, Int, Int, Long)] =
    wavFmtData(p).flatMap { case ((ch, rate, bits), (off, dl)) =>
      if (ch != 1 || bits != 16) None
      else {
        val n = (dl / 2L).toInt // a malformed odd data length floors
        var sum = 0L; var ss = 0L
        var mn = Int.MaxValue; var mx = Int.MinValue
        var i = 0
        while (i < n) {
          // high byte is SIGNED: Byte→Int sign-extension << 8 gives
          // the two's-complement 16-bit value directly
          val s = (p(off + 2 * i + 1).toInt << 8) | (p(off + 2 * i) & 0xff)
          sum += s; ss += s.toLong * s
          if (s < mn) mn = s
          if (s > mx) mx = s
          i += 1
        }
        if (n == 0) Some((rate, 0L, 0L, 0, 0, 0L))
        else Some((rate, n.toLong, sum, mn, mx, ss))
      }
    }

  /** q180: the certified real-PCM audio board — every document's bytes
    * rendered as a true 16-bit mono WAV ([[renderWav]]) and decoded
    * back sample-by-sample ([[decodeWavSamples]]); the DuckDB oracle
    * recomputes the statistics from the SOURCE byte pairs alone, so a
    * hash match certifies the container writer, the chunk walker, the
    * signed little-endian sample decode and the odd-tail padding all
    * agree bit-exactly. Same scale shape as q179: one mapPartitions
    * pass, no joins, no shuffle; WAV blobs never leave the iterator. */
  def audioDecodeBoard(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val bytes = Option(text).getOrElse("")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val (rate, n, sum, mn, mx, ss) =
            decodeWavSamples(renderWav(bytes)).getOrElse(
              sys.error(s"PCM round-trip failed for asset $id"))
          (id, rate, n, sum, mn, mx, ss)
        }
      }
      .toDF("asset_id", "rate", "n_samples", "sum_s", "min_s", "max_s",
        "sum_sq")
  }

  /** REAL video-header decode for MP4 / ISO-BMFF containers — pure
    * box walking (public format knowledge: ISO/IEC 14496-12), no codec
    * libraries: `moov/mvhd` gives timescale + duration, each
    * `moov/trak/tkhd` gives 16.16-fixed track dimensions, and the
    * video track's `stbl/stsz` gives the frame (sample) count. Only a
    * trak whose tkhd has nonzero width × height commits its sample
    * count — an audio trak's AAC frame count must not masquerade as
    * video frames. Returns (width, height, n_frames, duration_ms);
    * None for non-BMFF payloads — those fall back to [[stubDecode]]'s
    * synthetic values.
    *
    * Malformed-container discipline matches [[decodeWavHeader]]: box
    * sizes are advanced in Long math, a size that would step
    * backwards or past the parent ends the walk instead of looping or
    * over-reading (64-bit `largesize` and size-0 "to end of file"
    * boxes are both handled), and container nesting is capped at
    * [[MaxBoxDepth]] — a crafted payload of minimal 8-byte container
    * boxes would otherwise recurse ~payload_len/8 deep and throw
    * StackOverflowError, an Error the catch discipline can't contain.
    * Real BMFF never nests past ~6 (moov/trak/mdia/minf/stbl/stsd).
    */
  val MaxBoxDepth = 32
  def decodeMp4Header(p: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def u32(i: Int): Long = ((p(i) & 0xffL) << 24) | ((p(i + 1) & 0xffL) << 16) |
      ((p(i + 2) & 0xffL) << 8) | (p(i + 3) & 0xffL)
    def u64(i: Int): Long = (0 until 8).foldLeft(0L)((a, k) => (a << 8) | (p(i + k) & 0xffL))
    def typ(i: Int): String = new String(p, i + 4, 4, "US-ASCII")
    if (p.length < 16 || typ(0) != "ftyp") return None
    val containers = Set("moov", "mdia", "minf", "stbl")
    var timescale = 0L; var duration = 0L
    var width = 0; var height = 0; var nFrames = 0L
    // per-trak scratch: committed only if the trak turns out to be video
    var tW = 0; var tH = 0; var tFrames = 0L
    def boxes(start: Int, end: Int, depth: Int): Unit = {
      if (depth > MaxBoxDepth) return // malformed: stop descending
      var i = start
      var ok = true
      while (ok && i + 8 <= end) {
        val size0 = u32(i)
        var hdr = 8L
        val size: Long =
          if (size0 == 1L && i + 16 <= end) { hdr = 16L; u64(i + 8) }
          else if (size0 == 0L) (end - i).toLong // box runs to container end
          else size0
        // overflow-free form of "i + size > end": a crafted 64-bit
        // largesize near 2^63 would wrap i + size negative and let the
        // walk step backwards into an infinite loop
        if (size < hdr || size > (end - i).toLong) ok = false // malformed: stop
        else {
          val body = (i + hdr).toInt
          val bodyEnd = (i + size).toInt
          typ(i) match {
            case c if containers.contains(c) => boxes(body, bodyEnd, depth + 1)
            case "trak" =>
              tW = 0; tH = 0; tFrames = 0L
              boxes(body, bodyEnd, depth + 1)
              if (tW > 0 && tH > 0) { width = tW; height = tH; nFrames = tFrames }
            case "mvhd" if body + 4 <= bodyEnd =>
              val v = p(body) & 0xff
              if (v == 1 && body + 32 <= bodyEnd) {
                timescale = u32(body + 20); duration = u64(body + 24)
              } else if (v == 0 && body + 24 <= bodyEnd) {
                timescale = u32(body + 12); duration = u32(body + 16)
              }
            case "tkhd" if body + 4 <= bodyEnd =>
              // v0: ver/flags(4) times(8) id(4) res(4) dur(4) res(8)
              //     layer/alt/vol/res(8) matrix(36) → width at +76;
              // v1 widens times+duration by 4 each → width at +88
              val wOff = if ((p(body) & 0xff) == 1) body + 88 else body + 76
              if (wOff + 8 <= bodyEnd) {
                val w = (u32(wOff) >> 16).toInt // 16.16 fixed point
                val h = (u32(wOff + 4) >> 16).toInt
                if (w > 0 && h > 0) { tW = w; tH = h }
              }
            case "stsz" if body + 12 <= bodyEnd =>
              tFrames = u32(body + 8) // sample_count (even for fixed-size)
            case _ => ()
          }
          i = (i + size).toInt
        }
      }
    }
    boxes(0, p.length, 0)
    // numeric sanity, same malformed-container discipline as the walk:
    // a corrupt 0xFFFFFFFF sample_count must not wrap to -1 frames,
    // and a corrupt 64-bit mvhd duration must not overflow the ms math
    if (timescale > 0 && width > 0 && height > 0 &&
        nFrames <= Int.MaxValue && duration >= 0 &&
        duration <= Long.MaxValue / 1000L)
      Some((width, height, nFrames.toInt, duration * 1000L / timescale))
    else None
  }

  /** STUB decode kernel — deterministic fake standing in for the real
    * native decoder where decode genuinely needs codec libraries not
    * in this container (pixel data, audio resampling; returns
    * synthetic dimensions derived from the payload hash so tests are
    * stable). All three CONTAINER headers are decoded for REAL from
    * bytes: PNG/JPEG dimensions ([[decodeImageHeader]]), WAV
    * sample-rate/duration ([[decodeWavHeader]]), MP4 dimensions/
    * frames/duration ([[decodeMp4Header]]); a full decoder replaces
    * ONLY this function, the Spark plumbing around it is unchanged.
    */
  def stubDecode(assetId: Long, kind: String, payload: Array[Byte]): MediaMeta = {
    if (kind == "image") {
      decodeImageHeader(payload).foreach { case (w, h) =>
        return MediaMeta(assetId, kind, w, h, 1, 0, 0L, payload.length.toLong,
          f"${java.util.Arrays.hashCode(payload)}%08x")
      }
    }
    if (kind == "audio") {
      decodeWavHeader(payload).foreach { case (rate, ch, bits, dataLen) =>
        val durMs = dataLen * 8L * 1000L / (rate.toLong * ch * bits)
        return MediaMeta(assetId, kind, 0, 0, 0, rate, durMs,
          payload.length.toLong, f"${java.util.Arrays.hashCode(payload)}%08x")
      }
    }
    if (kind == "video") {
      decodeMp4Header(payload).foreach { case (w, h, frames, durMs) =>
        return MediaMeta(assetId, kind, w, h, frames, 0, durMs,
          payload.length.toLong, f"${java.util.Arrays.hashCode(payload)}%08x")
      }
    }
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

  /** Resize planning for image assets: aspect-preserving fit into a
    * `maxW`×`maxH` box, never upscaling. The geometry (scale factor,
    * output dims) is REAL and fully tested; the pixel resample itself
    * is the stubbed native step — a real pipeline feeds (asset_id,
    * payload, out_w, out_h) through the same mapPartitions decode
    * plumbing as [[decode]]. Pure codegen'd projection: at 100 TB the
    * plan runs at scan speed and only assets that actually shrink
    * (`scale < 1`) reach the expensive resample stage. */
  def resizePlan(meta: Dataset[MediaMeta], maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(1.0),
      least(lit(maxW.toDouble) / col("width"), lit(maxH.toDouble) / col("height")))
    meta.toDF()
      .filter(col("kind") === "image" && col("width") > 0 && col("height") > 0)
      .select(col("asset_id"), col("width"), col("height"),
        portableRound(scale, 6).as("scale"),
        greatest(floor(col("width") * scale + 0.5), lit(1L)).cast(IntegerType).as("out_w"),
        greatest(floor(col("height") * scale + 0.5), lit(1L)).cast(IntegerType).as("out_h"),
        (scale < 1.0).as("needs_resample"))
  }

  /** The certified media-feature dimensionality — ONE definition feeds
    * the Scala kernel default, the q170 gate call and the interpolated
    * DuckDB oracle (the q162 shared-constant discipline). */
  val MediaFeatureDim = 16

  /** Deterministic byte-level feature kernel — the certified encoder
    * that replaced the round-13 stub: a `dim`-bin byte histogram
    * (bin(b) = b·dim/256 over unsigned byte values) L2-normalized as
    * v_i = c_i / √(Σ c_j²). Bin counts are exact integers, Σc² is an
    * exact long, and each component is ONE exactly-rounded IEEE sqrt,
    * ONE division and ONE float32 cast — bit-identical in any engine,
    * which is what makes the q170 oracle possible. It is a real (if
    * simple) content signature: byte-range composition separates
    * text / UTF-8 / binary / compressed payloads, and identical
    * payloads embed identically — the property the ANN/dedup hand-off
    * rides. A production encoder (CLIP tower, audio embedder)
    * replaces ONLY this function; the mapPartitions seam in
    * [[extractFeatures]] is unchanged. Empty payloads map to the
    * zero vector. */
  def byteHistogramFeatures(payload: Array[Byte],
                            dim: Int = MediaFeatureDim): Array[Float] = {
    require(dim >= 1 && dim <= 256, s"dim must be in [1, 256]: $dim")
    val counts = new Array[Long](dim)
    var i = 0
    while (i < payload.length) {
      counts((payload(i) & 0xff) * dim / 256) += 1L
      i += 1
    }
    var ss = 0L
    var j = 0
    while (j < dim) { ss += counts(j) * counts(j); j += 1 }
    val out = new Array[Float](dim)
    if (ss > 0L) {
      val denom = math.sqrt(ss.toDouble)
      j = 0
      while (j < dim) { out(j) = (counts(j).toDouble / denom).toFloat; j += 1 }
    }
    out
  }

  /** Feature extraction over raw assets — the embedding column a
    * CLIP-dedup / media-ANN pipeline runs on. Same batched
    * mapPartitions plumbing as [[decode]] (per-partition encoder init,
    * rows in, (asset_id, kind, embedding) out); the output schema is
    * EXACTLY the embeddings-table contract (`vec_id`, `embedding
    * array<float>`), so the whole Similarity/Dedup ANN battery —
    * [[Dedup.embeddingNearDup]], the LSH/IVF/PQ index family —
    * consumes media embeddings unchanged ([[MultimodalSpec]] drives
    * that hand-off end-to-end: duplicated payloads land as a
    * cosine-1.0 near-dup pair). */
  def extractFeatures(spark: SparkSession, assets: DataFrame,
                      dim: Int = MediaFeatureDim): DataFrame = {
    import spark.implicits._
    assets.select(col("asset_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        // a real encoder loads its weights HERE, once per partition
        batch.map { case (id, kind, payload) =>
          (id, kind, byteHistogramFeatures(payload, dim))
        }
      }
      .toDF("vec_id", "kind", "embedding")
  }

  /** Feature dimensionality for the media→ANN hand-off: equal to
    * [[Similarity.Dim]] so media embeddings are a DROP-IN for every
    * index in the ANN family (the sign-plane literals, the IVF
    * centroids and the JL projections are all [[Similarity.Dim]]-wide).
    * [[byteHistogramFeatures]] supports any dim ≤ 256; the q170 gate
    * certifies the kernel at [[MediaFeatureDim]], this constant feeds
    * the q173 cross-modal dedup chain. */
  val MediaAnnDim: Int = Similarity.Dim

  /** q173's cosine gate. Byte histograms of same-language text cluster
    * tight (measured sf0.01: median pairwise cos 0.986), so the
    * near-dup read needs a high bar — 0.999 keeps a few hundred pairs
    * at sf0.01, the near-identical-payload stratum. The comparison
    * runs on the RAW IEEE cosine (rounding is display-only), the q69
    * discipline. */
  val MediaNearDupMinCos: Double = 0.999

  /** q173's audit-slice bound (asset_id < bound), the q29/q88
    * discipline: the gate board certifies the chain, it is not the
    * corpus pass. Byte-histogram text embeddings are maximally
    * concentrated — ~the whole corpus lands in ONE sign-plane bucket
    * (measured sf0.01: 494 of 500) — so the FIXED-plane chain's
    * inherent pair volume is quadratic in corpus size; the bounded
    * grid keeps every TASK at ~hotDf² but the total is the
    * contract's. The production corpus pass is [[mediaNearDupCelled]]
    * (q176): data-dependent cell + diff-plane blocking makes the
    * candidate volume sub-quadratic WITHOUT this bound — q173 stays
    * on the board as the exhaustive-within-bucket referee the celled
    * chain reconciles against on this slice. */
  val MediaNearDupMaxId: Long = 1000L

  /** q173: cross-modal dedup end-to-end — the [[extractFeatures]]
    * media embeddings (certified byte-histogram encoder, q170) fed
    * straight through the PRODUCTION near-dup chain
    * ([[Dedup.embeddingNearDupLsh]], q69: sign-plane buckets, bounded
    * bucket self-join, cosine gate), over the
    * [[MediaNearDupMaxId]]-bounded audit slice. This is the loop a
    * CLIP-dedup pipeline runs at 100 TB: encode assets once, bucket,
    * pair within buckets, keep near-identical payloads.
    *
    * Scale note: text-byte payloads are the adversarial case for the
    * bucketing — same-language assets agree with most sign planes, so
    * ONE bucket holds ~the whole slice (measured sf0.01: 494 of 500).
    * That is exactly the hot-bucket shape
    * [[Skew.boundedSelfPairs]] exists for, and this board rides it by
    * construction (the q69 chain routes every bucket self-join through
    * the grid). */
  def mediaNearDup(spark: SparkSession, docs: DataFrame): DataFrame =
    Dedup.embeddingNearDupLsh(
      extractFeatures(spark,
        syntheticAssets(docs.filter(col("doc_id") < MediaNearDupMaxId)),
        dim = MediaAnnDim)
        .select(col("vec_id"), col("embedding")),
      MediaNearDupMinCos)

  /** The media embedding table at the ANN dim — the (vec_id, embedding)
    * contract every Similarity/Dedup consumer reads. */
  private[graft] def mediaEmbeddings(spark: SparkSession,
                                     docs: DataFrame): DataFrame =
    extractFeatures(spark, syntheticAssets(docs), dim = MediaAnnDim)
      .select(col("vec_id"), col("embedding"))

  /** The celled chain's seed-centroid list, computed from a
    * SOURCE-bounded scan: the feature kernel is an opaque
    * mapPartitions pass, so a `vec_id < k` filter on its OUTPUT would
    * still encode every payload — bound the documents read instead
    * (the predicate reaches the parquet scan) and encode only the k
    * seed assets. */
  private[graft] def mediaSeeds(spark: SparkSession,
      docs: DataFrame): Seq[(Long, Seq[Double])] =
    // norm-filtered like the oracle's `cents FROM bk` (bk bounds
    // nrm > 0): an empty asset's all-zero embedding must not seed a
    // cell it could never cosine-match (fuzz round 19)
    Similarity.seedCentroidList(
      Similarity.nonZeroNorm(mediaEmbeddings(spark,
        docs.filter(col("doc_id") < Similarity.IvfCells))),
      Similarity.IvfCells)

  /** q176: the FULL-CORPUS cross-modal near-dup — [[mediaNearDup]]'s
    * chain with [[Dedup.embeddingNearDupCelled]]'s data-dependent
    * blocking in place of the fixed planes alone, which is what lets
    * the audit-slice bound go: candidate volume on the concentrated
    * media corpus drops 12.50M → 0.63M at sf0.1 (priced in-gate by
    * q177), while every reported pair still passes the exact cosine
    * gate. The q173 board is the exhaustive referee on its slice:
    * this chain's candidates there are a strict subset (the fixed
    * bucket stays in every band key), and [[MultimodalSpec]] pins the
    * exact reconciliation — measured recall 0.585/0.543 of the
    * referee's pairs at sf0.001/sf0.1, the certified price of
    * sub-quadratic blocking (loss decomposition in the operator's
    * scaladoc; [[mediaNearDupCelled2]] is the multi-probe dial that
    * buys the cross-cell loss back). */
  def mediaNearDupCelled(spark: SparkSession, docs: DataFrame): DataFrame =
    Dedup.embeddingNearDupCelled(mediaEmbeddings(spark, docs),
      MediaNearDupMinCos, Some(mediaSeeds(spark, docs)))

  /** q178: the MULTI-PROBE cross-modal near-dup — [[mediaNearDupCelled]]
    * with each vector probing its top-2 cells
    * ([[Dedup.embeddingNearDupCelled2From]]). The recall dial the q176
    * scaladoc names: q176's loss is ~2/3 cross-CELL pairs, and probing
    * the runner-up cell recovers exactly the pairs whose endpoints
    * straddle one cell boundary. q176's candidates are a strict subset
    * (the primary cell is always probed), so this board ⊇ q176's and
    * recall vs the q173 referee can only rise — both pinned by
    * [[MultimodalSpec]]; the q177 `probe2_*` rows price the extra
    * volume in-gate. */
  def mediaNearDupCelled2(spark: SparkSession, docs: DataFrame): DataFrame = {
    val keyed = Dedup.celledKeyedVectors(mediaEmbeddings(spark, docs),
      mediaSeeds(spark, docs)).coreCheckpoint()
    Dedup.embeddingNearDupCelled2From(keyed, MediaNearDupMinCos,
      inputMaterialized = true)
  }

  /** q177: the blocking-volume board that PRICES q176's composition
    * (the q172 discipline — certify the knob inside the gate): per
    * blocking scheme, group count, max group size and the candidate
    * pair volume Σ d(d−1)/2 a group-equality self-join owes —
    * `lsh_bucket` is q173's fixed-plane key (concentration pins it
    * near the n(n−1)/2 worst case: measured 98.4% of quad_pairs at
    * sf0.1), `celled_band0`/`celled_band1` are q176's two band keys
    * (cell, bucket, 4-bit diff-plane word); the chain's total
    * candidate volume is ≤ their sum (band 1 subtracts the
    * both-bands-agree overlap). Sub-quadratic blocking = the band
    * rows' sum sitting orders of magnitude under quad_pairs
    * (measured sf0.1: 0.63M vs 12.50M). All exact integers — counts
    * and integer division only. */
  def mediaBlockingBoard(keyed: DataFrame): DataFrame =
    // the board itself is corpus-agnostic and shared with the primary
    // embeddings table (q182) — [[Dedup.celledBlockingBoard]]; this
    // alias keeps the media chain's entry point and its scaladoc
    Dedup.celledBlockingBoard(keyed)

  /** q170: the certified media-feature board — [[extractFeatures]]'s
    * embedding exploded to scalar (vec_id, kind, pos, value) rows so
    * the DuckDB oracle can restate the whole feature map (synthetic
    * assets → byte histogram → exact normalization → float32) and
    * hash-match it, closing the one operator that had no gate row.
    *
    * Scale design: the kernel is one pass over each payload's bytes
    * inside the mapPartitions seam; the explode is dim rows per
    * asset; no joins, no shuffle — the board runs at scan speed. */
  def mediaFeaturesBoard(spark: SparkSession, assets: DataFrame,
                         dim: Int = MediaFeatureDim): DataFrame =
    extractFeatures(spark, assets, dim)
      .select(col("vec_id"), col("kind"),
        posexplode(col("embedding")).as(Seq("pos", "value")))

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
