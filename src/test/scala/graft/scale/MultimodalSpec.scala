package graft.scale

import graft.SparkSpec
import graft.{Tables => T}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  lazy val assets = Multimodal.syntheticAssets(
    T.documents(spark, "/root/testdata/sf0.001")).cache()

  test("synthetic assets: binary payloads with cycling kinds") {
    assert(assets.count() === 500)
    val kinds = assets.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet === Set("image", "audio", "video"))
    assert(kinds.values.sum === 500L)
    assert(assets.schema("payload").dataType.typeName === "binary")
  }

  test("columnar metadata runs without decoding") {
    val meta = Multimodal.columnarMeta(assets)
    assert(meta.filter(col("byte_len") <= 0).count() === 0)
    assert(meta.select("content_hash").distinct().count() > 1)
  }

  test("stub decode is deterministic and fills kind-appropriate fields") {
    val payload = "hello".getBytes("UTF-8")
    val a = Multimodal.stubDecode(1, "image", payload)
    val b = Multimodal.stubDecode(1, "image", payload)
    assert(a === b)
    assert(a.width > 0 && a.height > 0 && a.n_frames === 1 && a.sample_rate === 0)
    val audio = Multimodal.stubDecode(2, "audio", payload)
    assert(audio.sample_rate === 16000 && audio.width === 0)
  }

  test("decode via mapPartitions produces typed metadata for every asset") {
    val meta = Multimodal.decode(spark, assets)
    assert(meta.count() === 500)
    assert(meta.filter(m => m.byte_len <= 0).count() === 0)
    // decode is deterministic: running twice gives identical results
    val h1 = Multimodal.decode(spark, assets).collect().sortBy(_.asset_id).toSeq
    val h2 = meta.collect().sortBy(_.asset_id).toSeq
    assert(h1 === h2)
  }

  test("frame sampling explodes only video assets at the stride") {
    val meta = Multimodal.decode(spark, assets)
    val frames = Multimodal.sampleFrames(meta, stride = 100)
    assert(frames.filter(col("frame_idx") % 100 =!= 0).count() === 0)
    val one = frames.groupBy("asset_id").count()
      .join(meta.toDF().select(col("asset_id"), col("n_frames")), "asset_id")
      .filter(col("count") =!= ceil(col("n_frames") / 100.0)).count()
    assert(one === 0)
  }

  test("real header decode: PNG IHDR and JPEG SOF dimensions") {
    // minimal valid PNG header: signature + IHDR chunk for 640x480
    val png = Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 2, 0x80, // width 640
      0, 0, 1, 0xe0, // height 480
      8, 6, 0, 0, 0).map(_.toByte)
    assert(Multimodal.decodeImageHeader(png) === Some((640, 480)))
    // minimal JPEG: SOI + APP0 (len 4) + SOF0 (precision 8, h=100, w=200)
    val jpg = Array[Int](0xff, 0xd8,
      0xff, 0xe0, 0, 4, 0, 0, // APP0, length 4
      0xff, 0xc0, 0, 11, 8, 0, 100, 0, 200, 1, 0x11, 0, 0).map(_.toByte)
    assert(Multimodal.decodeImageHeader(jpg) === Some((200, 100)))
    // non-image bytes -> None (stub path)
    assert(Multimodal.decodeImageHeader("not an image".getBytes) === None)
    // decode() routes a real PNG payload through the header parser
    val meta = Multimodal.stubDecode(7L, "image", png)
    assert(meta.width === 640 && meta.height === 480 && meta.n_frames === 1)
  }

  test("real header decode: GIF logical screen and BMP DIB headers, " +
    "top-down BMP height normalized") {
    // GIF89a, logical screen 320x200 (little-endian u16s)
    val gif = ("GIF89a".getBytes.map(_.toInt) ++
      Array(0x40, 0x01, 0xc8, 0x00, 0x00, 0x00, 0x00)).map(_.toByte)
    assert(Multimodal.decodeImageHeader(gif) === Some((320, 200)))
    // GIF87a also accepted
    val gif87 = ("GIF87a".getBytes.map(_.toInt) ++
      Array(0x10, 0x00, 0x08, 0x00, 0, 0, 0)).map(_.toByte)
    assert(Multimodal.decodeImageHeader(gif87) === Some((16, 8)))
    // BMP with BITMAPINFOHEADER (size 40), 800x600
    def le32(v: Int) = Array(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >>> 24) & 0xff)
    val bmp = (Array('B'.toInt, 'M'.toInt) ++ le32(0) ++ Array(0, 0, 0, 0) ++
      le32(54) ++ le32(40) ++ le32(800) ++ le32(600) ++ Array(1, 0, 24, 0)).map(_.toByte)
    assert(Multimodal.decodeImageHeader(bmp) === Some((800, 600)))
    // top-down BMP stores height -600; the dimension is its magnitude
    val bmpTd = (Array('B'.toInt, 'M'.toInt) ++ le32(0) ++ Array(0, 0, 0, 0) ++
      le32(54) ++ le32(40) ++ le32(800) ++ le32(-600) ++ Array(1, 0, 24, 0)).map(_.toByte)
    assert(Multimodal.decodeImageHeader(bmpTd) === Some((800, 600)))
    // ancient BITMAPCOREHEADER (size 12) uses u16 dims
    val bmpCore = (Array('B'.toInt, 'M'.toInt) ++ le32(0) ++ Array(0, 0, 0, 0) ++
      le32(26) ++ le32(12) ++ Array(0x20, 0x00, 0x10, 0x00, 1, 0, 8, 0)).map(_.toByte)
    assert(Multimodal.decodeImageHeader(bmpCore) === Some((32, 16)))
    // a GIF payload routes through the real parser in the decode path
    val meta = Multimodal.stubDecode(9L, "image", gif)
    assert(meta.width === 320 && meta.height === 200 && meta.n_frames === 1)
  }

  test("real header decode: WAV fmt/data chunks give rate and exact duration") {
    // 16-bit stereo 8kHz WAV with 1600 data bytes = 50ms of audio,
    // plus a LIST chunk before data to exercise the chunk walk
    def u32le(v: Long) = Array((v & 0xff).toInt, ((v >> 8) & 0xff).toInt,
      ((v >> 16) & 0xff).toInt, ((v >> 24) & 0xff).toInt)
    def u16le(v: Int) = Array(v & 0xff, (v >> 8) & 0xff)
    val dataBytes = 1600
    val wav = (Array('R'.toInt, 'I', 'F', 'F') ++ u32le(36 + 6 + dataBytes) ++
      Array('W'.toInt, 'A', 'V', 'E') ++
      Array('f'.toInt, 'm', 't', ' ') ++ u32le(16) ++
      u16le(1) ++ u16le(2) ++ u32le(8000) ++ u32le(8000 * 2 * 2) ++
      u16le(4) ++ u16le(16) ++
      Array('L'.toInt, 'I', 'S', 'T') ++ u32le(4) ++ Array(1, 2, 3, 4) ++
      Array('d'.toInt, 'a', 't', 'a') ++ u32le(dataBytes) ++
      Array.fill(dataBytes)(0)).map(_.toByte)
    assert(Multimodal.decodeWavHeader(wav) === Some((8000, 2, 16, 1600L)))
    val meta = Multimodal.stubDecode(9L, "audio", wav)
    // 1600 bytes / (8000 Hz * 2 ch * 2 B) = 50 ms exactly
    assert(meta.sample_rate === 8000 && meta.duration_ms === 50L)
    // non-RIFF audio falls back to the stub's synthetic values
    assert(Multimodal.decodeWavHeader("not audio at all".getBytes) === None)
    // corrupt chunk length (0xFFFFFFF8 would step backwards) must
    // return None, not hang the executor in an infinite chunk walk
    val corrupt = (Array('R'.toInt, 'I', 'F', 'F', 0, 0, 0, 0,
      'W', 'A', 'V', 'E',
      'j', 'u', 'n', 'k', 0xf8, 0xff, 0xff, 0xff) ++
      Array.fill(40)(0)).map(_.toByte)
    assert(Multimodal.decodeWavHeader(corrupt) === None)
    // a data-chunk length larger than the payload itself is corrupt:
    // must not produce a days-long duration for a tiny file
    val badData = (Array('R'.toInt, 'I', 'F', 'F', 0, 0, 0, 0,
      'W', 'A', 'V', 'E',
      'f', 'm', 't', ' ') ++ u32le(16) ++
      u16le(1) ++ u16le(2) ++ u32le(8000) ++ u32le(8000 * 2 * 2) ++
      u16le(4) ++ u16le(16) ++
      Array('d'.toInt, 'a', 't', 'a') ++ u32le(0xFFFFFFF0L) ++
      Array.fill(16)(0)).map(_.toByte)
    assert(Multimodal.decodeWavHeader(badData) === None)
    val stub = Multimodal.stubDecode(9L, "audio", "not audio at all - long enough to be a payload".getBytes)
    assert(stub.sample_rate === 16000)
  }

  test("real header decode: MP4 box walk yields video dims, frame count " +
    "and exact duration; audio trak sample counts are not video frames") {
    def u32be(v: Long) = Array(((v >> 24) & 0xff).toInt, ((v >> 16) & 0xff).toInt,
      ((v >> 8) & 0xff).toInt, (v & 0xff).toInt)
    def box(t: String, body: Array[Int]): Array[Int] =
      u32be(8L + body.length) ++ t.map(_.toInt) ++ body
    val ftyp = box("ftyp", "isom".map(_.toInt).toArray ++ u32be(0))
    // mvhd v0: timescale 1000, duration 5000 → 5000 ms exactly
    val mvhd = box("mvhd", u32be(0) ++ u32be(0) ++ u32be(0) ++
      u32be(1000) ++ u32be(5000) ++ u32be(0))
    // tkhd v0 body is 84 bytes: ver/flags + 72 bytes to the 16.16 dims
    def tkhd(w: Int, h: Int) = box("tkhd",
      Array.fill(76)(0) ++ u32be(w.toLong << 16) ++ u32be(h.toLong << 16))
    def stsz(samples: Int) = box("stsz", u32be(0) ++ u32be(0) ++ u32be(samples))
    def trak(w: Int, h: Int, samples: Int) = box("trak",
      tkhd(w, h) ++ box("mdia", box("minf", box("stbl", stsz(samples)))))
    // audio trak FIRST (dims 0×0, 999 AAC samples — must be ignored),
    // then the video trak (320×240, 150 frames)
    val moov = box("moov", mvhd ++ trak(0, 0, 999) ++ trak(320, 240, 150))
    val mp4 = (ftyp ++ moov).map(_.toByte)
    assert(Multimodal.decodeMp4Header(mp4) === Some((320, 240, 150, 5000L)))
    // decode() routes a real MP4 payload through the box walk
    val meta = Multimodal.stubDecode(11L, "video", mp4)
    assert(meta.width === 320 && meta.height === 240 &&
      meta.n_frames === 150 && meta.duration_ms === 5000L)
    // non-BMFF video payloads fall back to the synthetic stub
    assert(Multimodal.decodeMp4Header("definitely not an mp4 file".getBytes) === None)
    // a box whose size would step backwards ends the walk instead of
    // hanging; with no complete moov parsed the result is None
    val corrupt = (ftyp ++ u32be(4) ++ "moov".map(_.toInt).toArray ++
      Array.fill(32)(0)).map(_.toByte)
    assert(Multimodal.decodeMp4Header(corrupt) === None)
    // 64-bit largesize header is honored
    val bigMoov = u32be(1) ++ "moov".map(_.toInt).toArray ++
      Array(0, 0, 0, 0) ++ u32be(16L + mvhd.length + trak(320, 240, 150).length) ++
      mvhd ++ trak(320, 240, 150)
    assert(Multimodal.decodeMp4Header((ftyp ++ bigMoov).map(_.toByte)) ===
      Some((320, 240, 150, 5000L)))
    // a corrupt stsz sample_count of 0xFFFFFFFF must not wrap to -1
    // frames through toInt — the container is rejected as malformed
    val hugeFrames = box("moov", mvhd ++ trak(320, 240, -1)) // u32be(-1) = FFFFFFFF
    assert(Multimodal.decodeMp4Header((ftyp ++ hugeFrames).map(_.toByte)) === None)
    // a 64-bit largesize near 2^63 must not overflow the i+size bound
    // into a backwards step (infinite walk): size = 2^63-16 has a clear
    // sign bit, so only an overflow-free bounds check rejects it
    val overflow = (ftyp ++ u32be(1) ++ "free".map(_.toInt).toArray ++
      Array(0x7f, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xf0)).map(_.toByte)
    assert(Multimodal.decodeMp4Header(overflow) === None) // and terminates
    // a depth bomb of ~200k nested 8-byte moov containers must hit the
    // MaxBoxDepth cap and return None, not recurse payload_len/8 deep
    // into a StackOverflowError (an Error no catch discipline contains)
    val d = 200000
    val ftypBytes = ftyp.map(_.toByte)
    val bomb = new Array[Byte](ftypBytes.length + 8 * d)
    System.arraycopy(ftypBytes, 0, bomb, 0, ftypBytes.length)
    for (i <- 0 until d) {
      val off = ftypBytes.length + 8 * i
      val size = 8L * (d - i) // each box exactly wraps the rest
      bomb(off) = ((size >> 24) & 0xff).toByte
      bomb(off + 1) = ((size >> 16) & 0xff).toByte
      bomb(off + 2) = ((size >> 8) & 0xff).toByte
      bomb(off + 3) = (size & 0xff).toByte
      bomb(off + 4) = 'm'; bomb(off + 5) = 'o'; bomb(off + 6) = 'o'; bomb(off + 7) = 'v'
    }
    assert(Multimodal.decodeMp4Header(bomb) === None)
  }

  test("resize planning: aspect-preserving fit, no upscaling, floor+0.5 rounding") {
    val spark2 = spark
    import spark2.implicits._
    val meta = Seq(
      MediaMeta(1L, "image", 1920, 1080, 1, 0, 0L, 10L, "a"), // landscape, shrinks
      MediaMeta(2L, "image", 300, 200, 1, 0, 0L, 10L, "b"),   // already fits
      MediaMeta(3L, "image", 1080, 1920, 1, 0, 0L, 10L, "c"), // portrait
      MediaMeta(4L, "audio", 0, 0, 0, 8000, 1L, 10L, "d")     // not an image
    ).toDS()
    val out = Multimodal.resizePlan(meta, 640, 480).collect()
      .map(r => r.getAs[Long]("asset_id") ->
        (r.getAs[Int]("out_w"), r.getAs[Int]("out_h"), r.getAs[Boolean]("needs_resample"))).toMap
    assert(out.size === 3) // audio excluded
    assert(out(1L) === ((640, 360, true)))  // scale 1/3, aspect kept
    assert(out(2L) === ((300, 200, false))) // never upscale
    assert(out(3L) === ((270, 480, true)))  // portrait: height binds
  }

  test("corpus media stats aggregate without touching payloads") {
    val stats = Multimodal.corpusMediaStats(Multimodal.decode(spark, assets))
    val byKind = stats.collect().map(r => r.getAs[String]("kind") -> r).toMap
    assert(byKind.keySet === Set("image", "audio", "video"))
    assert(byKind("image").getAs[Long]("n_assets") > 0)
  }

  test("extractFeatures emits the embeddings-table contract and feeds " +
    "the ANN battery: duplicated payloads become a cosine-1.0 near-dup " +
    "pair") {
    val spark2 = spark
    import spark2.implicits._
    // two byte-identical image payloads + two with DISJOINT byte
    // ranges (the histogram kernel scores byte-range composition, so
    // same-alphabet text payloads are legitimately similar — the
    // orthogonality fixture uses genuinely different content classes)
    val dup = "same media payload".getBytes("UTF-8")
    val a = Seq(
      (1L, "image", dup), (2L, "image", dup),
      (3L, "audio", Array.tabulate(24)(i => (i % 16).toByte)),
      (4L, "video", Array.tabulate(24)(i => (240 + i % 16).toByte))
    ).toDF("asset_id", "kind", "payload")
    val feats = Multimodal.extractFeatures(spark, a, dim = 16)
    val rows = feats.collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).toVector)
      .toMap
    // deterministic kernel: identical payloads embed identically,
    // unit-normalized, fixed width
    assert(rows(1L) === rows(2L))
    assert(rows.values.forall(_.length == 16))
    val n1 = math.sqrt(rows(1L).map(x => x.toDouble * x).sum)
    assert(math.abs(n1 - 1.0) < 1e-6)
    // the hand-off: the SAME near-dup operator the text corpus uses
    // consumes media embeddings unchanged
    val pairs = Dedup.embeddingNearDup(feats, minCos = 0.99, maxId = 100L)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"),
        r.getAs[Double]("cos")))
    assert(pairs.toSeq === Seq((1L, 2L, 1.0)))
    // re-run determinism (no RNG state leaks across partitions)
    assert(Multimodal.extractFeatures(spark, a, dim = 16).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).toVector)
      .toMap === rows)
  }

  test("byteHistogramFeatures: hand-computed bins, single-rounding " +
    "normalization chain, empty payload → zero vector") {
    // bytes 0, 1 → bin 0; 17 → bin 1; 0xff ×2 → bin 15
    val p = Array[Byte](0, 1, 17, 0xff.toByte, 0xff.toByte)
    val f = Multimodal.byteHistogramFeatures(p, 16)
    val denom = math.sqrt((2L * 2 + 1 + 2L * 2).toDouble)
    assert(f(0) === (2.0 / denom).toFloat)
    assert(f(1) === (1.0 / denom).toFloat)
    assert(f(15) === (2.0 / denom).toFloat)
    assert((2 until 15).forall(f(_) === 0f))
    assert(Multimodal.byteHistogramFeatures(Array.emptyByteArray, 16)
      .forall(_ === 0f))
    // multi-byte UTF-8: the kernel sees BYTES, not code points — é is
    // 0xc3 0xa9 (bins 12, 10)
    val g = Multimodal.byteHistogramFeatures("é".getBytes("UTF-8"), 16)
    val d2 = math.sqrt(2.0)
    assert(g(12) === (1.0 / d2).toFloat && g(10) === (1.0 / d2).toFloat)
  }

  test("byteHistogramFeatures property: random payloads at several dims " +
    "match an independent BigInt/IEEE reference") {
    val rnd = new scala.util.Random(83)
    for (trial <- 1 to 20; dim <- Seq(4, 16, 64)) {
      val payload = Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte)
      val got = Multimodal.byteHistogramFeatures(payload, dim)
      // independent reference: group by bin via a Map, BigInt moments,
      // the same single-rounding chain stated from scratch
      val counts = payload.groupBy(b => (b & 0xff) * dim / 256)
        .view.mapValues(_.length.toLong).toMap
      val ss = counts.values.map(c => BigInt(c) * c).sum
      val ref = Array.tabulate(dim) { i =>
        if (ss == 0) 0f
        else (counts.getOrElse(i, 0L).toDouble /
          math.sqrt(ss.toDouble)).toFloat
      }
      assert(got.toSeq === ref.toSeq, s"trial=$trial dim=$dim")
    }
  }

  test("mediaFeaturesBoard explodes to the (vec_id, kind, pos, value) " +
    "certification schema — dim scalar rows per asset") {
    val out = Multimodal.mediaFeaturesBoard(spark, assets, dim = 16)
    val rows = out.collect()
    assert(rows.length === assets.count().toInt * 16)
    val one = rows.filter(_.getAs[Long]("vec_id") == rows.head.getAs[Long]("vec_id"))
    assert(one.map(_.getAs[Int]("pos")).sorted.toSeq === (0 until 16))
    // unit norm survives the explode
    val norm = math.sqrt(one.map(r => math.pow(r.getAs[Float]("value"), 2)).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
  }

  test("mediaNearDup (q173): the PRODUCTION LSH chain over media " +
    "embeddings keeps a planted duplicate payload at cos 1.0 and the " +
    "pair list is a subset of the exact referee's") {
    val spark2 = spark
    import spark2.implicits._
    val dup = "the very same payload bytes".getBytes("UTF-8")
    val docs = ((1 to 40).map(i => (i.toLong, s"background document " +
        s"number $i with ordinary text ${"filler " * (i % 5)}")) ++
      Seq((41L, new String(dup, "UTF-8")), (42L, new String(dup, "UTF-8"))))
      .toDF("doc_id", "text")
    val got = Multimodal.mediaNearDup(spark, docs)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"),
        r.getAs[Double]("cos"))).toSet
    // identical payloads embed identically → cosine exactly 1.0, and
    // identical embeddings share every sign-plane bucket, so the LSH
    // chain CANNOT miss the pair (the property that makes bucketed
    // near-dup sound for exact duplicates)
    assert(got.contains((41L, 42L, 1.0)), s"planted dup missing: $got")
    // soundness: everything the production chain reports clears the
    // gate against the exact brute referee on the same features
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.syntheticAssets(docs), dim = Multimodal.MediaAnnDim)
    val exact = graft.scale.Dedup.embeddingNearDup(feats,
        Multimodal.MediaNearDupMinCos, maxId = 1000L)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"),
        r.getAs[Double]("cos"))).toSet
    assert(got.subsetOf(exact), s"LSH reported a pair the referee rejects")
  }

  test("mediaNearDupCelled (q176): exact reconciliation against the " +
    "exhaustive q173 referee — the celled board IS the referee's pairs " +
    "whose endpoints share a cell and a diff-plane band, emitted " +
    "exactly once, with a planted duplicate always found and measured " +
    "recall above the certified floor") {
    val docs = T.documents(spark, "/root/testdata/sf0.001")
    // sf0.001 ids (0..499) sit entirely inside the q173 audit slice,
    // so q173 here is the EXHAUSTIVE within-fixed-bucket referee
    val referee = Multimodal.mediaNearDup(spark, docs)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"),
        r.getAs[Double]("cos"))).toSet
    val celled = Multimodal.mediaNearDupCelled(spark, docs).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"),
        r.getAs[Double]("cos")))
    // exactly-once across the two band joins
    assert(celled.length === celled.toSet.size,
      "a pair was emitted by both bands")
    val got = celled.toSet
    // soundness: the fixed bucket stays in every band key, so celled
    // candidates are a subset of the referee's — same cosines included
    assert(got.subsetOf(referee),
      s"celled chain reported a pair the referee rejects: ${got -- referee}")
    // completeness relative to the blocking: the celled board is
    // EXACTLY the referee pairs whose endpoints share (cell, band)
    val keyed = Dedup.celledBands(Dedup.celledKeyedVectors(
        Multimodal.mediaEmbeddings(spark, docs),
        Multimodal.mediaSeeds(spark, docs)))
      .select(col("vec_id"), col("cell_id"), col("db0"), col("db1"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    val expected = referee.filter { case (a, b, _) =>
      val (ca, a0, a1) = keyed(a); val (cb, b0, b1) = keyed(b)
      ca == cb && (a0 == b0 || a1 == b1)
    }
    assert(got === expected,
      s"celled board != blocked referee: missing ${expected -- got}, " +
        s"extra ${got -- expected}")
    // the certified price of sub-quadratic blocking: measured recall
    // 0.585 here (0.543 at sf0.1) — floor with the q88 margin habit
    val recall = got.size.toDouble / referee.size
    assert(recall >= 0.5, f"recall $recall%.3f under the 0.5 floor")
    // a planted exact duplicate shares EVERY key (identical embeddings
    // agree with every plane and centroid), so the celled chain cannot
    // miss it — the property that keeps banding sound for true dups
    val spark2 = spark
    import spark2.implicits._
    val dup = "the very same payload bytes"
    // ids start at 0: the seed list (and so the diff planes) needs the
    // contiguous 0..15 prefix the production tables have
    val planted = ((0 to 40).map(i => (i.toLong, s"background doc $i " +
        ("filler " * (i % 5)))) ++ Seq((41L, dup), (42L, dup)))
      .toDF("doc_id", "text")
    val p = Multimodal.mediaNearDupCelled(spark, planted)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"),
        r.getAs[Double]("cos"))).toSet
    assert(p.contains((41L, 42L, 1.0)), s"planted dup missing: $p")
  }

  test("pixelDecodeBoard (q179): the JDK PNG round-trip is bit-exact — " +
    "decoded pixel stats equal byte math on crafted patterns, padding " +
    "collapses min to zero, channel order is certified on a non-gray " +
    "image, and corrupt payloads decode to None") {
    import java.nio.charset.StandardCharsets.UTF_8
    // exact-fit payload (64 bytes = one full row, no padding): min is
    // the true byte min, sums are Σ bytes on every channel
    val exact = Array.tabulate(64)(i => (i * 4 + 1).toByte) // 1..253, no 0
    val Some((w1, h1, sr1, sg1, sb1, mn1, mx1)) =
      Multimodal.decodePixelStats(Multimodal.renderPng(exact))
    val sum = exact.map(_ & 0xff).map(_.toLong).sum
    assert((w1, h1) === ((64, 1)))
    assert(sr1 === sum && sg1 === sum && sb1 === sum)
    assert(mn1 === 1 && mx1 === 253)
    // padded payload (65 bytes -> 2 rows, 63 zero pixels): min drops
    // to 0, sums unchanged by the zero padding
    val padded = exact :+ 0xff.toByte
    val Some((w2, h2, sr2, _, _, mn2, mx2)) =
      Multimodal.decodePixelStats(Multimodal.renderPng(padded))
    assert((w2, h2) === ((64, 2)))
    assert(sr2 === sum + 255 && mn2 === 0 && mx2 === 255)
    // empty payload renders a single all-zero row
    assert(Multimodal.decodePixelStats(Multimodal.renderPng(Array.empty))
      === Some((64, 1, 0L, 0L, 0L, 0, 0)))
    // multi-byte UTF-8 text: stats equal byte math on the encoded form
    val txt = "héllo 🎉".getBytes(UTF_8)
    val Some((_, _, sr3, _, _, _, _)) =
      Multimodal.decodePixelStats(Multimodal.renderPng(txt))
    assert(sr3 === txt.map(_ & 0xff).map(_.toLong).sum)
    // channel order: a non-gray 2×1 image written by ImageIO itself —
    // red (255,0,0) then blue-ish (0,0,7); sums must land per channel
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x000007)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(Multimodal.decodePixelStats(bos.toByteArray)
      === Some((2, 1, 255L, 0L, 7L, 0, 255)))
    // corrupt payload: no bundled reader accepts it
    assert(Multimodal.decodePixelStats("not an image".getBytes(UTF_8)).isEmpty)
    // the board reproduces the per-asset stats over a real table
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq((7L, "abc"), (8L, "")).toDF("doc_id", "text")
    val rows = Multimodal.pixelDecodeBoard(spark, docs).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(rows(7L) === Seq(64, 1, 294L, 294L, 294L, 0, 99)) // a+b+c, pad->0
    assert(rows(8L) === Seq(64, 1, 0L, 0L, 0L, 0, 0))
  }

  test("audioDecodeBoard (q180): the PCM round-trip is bit-exact — " +
    "signed 16-bit LE samples decode to byte math, odd tails pad a " +
    "zero high byte, the header parses back, and non-mono-16-bit " +
    "payloads fall back to None") {
    import java.nio.charset.StandardCharsets.UTF_8
    // two full samples: (0x01, 0x02) -> 0x0201 = 513; (0xff, 0xff) -> -1
    val b = Array[Byte](0x01, 0x02, 0xff.toByte, 0xff.toByte)
    val wav = Multimodal.renderWav(b)
    assert(Multimodal.decodeWavSamples(wav)
      === Some((16000, 2L, 512L, -1, 513, 513L * 513 + 1)))
    // the rendered container parses through the existing header path
    assert(Multimodal.decodeWavHeader(wav) === Some((16000, 1, 16, 4L)))
    // odd tail: 0x80 alone pads a zero high byte -> sample 128
    assert(Multimodal.decodeWavSamples(
        Multimodal.renderWav(Array(0x80.toByte)))
      === Some((16000, 1L, 128L, 128, 128, 128L * 128)))
    // a high byte >= 0x80 makes the sample negative: (0x00, 0x80) -> -32768
    assert(Multimodal.decodeWavSamples(
        Multimodal.renderWav(Array(0x00, 0x80.toByte)))
      === Some((16000, 1L, -32768L, -32768, -32768, 32768L * 32768)))
    // empty payload: zero samples, all-zero stats
    assert(Multimodal.decodeWavSamples(Multimodal.renderWav(Array.empty))
      === Some((16000, 0L, 0L, 0, 0, 0L)))
    // a non-16-bit fmt falls back to the header-only path (byte 34 is
    // the bits/sample field of the rendered header)
    val eightBit = wav.clone(); eightBit(34) = 8
    assert(Multimodal.decodeWavSamples(eightBit).isEmpty)
    assert(Multimodal.decodeWavHeader(eightBit).isDefined)
    // non-RIFF payloads decode to None
    assert(Multimodal.decodeWavSamples("not audio".getBytes(UTF_8)).isEmpty)
    // the board reproduces per-asset stats over a real table: "ab" ->
    // one sample 0x6261 = 25185; "" -> zero samples
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq((1L, "ab"), (2L, "")).toDF("doc_id", "text")
    val rows = Multimodal.audioDecodeBoard(spark, docs).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(rows(1L) === Seq(16000, 1L, 25185L, 25185, 25185, 25185L * 25185))
    assert(rows(2L) === Seq(16000, 0L, 0L, 0, 0, 0L))
  }

  test("mediaNearDupCelled2 (q178): multi-probe reconciliation — the " +
    "board is EXACTLY the referee pairs sharing any probed cell and a " +
    "band, emitted exactly once, a strict superset of the single-probe " +
    "q176 board, with measured recall above it") {
    val docs = T.documents(spark, "/root/testdata/sf0.001")
    val referee = Multimodal.mediaNearDup(spark, docs)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"),
        r.getAs[Double]("cos"))).toSet
    val single = Multimodal.mediaNearDupCelled(spark, docs)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"),
        r.getAs[Double]("cos"))).toSet
    val probed = Multimodal.mediaNearDupCelled2(spark, docs).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"),
        r.getAs[Double]("cos")))
    // exactly-once across the (probe cell × band) regions: the
    // min-shared-cell filter is what this asserts
    assert(probed.length === probed.toSet.size,
      "a pair was emitted by more than one (cell, band) region")
    val got = probed.toSet
    // soundness: the fixed bucket stays in every key — candidates are
    // still a subset of the exhaustive referee's
    assert(got.subsetOf(referee),
      s"probe2 chain reported a pair the referee rejects: ${got -- referee}")
    // the dial's contract: the primary cell is always probed, so the
    // single-probe board is a subset and recall can only rise
    assert(single.subsetOf(got),
      s"q176 pairs missing from the probe2 board: ${single -- got}")
    // completeness relative to the blocking: EXACTLY the referee pairs
    // whose endpoints share ANY probed cell and a diff-plane band
    val keyed = Dedup.celledBands(Dedup.celledKeyedVectors(
        Multimodal.mediaEmbeddings(spark, docs),
        Multimodal.mediaSeeds(spark, docs)))
      .select(col("vec_id"), col("cell_id"), col("cell2"), col("bucket"),
        col("db0"), col("db1"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val expected = referee.filter { case (a, b, _) =>
      val (ca, ca2, bka, a0, a1) = keyed(a)
      val (cb, cb2, bkb, b0, b1) = keyed(b)
      (Set(ca, ca2) & Set(cb, cb2)).nonEmpty && bka == bkb &&
        (a0 == b0 || a1 == b1)
    }
    assert(got === expected,
      s"probe2 board != blocked referee: missing ${expected -- got}, " +
        s"extra ${got -- expected}")
    // measured: 0.852 here (0.834 at sf0.1) vs single-probe 0.585 —
    // floored with the q88 margin habit
    val recall = got.size.toDouble / referee.size
    assert(recall >= 0.75, f"probe2 recall $recall%.3f under the 0.75 floor")
  }
}
