package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit specs for the training-data extension operators (text analysis,
  * dedup, similarity, multimodal) on small in-memory frames with
  * hand-computable expectations.
  */
class ExtSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat sat on the mat"), // exact dup of 1
    (3L, "the cat sat on the big mat"), // near-dup of 1
    (4L, "completely different words entirely here now"),
    (5L, "el gato de la casa y que")
  ).toDF("doc_id", "text")

  test("tokenCount / bpeTokenCount / meanTokenLen (T1)") {
    val r = docs.filter($"doc_id" === 1)
      .select(TextAnalysis.tokenCount($"text"), TextAnalysis.meanTokenLen($"text"))
      .head()
    assert(r.getInt(0) === 6)
    assert(r.getDouble(1) === 17.0 / 6) // "thecatsatonthemat" = 17 chars
  }

  test("stopword + quality: stopword-free text scores lower (T2)") {
    val q = docs.select($"doc_id", TextAnalysis.qualityScore($"text").as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q(1) > q(4)) // "the ... the" has stopwords; doc 4 has none
  }

  test("langId votes markers, first-max tiebreak (T3)") {
    val r = docs.select($"doc_id", TextAnalysis.langId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(r(1) === "en")
    assert(r(5) === "es") // el/de/la/y/que markers
    assert(r(4) === "und") // no markers at all
  }

  test("fingerprints: identical for exact dups, different otherwise (T4)") {
    val fp = docs.select($"doc_id", TextAnalysis.fingerprintMd5($"text").as("m"),
        TextAnalysis.fingerprintRolling($"text").as("r"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(fp(1) === fp(2))
    assert(fp(1) !== fp(3))
  }

  test("exactGroups: dup group collapses to min id (D1)") {
    val g = Dedup.exactGroups(docs, "doc_id", "text").collect()
    assert(g.length === 4) // 5 docs, one exact-dup pair
    val dupGroup = g.find(_.getAs[Long]("n_copies") === 2L).get
    assert(dupGroup.getAs[Long]("keep_id") === 1L)
  }

  test("shingleIndex: distinct word 3-grams; short text falls back whole (D2)") {
    val sh = Dedup.shingleIndex(Seq((1L, "a b c d")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(_.getString(1)).sorted
    assert(sh.toSeq === Seq("a b c", "b c d"))
    val short = Dedup.shingleIndex(Seq((1L, "a b")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(_.getString(1))
    assert(short.toSeq === Seq("a b"))
  }

  test("jaccardPairs finds the near-dup pair with correct jaccard (D2)") {
    val sh = Dedup.shingleIndex(docs, "doc_id", "text")
    val pairs = Dedup.jaccardPairs(sh, "doc_id").filter($"jaccard" >= 0.2)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("jaccard")))
    assert(pairs.exists { case (a, b, j) => a == 1 && b == 2 && j == 1.0 }) // exact dup
    assert(pairs.exists { case (a, b, j) => Set(a, b) == Set(1L, 3L) && j > 0.2 && j < 1.0 })
  }

  test("minhashDedup recovers exact + near dups, drops unrelated (D3)") {
    val pairs = Dedup.minhashDedup(docs, "doc_id", "text", threshold = 0.3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("simhash: identical text → identical sketch; hamming pairs (D4)") {
    val sh = Dedup.shingleIndex(docs, "doc_id", "text")
    val sims = Dedup.simhash(sh, "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sims(1) === sims(2))
    // 64-bit sketch: any Long value is in range; distinct texts should
    // yield distinct sketches on this fixture
    assert(sims.values.toSet.size > 1)
    val pairs = Dedup.simhashPairs(Dedup.simhash(sh, "doc_id"), "doc_id", maxHamming = 0)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.contains((1L, 2L)))
  }

  test("cosine: orthogonal=0, identical=1; knnBrute ranks by cosine (S1)") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(1.0f, 0.1f)), (3L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val cos = vecs.filter($"vec_id" === 0).crossJoin(
        vecs.filter($"vec_id" === 1).select($"embedding".as("e2")))
      .select(Similarity.cosine($"embedding", $"e2")).head().getDouble(0)
    assert(math.abs(cos) < 1e-12)
    val knn = Similarity.knnBrute(vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding", k = 3)
      .orderBy($"rnk").collect().map(_.getAs[Long]("neighbor_id"))
    assert(knn.toSeq === Seq(2L, 1L, 3L)) // by descending cosine to (1,0)
  }

  test("hardNegatives: only OTHER-label neighbors, ranked by cosine (S7)") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 1), // query, label 1
      (1L, Array(0.99f, 0.1f), 1), // same label, MORE similar — must be excluded
      (2L, Array(0.9f, 0.3f), 2),
      (3L, Array(0.0f, 1.0f), 2),
      (4L, Array(-1.0f, 0.0f), 3)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(vecs.filter($"vec_id" === 0), vecs,
        "vec_id", "embedding", "label", k = 3)
      .orderBy($"rnk")
      .select("neighbor_id", "n_label").as[(Long, Int)].collect()
    assert(out.map(_._1).toSeq === Seq(2L, 3L, 4L)) // nearest different-label first
    assert(out.forall(_._2 != 1), s"same-label neighbor leaked: ${out.toSeq}")
  }

  test("ivfAssign + ivfSearch: probed clusters cover the true neighbor (S2)") {
    val vecs = (0 until 20).map(i =>
      (i.toLong, Array(math.cos(i * 0.3).toFloat, math.sin(i * 0.3).toFloat))
    ).toDF("vec_id", "embedding")
    val cents = vecs.filter($"vec_id" < 4)
    val assigned = Similarity.ivfAssign(vecs, cents, "vec_id", "embedding")
    assert(assigned.count() === 20)
    assert(assigned.select("cluster").distinct().count() <= 4)
    val res = Similarity.ivfSearch(vecs.filter($"vec_id" === 5), assigned, cents,
      "vec_id", "embedding", k = 2, nprobe = 2)
    val top = res.orderBy($"rnk").collect().map(_.getAs[Long]("neighbor_id"))
    assert(top.nonEmpty && (top.contains(4L) || top.contains(6L))) // angular neighbors
  }

  test("cosinePairs: near-identical vectors cross the threshold (D5)") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.999f, 0.01f)), (2L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.cosinePairs(vecs, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.toSeq === Seq((0L, 1L)))
  }

  test("sampling is deterministic and partitioning-independent (no RNG)") {
    val df = (1L to 400L).map(i => (i, if (i % 3 == 0) "en" else "other"))
      .toDF("doc_id", "lang")
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select("doc_id").collect().map(_.getLong(0)).toSet
    val base = ids(Sampling.stratified(df, "doc_id", "lang", Seq("en" -> 2), defaultRate = 4))
    // identical under repartitioning and row reordering — df.sample() is not
    val shuffled = ids(Sampling.stratified(
      df.repartition(13).sortWithinPartitions($"doc_id".desc),
      "doc_id", "lang", Seq("en" -> 2), defaultRate = 4))
    assert(base === shuffled)
    // per-stratum rates are roughly honored (md5 buckets ≈ uniform)
    val en = df.filter($"lang" === "en").count().toDouble
    val enKept = Sampling.stratified(df, "doc_id", "lang", Seq("en" -> 2), defaultRate = 4)
      .filter($"lang" === "en").count().toDouble
    assert(enKept / en > 0.3 && enKept / en < 0.7, s"~1/2 expected, got ${enKept / en}")
    // uniform m=1 keeps everything
    assert(ids(Sampling.uniform(df, "doc_id", 1)) === (1L to 400L).toSet)
  }

  test("sampling rejects rate < 1 (Spark's % 0 is NULL → silent full drop; oracles error)") {
    val df = Seq((1L, "en")).toDF("doc_id", "lang")
    intercept[IllegalArgumentException] { Sampling.uniform(df, "doc_id", 0) }
    intercept[IllegalArgumentException] { Sampling.uniform(df, "doc_id", -2) }
    intercept[IllegalArgumentException] {
      Sampling.stratified(df, "doc_id", "lang", Seq("en" -> 2), defaultRate = 0)
    }
    intercept[IllegalArgumentException] {
      Sampling.stratified(df, "doc_id", "lang", Seq("en" -> 0), defaultRate = 4)
    }
  }

  test("multimodal: decodeMeta derives stable dims/mean; frames slice bytes (M1)") {
    val media = Multimodal.fromText(spark, docs, "doc_id", "text")
    val meta = Multimodal.decodeMeta(media).collect().map(m => m.media_id -> m).toMap
    assert(meta(1L) === meta(2L).copy(media_id = 1L)) // same bytes → same meta
    val m1 = meta(1L)
    assert(m1.n_bytes === 22L && m1.channels === 3)
    // width from bytes 't','h': (116<<4)|(104>>4) + 1
    assert(m1.width === ((116 << 4) | (104 >> 4)) + 1)
    assert(m1.mean_byte === "the cat sat on the mat".getBytes("UTF-8").map(_ & 0xff).sum.toDouble / 22)
    val framed = Multimodal.sampleFrames(
      media.toDF(), "media", nFrames = 3, frameBytes = 4)
    val frames = framed.filter($"media_id" === 1).select($"frames").head().getSeq[Array[Byte]](0)
    assert(frames.length === 3 && frames.forall(_.length === 4))
    assert(new String(frames.head, "UTF-8") === "the ")
    val rp = Multimodal.resizePlan(Multimodal.decodeMeta(media), maxSide = 256).collect()
    assert(rp.forall(r => r.getAs[Int]("out_width") <= 256 && r.getAs[Int]("out_height") <= 256))
  }

  test("multimodal: ImageIoCodec decodes a real PNG — true dims, channels, pixel mean") {
    import Multimodal.MediaRow
    // deterministic 7×5 RGB gradient, written as a real PNG in-test
    val img = new java.awt.image.BufferedImage(7, 5,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 5; x <- 0 until 7)
      img.setRGB(x, y, ((x * 30) << 16) | ((y * 40) << 8) | 7)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray

    val rows = Seq(
      MediaRow(1L, "image", png),
      MediaRow(2L, "image", "definitely not an image".getBytes("UTF-8")),
      MediaRow(3L, "audio", Array[Byte](9, 8, 7, 6)))
    val out = Multimodal.decodeMeta(rows.toDS(), Multimodal.ImageIoCodec.decode)
      .collect().map(m => m.media_id -> m).toMap

    // the real decode: true dimensions and channel count, exact pixel mean
    // (PNG is lossless, so the gradient samples round-trip exactly)
    assert(out(1L).width === 7 && out(1L).height === 5 && out(1L).channels === 3)
    assert(out(1L).n_bytes === png.length.toLong)
    val expMean = (for { y <- 0 until 5; x <- 0 until 7; v <- Seq(x * 30, y * 40, 7) }
      yield v.toDouble).sum / (7 * 5 * 3)
    assert(out(1L).mean_byte === expMean)
    // unparseable image bytes and non-image kinds fall back to FakeCodec
    // deterministically instead of failing the stage
    assert(out(2L) === Multimodal.FakeCodec.decode(rows(1)))
    assert(out(3L) === Multimodal.FakeCodec.decode(rows(2)))
  }

  test("multimodal: decodeAudioMeta reads a real WAV — true sample rate, channels, frames") {
    import Multimodal.MediaRow
    import javax.sound.sampled._
    // 1000 frames of 16-bit stereo PCM at 22050 Hz, written as a real WAV
    // in-test (JDK sound stack, no fixtures on disk)
    val fmt = new AudioFormat(22050f, 16, 2, true, false)
    val nFrames = 1000
    val pcm = Array.tabulate(nFrames * fmt.getFrameSize)(i => (i % 251).toByte)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray

    val rows = Seq(
      MediaRow(1L, "audio", wav),
      MediaRow(2L, "audio", "not audio at all".getBytes("UTF-8")))
    val out = Multimodal.decodeAudioMeta(rows.toDS())
      .collect().map(m => m.media_id -> m).toMap
    assert(out(1L).sample_rate === 22050.0)
    assert(out(1L).channels === 2)
    assert(out(1L).n_frames === nFrames.toLong)
    assert(math.abs(out(1L).duration_sec - nFrames / 22050.0) < 1e-9)
    assert(out(1L).n_bytes === wav.length.toLong)
    // dirty payload: sentinel row, stage never fails
    assert(out(2L).sample_rate === -1.0 && out(2L).channels === 0)
  }

  test("multimodal: decodeVideoMeta parses real MP4 headers (v0 and v1), sentinels the rest") {
    import Multimodal.{MediaRow, Mp4}
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(t: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ t.getBytes("ISO-8859-1") ++ payload

    // version-0 movie: timescale 600, duration 3000 (5 s), one 320x240 track
    val mvhd0 = be32(0) ++ be32(0) ++ be32(0) ++ be32(600) ++ be32(3000)
    val tkhd0 = Array.fill[Byte](76)(0) ++ be32(320L << 16) ++ be32(240L << 16)
    val mp4v0 = box("ftyp", "isom".getBytes("ISO-8859-1") ++ be32(0)) ++
      box("moov", box("mvhd", mvhd0) ++ box("trak", box("tkhd", tkhd0)))

    // version-1 movie (64-bit times): timescale 1000, duration 90000 (90 s),
    // one 640x360 track at the v1 offsets
    val mvhd1 = Array[Byte](1, 0, 0, 0) ++ Array.fill[Byte](16)(0) ++
      be32(1000) ++ be32(0) ++ be32(90000)
    val tkhd1 = Array[Byte](1, 0, 0, 0) ++ Array.fill[Byte](84)(0) ++
      be32(640L << 16) ++ be32(360L << 16)
    val mp4v1 = box("moov", box("mvhd", mvhd1) ++ box("trak", box("tkhd", tkhd1)))

    val rows = Seq(
      MediaRow(1L, "video", mp4v0),
      MediaRow(2L, "video", "not an mp4 container".getBytes("UTF-8")),
      MediaRow(3L, "image", mp4v0), // non-video kind: no parse attempted
      MediaRow(4L, "video", mp4v1))
    val out = Multimodal.decodeVideoMeta(rows.toDS())
      .collect().map(m => m.media_id -> m).toMap

    assert(out(1L).width === 320 && out(1L).height === 240)
    assert(out(1L).timescale === 600L)
    assert(math.abs(out(1L).duration_sec - 5.0) < 1e-9)
    assert(out(1L).n_bytes === mp4v0.length.toLong)
    assert(out(4L).width === 640 && out(4L).height === 360)
    assert(math.abs(out(4L).duration_sec - 90.0) < 1e-9)
    // dirty payload and mislabeled kind: sentinel rows, stage never fails
    assert(out(2L).width === -1 && out(2L).timescale === -1L)
    assert(out(3L).width === -1 && out(3L).duration_sec === -1.0)

    // the decodeMeta seam: Mp4Codec replaces FakeCodec's fake dims with the
    // container's real ones for parseable video, falls back otherwise
    val meta = Multimodal.Mp4Codec.decode(rows.head)
    assert(meta.width === 320 && meta.height === 240)
    assert(meta.mean_byte ===
      mp4v0.iterator.map(b => (b & 0xff).toDouble).sum / mp4v0.length)
    assert(Multimodal.Mp4Codec.decode(rows(1)) ===
      Multimodal.FakeCodec.decode(rows(1)))
    // a truncated box (declared size past the payload end) is corrupt, not
    // a crash — and corrupt means sentinel, not garbage dims
    assert(Mp4.parse(mp4v0.take(mp4v0.length - 10)) === None)

    // hostile nesting: 5000 container headers each declaring the remainder
    // as payload — the depth cap returns the sentinel instead of recursing
    // one frame per box into StackOverflowError (an Error, which the
    // Exception-only catch would NOT convert)
    val depth = 5000
    val bb = java.nio.ByteBuffer.allocate(depth * 8)
    for (i <- 0 until depth) {
      bb.putInt((depth - i) * 8)
      bb.put("moov".getBytes("ISO-8859-1"))
    }
    assert(Mp4.parse(bb.array) === None)
  }

  test("multimodal: MP4 dims belong to ONE track (max area), never a per-axis max") {
    import Multimodal.Mp4
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(t: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ t.getBytes("ISO-8859-1") ++ payload
    val mvhd = be32(0) ++ be32(0) ++ be32(0) ++ be32(600) ++ be32(600)
    def tkhd(w: Long, h: Long) =
      Array.fill[Byte](76)(0) ++ be32(w << 16) ++ be32(h << 16)
    // 640x480 video + 200x800 portrait banner: a per-axis max would report
    // 640x800 — dimensions NO track has; the real answer is the max-area
    // track's pair, in either track order
    def movie(first: (Long, Long), second: (Long, Long)) =
      box("moov", box("mvhd", mvhd) ++
        box("trak", box("tkhd", tkhd(first._1, first._2))) ++
        box("trak", box("tkhd", tkhd(second._1, second._2))))
    val a = Mp4.parse(movie((200L, 800L), (640L, 480L))).get
    assert((a.width, a.height) === (640, 480))
    val b = Mp4.parse(movie((640L, 480L), (200L, 800L))).get
    assert((b.width, b.height) === (640, 480))
    // equal areas tie: the FIRST track wins (strict greater-than), still a
    // real pair
    val t = Mp4.parse(movie((480L, 640L), (640L, 480L))).get
    assert((t.width, t.height) === (480, 640))
  }

  test("multimodal: resizeImages preserves the alpha channel of RGBA inputs") {
    import Multimodal.MediaRow
    val img = new java.awt.image.BufferedImage(64, 32,
      java.awt.image.BufferedImage.TYPE_4BYTE_ABGR)
    // uniform alpha 128: bilinear interpolation of a constant stays constant,
    // so the assertion is exact
    for (y <- 0 until 32; x <- 0 until 64)
      img.setRGB(x, y, (128 << 24) | ((x * 4) << 16) | ((y * 8) << 8) | 99)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val out = Multimodal.resizeImages(
        Seq(MediaRow(1L, "image", baos.toByteArray)).toDS(), maxSide = 16)
      .head().media
    val resized = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
    assert(resized.getWidth === 16 && resized.getHeight === 8)
    assert(resized.getColorModel.hasAlpha,
      "resized RGBA image lost its alpha channel")
    val alphas = for (y <- 0 until 8; x <- 0 until 16)
      yield (resized.getRGB(x, y) >>> 24)
    assert(alphas.forall(_ === 128), s"alpha not preserved: ${alphas.distinct}")
  }

  test("multimodal: resizeImages resamples real pixels with resizePlan's dims") {
    import Multimodal.MediaRow
    val img = new java.awt.image.BufferedImage(64, 32,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 32; x <- 0 until 64)
      img.setRGB(x, y, ((x * 4) << 16) | ((y * 8) << 8) | 99)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray

    val small = "tiny".getBytes("UTF-8")
    val rows = Seq(
      MediaRow(1L, "image", png),
      MediaRow(2L, "image", small),      // undecodable → byte-identical
      MediaRow(3L, "audio", png))        // non-image kind → byte-identical
    val out = Multimodal.resizeImages(rows.toDS(), maxSide = 16)
      .collect().map(m => m.media_id -> m).toMap

    // the resample is real: the output is a decodable PNG at exactly the
    // dims resizePlan computes for (64, 32, maxSide 16) = (16, 8)
    val resized = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L).media))
    assert(resized.getWidth === 16 && resized.getHeight === 8)
    val planned = Multimodal.resizePlan(
        Multimodal.decodeMeta(rows.take(1).toDS(), Multimodal.ImageIoCodec.decode),
        maxSide = 16)
      .select("out_width", "out_height").head()
    assert((resized.getWidth, resized.getHeight) ===
      ((planned.getInt(0), planned.getInt(1))))
    // downscaled content, not a repaint: interior pixels follow the source
    // gradient direction (monotone left-to-right red channel)
    val reds = (0 until 16).map(x => (resized.getRGB(x, 4) >> 16) & 0xff)
    assert(reds.zip(reds.tail).forall { case (a, b) => a <= b }, s"reds not monotone: $reds")
    assert(reds.last > reds.head)
    // pass-through rows are byte-identical
    assert(out(2L).media.toSeq === small.toSeq)
    assert(out(3L).media.toSeq === png.toSeq)
    // an image already inside the bound also passes through byte-identical
    val noop = Multimodal.resizeImages(rows.take(1).toDS(), maxSide = 64)
      .head().media
    assert(noop.toSeq === png.toSeq)
  }

  test("multimodal: dHash — exact/invisible edits hash equal, sampled edits flip <= 2 bits, pairing reuses simhash buckets (M4)") {
    import Multimodal.MediaRow
    val (w, h) = (32, 24)
    def raster(edit: (Int, Int, Int) => Int): Array[Byte] =
      (for (y <- 0 until h; x <- 0 until w)
        yield edit(x, y, (2 * x + 3 * y + 11) % 256).toByte).toArray
    val base = raster((_, _, v) => v)
    val copy = raster((_, _, v) => v)
    // (1,1) is never on the 9x8 sample grid (xs: 0,3,7,10,14,17,21,24,28;
    // ys: 0,3,6,9,12,15,18,21) — the edit must be invisible to the hash
    val invisible = raster((x, y, v) => if (x == 1 && y == 1) (v + 100) % 256 else v)
    // (14,12) IS sampled (gx=4, gy=4): only the two comparisons reading it
    // can flip
    val sampled = raster((x, y, v) => if (x == 14 && y == 12) (v + 128) % 256 else v)
    val rows = Seq(
      MediaRow(1L, "image", base), MediaRow(2L, "image", copy),
      MediaRow(3L, "image", invisible), MediaRow(4L, "image", sampled))
    val hs = Multimodal.dhashRaster(rows.toDS(), w, h)
      .collect().map(m => m.media_id -> m.dhash).toMap
    assert(hs(2L) === hs(1L))
    assert(hs(3L) === hs(1L), "edit at a non-sampled pixel must not change the hash")
    val d = java.lang.Long.bitCount(hs(4L) ^ hs(1L))
    assert(d >= 1 && d <= 2, s"sampled-cell edit flips 1-2 bits, got $d")
    // pairing goes through Dedup.simhashPairs UNCHANGED
    val pairs = Dedup.simhashPairs(
        Multimodal.dhashRaster(rows.toDS(), w, h).toDF()
          .select(col("media_id"), col("dhash").as("simhash")),
        "media_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
  }

  test("multimodal: audio energy hash — gain copies equal, one-segment edit flips <= 2 bits, WAV seam matches raw PCM (M5)") {
    import Multimodal.MediaRow
    import javax.sound.sampled._
    // amplitude grows with the segment index, so segment energies strictly
    // increase → every gradient bit is 1 and edits have a KNOWN effect
    def wave(t: Int): Int = (t / 10 + 1) * 10 + (t % 5) - 2
    def pcm(edit: Int => Int): Array[Byte] = {
      val bs = new Array[Byte](650 * 2)
      for (t <- 0 until 650) {
        val v = edit(t)
        bs(2 * t) = (v & 0xff).toByte
        bs(2 * t + 1) = ((v >> 8) & 0xff).toByte
      }
      bs
    }
    val base = pcm(wave)
    val gain2 = pcm(t => wave(t) * 2)
    // silencing exactly segment 30 can only move the e29<e30 and e30<e31
    // comparisons: the first flips (e30 drops to 0), the second holds
    val oneSeg = pcm(t => if (t >= 300 && t < 310) 0 else wave(t))
    val rows = Seq(MediaRow(1L, "audio", base), MediaRow(2L, "audio", gain2),
      MediaRow(3L, "audio", oneSeg))
    val hs = Multimodal.audioHashPcm(rows.toDS())
      .collect().map(m => m.media_id -> m.dhash).toMap
    assert(hs(2L) === hs(1L), "constant gain must not change the energy-gradient hash")
    val d = java.lang.Long.bitCount(hs(3L) ^ hs(1L))
    assert(d >= 1 && d <= 2, s"one-segment edit flips 1-2 bits, got $d")
    // the real-container seam: base samples wrapped as an actual WAV (mono),
    // and as stereo with L=R, must hash identically to the raw PCM — the
    // decode + mono mixdown must be transparent
    def wav(bytes: Array[Byte], channels: Int): Array[Byte] = {
      val out = if (channels == 1) bytes
        else {
          val st = new Array[Byte](bytes.length * 2)
          for (t <- 0 until bytes.length / 2; c <- 0 to 1) {
            st(4 * t + 2 * c) = bytes(2 * t); st(4 * t + 2 * c + 1) = bytes(2 * t + 1)
          }
          st
        }
      val fmt = new AudioFormat(22050f, 16, channels, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(out), fmt, 650L),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val whs = Multimodal.audioHashWav(Seq(
        MediaRow(10L, "audio", wav(base, 1)),
        MediaRow(11L, "audio", wav(base, 2)),
        MediaRow(12L, "audio", base)).toDS()) // not a WAV → raw-PCM fallback
      .collect().map(m => m.media_id -> m.dhash).toMap
    assert(whs(10L) === hs(1L), "WAV-wrapped PCM must hash like the raw samples")
    assert(whs(11L) === hs(1L), "stereo L=R mixes down to the mono hash")
    assert(whs(12L) === hs(1L), "undecodable payload falls back to raw-PCM interpretation")
    // pairing goes through Dedup.simhashPairs UNCHANGED
    val pairs = Dedup.simhashPairs(
        Multimodal.audioHashPcm(rows.toDS()).toDF()
          .select(col("media_id"), col("dhash").as("simhash")),
        "media_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("multimodal: dHash over a real PNG — brightness shift preserves the hash, undecodable falls back") {
    import Multimodal.MediaRow
    def png(shift: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(20, 16,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until 16; x <- 0 until 20) {
        val g = math.min(x * 10 + shift, 255)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val rows = Seq(
      MediaRow(1L, "image", png(0)),
      MediaRow(2L, "image", png(20)), // uniformly brighter: gradients unchanged
      MediaRow(3L, "image", "not an image".getBytes("UTF-8")))
    val hs = Multimodal.dhashImages(rows.toDS())
      .collect().map(m => m.media_id -> m.dhash).toMap
    // a global brightness shift preserves every left<right comparison away
    // from saturation — the perceptual-hash property dHash is chosen for
    assert(hs(2L) === hs(1L))
    // undecodable bytes fall back deterministically (same input → same hash)
    val again = Multimodal.dhashImages(rows.toDS())
      .collect().map(m => m.media_id -> m.dhash).toMap
    assert(again(3L) === hs(3L))
  }

  // ---- AVI frame decode fixtures (test-side RIFF writer) ----

  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def cc4(s: String): Array[Byte] = s.getBytes("ISO-8859-1")
  private def riffChunk(fourcc: String, data: Array[Byte]): Array[Byte] =
    cc4(fourcc) ++ le32(data.length.toLong) ++ data ++
      (if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
  private def riffList(listType: String, body: Array[Byte]): Array[Byte] =
    riffChunk("LIST", cc4(listType) ++ body)

  /** A complete single-video-stream AVI: avih + strl(strh, strf) + movi
    * with the given frame chunks — the MJPEG/DIB writer the decode spec
    * round-trips through [[Multimodal.Avi]].
    */
  private def aviBytes(w: Int, h: Int, bits: Int, comp: String,
      frames: Seq[(String, Array[Byte])]): Array[Byte] = {
    val avih = riffChunk("avih",
      le32(40000L) ++ le32(0L) ++ le32(0L) ++ le32(0L) ++
        le32(frames.length.toLong) ++ le32(0L) ++ le32(1L) ++ le32(0L) ++
        le32(w.toLong) ++ le32(h.toLong) ++ Array.fill(16)(0.toByte))
    val strh = riffChunk("strh",
      cc4("vids") ++ cc4(if (comp == "RGB ") "DIB " else comp) ++
        Array.fill(48)(0.toByte))
    val compBytes = if (comp == "RGB ") le32(0L) else cc4(comp)
    val strf = riffChunk("strf",
      le32(40L) ++ le32(w.toLong) ++ le32(h.toLong) ++
        Array[Byte](1, 0) ++
        Array[Byte]((bits & 0xff).toByte, ((bits >> 8) & 0xff).toByte) ++
        compBytes ++ le32((w * h * 3).toLong) ++ Array.fill(16)(0.toByte))
    val hdrl = riffList("hdrl", avih ++ riffList("strl", strh ++ strf))
    val movi = riffList("movi",
      frames.flatMap { case (fc, d) => riffChunk(fc, d) }.toArray)
    val body = cc4("AVI ") ++ hdrl ++ movi
    cc4("RIFF") ++ le32(body.length.toLong) ++ body
  }

  /** Bottom-up padded-row BGR frame payload from a per-(x, y) pixel
    * function returning (b, g, r) with y = 0 the TOP row. */
  private def dibFrame(w: Int, h: Int)(
      px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val out = Array.fill(rowBytes * h)(0.toByte)
    for (sy <- 0 until h; x <- 0 until w) {
      val (b, g, r) = px(x, h - 1 - sy)
      out(sy * rowBytes + x * 3) = b.toByte
      out(sy * rowBytes + x * 3 + 1) = g.toByte
      out(sy * rowBytes + x * 3 + 2) = r.toByte
    }
    out
  }

  private def jpegBytes(w: Int, h: Int)(
      px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val g = px(x, y) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("avi mjpeg frames: REAL per-frame JPEG decode — true dims, frame dhash identical to the still-image dhash of the same bytes; shared frames pair videos") {
    import Multimodal.MediaRow
    // two distinct gradient frames, JPEG-encoded once and reused so
    // frame-content identity across videos is byte-exact
    val f0 = jpegBytes(32, 16)((x, y) => x * 7 + y * 3)
    val f1 = jpegBytes(32, 16)((x, y) => 255 - x * 7 - y * 3)
    val f2 = jpegBytes(32, 16)((x, y) => (x * y) % 251)
    val vidA = aviBytes(32, 16, 24, "MJPG", Seq("00dc" -> f0, "00dc" -> f1))
    val vidB = aviBytes(32, 16, 24, "MJPG", Seq("00dc" -> f0, "00dc" -> f2))
    val frames = Multimodal.decodeVideoFrames(Seq(
        MediaRow(1L, "video", vidA), MediaRow(2L, "video", vidB)).toDS())
      .collect().map(f => (f.media_id, f.frame_idx) -> f).toMap
    assert(frames.size === 4)
    assert(frames((1L, 0)).width === 32 && frames((1L, 0)).height === 16)
    // the SAME JPEG bytes hash identically as a video frame and a still
    val still = Multimodal.dhashImages(Seq(
        MediaRow(9L, "image", f0)).toDS()).collect()(0).dhash
    assert(frames((1L, 0)).dhash === still)
    // video near-dup through frame hashes, image machinery unchanged:
    // the shared frame pairs A with B; the disjoint frames do not
    assert(frames((1L, 0)).dhash === frames((2L, 0)).dhash)
    assert(frames((1L, 1)).dhash !== frames((2L, 1)).dhash)
  }

  test("avi dib frames: byte-arithmetic decode — exact mean and dims, even-stride sampling, per-frame dhash from the bottom-up raster") {
    import Multimodal.MediaRow
    // 5 frames, 12x8, constant byte per frame: mean is exact
    val mk = (c: Int) => dibFrame(12, 8)((_, _) => (c, c, c))
    val vid = aviBytes(12, 8, 24, "RGB ",
      (0 until 5).map(i => "00db" -> mk(50 + i * 10)))
    val out = Multimodal.decodeVideoFrames(Seq(
        MediaRow(7L, "video", vid)).toDS(), nFrames = 3)
      .collect().sortBy(_.frame_idx)
    // even stride over 5 frames at nFrames = 3 picks 0, 2, 4
    assert(out.map(_.frame_idx).toSeq === Seq(0, 2, 4))
    assert(out.forall(f => f.width === 12 && f.height === 8))
    assert(out.map(_.mean_px).toSeq === Seq(50.0, 70.0, 90.0))
    // a horizontal gradient sets every dhash bit (right neighbor always
    // brighter), a constant frame sets none — the raster orientation leg
    val grad = aviBytes(12, 8, 24, "RGB ",
      Seq("00db" -> dibFrame(12, 8)((x, _) => (x * 20, x * 20, x * 20))))
    val gf = Multimodal.decodeVideoFrames(Seq(
        MediaRow(8L, "video", grad)).toDS()).collect()(0)
    assert(gf.dhash === -1L) // all 64 bits set
    assert(out(0).dhash === 0L)
  }

  test("avi dirty posture: truncation, non-video kinds, overrun chunks, and zero-size chunk floods sentinel or stop — never throw") {
    import Multimodal.{Avi, MediaRow}
    val good = aviBytes(12, 8, 24, "RGB ",
      Seq("00db" -> dibFrame(12, 8)((_, _) => (1, 2, 3))))
    // truncating the movi payload drops the walk to None -> sentinel
    val rows = Seq(
      MediaRow(1L, "video", good.take(good.length - 20)),
      MediaRow(2L, "image", good), // non-video kind: no parse attempted
      MediaRow(3L, "video", "not a riff container at all".getBytes("UTF-8")))
    val out = Multimodal.decodeVideoFrames(rows.toDS())
      .collect().map(f => f.media_id -> f).toMap
    assert(out.size === 3)
    assert(out.values.forall(f => f.frame_idx === -1 && f.width === -1))
    // a frame chunk whose declared size overruns the container: walk None
    val overrun = good.clone()
    // the movi frame chunk's size field sits 4 bytes after its fourcc;
    // find "00db" and corrupt its size
    val di = good.indexOfSlice("00db".getBytes("ISO-8859-1"))
    System.arraycopy(le32(1000000L), 0, overrun, di + 4, 4)
    assert(Avi.parse(overrun) === None)
    // a zero-size chunk flood past the work cap stops gracefully (and,
    // carrying no avih, parses to None) instead of spinning
    val flood = cc4("RIFF") ++ le32(8L + (9L << 20)) ++ cc4("AVI ") ++
      Array.fill(9 << 20)(0.toByte)
    assert(Avi.parse(flood) === None)
  }

  test("avi stream awareness + hostile dims + top-down DIB + tiny MJPEG: audio-first files decode stream 1, huge headers sentinel instead of throwing, negative biHeight flips rows, small frames hash like stills") {
    import Multimodal.{Avi, MediaRow}
    // rows ALTERNATE horizontal direction so a vertical flip permutes
    // odd/even row patterns and provably changes the dhash — a
    // same-pattern-every-row gradient would be flip-invariant and the
    // top-down pin below would pass vacuously
    val px = (x: Int, y: Int) => {
      val g = if (y % 2 == 0) x * 20 else (11 - x) * 20
      (g, g, g)
    }
    val f = dibFrame(12, 8)(px)
    def vidStrf(biHeight: Long) = riffChunk("strf",
      le32(40L) ++ le32(12L) ++ le32(biHeight & 0xffffffffL) ++
        Array[Byte](1, 0, 24, 0) ++ le32(0L) ++ le32((12 * 8 * 3).toLong) ++
        Array.fill(16)(0.toByte))
    def avih(w: Long, h: Long, streams: Long) = riffChunk("avih",
      le32(40000L) ++ le32(0L) ++ le32(0L) ++ le32(0L) ++ le32(1L) ++
        le32(0L) ++ le32(streams) ++ le32(0L) ++ le32(w) ++ le32(h) ++
        Array.fill(16)(0.toByte))
    def strl(fcc: String, handler: String, strf: Array[Byte]) = riffList(
      "strl", riffChunk("strh",
        cc4(fcc) ++ cc4(handler) ++ Array.fill(48)(0.toByte)) ++ strf)
    def riff(body: Array[Byte]) =
      cc4("RIFF") ++ le32((4 + body.length).toLong) ++ cc4("AVI ") ++ body
    // audio-first: stream 0 'auds' (WAVEFORMATEX-ish 30-byte strf that
    // MUST NOT poison the video format), stream 1 'vids' DIB — frames
    // carry stream number 01, the audio '00wb' chunk is ignored
    val audioFirst = riff(
      riffList("hdrl", avih(12, 8, 2) ++
        strl("auds", "mp3 ", riffChunk("strf", Array.fill(30)(7.toByte))) ++
        strl("vids", "DIB ", vidStrf(8L))) ++
      riffList("movi",
        riffChunk("00wb", Array.fill(64)(1.toByte)) ++
        riffChunk("01db", f)))
    val outA = Multimodal.decodeVideoFrames(Seq(
        MediaRow(1L, "video", audioFirst)).toDS()).collect()
    val ref = Multimodal.decodeVideoFrames(Seq(MediaRow(2L, "video",
        aviBytes(12, 8, 24, "RGB ", Seq("00db" -> f)))).toDS()).collect()(0)
    assert(outA.length === 1 && outA(0).frame_idx === 0)
    assert(outA(0).width === 12 && outA(0).mean_px === ref.mean_px &&
      outA(0).dhash === ref.dhash)
    // top-down DIB (negative strf biHeight): rows stored top-first must
    // decode to the SAME image — identical mean and dhash
    val rowBytes = ((12 * 3 + 3) / 4) * 4
    val fTop = Array.fill(rowBytes * 8)(0.toByte)
    for (y <- 0 until 8; x <- 0 until 12) {
      val (b, g, r) = px(x, y)
      fTop(y * rowBytes + x * 3) = b.toByte
      fTop(y * rowBytes + x * 3 + 1) = g.toByte
      fTop(y * rowBytes + x * 3 + 2) = r.toByte
    }
    val topDown = riff(
      riffList("hdrl", avih(12, 8, 1) ++
        strl("vids", "DIB ", vidStrf(-8L))) ++
      riffList("movi", riffChunk("00db", fTop)))
    val outT = Multimodal.decodeVideoFrames(Seq(
        MediaRow(3L, "video", topDown)).toDS()).collect()(0)
    assert(outT.mean_px === ref.mean_px && outT.dhash === ref.dhash,
      "negative biHeight must flip row order, not mirror the raster")
    // hostile header dims: over the sanity cap, and under it but
    // Int-overflowing rowBytes*h — both sentinel, neither throws
    for ((w, h) <- Seq((50000L, 50000L), (30000L, 30000L))) {
      val hostile = riff(
        riffList("hdrl", avih(w, h, 1) ++
          strl("vids", "DIB ", riffChunk("strf",
            le32(40L) ++ le32(w) ++ le32(h) ++ Array[Byte](1, 0, 24, 0) ++
              le32(0L) ++ le32(96L) ++ Array.fill(16)(0.toByte)))) ++
        riffList("movi", riffChunk("00db", Array.fill(96)(5.toByte))))
      val o = Multimodal.decodeVideoFrames(Seq(
          MediaRow(4L, "video", hostile)).toDS()).collect()
      assert(o.length === 1 && o(0).frame_idx === -1,
        s"hostile dims ${w}x$h must sentinel")
    }
    // a tiny (sub-9x8-grid) MJPEG frame hashes EXACTLY like the same
    // bytes as a still — the shared-fallback invariant
    val tiny = jpegBytes(8, 6)((x, y) => x * 30 + y * 11)
    val outJ = Multimodal.decodeVideoFrames(Seq(MediaRow(5L, "video",
        aviBytes(8, 6, 24, "MJPG", Seq("00dc" -> tiny)))).toDS()).collect()(0)
    val still = Multimodal.dhashImages(Seq(
        MediaRow(6L, "image", tiny)).toDS()).collect()(0).dhash
    assert(outJ.width === 8 && outJ.height === 6 && outJ.dhash === still)
  }

  test("videoNearDupPairs: positional frame-scoped MJPEG pairing — twins sharing 2 of 3 positions pair, 1 of 3 doesn't, sentinels pair with nothing") {
    import Multimodal.MediaRow
    // three maximally-distinct frame patterns (pairwise dhash hamming
    // >> 3, robust to JPEG loss): increasing gradient (all comparison
    // bits set), decreasing (none), alternating (half)
    val inc = jpegBytes(32, 16)((x, _) => x * 7)
    val dec = jpegBytes(32, 16)((x, _) => 220 - x * 6)
    val alt = jpegBytes(32, 16)((x, _) => (x % 2) * 200)
    def vid(frames: Array[Byte]*) =
      aviBytes(32, 16, 24, "MJPG", frames.map("00dc" -> _))
    val rows = Seq(
      MediaRow(1L, "video", vid(inc, alt, inc)),
      MediaRow(2L, "video", vid(inc, alt, dec)), // shares positions 0, 1
      MediaRow(3L, "video", vid(inc, dec, alt)), // shares position 0 only
      MediaRow(4L, "video", "junk".getBytes("UTF-8"))) // sentinel
    val frames = Multimodal.decodeVideoFrames(rows.toDS(), nFrames = 3)
    val pairs = Multimodal.videoNearDupPairs(frames, maxHamming = 3,
      minShared = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet === Set((1L, 2L)),
      s"only the 2-of-3 twin pair must survive minShared = 2: $pairs")
    assert(pairs((1L, 2L)) >= 2L)
    // at minShared = 1 the 1-of-3 pairs appear; the sentinel never does
    val loose = Multimodal.videoNearDupPairs(frames, maxHamming = 3,
      minShared = 1).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  /** A DIB frame whose dHash is EXACTLY `Seq.fill(8)(mask)` — sampled
    * column values step +10/−10 by the mask bits, so distinct masks give
    * provably distinct hashes (no reliance on gradient wrap accidents).
    */
  private def maskFrame(mask: Int): Array[Byte] = {
    val xs = (0 until 9).map(gx => gx * 12 / 9)
    dibFrame(12, 8) { (x, _) =>
      val k = xs.lastIndexWhere(_ <= x)
      var v = 128
      for (j <- 1 to k) v += (if (((mask >> (j - 1)) & 1) == 1) 10 else -10)
      (v, v, v)
    }
  }

  test("videoNearDupPairs floodCap: a corpus-wide intro frame is DROPPED (df-cap), not star-paired — twin counts stay exact over informative frames, flood-only pairs disappear") {
    import Multimodal.MediaRow
    def dvid(frames: Array[Byte]*) =
      aviBytes(12, 8, 24, "RGB ", frames.map("00db" -> _))
    val intro = maskFrame(0xF0) // shared by every video at position 0
    // distinct masks → provably distinct frame hashes at hamming 0
    val rows = Seq(
      MediaRow(10L, "video", dvid(intro, maskFrame(1), maskFrame(2))),
      MediaRow(11L, "video", dvid(intro, maskFrame(1), maskFrame(2))),
      MediaRow(12L, "video", dvid(intro, maskFrame(3), maskFrame(4))),
      MediaRow(13L, "video", dvid(intro, maskFrame(5), maskFrame(6))),
      MediaRow(14L, "video", dvid(intro, maskFrame(7), maskFrame(8))))
    val frames = Multimodal.decodeVideoFrames(rows.toDS(), nFrames = 3)
    // uncapped at minShared 1: the shared intro pairs EVERYTHING
    val loose = Multimodal.videoNearDupPairs(frames, maxHamming = 0,
      minShared = 1).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose.size === 10, s"intro must pair all 5 videos uncapped: $loose")
    // floodCap 3 < 5 drops position 0: only the genuine twins survive,
    // and their n_shared counts exactly the two informative frames
    val capped = Multimodal.videoNearDupPairs(frames, maxHamming = 0,
      minShared = 1, floodCap = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(capped.keySet === Set((10L, 11L)),
      s"flood position must not produce or rob pairs: $capped")
    assert(capped((10L, 11L)) === 2L,
      "n_shared counts informative positions exactly")
    // scope columns colliding with the pairing plan's reserved names
    // fail fast with the actual cause, not a deep AnalysisException
    val sh = Seq((1L, 0, 0L)).toDF("media_id", "cv", "simhash")
    val err = intercept[IllegalArgumentException] {
      Dedup.simhashPairs(sh, "media_id", scopeCols = Seq("cv"))
    }
    assert(err.getMessage.contains("reserved"))
  }

  test("videoNearDupPairsUnordered: a 1-frame-trimmed twin pairs at containment 1.0 in the unordered mode and NOT in the positional mode") {
    import Multimodal.MediaRow
    def dvid(frames: Array[Byte]*) =
      aviBytes(12, 8, 24, "RGB ", frames.map("00db" -> _))
    val (fa, fb, fc) = (maskFrame(1), maskFrame(2), maskFrame(3))
    val rows = Seq(
      MediaRow(20L, "video", dvid(fa, fb, fc)), // base
      MediaRow(21L, "video", dvid(fb, fc)), // trimmed by its leading frame
      MediaRow(22L, "video",
        dvid(maskFrame(9), maskFrame(10), maskFrame(12))), // unrelated
      MediaRow(23L, "video", "junk".getBytes("UTF-8"))) // sentinel
    val frames = Multimodal.decodeVideoFrames(rows.toDS(), nFrames = 3)
    // positional mode structurally misses the trim: every shared frame
    // sits at a DIFFERENT position, so no position matches
    val positional = Multimodal.videoNearDupPairs(frames, maxHamming = 0,
      minShared = 1).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!positional.contains((20L, 21L)),
      s"positional mode must miss the trimmed twin: $positional")
    // unordered mode: {fb, fc} fully contained in {fa, fb, fc}
    val un = Multimodal.videoNearDupPairsUnordered(frames, maxHamming = 0,
      minContainment = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))).toMap
    assert(un.keySet === Set((20L, 21L)),
      s"only the trimmed twin must pair (no unrelated, no sentinel): $un")
    val (na, nb, ma, mb, cont) = un((20L, 21L))
    assert(na === 3L && nb === 2L && ma === 2L && mb === 2L && cont === 1.0)
    // floodCap rides the same df-cap semantics: a hash shared corpus-wide
    // is dropped BEFORE pairing, so the twin's containment is computed
    // over informative hashes only
    val intro = maskFrame(0xF0)
    val rows2 = Seq(
      MediaRow(30L, "video", dvid(intro, fa, fb)),
      MediaRow(31L, "video", dvid(intro, fa, fb)), // full twin of 30
      MediaRow(32L, "video", dvid(intro, maskFrame(5), maskFrame(6))),
      MediaRow(33L, "video", dvid(intro, maskFrame(7), maskFrame(9))))
    val fr2 = Multimodal.decodeVideoFrames(rows2.toDS(), nFrames = 3)
    val capped = Multimodal.videoNearDupPairsUnordered(fr2, maxHamming = 0,
      minContainment = 0.9, floodCap = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((30L, 31L)),
      s"flood hash must not produce pairs nor rob the true twin: $capped")
  }

  test("audioWindowHashes: a hop-aligned trimmed clip carries bit-identical window hashes at shifted indices and pairs at containment 1.0 where the whole-clip fingerprint misses") {
    import Multimodal.MediaRow
    def pcm(n: Int, off: Int, a: Int, b: Int, c: Int): Array[Byte] = {
      val bs = new Array[Byte](n * 2)
      for (t <- 0 until n) {
        val at = t + off
        val v = (a * at * at + b * at + c) % 4001 - 2000
        bs(2 * t) = (v & 0xff).toByte
        bs(2 * t + 1) = ((v >> 8) & 0xff).toByte
      }
      bs
    }
    val rows = Seq(
      MediaRow(40L, "audio", pcm(1300, 0, 3, 5, 7)), // base: 3 windows
      MediaRow(41L, "audio", pcm(975, 325, 3, 5, 7)), // minus one hop
      MediaRow(42L, "audio", pcm(1300, 0, 4, 9, 55))) // unrelated stream
    val wins = Multimodal.audioWindowHashes(rows.toDS(),
      windowSamples = 650, hopSamples = 325)
    val byMedia = wins.collect().groupBy(_.media_id)
      .map { case (k, v) => k -> v.sortBy(_.window_idx).map(_.dhash).toSeq }
    assert(byMedia(40L).length === 3 && byMedia(41L).length === 2)
    assert(byMedia(41L) === byMedia(40L).drop(1),
      "hop-aligned trim must replay the base's window hashes, shifted")
    // the whole-clip fingerprint shifts every segment boundary — the
    // trim is unrecognizable to it (deterministic fixture, no flake)
    val whole = Multimodal.audioHashPcm(rows.take(2).toDS()).collect()
      .map(h => h.media_id -> h.dhash).toMap
    assert(java.lang.Long.bitCount(whole(40L) ^ whole(41L)) > 3,
      "whole-clip hashes of base vs trim must diverge past tolerance")
    // unordered containment: the trim's 2-hash set is fully contained
    val pairs = Multimodal.audioNearDupPairsUnordered(wins, maxHamming = 0,
      minContainment = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(6)).toMap
    assert(pairs.keySet === Set((40L, 41L)),
      s"only the trimmed twin must pair: $pairs")
    assert(pairs((40L, 41L)) === 1.0)
    // a clip shorter than one window emits no windows (documented)
    assert(Multimodal.audioWindowHashes(
      Seq(MediaRow(43L, "audio", pcm(100, 0, 3, 5, 7))).toDS(),
      650, 325).count() === 0L)
  }

  test("simhashMatchPairs bucketCap DROPS hot chunk buckets (no star pairs): counts stay exact and deterministic, pairs outside the flood survive") {
    // flood family: 10 sketches sharing chunks 0/2/3 (buckets of 10),
    // distinct chunk 1 (singletons) — under cap 4 every agreeing bucket
    // is hot, so the family must emit NOTHING (a star path would emit
    // rep pairs with arbitrary carried hashes)
    val flood = (1L to 10L).map(i => (i, (i << 16) | 0x42L))
    // genuine twin outside the flood: all four buckets of size 2
    val twin = Seq((20L, 0x7B3A9C4D5E6F1122L), (21L, 0x7B3A9C4D5E6F1122L))
    val sh = (flood ++ twin).toDF("media_id", "simhash")
    val capped = Dedup.simhashMatchPairs(sh, "media_id", maxHamming = 3,
      bucketCap = 4)
    val got = capped.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === Set((20L, 21L, 0x7B3A9C4D5E6F1122L, 0x7B3A9C4D5E6F1122L)),
      s"hot buckets must drop, the small-bucket twin must survive: $got")
    // deterministic: a second execution returns the identical set
    assert(capped.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet === got)
    // uncapped control: the flood family DOES pair (hamming via chunk-1
    // diffs <= 3), proving the cap (not the fixture) removed them
    val loose = Dedup.simhashMatchPairs(sh, "media_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose.contains((1L, 2L)) && loose.contains((20L, 21L)))
  }
}
