package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling: media as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side plumbing is real — schema, batch shape, partition-parallel
  * `mapPartitions` over typed Datasets (the Scala analog of `mapInPandas`:
  * one iterator per partition, amortizing per-batch codec setup). The codec
  * itself is STUBBED with a deterministic fake (this container has no
  * image/audio libraries): `FakeCodec` derives dimensions and "pixel" stats
  * from the raw bytes, so tests exercise the full distributed path with
  * verifiable outputs. Swap `FakeCodec` for a real decoder (javax.imageio,
  * ffmpeg-cli per partition, …) without touching the pipeline.
  *
  * Scale notes: media blobs dominate row size — keep them in their own
  * column, project them away before any shuffle (metadata-only exchanges),
  * and size partitions by bytes (`spark.sql.files.maxPartitionBytes`), not
  * rows. Frame sampling / byte slicing happens as Column expressions where
  * possible (no decode needed) so the scan prunes to the slice.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, media: Array[Byte])
  final case class MediaMeta(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, channels: Int, mean_byte: Double)

  /** Deterministic fake codec — replace with a real decoder in production.
    * "Dimensions" come from the first bytes, "pixel mean" from the payload:
    * stable, content-derived, and cheap to verify in tests.
    */
  object FakeCodec {
    def decode(r: MediaRow): MediaMeta = {
      val bs = r.media
      val w = if (bs.length >= 2) ((bs(0) & 0xff) << 4 | (bs(1) & 0xff) >> 4) + 1 else 1
      val h = if (bs.length >= 4) ((bs(2) & 0xff) << 4 | (bs(3) & 0xff) >> 4) + 1 else 1
      val ch = r.kind match { case "image" => 3; case "audio" => 1; case _ => 3 }
      val mean = if (bs.isEmpty) 0.0
        else bs.iterator.map(b => (b & 0xff).toDouble).sum / bs.length
      MediaMeta(r.media_id, r.kind, bs.length.toLong, w, h, ch, mean)
    }
  }

  /** REAL image decode via JDK-built-in `javax.imageio` (PNG, JPEG, GIF,
    * BMP — no dependencies beyond the JDK): true width/height, channel
    * count from the color model, and the mean over every raster sample
    * (the decoded-pixel analog of FakeCodec's mean over raw bytes).
    *
    * Rows whose payload ImageIO cannot parse — and non-image kinds — fall
    * back to [[FakeCodec]], so a dirty web-scale corpus (truncated files,
    * mislabeled MIME types) decodes deterministically instead of failing
    * the stage; a real pipeline would also project out a `decoded` flag
    * (width/height > 1 distinguishes the paths here).
    */
  object ImageIoCodec {
    def decode(r: MediaRow): MediaMeta = {
      if (r.kind != "image") FakeCodec.decode(r)
      else {
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
          catch { case _: Exception => null }
        if (img == null) FakeCodec.decode(r)
        else {
          val raster = img.getRaster
          val (w, h, ch) = (img.getWidth, img.getHeight, raster.getNumBands)
          var sum = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              var b = 0
              while (b < ch) { sum += raster.getSample(x, y, b); b += 1 }
              x += 1
            }
            y += 1
          }
          MediaMeta(r.media_id, r.kind, r.media.length.toLong, w, h, ch,
            sum / (w.toLong * h * ch))
        }
      }
    }
  }

  /** Decode stage: partition-parallel metadata extraction. The iterator
    * shape lets a real codec init once per partition (the reason for
    * mapPartitions over map). `codec` defaults to the deterministic
    * [[FakeCodec]] (cross-engine-replayable, used by the m1 oracle query);
    * pass `ImageIoCodec.decode` for real image decoding.
    */
  def decodeMeta(media: Dataset[MediaRow],
      codec: MediaRow => MediaMeta = FakeCodec.decode): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec init would go here
      it.map(codec)
    }
  }

  /** Resize stub: recompute target dims preserving aspect ratio; the pixel
    * resample itself is the codec's job (stubbed — bytes pass through).
    */
  def resizePlan(meta: Dataset[MediaMeta], maxSide: Int): DataFrame = {
    meta.toDF().withColumn("scale",
        least(lit(maxSide) / col("width"), lit(maxSide) / col("height"), lit(1.0)))
      .withColumn("out_width", greatest(floor(col("width") * col("scale")), lit(1)).cast("int"))
      .withColumn("out_height", greatest(floor(col("height") * col("scale")), lit(1)).cast("int"))
      .drop("scale")
  }

  /** Frame sampling as pure byte slicing — a Column expression, no decode:
    * `nFrames` fixed-width windows at even stride through the blob. The
    * stride is floored to whole bytes BEFORE the frame-index multiply, so
    * every offset is exact integer arithmetic (float offsets truncate in
    * Spark but round in other engines — m2's oracle pins the parity).
    */
  def sampleFrames(df: DataFrame, mediaCol: String, nFrames: Int, frameBytes: Int): DataFrame = {
    val stride = floor(
      greatest(octet_length(col(mediaCol)) - frameBytes, lit(0)) /
        lit(math.max(nFrames - 1, 1))).cast("long")
    df.withColumn("frames",
      transform(sequence(lit(0), lit(nFrames - 1)),
        i => substring(col(mediaCol), (i * stride + 1).cast("int"), lit(frameBytes))))
  }

  /** Wrap any table into media rows by treating a string column's UTF-8
    * bytes as the payload — the harness's stand-in for real blobs (testdata
    * has no binary table; documents.text is byte-identical in both engines).
    */
  def fromText(spark: SparkSession, df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        lit("image").as("kind"),
        encode(col(textCol), "UTF-8").as("media"))
      .as[MediaRow]
  }
}
