package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, batch-shaped decode/feature-extract over `mapPartitions`.
  *
  * IMAGES are fully real: [[ImageIODecoder]]/[[ImageIOResizer]] decode,
  * scale and re-encode PNG/JPEG/BMP/GIF through plain-JDK
  * `javax.imageio` — no external codecs needed. AUDIO/VIDEO decode
  * remains environment-blocked (the JDK ships no codecs):
  * [[FakeDecoder]]/[[FakeFrameSampler]] are deterministic placeholders
  * with the exact signature a real decoder plugs into, and the oracled
  * byte-level queries (q31/q69/q47) pin their batch contracts.
  * Everything Spark-side — schema, partitioning, batch iteration shape,
  * output contract — is real and tested. On a Python-capable cluster the
  * same batch contract maps 1:1 onto `mapInPandas`/`mapInArrow` with the
  * decoder in the worker.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      media: Array[Byte],
      mime: String,
      meta_width: Int,
      meta_height: Int)

  final case class MediaFeatures(
      media_id: Long,
      n_bytes: Long,
      n_frames: Int,
      checksum: Long,
      feature: Array[Float])

  /** Batch size the decoder sees per call — the `mapInPandas` batch-shape
    * analog; real decoders amortize codec setup across a batch.
    */
  val DecodeBatchSize = 64

  /** Decoder contract: one batch of media rows in, one batch of features
    * out (sizes must match).
    */
  trait Decoder extends Serializable {
    def decodeBatch(rows: Seq[MediaRow]): Seq[MediaFeatures]
  }

  /** STUB decoder — deterministic fake. A real implementation would call
    * an image/audio library per batch here; this one derives stable values
    * from the bytes so the plumbing is testable end-to-end.
    */
  object FakeDecoder extends Decoder {
    def decodeBatch(rows: Seq[MediaRow]): Seq[MediaFeatures] = rows.map { r =>
      var crc = 0L
      var i = 0
      while (i < r.media.length) {
        crc = crc * 31 + (r.media(i) & 0xff)
        i += 1
      }
      MediaFeatures(
        r.media_id,
        r.media.length.toLong,
        (r.media.length / 1000) + 1,
        crc,
        Array.tabulate(8)(j => ((crc >>> (8 * (j % 8))) & 0xff).toFloat))
    }
  }

  /** REAL image decoder over plain-JDK `javax.imageio` (PNG, JPEG, BMP,
    * GIF — the registry the JDK ships). Per image: true pixel dimensions
    * land in the checksum and an 8-bin normalized luminance histogram
    * lands in `feature` (a resolution-independent perceptual signature —
    * the embedding-ish vector downstream dedup/ANN stages consume).
    * Still images report n_frames = 1. Undecodable payloads fail LOUDLY
    * (a silent skip would corrupt 1:1 batch contracts downstream).
    */
  object ImageIODecoder extends Decoder {
    def decodeBatch(rows: Seq[MediaRow]): Seq[MediaFeatures] = rows.map { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.media))
      require(img != null,
        s"media_id ${r.media_id}: payload is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      val hist = new Array[Float](8)
      var crc = 17L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y) // ARGB, color-managed to sRGB
          val lum = (((rgb >> 16) & 0xff) * 299 +
            ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
          hist(lum >> 5) += 1f
          crc = crc * 31 + rgb
          x += 1
        }
        y += 1
      }
      crc = (crc * 31 + w) * 31 + h
      val n = (w.toLong * h).toFloat
      MediaFeatures(r.media_id, r.media.length.toLong, 1, crc,
        hist.map(_ / n))
    }
  }

  /** Distributed batch decode: partitions iterate in DecodeBatchSize
    * groups (bounded memory per batch), each handed to the decoder.
    */
  def decode(
      media: Dataset[MediaRow],
      decoder: Decoder = FakeDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(batch =>
        decoder.decodeBatch(batch.toSeq))
    }
  }

  /** Build a media table from the documents table (text bytes standing in
    * for opaque media payloads — same shapes, no codecs needed).
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("application/octet-stream").as("mime"),
      lit(0).as("meta_width"),
      lit(0).as("meta_height")).as[MediaRow]
  }

  // ------------------------------------------------------- resize

  /** Batch resize contract (image scaling lives behind it). */
  trait Resizer extends Serializable {
    def resizeBatch(rows: Seq[MediaRow], w: Int, h: Int): Seq[MediaRow]
  }

  /** STUB resizer: deterministic payload transform (truncate/pad toward
    * w*h bytes) + metadata update — a real implementation decodes,
    * scales, and re-encodes per batch.
    */
  object FakeResizer extends Resizer {
    def resizeBatch(rows: Seq[MediaRow], w: Int, h: Int): Seq[MediaRow] =
      rows.map { r =>
        val target = math.max(1, w * h)
        val out = java.util.Arrays.copyOf(r.media, target)
        r.copy(media = out, meta_width = w, meta_height = h)
      }
  }

  /** REAL image resizer: decode via `javax.imageio`, bilinear scale on a
    * `Graphics2D`, re-encode as PNG (the JDK's PNG writer is
    * deterministic, so resized payloads are stable bytes — cacheable and
    * dedupable downstream). Output metadata carries the target
    * dimensions and `image/png`.
    */
  object ImageIOResizer extends Resizer {
    def resizeBatch(rows: Seq[MediaRow], w: Int, h: Int): Seq[MediaRow] = {
      require(w >= 1 && h >= 1, s"resize target must be positive: ${w}x$h")
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.media))
        require(img != null,
          s"media_id ${r.media_id}: payload is not a decodable image")
        val out = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        r.copy(media = bos.toByteArray, mime = "image/png",
          meta_width = w, meta_height = h)
      }
    }
  }

  /** Distributed batch resize — same DecodeBatchSize batch iteration as
    * [[decode]]; 1:1 row contract.
    */
  def resize(
      media: Dataset[MediaRow],
      w: Int,
      h: Int,
      resizer: Resizer = FakeResizer): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(batch =>
        resizer.resizeBatch(batch.toSeq, w, h))
    }
  }

  // ------------------------------------------------------- frame sampling

  final case class FrameRow(
      media_id: Long,
      frame_index: Int,
      frame: Array[Byte])

  /** Batch frame-sampler contract: one media row fans out to every
    * `every`-th frame (the 1:N shape a video sampler has).
    */
  trait FrameSampler extends Serializable {
    def sampleBatch(rows: Seq[MediaRow], every: Int): Seq[FrameRow]
  }

  /** STUB sampler: frame count follows [[FakeDecoder]]'s byte-length
    * heuristic (len/1000 + 1); each sampled frame carries a deterministic
    * 1000-byte slice of the payload standing in for a decoded frame.
    */
  object FakeFrameSampler extends FrameSampler {
    def sampleBatch(rows: Seq[MediaRow], every: Int): Seq[FrameRow] =
      rows.flatMap { r =>
        val nFrames = (r.media.length / 1000) + 1
        (0 until nFrames by every).map { f =>
          val from = math.min(f * 1000, r.media.length)
          val until = math.min(from + 1000, r.media.length)
          FrameRow(r.media_id, f,
            java.util.Arrays.copyOfRange(r.media, from, until))
        }
      }
  }

  /** Distributed frame sampling: every `every`-th frame of each media row,
    * batch-iterated like [[decode]]. Output grows 1:N — partition counts
    * carry over from the input, so upstream partitioning bounds the fan-out
    * per task.
    */
  def frameSample(
      media: Dataset[MediaRow],
      every: Int,
      sampler: FrameSampler = FakeFrameSampler): Dataset[FrameRow] = {
    require(every >= 1, "frame step must be >= 1")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(batch =>
        sampler.sampleBatch(batch.toSeq, every))
    }
  }
}
