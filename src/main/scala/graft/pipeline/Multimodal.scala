package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, batch-shaped decode/feature-extract over `mapPartitions`.
  *
  * IMAGES are fully real: [[ImageIODecoder]]/[[ImageIOResizer]] decode,
  * scale and re-encode PNG/JPEG/BMP/GIF through plain-JDK
  * `javax.imageio` — no external codecs needed. UNCOMPRESSED AUDIO is
  * real too: [[WavPcm]]/[[WavAudioDecoder]]/[[wavEnergy]] decode PCM
  * WAV/AIFF/AU through plain-JDK `javax.sound.sampled`, and
  * [[GifFrameSampler]] samples real frames from the one multi-frame
  * container the JDK decodes (animated GIF). Only COMPRESSED audio
  * (mp3/ogg/aac) and VIDEO remain environment-blocked (the JDK ships
  * no codecs for those):
  * [[FakeDecoder]]/[[FakeFrameSampler]] are deterministic placeholders
  * with the exact signature a real decoder plugs into (via the SPI
  * seam below), and the oracled byte-level queries (q31/q69/q47) pin
  * their batch contracts.
  * Everything Spark-side — schema, partitioning, batch iteration shape,
  * output contract — is real and tested. On a Python-capable cluster the
  * same batch contract maps 1:1 onto `mapInPandas`/`mapInArrow` with the
  * decoder in the worker.
  */
object Multimodal {

  // ImageIO's default stream cache is DISK-backed: every
  // ImageIO.read/write on a byte-array stream creates (and deletes) a
  // temp FILE. Per-payload codec work over a corpus turns that into
  // millions of tiny filesystem round-trips — measured as q383's 34x
  // wall at 10x rows in the r15 sf10 probe (tiny PNG frames, so the
  // temp-file overhead dominated). All our payloads are in-memory byte
  // arrays; cache in memory. Object init runs once per JVM/executor on
  // first touch of any lane.
  javax.imageio.ImageIO.setUseCache(false)

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

  /** REAL frame sampler for multi-frame images (animated GIF — the one
    * multi-frame container the JDK decodes without external codecs):
    * per payload, read every `every`-th frame through the ImageIO
    * sequence reader and re-encode it as PNG (deterministic bytes, the
    * [[ImageIOResizer]] discipline). Frames come back as the reader's
    * RAW rasters — GIF delta frames are NOT composited onto their
    * predecessors (compositing is a codec policy; a production video
    * decoder behind the SPI seam owns it). Undecodable payloads fail
    * LOUDLY, preserving the batch contract.
    */
  object GifFrameSampler extends FrameSampler {
    def sampleBatch(rows: Seq[MediaRow], every: Int): Seq[FrameRow] =
      rows.flatMap { r =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.media))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext,
          s"media_id ${r.media_id}: payload is not a decodable image stream")
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          (0 until n by every).map { f =>
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(reader.read(f), "png", bos)
            FrameRow(r.media_id, f, bos.toByteArray)
          }
        } finally {
          reader.dispose()
          iis.close()
        }
      }
  }

  /** REAL ANIMATED-PNG frame sampler: every `every`-th FULLY-COMPOSITED
    * frame through [[Apng]] (dispose/blend ops applied, so delta-frame
    * animations sample their true rendered frames, unlike a naive
    * region decode), re-encoded as deterministic PNG — the shared
    * payload policy, so downstream image stages consume GIF, APNG and
    * MJPEG frames identically.
    */
  object ApngFrameSampler extends FrameSampler {
    def sampleBatch(rows: Seq[MediaRow], every: Int): Seq[FrameRow] =
      rows.flatMap { r =>
        val all = Apng.frames(r.media)
        all.zipWithIndex.collect { case (f, i) if i % every == 0 =>
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(f.image, "png", bos)
          FrameRow(r.media_id, i, bos.toByteArray)
        }
      }
  }

  /** MAGIC-BYTE auto-dispatching frame sampler — [[AutoAudioDecoder]]'s
    * animation twin: `GIF8` → [[GifFrameSampler]], the PNG signature →
    * [[ApngFrameSampler]], `RIFF…AVI ` → [[MjpegAviFrameSampler]];
    * unknown magic fails loudly. A heterogeneous crawl corpus
    * frame-samples through ONE operator with no content-type labels,
    * and every lane emits the same PNG payload policy, so downstream
    * image dedup/feature stages are container-blind.
    */
  object AutoFrameSampler extends FrameSampler {
    def sampleBatch(rows: Seq[MediaRow], every: Int): Seq[FrameRow] =
      rows.flatMap { r =>
        val b = r.media
        def str(off: Int, n: Int) =
          if (b.length >= off + n) new String(b, off, n, "US-ASCII") else ""
        val sampler: FrameSampler =
          if (str(0, 4) == "GIF8") GifFrameSampler
          else if (b.length >= 8 && (b(0) & 0xff) == 0x89 &&
            str(1, 3) == "PNG") ApngFrameSampler
          else if (str(0, 4) == "RIFF" && str(8, 4) == "AVI ")
            MjpegAviFrameSampler
          else throw new IllegalArgumentException(
            s"media_id ${r.media_id}: unrecognized animation container " +
              s"(magic ${str(0, 4)})")
        sampler.sampleBatch(Seq(r), every)
      }
  }

  /** REAL VIDEO frame sampler: Motion-JPEG in its standard AVI
    * container through [[MjpegAvi]] — demux the `movi` frame chunks,
    * decode every `every`-th one with the JDK's own JPEG codec, and
    * re-encode as deterministic PNG (the [[GifFrameSampler]] payload
    * policy, so downstream image dedup/feature stages consume both
    * identically). MJPEG is intra-frame-only, so raw per-frame decode
    * IS the full decode — no compositing policy left to a production
    * codec. Undecodable payloads fail LOUDLY (batch contract).
    */
  object MjpegAviFrameSampler extends FrameSampler {
    def sampleBatch(rows: Seq[MediaRow], every: Int): Seq[FrameRow] =
      rows.flatMap { r =>
        val jpegs = MjpegAvi.frames(r.media)
        (0 until jpegs.length by every).map { f =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(jpegs(f)))
          require(img != null,
            s"media_id ${r.media_id}: frame $f is not a decodable JPEG")
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          FrameRow(r.media_id, f, bos.toByteArray)
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

  // ------------------------------------------------------- audio (PCM)

  /** REAL audio lane over plain-JDK `javax.sound.sampled`: the JDK
    * ships PCM WAV/AIFF/AU parsers (no external codecs needed), so
    * uncompressed audio decodes for real — only COMPRESSED audio
    * (mp3/ogg/aac) remains behind the codec SPI seam, the same split as
    * images (imageio formats real) vs video (stub).
    */
  object WavPcm {

    /** Decode a PCM WAV/AIFF/AU payload to mono integer samples
      * (channels averaged with truncation toward zero — deterministic),
      * in the native signed range of the sample width. Supports 8- and
      * 16-bit PCM, signed or unsigned, either endianness; anything else
      * — or an undecodable payload — fails LOUDLY as
      * IllegalArgumentException (the 1:1 batch contract; a silent skip
      * would corrupt downstream joins).
      *
      * @return (sample rate in Hz, mono samples)
      */
    def decodeMono(bytes: Array[Byte]): (Float, Array[Int]) = {
      import javax.sound.sampled.{AudioFormat, AudioSystem, UnsupportedAudioFileException}
      val ais =
        try AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        catch {
          case e: UnsupportedAudioFileException =>
            throw new IllegalArgumentException(
              s"payload is not a decodable PCM audio file: ${e.getMessage}")
        }
      try {
        val fmt = ais.getFormat
        val enc = fmt.getEncoding
        val signed = enc == AudioFormat.Encoding.PCM_SIGNED
        require(signed || enc == AudioFormat.Encoding.PCM_UNSIGNED,
          s"unsupported audio encoding $enc — PCM only; plug a " +
            "compressed-format codec through the SPI seam")
        val bits = fmt.getSampleSizeInBits
        require(bits == 8 || bits == 16,
          s"unsupported PCM sample width: $bits bits (8/16 supported)")
        val ch = fmt.getChannels
        require(ch >= 1, "audio payload declares zero channels")
        // NOT readAllBytes: AudioInputStream.read returns 0 (not -1)
        // when the buffer holds less than one frame, and a crafted fmt
        // chunk can declare a frame size above readNBytes' internal
        // 16 KiB buffer — InputStream.readAllBytes then spins forever
        // on the 0-byte reads (fuzz-pinned hang). Read frame-aligned
        // buffers ourselves and fail loudly if the stream stalls.
        val afs = math.max(1, fmt.getFrameSize)
        require(afs <= (1 << 20), s"unsupported audio frame size: $afs bytes")
        val dbuf = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](math.max(afs, (64 * 1024 / afs) * afs))
        var got = ais.read(buf)
        while (got > 0) { dbuf.write(buf, 0, got); got = ais.read(buf) }
        require(got == -1,
          "audio stream stalled mid-read — corrupt frame geometry")
        val data = dbuf.toByteArray
        val bps = bits / 8
        val frameSize = bps * ch
        val n = data.length / frameSize
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          var sum = 0
          var c = 0
          while (c < ch) {
            val off = i * frameSize + c * bps
            val s =
              if (bits == 8) {
                if (signed) data(off).toInt else (data(off) & 0xff) - 128
              } else {
                val (b0, b1) =
                  if (fmt.isBigEndian) (data(off), data(off + 1))
                  else (data(off + 1), data(off))
                val raw = ((b0 & 0xff) << 8) | (b1 & 0xff)
                if (signed) raw.toShort.toInt else raw - 32768
              }
            sum += s
            c += 1
          }
          out(i) = sum / ch
          i += 1
        }
        (fmt.getSampleRate, out)
      } finally ais.close()
    }
  }

  /** REAL audio decoder for the SPI seam: per PCM payload, n_frames =
    * mono sample count, a rolling-hash checksum over the decoded
    * samples (byte-layout-independent: the same sound at the same rate
    * hashes equal from WAV or AIFF), and an 8-segment normalized energy
    * envelope as `feature` — the duration-independent loudness
    * signature downstream dedup/ANN stages consume, the audio analog of
    * [[ImageIODecoder]]'s luminance histogram.
    */
  object WavAudioDecoder extends Decoder {
    def decodeBatch(rows: Seq[MediaRow]): Seq[MediaFeatures] = rows.map { r =>
      val (rate, samples) = WavPcm.decodeMono(r.media)
      audioFeatures(r.media_id, r.media.length.toLong, rate.toInt, samples)
    }
  }

  /** The shared audio feature fold (checksum + 8-segment energy
    * envelope) over decoded mono samples — identical math for every
    * audio lane, so the same sound at the same rate features equal
    * regardless of its container/codec path.
    */
  private def audioFeatures(
      id: Long, payloadLen: Long, rateInt: Int,
      samples: Array[Int]): MediaFeatures = {
    var crc = 17L
    var i = 0
    while (i < samples.length) { crc = crc * 31 + samples(i); i += 1 }
    crc = (crc * 31 + samples.length) * 31 + rateInt
    val seg = new Array[Double](8)
    if (samples.length > 0) {
      i = 0
      while (i < samples.length) {
        val s = samples(i).toDouble
        // segment index by exact integer math — no length/8 rounding
        seg(((i.toLong * 8) / samples.length).toInt) += s * s
        i += 1
      }
    }
    val tot = seg.sum
    val env =
      if (tot > 0) seg.map(e => (e / tot).toFloat)
      else new Array[Float](8)
    MediaFeatures(id, payloadLen, samples.length, crc, env)
  }

  /** REAL COMPRESSED-audio decoder for the SPI seam: IMA/DVI ADPCM in
    * its standard WAV container (fmt tag 0x11, ~4:1 over 16-bit PCM)
    * through [[ImaAdpcm]] — the first genuinely compressed format the
    * audio lane decodes natively (the JDK ships no ADPCM codec; other
    * compressed formats still arrive through the SPI seam). Features
    * are the SAME fold as [[WavAudioDecoder]], so ADPCM-compressed and
    * PCM copies of one sound land adjacent in downstream dedup/ANN up
    * to quantization error.
    */
  object AdpcmAudioDecoder extends Decoder {
    def decodeBatch(rows: Seq[MediaRow]): Seq[MediaFeatures] = rows.map { r =>
      val (rate, samples) = ImaAdpcm.decodeWavMono(r.media)
      audioFeatures(r.media_id, r.media.length.toLong, rate, samples)
    }
  }

  /** REAL LOSSLESS-compressed audio decoder for the SPI seam: FLAC
    * through [[FlacPcm]] (fixed/LPC prediction + Rice residuals — the
    * format speech corpora like LibriSpeech ship in). Same feature
    * fold, and since FLAC is lossless a FLAC copy of a PCM sound
    * features EXACTLY equal (not merely adjacent like ADPCM).
    */
  object FlacAudioDecoder extends Decoder {
    def decodeBatch(rows: Seq[MediaRow]): Seq[MediaFeatures] = rows.map { r =>
      val (rate, samples) = FlacPcm.decodeMono(r.media)
      audioFeatures(r.media_id, r.media.length.toLong, rate, samples)
    }
  }

  /** MAGIC-BYTE auto-dispatching audio decoder: a crawl corpus never
    * labels its payloads reliably, so dispatch on the container bytes
    * themselves, not a content-type string — `fLaC` → [[FlacPcm]],
    * RIFF/WAVE with fmt tag 0x11 → [[ImaAdpcm]], RIFF/WAVE (PCM tags) /
    * AIFF (`FORM…AIFF`) / AU (`.snd`) → [[WavPcm]]. Unknown magic
    * fails LOUDLY (the 1:1 batch contract). All lanes share
    * [[audioFeatures]], so the SAME sound under any LOSSLESS
    * container/codec yields the same content checksum — the dedup key
    * mixed-codec corpora group on (q382).
    */
  object AutoAudioDecoder extends Decoder {
    /** The RIFF/WAVE fmt-chunk wFormatTag, or -1 when absent/not WAVE. */
    private def waveFormatTag(b: Array[Byte]): Int = {
      if (b.length < 12 || new String(b, 0, 4, "US-ASCII") != "RIFF" ||
        new String(b, 8, 4, "US-ASCII") != "WAVE") return -1
      var off = 12
      while (off + 8 <= b.length) {
        val id = new String(b, off, 4, "US-ASCII")
        val len = (b(off + 4) & 0xff) | ((b(off + 5) & 0xff) << 8) |
          ((b(off + 6) & 0xff) << 16) | ((b(off + 7) & 0xff) << 24)
        if (len < 0) return -1 // corrupt — let the lane decoder reject
        if (id == "fmt " && off + 10 <= b.length)
          return (b(off + 8) & 0xff) | ((b(off + 9) & 0xff) << 8)
        off += 8 + len + (len & 1)
      }
      -1
    }
    def decodeBatch(rows: Seq[MediaRow]): Seq[MediaFeatures] = rows.map { r =>
      val b = r.media
      def tag4 = if (b.length >= 4) new String(b, 0, 4, "US-ASCII") else ""
      val (rate, samples): (Int, Array[Int]) =
        if (tag4 == "fLaC") FlacPcm.decodeMono(b)
        else if (waveFormatTag(b) == 0x11) ImaAdpcm.decodeWavMono(b)
        else if (waveFormatTag(b) >= 0 || tag4 == "FORM" || tag4 == ".snd") {
          val (rf, s) = WavPcm.decodeMono(b); (rf.toInt, s)
        } else throw new IllegalArgumentException(
          s"unrecognized audio container (magic ${tag4.take(4)})")
      audioFeatures(r.media_id, b.length.toLong, rate, samples)
    }
  }

  /** Deterministic WAV synthesis from text — the fixture generator
    * feeding [[wavEnergy]]'s REAL decode in the oracled roundtrip gate
    * (q371): one 16-bit mono PCM sample per printable-ASCII character,
    * amp = codepoint − 79 (the [[fakePcmEnergy]] lane's amplitude
    * formula, so the oracle replays it as ascii() math), rendered as a
    * true RIFF/WAVE payload via `javax.sound.sampled` on the
    * executors. The gate equality holds iff WAV encode→decode is
    * sample-exact — which 16-bit PCM guarantees.
    */
  def textToWav(
      docs: DataFrame, idCol: String, textCol: String,
      rate: Float = 8000f): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.functions.{col, length, regexp_replace}
    docs
      .select(col(idCol).cast("long").as("id"),
        regexp_replace(col(textCol), "[^ -~]", "").as("s"))
      .filter(length(col("s")) > 0)
      .as[(Long, String)]
      .map { case (id, s) =>
        val bytes = new Array[Byte](s.length * 2)
        var i = 0
        while (i < s.length) {
          val amp = s.charAt(i).toInt - 79
          bytes(2 * i) = (amp & 0xff).toByte
          bytes(2 * i + 1) = ((amp >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(bytes), fmt, s.length.toLong),
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        MediaRow(id, bos.toByteArray, "audio/wav", 0, 0)
      }
  }

  /** [[textToWav]]'s FLAC twin: the same deterministic amplitude
    * formula (codepoint − 79), compressed through the real [[FlacPcm]]
    * encoder on the executors. Feeds the q380 gate: the oracle replays
    * the amplitude formula exactly like q371's, so the gate holds iff
    * FLAC encode→decode is SAMPLE-EXACT — which losslessness
    * guarantees and the decoder's CRC-16 + MD5 checks enforce.
    */
  def textToFlac(
      docs: DataFrame, idCol: String, textCol: String,
      rate: Int = 8000): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.functions.{col, length, regexp_replace}
    docs
      .select(col(idCol).cast("long").as("id"),
        regexp_replace(col(textCol), "[^ -~]", "").as("s"))
      .filter(length(col("s")) > 0)
      .as[(Long, String)]
      .map { case (id, s) =>
        val samples = Array.tabulate(s.length)(i => s.charAt(i).toInt - 79)
        MediaRow(id, FlacPcm.encode(samples, rate), "audio/flac", 0, 0)
      }
  }

  /** Windowed audio energy + silence gating over REAL decoded PCM —
    * [[fakePcmEnergy]]'s production twin (same output contract:
    * media_id, win, n_samples, energy, silence). The decode runs in the
    * [[DecodeBatchSize]] batch shape and the per-window Σs² folds
    * SEQUENTIALLY inside the partition sweep — windows of one payload
    * are contiguous samples, so no explode, no shuffle, O(1) state per
    * window: a pure scan-stage operator. Energy is an exact integer sum
    * (16-bit samples ⇒ window sums ≪ int64); the silence gate scales by
    * the window's own sample count so tail windows gate fairly.
    */
  def wavEnergy(
      media: Dataset[MediaRow],
      windowSamples: Int = 1024,
      silencePerSample: Long = 100L): DataFrame =
    windowedEnergy(media, WavDecodeFn, windowSamples, silencePerSample)

  /** [[wavEnergy]] over FLAC payloads ([[FlacPcm]] decode) — identical
    * windowed fold, so FLAC- and WAV-encoded copies of one sound
    * produce IDENTICAL rows (FLAC is lossless).
    */
  def flacEnergy(
      media: Dataset[MediaRow],
      windowSamples: Int = 1024,
      silencePerSample: Long = 100L): DataFrame =
    windowedEnergy(media, FlacDecodeFn, windowSamples, silencePerSample)

  // top-level serializable decode fns: the closures below ship to
  // executors, and a lambda-in-method would drag the enclosing scope in
  private val WavDecodeFn: Array[Byte] => Array[Int] =
    b => WavPcm.decodeMono(b)._2
  private val FlacDecodeFn: Array[Byte] => Array[Int] =
    b => FlacPcm.decodeMono(b)._2

  private def windowedEnergy(
      media: Dataset[MediaRow],
      decodeFn: Array[Byte] => Array[Int],
      windowSamples: Int,
      silencePerSample: Long): DataFrame = {
    require(windowSamples >= 1 && silencePerSample >= 0,
      "need windowSamples >= 1 and silencePerSample >= 0")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.flatMap { r =>
          val samples = decodeFn(r.media)
          samples.iterator.grouped(windowSamples).zipWithIndex.map {
            case (win, wi) =>
              var energy = 0L
              win.foreach { s => energy += s.toLong * s }
              (r.media_id, wi.toLong, win.length.toLong, energy,
                if (energy < win.length * silencePerSample) 1 else 0)
          }
        }
      }
    }.toDF("media_id", "win", "n_samples", "energy", "silence")
  }

  // ------------------------------------------------------- perceptual hash

  /** 63-bit difference hash (dHash) over a 9×8 luminance grid: bit
    * (y·8+x) is set iff lum(y,x) < lum(y,x+1) for y∈[0,8), x∈[0,8),
    * except the top (7,7) comparison — 63 bits keep the value inside
    * SIGNED int64 on every engine (DuckDB's checked `<<` rejects 1<<63;
    * the hamming radius loses nothing measurable from one bit). Near-dup
    * images keep near-equal hashes under resize/re-encode — the
    * perceptual analog of SimHash.
    */
  val DHashBits = 63

  /** REAL lane: decode via javax.imageio, bilinear-sample the luminance
    * plane down to 9×8, difference-hash. Same batch contract as the
    * decoders.
    */
  object ImageIOHasher extends Serializable {
    def hashBatch(rows: Seq[MediaRow]): Seq[(Long, Long)] = rows.map { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.media))
      require(img != null,
        s"media_id ${r.media_id}: payload is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      // bilinear luminance sample at the 9×8 grid centers
      def lum(fx: Double, fy: Double): Double = {
        val x0 = math.min(w - 1, math.max(0, fx.toInt))
        val y0 = math.min(h - 1, math.max(0, fy.toInt))
        val x1 = math.min(w - 1, x0 + 1)
        val y1 = math.min(h - 1, y0 + 1)
        val ax = fx - x0
        val ay = fy - y0
        def l(x: Int, y: Int): Double = {
          val rgb = img.getRGB(x, y)
          (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000.0
        }
        l(x0, y0) * (1 - ax) * (1 - ay) + l(x1, y0) * ax * (1 - ay) +
          l(x0, y1) * (1 - ax) * ay + l(x1, y1) * ax * ay
      }
      val g = Array.tabulate(8, 9) { (y, x) =>
        lum((x + 0.5) * w / 9.0 - 0.5, (y + 0.5) * h / 8.0 - 0.5)
      }
      var hash = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val bit = y * 8 + x
          if (bit < DHashBits && g(y)(x) < g(y)(x + 1))
            hash |= 1L << bit
          x += 1
        }
        y += 1
      }
      (r.media_id, hash)
    }
  }

  /** Distributed real-lane hash: (media_id, dhash) per image. */
  def dhashImages(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(batch =>
        ImageIOHasher.hashBatch(batch.toSeq))
    }.toDF("media_id", "dhash")
  }

  /** STUB lane as a pure Column expression (scan-stage, codegen'd): the
    * deterministic fake gray grid is the code points of the
    * printable-ASCII-filtered lowercased text, padded to 72 with
    * spaces, row-major 9×8 — so near-identical texts (the fake stand-in
    * for near-identical images) get near-equal hashes, and the oracle
    * replays ascii()/substr() verbatim.
    */
  def fakeDHash(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val s = rpad(regexp_replace(lower(text), "[^ -~]", ""), 72, " ")
    val terms = for {
      y <- 0 until 8
      x <- 0 until 8
      bit = y * 8 + x
      if bit < DHashBits
    } yield {
      val a = ascii(substring(s, y * 9 + x + 1, 1))
      val b = ascii(substring(s, y * 9 + x + 2, 1))
      when(a < b, lit(1L << bit)).otherwise(lit(0L))
    }
    terms.reduce(_ + _) // disjoint bits: sum ≡ bitwise OR
  }

  /** Hamming-radius near-dup pairs over dHashes: 4 16-bit bands (bits
    * 0-15/16-31/32-47/48-62) bucket the candidates; a pair is surfaced
    * iff some band matches exactly. Pigeonhole guarantees full recall
    * for radius ≤ 3 (4 bands, ≤3 flipped bits ⇒ one band clean);
    * radius 4-6 pairs are found unless their flips touch all 4 bands —
    * the standard banding recall trade, stated not hidden.
    * Verification is exact bit_count(xor) ≤ radius. Never all-pairs:
    * the join key is (band, 16-bit value).
    */
  def dhashNearDupPairs(
      hashes: DataFrame, radius: Int = 6): DataFrame = {
    import org.apache.spark.sql.functions._
    require(radius >= 0 && radius < DHashBits, s"bad radius: $radius")
    val banded = hashes.select(
      col("media_id"), col("dhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("dhash"), 16 * b).bitwiseAND(lit(0xffffL))
            .as("bv"))): _*)).as("bb"))
      .select(col("media_id"), col("dhash"),
        col("bb.band").as("band"), col("bb.bv").as("bv"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        bit_count(col("a.dhash").bitwiseXOR(col("b.dhash")))
          .as("hamming"))
      // filter BEFORE the dedup exchange: hamming is a function of the
      // pair, so the distinct set is unchanged — but the radius cut is
      // selective, and uncut the shuffle carried every multi-band
      // candidate collision (r16, guide §2.3)
      .filter(col("hamming") <= radius)
      .distinct()
  }

  /** Windowed audio energy + silence gating over the deterministic
    * fake-PCM lane (the VAD/silence-trim front of an audio pipeline).
    * The JDK ships no audio codecs, so the decode is the documented
    * stub: samples are the code points of the printable-ASCII-filtered
    * text re-centered to [−47, 47] — while the Spark-side plumbing is
    * the real thing: a scan-stage position explode (no shuffle until
    * the window aggregate), fixed-size sample windows, per-window
    * energy as an EXACT integer Σs² (|s| ≤ 47 ⇒ window sums ≪ int64),
    * and the silence gate as a pure integer compare scaled by the
    * window's own sample count (tail windows gate fairly). One
    * (media, window) hash aggregate with map-side combine; swap the
    * sample expression for a real PCM decoder batch UDF and nothing
    * downstream changes.
    */
  def fakePcmEnergy(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      windowSamples: Int = 16,
      silencePerSample: Int = 100): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(windowSamples >= 1 && silencePerSample >= 0,
      "need windowSamples >= 1 and silencePerSample >= 0")
    docs
      .select(col(idCol).as("media_id"),
        regexp_replace(col(textCol), "[^ -~]", "").as("__s"))
      .filter(length(col("__s")) > 0)
      .select(col("media_id"), col("__s"),
        posexplode(sequence(lit(1), length(col("__s")))))
      .select(col("media_id"),
        expr(s"CAST(pos DIV $windowSamples AS BIGINT)").as("win"),
        (expr("ascii(substr(__s, pos + 1, 1))") - 79).as("__amp"))
      .groupBy(col("media_id"), col("win"))
      .agg(count(lit(1)).as("n_samples"),
        sum(col("__amp") * col("__amp")).cast("long").as("energy"))
      .select(col("media_id"), col("win"), col("n_samples"),
        col("energy"),
        (col("energy") < col("n_samples") * silencePerSample)
          .cast("int").as("silence"))
      .orderBy("media_id", "win")
  }

  // ------------------------------------------------------- codec discovery

  /** Codec SPI seam: resolve the Decoder/Resizer/FrameSampler to use at
    * runtime WITHOUT touching operator call sites — a real audio/video
    * codec drops in as a jar, no code change. Resolution order:
    *
    *  1. system property `graft.multimodal.<kind>` (kind ∈ decoder,
    *     resizer, frameSampler) naming a class — a Scala `object`
    *     (MODULE$ singleton) or a class with a public no-arg
    *     constructor; deployments pin their codec explicitly;
    *  2. `java.util.ServiceLoader`: the first provider registered under
    *     `META-INF/services/<trait binary name>` on the classpath
    *     (e.g. `graft.pipeline.Multimodal$Decoder`);
    *  3. the deterministic fake — the documented stub lane.
    *
    * Instances must be Serializable (they ship inside mapPartitions
    * closures to every executor). The ORACLED queries keep passing the
    * fakes explicitly: their answers are pinned to the stub lane by
    * design; discovery is the production wiring
    * (`Multimodal.decode(media, Multimodal.loadDecoder())`).
    */
  def loadDecoder(): Decoder = loadCodec[Decoder]("decoder", FakeDecoder)

  /** See [[loadDecoder]]. */
  def loadResizer(): Resizer = loadCodec[Resizer]("resizer", FakeResizer)

  /** See [[loadDecoder]]. */
  def loadFrameSampler(): FrameSampler =
    loadCodec[FrameSampler]("frameSampler", FakeFrameSampler)

  private def loadCodec[T](kind: String, fallback: T)(
      implicit ct: scala.reflect.ClassTag[T]): T = {
    val cls = ct.runtimeClass.asInstanceOf[Class[T]]
    sys.props.get(s"graft.multimodal.$kind") match {
      case Some(name) =>
        val c = Class.forName(name)
        require(cls.isAssignableFrom(c),
          s"graft.multimodal.$kind=$name does not implement ${cls.getName}")
        val instance =
          try c.getField("MODULE$").get(null) // Scala object singleton
          catch { case _: NoSuchFieldException =>
            c.getDeclaredConstructor().newInstance()
          }
        cls.cast(instance)
      case None =>
        import scala.jdk.CollectionConverters._
        java.util.ServiceLoader.load(cls).iterator().asScala
          .nextOption().getOrElse(fallback)
    }
  }
}
