package graft

import java.awt.image.BufferedImage
import graft.pipeline.{MjpegAvi, Multimodal}
import graft.pipeline.Multimodal.MediaRow
import org.scalatest.funsuite.AnyFunSuite

/** The MJPEG-in-AVI real video lane: container roundtrip, frame
  * sampling through the JDK's actual JPEG codec, loud failures, and
  * the distributed sampler end-to-end.
  */
class MjpegAviSpec extends AnyFunSuite {

  /** One solid-color JPEG frame; color varies with the frame index so
    * sampled frames are distinguishable after decode.
    */
  private def jpegFrame(idx: Int, w: Int = 32, h: Int = 24): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(idx * 23 % 256, idx * 47 % 256, 128))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("container roundtrip: encode N frames, demux N frames, bytes " +
      "exact; RIFF/AVI shape") {
    val frames = (0 until 7).map(jpegFrame(_))
    val avi = MjpegAvi.encode(frames, 32, 24)
    assert(new String(avi, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(avi, 8, 4, "US-ASCII") == "AVI ")
    val out = MjpegAvi.frames(avi)
    assert(out.length == 7)
    out.zip(frames).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
    // odd-length frames exercise the word-alignment padding
    val odd = frames.map(f => if (f.length % 2 == 0) f.dropRight(0) else f)
    assert(MjpegAvi.frames(MjpegAvi.encode(odd, 32, 24)).length == 7)
  }

  test("non-AVI payloads fail loudly") {
    intercept[IllegalArgumentException](MjpegAvi.frames(Array[Byte](1, 2)))
    intercept[IllegalArgumentException](
      MjpegAvi.frames("RIFFxxxxWAVEdata".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](MjpegAvi.encode(Nil, 8, 8))
  }

  test("corrupt negative chunk lengths fail loudly instead of spinning " +
      "the walker (r15)") {
    val avi = MjpegAvi.encode(Seq(jpegFrame(0)), 32, 24)
    // outer walk: first chunk after the RIFF header is LIST hdrl at
    // offset 12 — poison its 32-bit length to -8 (top bit set)
    val outer = avi.clone()
    outer(16) = -8; outer(17) = -1; outer(18) = -1; outer(19) = -1
    val e1 = intercept[IllegalArgumentException](MjpegAvi.frames(outer))
    assert(e1.getMessage.contains("negative length"))
    // inner movi walk: poison the first 00dc chunk's length
    val inner = avi.clone()
    val moviAt = (12 until avi.length - 12).find(i =>
      new String(avi, i, 4, "US-ASCII") == "movi").get
    inner(moviAt + 8) = -8; inner(moviAt + 9) = -1
    inner(moviAt + 10) = -1; inner(moviAt + 11) = -1
    val e2 = intercept[IllegalArgumentException](MjpegAvi.frames(inner))
    assert(e2.getMessage.contains("negative length"))
  }

  test("frame sampler decodes every Nth frame via the real JPEG codec " +
      "and re-encodes as PNG") {
    val frames = (0 until 10).map(jpegFrame(_))
    val avi = MjpegAvi.encode(frames, 32, 24)
    val out = Multimodal.MjpegAviFrameSampler.sampleBatch(
      Seq(MediaRow(5L, avi, "video/x-msvideo", 0, 0)), every = 3)
    assert(out.map(_.frame_index) == Seq(0, 3, 6, 9))
    out.foreach { f =>
      // PNG payload decoding back to the frame's solid color
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(f.frame))
      assert(img.getWidth == 32 && img.getHeight == 24)
      val expected = new java.awt.Color(
        f.frame_index * 23 % 256, f.frame_index * 47 % 256, 128)
      val got = new java.awt.Color(img.getRGB(16, 12))
      // JPEG is lossy: the decoded solid color is within quantization
      // distance of the encoded one
      assert(math.abs(got.getRed - expected.getRed) < 16 &&
        math.abs(got.getGreen - expected.getGreen) < 16 &&
        math.abs(got.getBlue - expected.getBlue) < 16,
        s"frame ${f.frame_index}: $got vs $expected")
    }
  }
}

/** Distributed sampling — spark-backed suite. */
class MjpegAviSparkSpec extends SparkSpec {
  import spark.implicits._

  test("MjpegAviFrameSampler drives the distributed frameSample " +
      "operator unchanged") {
    def jpeg(idx: Int): Array[Byte] = {
      val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(idx * 50 % 256, 0, 0))
      g.fillRect(0, 0, 16, 16); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val avi1 = MjpegAvi.encode((0 until 6).map(jpeg), 16, 16)
    val avi2 = MjpegAvi.encode((0 until 3).map(jpeg), 16, 16)
    val media = Seq(
      MediaRow(1L, avi1, "video/x-msvideo", 0, 0),
      MediaRow(2L, avi2, "video/x-msvideo", 0, 0)).toDS()
    val out = Multimodal.frameSample(media, every = 2,
      Multimodal.MjpegAviFrameSampler).collect()
    assert(out.map(f => (f.media_id, f.frame_index)).toSet ==
      Set((1L, 0), (1L, 2), (1L, 4), (2L, 0), (2L, 2)))
  }
}
