package graft.pipeline

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import org.scalatest.funsuite.AnyFunSuite

/** [[Apng]] — container pinning in the codec-spec discipline:
  * pixel-exact roundtrip (PNG is lossless), FULL dispose/blend
  * compositing on hand-built delta-frame streams, chunk-CRC and
  * sequence-number loudness, and PNG-degradation sanity (the stream is
  * a valid still PNG to a non-animated reader).
  */
class ApngSpec extends AnyFunSuite {

  private def solid(w: Int, h: Int, rgb: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h)
    g.dispose()
    img
  }

  test("full-frame roundtrip is pixel-exact; delays carried") {
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff, 0x123456)
    val apng = Apng.encode(colors.zipWithIndex.map { case (c, i) =>
      Apng.Frame(solid(20, 12, c), delayNum = i + 1, delayDen = 100)
    })
    val out = Apng.frames(apng)
    assert(out.length == 4)
    out.zip(colors).zipWithIndex.foreach { case ((f, c), i) =>
      assert(f.index == i && f.delayNum == i + 1 && f.delayDen == 100)
      for (x <- 0 until 20; y <- 0 until 12)
        assert((f.image.getRGB(x, y) & 0xffffff) == c, s"frame $i ($x,$y)")
    }
    // degradation contract: a non-animated PNG reader sees frame 0
    val still = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(apng))
    assert(still != null && (still.getRGB(3, 3) & 0xffffff) == 0xff0000)
  }

  // ------------------------- hand-built delta-frame compositing streams

  /** Build an APNG with explicit per-frame regions/ops: frame 0 is the
    * full canvas over IDAT; later frames are (image, x, y, dispose of
    * the PREVIOUS frame... no — dispose/blend belong to EACH frame).
    */
  private def craftDelta(
      canvas: BufferedImage,
      deltas: Seq[(BufferedImage, Int, Int, Int, Int)]): Array[Byte] = {
    // re-encode through Apng.encode piecewise is impossible (it is
    // full-frame only), so assemble chunks here via the public encode
    // of single images + chunk surgery
    def pngBytes(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def chunksOf(png: Array[Byte]): Seq[(String, Array[Byte])] = {
      var off = 8
      val out = Seq.newBuilder[(String, Array[Byte])]
      while (off + 8 <= png.length) {
        val len = ((png(off) & 0xff) << 24) | ((png(off + 1) & 0xff) << 16) |
          ((png(off + 2) & 0xff) << 8) | (png(off + 3) & 0xff)
        out += ((new String(png, off + 4, 4, "US-ASCII"),
          java.util.Arrays.copyOfRange(png, off + 8, off + 8 + len)))
        off += 12 + len
      }
      out.result()
    }
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    def writeChunk(ctype: String, data: Array[Byte]): Unit = {
      out.write((data.length >>> 24) & 0xff)
      out.write((data.length >>> 16) & 0xff)
      out.write((data.length >>> 8) & 0xff)
      out.write(data.length & 0xff)
      val t = ctype.getBytes("US-ASCII")
      out.write(t); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      val v = crc.getValue.toInt
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    val head = chunksOf(pngBytes(canvas))
    writeChunk("IHDR", head.find(_._1 == "IHDR").get._2)
    val actl = new ByteArrayOutputStream()
    def be32(v: Int): Unit = {
      actl.write((v >>> 24) & 0xff); actl.write((v >>> 16) & 0xff)
      actl.write((v >>> 8) & 0xff); actl.write(v & 0xff)
    }
    be32(1 + deltas.length); be32(0)
    writeChunk("acTL", actl.toByteArray)
    var seq = 0
    def fctl(w: Int, h: Int, x: Int, y: Int, dispose: Int,
        blend: Int): Unit = {
      val d = new ByteArrayOutputStream()
      def b32(v: Int): Unit = {
        d.write((v >>> 24) & 0xff); d.write((v >>> 16) & 0xff)
        d.write((v >>> 8) & 0xff); d.write(v & 0xff)
      }
      b32(seq); seq += 1
      b32(w); b32(h); b32(x); b32(y)
      d.write(0); d.write(1); d.write(0); d.write(10) // delay 1/10
      d.write(dispose); d.write(blend)
      writeChunk("fcTL", d.toByteArray)
    }
    fctl(canvas.getWidth, canvas.getHeight, 0, 0, 0, 0)
    val canvasIdat = new ByteArrayOutputStream()
    head.filter(_._1 == "IDAT").foreach(c => canvasIdat.write(c._2))
    writeChunk("IDAT", canvasIdat.toByteArray)
    deltas.foreach { case (img, x, y, dispose, blend) =>
      fctl(img.getWidth, img.getHeight, x, y, dispose, blend)
      val idat = new ByteArrayOutputStream()
      chunksOf(pngBytes(img)).filter(_._1 == "IDAT")
        .foreach(c => idat.write(c._2))
      val d = new ByteArrayOutputStream()
      d.write((seq >>> 24) & 0xff); d.write((seq >>> 16) & 0xff)
      d.write((seq >>> 8) & 0xff); d.write(seq & 0xff)
      seq += 1
      d.write(idat.toByteArray)
      writeChunk("fdAT", d.toByteArray)
    }
    writeChunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  test("delta frames composite: SOURCE patch, dispose BACKGROUND, " +
      "dispose PREVIOUS") {
    val base = solid(16, 16, 0x101010)
    // frame 1: red 4x4 patch at (2,2), dispose PREVIOUS (reverts after)
    // frame 2: green 4x4 patch at (8,8), dispose BACKGROUND
    // frame 3: blue 2x2 patch at (0,0), dispose NONE
    val apng = craftDelta(base, Seq(
      (solid(4, 4, 0xff0000), 2, 2, 2, 0),
      (solid(4, 4, 0x00ff00), 8, 8, 1, 0),
      (solid(2, 2, 0x0000ff), 0, 0, 0, 0)))
    val fs = Apng.frames(apng)
    assert(fs.length == 4)
    def rgb(i: Int, x: Int, y: Int) = fs(i).image.getRGB(x, y) & 0xffffff
    def alpha(i: Int, x: Int, y: Int) = (fs(i).image.getRGB(x, y) >>> 24)
    // frame 0: the base everywhere
    assert(rgb(0, 3, 3) == 0x101010 && rgb(0, 9, 9) == 0x101010)
    // frame 1: red patch present, rest base
    assert(rgb(1, 3, 3) == 0xff0000 && rgb(1, 9, 9) == 0x101010)
    // frame 2: red REVERTED (dispose PREVIOUS on frame 1), green patch
    assert(rgb(2, 3, 3) == 0x101010, "dispose PREVIOUS must revert")
    assert(rgb(2, 9, 9) == 0x00ff00)
    // frame 3: green region CLEARED to transparent (dispose BACKGROUND
    // on frame 2), blue patch at origin
    assert(alpha(3, 9, 9) == 0, "dispose BACKGROUND must clear to alpha 0")
    assert(rgb(3, 0, 0) == 0x0000ff && rgb(3, 3, 3) == 0x101010)
  }

  test("corruption and malformed streams are loud") {
    val apng = Apng.encode(Seq(Apng.Frame(solid(8, 8, 0xabcdef)),
      Apng.Frame(solid(8, 8, 0x123456))))
    // chunk CRC
    val bad = apng.clone(); bad(40) = (bad(40) ^ 0x11).toByte
    intercept[IllegalArgumentException](Apng.frames(bad))
    // a plain (non-animated) PNG rejects: no acTL
    val still = {
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(solid(8, 8, 1), "png", bos)
      bos.toByteArray
    }
    val e = intercept[IllegalArgumentException](Apng.frames(still))
    assert(e.getMessage.contains("acTL"))
    // not a PNG at all
    intercept[IllegalArgumentException](Apng.frames(Array[Byte](1, 2, 3)))
    // truncation
    intercept[IllegalArgumentException](
      Apng.frames(java.util.Arrays.copyOf(apng, apng.length - 6)))
  }

  test("heterogeneous frame image types encode to a decodable APNG " +
      "(r16 ADVICE pin): RGB head + ARGB + indexed tail are " +
      "normalized to one IHDR instead of fdAT-ing mismatched IDATs") {
    def filled(typ: Int, rgb: Int): BufferedImage = {
      val img = new BufferedImage(10, 6, typ)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, 10, 6)
      g.dispose(); img
    }
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff)
    val types = Seq(BufferedImage.TYPE_INT_RGB,
      BufferedImage.TYPE_INT_ARGB, BufferedImage.TYPE_BYTE_INDEXED)
    val apng = Apng.encode(colors.zip(types).map { case (c, t) =>
      Apng.Frame(filled(t, c))
    })
    val out = Apng.frames(apng)
    assert(out.length == 3)
    out.zip(colors).zipWithIndex.foreach { case ((f, c), i) =>
      for (x <- 0 until 10; y <- 0 until 6)
        assert((f.image.getRGB(x, y) & 0xffffff) == c,
          f"frame $i ($x,$y): got 0x${f.image.getRGB(x, y)}%08x")
    }
    // every frame decodes against the ONE written IHDR: a standalone
    // PNG reader must also accept frame 0 (degradation contract holds
    // through normalization)
    val still = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(apng))
    assert(still != null && (still.getRGB(2, 2) & 0xffffff) == 0xff0000)
    // and the uniform-type path stays byte-identical to a direct
    // encode (no normalization when nothing mismatches)
    val uni = colors.map(c =>
      Apng.Frame(filled(BufferedImage.TYPE_INT_RGB, c)))
    assert(java.util.Arrays.equals(Apng.encode(uni), Apng.encode(uni)))
  }
}

/** Distributed sampler — spark-backed suite. */
class ApngSparkSpec extends graft.SparkSpec {
  import spark.implicits._
  import graft.pipeline.Multimodal.MediaRow

  test("ApngFrameSampler drives the distributed frameSample operator") {
    def img(c: Int) = {
      val i = new BufferedImage(10, 10, BufferedImage.TYPE_INT_RGB)
      val g = i.createGraphics()
      g.setColor(new java.awt.Color(c)); g.fillRect(0, 0, 10, 10)
      g.dispose(); i
    }
    val a1 = Apng.encode((0 until 5).map(i => Apng.Frame(img(i * 50))))
    val a2 = Apng.encode((0 until 2).map(i => Apng.Frame(img(i * 99))))
    val media = Seq(
      MediaRow(1L, a1, "image/apng", 0, 0),
      MediaRow(2L, a2, "image/apng", 0, 0)).toDS()
    val out = Multimodal.frameSample(media, every = 2,
      Multimodal.ApngFrameSampler).collect()
    assert(out.map(f => (f.media_id, f.frame_index)).toSet ==
      Set((1L, 0), (1L, 2), (1L, 4), (2L, 0)))
    // payloads are decodable PNGs of the composited frames
    out.filter(_.media_id == 1L).foreach { f =>
      val i = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(f.frame))
      assert((i.getRGB(5, 5) & 0xffffff) == f.frame_index * 25 * 2)
    }
  }

  test("AutoFrameSampler dispatches on container magic and rejects " +
      "unknown payloads loudly (r15)") {
    def img(c: Int) = {
      val i = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
      val g = i.createGraphics()
      g.setColor(new java.awt.Color(c)); g.fillRect(0, 0, 8, 8)
      g.dispose(); i
    }
    val apng = Apng.encode((0 until 3).map(i => Apng.Frame(img(i * 80))))
    val avi = {
      val frames = (0 until 3).map { _ =>
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img(128), "jpg", bos)
        bos.toByteArray
      }
      MjpegAvi.encode(frames, 8, 8)
    }
    val out = Multimodal.frameSample(
      Seq(MediaRow(1L, apng, "?", 0, 0), MediaRow(2L, avi, "?", 0, 0))
        .toDS(), every = 2, Multimodal.AutoFrameSampler).collect()
    assert(out.map(f => (f.media_id, f.frame_index)).toSet ==
      Set((1L, 0), (1L, 2), (2L, 0), (2L, 2)))
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.frameSample(
        Seq(MediaRow(3L, "MKV?trash".getBytes("US-ASCII"), "?", 0, 0))
          .toDS(), every = 1, Multimodal.AutoFrameSampler).collect()
    }
    assert(String.valueOf(e.getMessage).contains("unrecognized") ||
      Option(e.getCause).exists(c =>
        String.valueOf(c.getMessage).contains("unrecognized")))
  }
}
