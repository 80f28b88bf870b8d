package graft.pipeline

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.util.zip.CRC32

/** APNG (animated PNG) container codec — the web's OTHER animation
  * format beside GIF, and a fully-specified LOSSLESS one: a standard
  * PNG stream extended by three chunk types (the published APNG
  * specification, now part of the W3C PNG spec): `acTL` (frame/play
  * counts, before `IDAT`), one `fcTL` per frame (sequence number,
  * region geometry, delay, dispose/blend ops) and `fdAT` (sequence
  * number + an `IDAT`-equivalent payload) for frames after the first.
  * A viewer that knows nothing of APNG still renders the first frame —
  * that degradation contract is why the animation chunks are ancillary.
  *
  * DECODE ([[frames]]) implements the full compositing model: each
  * frame's pixels are reconstructed as a standalone PNG (signature +
  * patched IHDR + PLTE/tRNS carried over + IDAT from the fdAT payload
  * + IEND, CRCs recomputed) and decoded by the JDK's own PNG codec,
  * then composited onto the canvas per `blend_op` (SOURCE replaces the
  * region, OVER alpha-composites) with `dispose_op` applied afterwards
  * (NONE / BACKGROUND clears the region / PREVIOUS reverts it) — so
  * delta-frame animations reproduce exactly, not just full-frame ones.
  * Every chunk CRC is verified and negative/truncated lengths fail
  * loudly (the [[MjpegAvi]] walker lesson).
  *
  * ENCODE ([[encode]]) emits the common full-frame shape (every frame
  * the canvas size, blend SOURCE, dispose NONE) — bit-deterministic
  * given deterministic PNG encodes, which the JDK's PNG writer
  * provides.
  */
object Apng {

  // in-memory ImageIO stream cache — see the Multimodal object note
  // (Apng is usable standalone, so set it here too)
  javax.imageio.ImageIO.setUseCache(false)

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(b: ByteArrayOutputStream, v: Int): Unit = {
    b.write((v >>> 24) & 0xff); b.write((v >>> 16) & 0xff)
    b.write((v >>> 8) & 0xff); b.write(v & 0xff)
  }
  private def rd32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def rd16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private def writeChunk(
      out: ByteArrayOutputStream, ctype: String, data: Array[Byte]): Unit = {
    be32(out, data.length)
    val t = ctype.getBytes("US-ASCII")
    out.write(t)
    out.write(data)
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    be32(out, crc.getValue.toInt)
  }

  /** One parsed chunk: (type, data) — CRC already verified. */
  private final case class Chunk(ctype: String, data: Array[Byte])

  private def chunks(png: Array[Byte]): Vector[Chunk] = {
    require(png.length >= 8 &&
      java.util.Arrays.equals(java.util.Arrays.copyOf(png, 8), Signature),
      "payload is not a PNG stream")
    val out = Vector.newBuilder[Chunk]
    var off = 8
    while (off + 8 <= png.length) {
      val len = rd32(png, off)
      require(len >= 0, s"corrupt PNG chunk: negative length $len")
      // Long arithmetic: a len near Int.MaxValue must not wrap the
      // bound check positive and index past the array (fuzz-pinned)
      require(off.toLong + 12 + len <= png.length,
        "corrupt PNG chunk: length past end of stream")
      val ctype = new String(png, off + 4, 4, "US-ASCII")
      val data = java.util.Arrays.copyOfRange(png, off + 8, off + 8 + len)
      val crc = new CRC32()
      crc.update(png, off + 4, 4 + len)
      require(crc.getValue.toInt == rd32(png, off + 8 + len),
        s"PNG chunk '$ctype': CRC mismatch")
      out += Chunk(ctype, data)
      off += 12 + len
    }
    require(off == png.length,
      "corrupt PNG stream: trailing bytes after the last whole chunk")
    val res = out.result()
    require(res.nonEmpty && res.last.ctype == "IEND",
      "truncated PNG stream: no terminal IEND chunk")
    res
  }

  /** Extract the concatenated IDAT payload of a (still) PNG. */
  private def idatPayload(png: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    chunks(png).filter(_.ctype == "IDAT").foreach(c => out.write(c.data))
    require(out.size > 0, "PNG stream carries no IDAT chunk")
    out.toByteArray
  }

  /** One animation frame for [[encode]]: full-canvas image + delay. */
  final case class Frame(image: BufferedImage, delayNum: Int = 1,
      delayDen: Int = 10)

  /** Assemble full-frame images into an APNG (blend SOURCE, dispose
    * NONE — the common shape); every image must match the canvas size.
    */
  def encode(frames: Seq[Frame]): Array[Byte] = {
    require(frames.nonEmpty, "an APNG needs at least one frame")
    val w = frames.head.image.getWidth
    val h = frames.head.image.getHeight
    frames.foreach(f => require(
      f.image.getWidth == w && f.image.getHeight == h,
      "encode emits full-canvas frames only"))
    // PNG-encode each frame via the JDK, then lift its chunks
    def pngEncode(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    var pngs = frames.map(f => pngEncode(f.image))
    // The container writes ONE IHDR (and PLTE/tRNS set) — the head
    // frame's — while later frames contribute raw IDAT payloads as
    // fdAT. Frames whose BufferedImage types differ (RGB head + ARGB
    // tail, indexed images with differing palettes) would decode
    // against the wrong IHDR/palette: undecodable at best, silently
    // wrong colors in the indexed case. Guard: if any frame's
    // IHDR/PLTE/tRNS bytes differ from the head's, redraw EVERY frame
    // into TYPE_INT_ARGB and re-encode — one uniform IHDR, no palette.
    // Matching-type input (the common path) is untouched byte-for-byte.
    def headerBytes(png: Array[Byte]): Seq[(String, Seq[Byte])] =
      chunks(png).filter(c =>
        c.ctype == "IHDR" || c.ctype == "PLTE" || c.ctype == "tRNS")
        .map(c => (c.ctype, c.data.toSeq))
    val headHdr = headerBytes(pngs.head)
    if (pngs.exists(p => headerBytes(p) != headHdr)) {
      pngs = frames.map { f =>
        val norm = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
        val g = norm.createGraphics()
        g.drawImage(f.image, 0, 0, null)
        g.dispose()
        pngEncode(norm)
      }
    }
    val headChunks = chunks(pngs.head)
    val ihdr = headChunks.find(_.ctype == "IHDR").get
    val out = new ByteArrayOutputStream()
    out.write(Signature)
    writeChunk(out, "IHDR", ihdr.data)
    val actl = new ByteArrayOutputStream()
    be32(actl, frames.length); be32(actl, 0) // plays: 0 = infinite
    writeChunk(out, "acTL", actl.toByteArray)
    // carry the first frame's palette/transparency if the JDK emitted one
    headChunks.filter(c => c.ctype == "PLTE" || c.ctype == "tRNS")
      .foreach(c => writeChunk(out, c.ctype, c.data))
    var seq = 0
    def fctl(fr: Frame): Unit = {
      val d = new ByteArrayOutputStream()
      be32(d, seq); seq += 1
      be32(d, w); be32(d, h); be32(d, 0); be32(d, 0)
      d.write((fr.delayNum >> 8) & 0xff); d.write(fr.delayNum & 0xff)
      d.write((fr.delayDen >> 8) & 0xff); d.write(fr.delayDen & 0xff)
      d.write(0) // dispose NONE
      d.write(0) // blend SOURCE
      writeChunk(out, "fcTL", d.toByteArray)
    }
    fctl(frames.head)
    writeChunk(out, "IDAT", idatPayload(pngs.head))
    frames.tail.zip(pngs.tail).foreach { case (fr, png) =>
      fctl(fr)
      val d = new ByteArrayOutputStream()
      be32(d, seq); seq += 1
      d.write(idatPayload(png))
      writeChunk(out, "fdAT", d.toByteArray)
    }
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** A decoded, fully-composited frame. */
  final case class DecodedFrame(
      index: Int, image: BufferedImage, delayNum: Int, delayDen: Int)

  private final case class Fctl(
      seq: Int, w: Int, h: Int, x: Int, y: Int,
      delayNum: Int, delayDen: Int, dispose: Int, blend: Int)

  /** Decode every animation frame with full dispose/blend compositing.
    * Fails loudly on anything that is not an APNG (a plain PNG has no
    * acTL), on CRC mismatches, on out-of-order sequence numbers, and
    * on region geometry outside the canvas.
    */
  def frames(apng: Array[Byte]): Seq[DecodedFrame] = {
    val cs = chunks(apng)
    val ihdr = cs.find(_.ctype == "IHDR").getOrElse(
      throw new IllegalArgumentException("PNG stream carries no IHDR"))
    require(ihdr.data.length == 13,
      s"corrupt IHDR: ${ihdr.data.length} bytes (13 expected)")
    val actl = cs.find(_.ctype == "acTL").getOrElse(
      throw new IllegalArgumentException(
        "PNG stream is not animated (no acTL chunk)"))
    require(actl.data.length >= 8,
      s"corrupt acTL: ${actl.data.length} bytes (8 expected)")
    val canvasW = rd32(ihdr.data, 0)
    val canvasH = rd32(ihdr.data, 4)
    require(canvasW > 0 && canvasH > 0,
      s"corrupt IHDR: non-positive canvas ${canvasW}x$canvasH")
    // ARGB compositing allocates two canvas-sized int planes; a crafted
    // IHDR must not turn that into a multi-GB allocation (CRC-valid
    // dimension bombs are cheap to mint — fuzz-pinned)
    require(canvasW.toLong * canvasH <= (1L << 26),
      s"canvas ${canvasW}x$canvasH exceeds this decoder's " +
        s"${1L << 26}-pixel bound")
    val carried = cs.filter(c => c.ctype == "PLTE" || c.ctype == "tRNS")
    val declared = rd32(actl.data, 0)

    // gather (fcTL, payload) pairs in stream order, verifying the
    // sequence numbers interleave exactly as the spec requires
    var expectSeq = 0
    var cur: Option[Fctl] = None
    var curData = new ByteArrayOutputStream()
    var sawIdat = false
    val collected = Vector.newBuilder[(Fctl, Array[Byte])]
    def flush(): Unit = cur.foreach { f =>
      require(curData.size > 0, s"frame seq ${f.seq} carries no data")
      collected += ((f, curData.toByteArray))
      cur = None
      curData = new ByteArrayOutputStream()
    }
    cs.foreach { c =>
      c.ctype match {
        case "fcTL" =>
          flush()
          require(c.data.length >= 26,
            s"corrupt fcTL: ${c.data.length} bytes (26 expected)")
          require(rd32(c.data, 0) == expectSeq,
            s"APNG sequence number ${rd32(c.data, 0)} out of order " +
              s"(expected $expectSeq)")
          expectSeq += 1
          cur = Some(Fctl(rd32(c.data, 0), rd32(c.data, 4),
            rd32(c.data, 8), rd32(c.data, 12), rd32(c.data, 16),
            rd16(c.data, 20), rd16(c.data, 22),
            c.data(24) & 0xff, c.data(25) & 0xff))
        case "IDAT" =>
          sawIdat = true
          // IDAT belongs to the animation only when an fcTL precedes it
          if (cur.isDefined) curData.write(c.data)
        case "fdAT" =>
          require(sawIdat, "fdAT before IDAT")
          require(cur.isDefined, "fdAT without a preceding fcTL")
          require(c.data.length >= 4,
            s"corrupt fdAT: ${c.data.length} bytes carry no sequence number")
          require(rd32(c.data, 0) == expectSeq,
            s"APNG sequence number ${rd32(c.data, 0)} out of order " +
              s"(expected $expectSeq)")
          expectSeq += 1
          curData.write(c.data, 4, c.data.length - 4)
        case _ => ()
      }
    }
    flush()
    val frameList = collected.result()
    require(frameList.length == declared,
      s"acTL declares $declared frames, stream carries " +
        s"${frameList.length}")

    // composite
    val canvas = new BufferedImage(
      canvasW, canvasH, BufferedImage.TYPE_INT_ARGB)
    val out = Vector.newBuilder[DecodedFrame]
    frameList.zipWithIndex.foreach { case ((f, payload), idx) =>
      // Long sums: crafted x+w near Int.MaxValue must not wrap negative
      // and pass the canvas bound (fuzz-pinned)
      require(f.w > 0 && f.h > 0 && f.x >= 0 && f.y >= 0 &&
        f.x.toLong + f.w <= canvasW && f.y.toLong + f.h <= canvasH,
        s"frame seq ${f.seq}: region outside the canvas")
      require(f.dispose <= 2 && f.blend <= 1,
        s"frame seq ${f.seq}: reserved dispose/blend op")
      // reconstruct the region as a standalone PNG and decode it
      val png = new ByteArrayOutputStream()
      png.write(Signature)
      val patched = ihdr.data.clone()
      patched(0) = ((f.w >>> 24) & 0xff).toByte
      patched(1) = ((f.w >>> 16) & 0xff).toByte
      patched(2) = ((f.w >>> 8) & 0xff).toByte
      patched(3) = (f.w & 0xff).toByte
      patched(4) = ((f.h >>> 24) & 0xff).toByte
      patched(5) = ((f.h >>> 16) & 0xff).toByte
      patched(6) = ((f.h >>> 8) & 0xff).toByte
      patched(7) = (f.h & 0xff).toByte
      writeChunk(png, "IHDR", patched)
      carried.foreach(c => writeChunk(png, c.ctype, c.data))
      writeChunk(png, "IDAT", payload)
      writeChunk(png, "IEND", Array.emptyByteArray)
      val region = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png.toByteArray))
      require(region != null, s"frame seq ${f.seq}: undecodable pixels")

      // snapshot for dispose PREVIOUS — a raster copy, not a
      // getRGB/setRGB round trip: both canvases are TYPE_INT_ARGB, so
      // the per-pixel color-model conversion is an identity and the
      // raster copy is bit-identical at arraycopy speed (the per-pixel
      // loop was a fuzz-found hang: a CRC-valid near-2^26-pixel canvas
      // made each frame snapshot tens of millions of colorModel calls)
      val before =
        if (f.dispose == 2)
          canvas.getData(new java.awt.Rectangle(f.x, f.y, f.w, f.h))
        else null
      val g = canvas.createGraphics()
      try {
        if (f.blend == 0) { // SOURCE: replace the region
          val comp = g.getComposite
          g.setComposite(java.awt.AlphaComposite.Src)
          g.drawImage(region, f.x, f.y, null)
          g.setComposite(comp)
        } else g.drawImage(region, f.x, f.y, null) // OVER
      } finally g.dispose()
      // the OUTPUT frame is the canvas as rendered (raster copy — see
      // the dispose-PREVIOUS note above)
      val shot = new BufferedImage(
        canvasW, canvasH, BufferedImage.TYPE_INT_ARGB)
      canvas.copyData(shot.getRaster)
      out += DecodedFrame(idx, shot, f.delayNum, f.delayDen)
      // dispose for the NEXT frame
      f.dispose match {
        case 1 => // BACKGROUND: clear the region to transparent
          val gc = canvas.createGraphics()
          try {
            gc.setComposite(java.awt.AlphaComposite.Clear)
            gc.fillRect(f.x, f.y, f.w, f.h)
          } finally gc.dispose()
        case 2 => canvas.getRaster.setRect(before)
        case _ => ()
      }
    }
    out.result()
  }
}
