package graft.pipeline

import java.io.ByteArrayOutputStream

/** MJPEG-in-AVI container codec — a REAL video lane for the multimodal
  * pipeline: the standard RIFF `AVI ` layout (`hdrl` with `avih` +
  * `strl(strh 'vids'/'MJPG', strf BITMAPINFOHEADER)`, a `movi` LIST of
  * `00dc` frame chunks, and an `idx1` index — the shape
  * ffmpeg/VLC/Windows demux) with each frame a complete baseline JPEG,
  * which the JDK's own ImageIO JPEG codec decodes. Motion-JPEG is the
  * one genuine video format that needs NO external codec jar, so with
  * this the video frame-sampling lane joins audio (PCM, IMA ADPCM) and
  * images (PNG/JPEG/BMP/GIF) as REAL — only inter-frame-compressed
  * formats (H.264 etc.) remain behind the codec SPI seam.
  *
  * Everything is byte-exact container arithmetic — safe for the
  * deterministic-fixture discipline the suite pins.
  */
object MjpegAvi {

  private def le16(b: ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
  }
  private def le32(b: ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
    b.write((v >> 16) & 0xff); b.write((v >> 24) & 0xff)
  }
  private def fourcc(b: ByteArrayOutputStream, s: String): Unit =
    b.write(s.getBytes("US-ASCII"))

  /** Assemble complete per-frame JPEG payloads into a standard MJPEG
    * AVI (single video stream, no audio).
    */
  def encode(
      frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty, "an AVI needs at least one frame")
    require(fps > 0, "fps must be positive")
    val maxFrame = frames.map(_.length).max

    // LIST hdrl: avih + LIST strl(strh + strf)
    val hdrl = new ByteArrayOutputStream()
    fourcc(hdrl, "hdrl")
    fourcc(hdrl, "avih"); le32(hdrl, 56)
    le32(hdrl, 1000000 / fps) // µs per frame
    le32(hdrl, maxFrame * fps) // max bytes/sec (informative)
    le32(hdrl, 0) // padding granularity
    le32(hdrl, 0x10) // AVIF_HASINDEX
    le32(hdrl, frames.length)
    le32(hdrl, 0) // initial frames
    le32(hdrl, 1) // streams
    le32(hdrl, maxFrame) // suggested buffer
    le32(hdrl, width); le32(hdrl, height)
    le32(hdrl, 0); le32(hdrl, 0); le32(hdrl, 0); le32(hdrl, 0) // reserved
    val strl = new ByteArrayOutputStream()
    fourcc(strl, "strl")
    fourcc(strl, "strh"); le32(strl, 56)
    fourcc(strl, "vids"); fourcc(strl, "MJPG")
    le32(strl, 0); le16(strl, 0); le16(strl, 0) // flags, prio, lang
    le32(strl, 0) // initial frames
    le32(strl, 1); le32(strl, fps) // rate = fps/1
    le32(strl, 0); le32(strl, frames.length) // start, length
    le32(strl, maxFrame); le32(strl, -1) // buffer, quality
    le32(strl, 0) // sample size (0 = varying)
    le16(strl, 0); le16(strl, 0); le16(strl, width); le16(strl, height)
    fourcc(strl, "strf"); le32(strl, 40) // BITMAPINFOHEADER
    le32(strl, 40); le32(strl, width); le32(strl, height)
    le16(strl, 1); le16(strl, 24) // planes, bpp
    fourcc(strl, "MJPG")
    le32(strl, width * height * 3)
    le32(strl, 0); le32(strl, 0); le32(strl, 0); le32(strl, 0)
    val strlBytes = strl.toByteArray
    fourcc(hdrl, "LIST"); le32(hdrl, strlBytes.length)
    hdrl.write(strlBytes)
    val hdrlBytes = hdrl.toByteArray

    // LIST movi: one 00dc chunk per frame; idx1 offsets are relative to
    // the 'movi' fourcc position
    val movi = new ByteArrayOutputStream()
    fourcc(movi, "movi")
    val offsets = new Array[Int](frames.length)
    frames.zipWithIndex.foreach { case (f, i) =>
      offsets(i) = movi.size() - 4 // offset from after 'movi' + 4 conv.
      fourcc(movi, "00dc"); le32(movi, f.length)
      movi.write(f)
      if ((f.length & 1) == 1) movi.write(0)
    }
    val moviBytes = movi.toByteArray

    val idx1 = new ByteArrayOutputStream()
    frames.zipWithIndex.foreach { case (f, i) =>
      fourcc(idx1, "00dc")
      le32(idx1, 0x10) // AVIIF_KEYFRAME
      le32(idx1, offsets(i) + 4)
      le32(idx1, f.length)
    }
    val idx1Bytes = idx1.toByteArray

    val out = new ByteArrayOutputStream()
    fourcc(out, "RIFF")
    le32(out, 4 + (8 + hdrlBytes.length) + (8 + moviBytes.length) +
      (8 + idx1Bytes.length))
    fourcc(out, "AVI ")
    fourcc(out, "LIST"); le32(out, hdrlBytes.length); out.write(hdrlBytes)
    fourcc(out, "LIST"); le32(out, moviBytes.length); out.write(moviBytes)
    fourcc(out, "idx1"); le32(out, idx1Bytes.length); out.write(idx1Bytes)
    out.toByteArray
  }

  private def rd32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Demux the video frames of an MJPEG AVI: walks the `movi` LIST and
    * returns every complete `..dc`/`..db` chunk payload (each a full
    * JPEG). Fails LOUDLY on anything that is not a RIFF AVI.
    */
  def frames(avi: Array[Byte]): Seq[Array[Byte]] = {
    require(avi.length >= 12 && tag(avi, 0) == "RIFF" &&
      tag(avi, 8) == "AVI ", "payload is not a RIFF AVI file")
    val out = Vector.newBuilder[Array[Byte]]
    // offsets advance in Long: a crafted len near Int.MaxValue must not
    // wrap the cursor negative and re-enter the walk (fuzz-pinned)
    var off = 12L
    while (off + 8 <= avi.length) {
      val id = tag(avi, off.toInt)
      val len = rd32(avi, off.toInt + 4)
      // A negative 32-bit length (corrupt/crafted payload) would make the
      // offset advance non-positive and spin the walk forever — fail loudly.
      require(len >= 0, s"corrupt RIFF chunk '$id': negative length $len")
      if (id == "LIST" && off + 12 <= avi.length &&
          tag(avi, off.toInt + 8) == "movi") {
        var p = off + 12
        val end = math.min(off + 8 + len, avi.length.toLong)
        while (p + 8 <= end) {
          val cid = tag(avi, p.toInt)
          val clen = rd32(avi, p.toInt + 4)
          require(clen >= 0,
            s"corrupt movi chunk '$cid': negative length $clen")
          if (cid.length == 4 && (cid.endsWith("dc") || cid.endsWith("db")) &&
              p + 8 + clen <= end)
            out += java.util.Arrays.copyOfRange(
              avi, p.toInt + 8, p.toInt + 8 + clen)
          p += 8L + clen + (clen & 1)
        }
      }
      off += 8L + len + (len & 1)
    }
    val fs = out.result()
    require(fs.nonEmpty, "AVI carries no video frame chunks")
    fs
  }
}
