package graft.pipeline

/** IMA/DVI ADPCM codec (4 bits per sample, ~4:1 over 16-bit PCM) and
  * its standard WAV container (wFormatTag 0x11) — a REAL compressed
  * audio lane for the multimodal pipeline: the algorithm and container
  * layout are the published IMA "Recommended Practices for Enhancing
  * Digital Audio Compatibility" scheme that sox/ffmpeg/Windows decode,
  * implemented from the specification (step-size + index tables, 4-bit
  * quantizer with (step>>3) rounding bias, per-block predictor reseed).
  *
  * The JDK ships no ADPCM codec, so before this the compressed-audio
  * lane was a deterministic stub behind the SPI seam; with this object
  * [[Multimodal.AdpcmAudioDecoder]] decodes genuine compressed audio
  * on executors. Everything is integer math — bit-exact across
  * platforms, safe for oracle-grade determinism.
  */
object ImaAdpcm {

  // published IMA step-size table (89 entries)
  private val Step: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  // index adjustment per 3-bit magnitude code
  private val IndexAdj: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  private def clampSample(v: Int): Int =
    if (v > 32767) 32767 else if (v < -32768) -32768 else v
  private def clampIndex(v: Int): Int =
    if (v > 88) 88 else if (v < 0) 0 else v

  /** Mutable codec state: the predictor (last reconstructed sample) and
    * the step-table index — identical on both sides by construction.
    */
  final class State(var predictor: Int, var index: Int)

  /** Encode one sample → 4-bit code, advancing `st` exactly as the
    * decoder will (the encoder embeds the decoder — the standard ADPCM
    * closed-loop structure, so quantization error never accumulates).
    */
  def encodeSample(sample: Int, st: State): Int = {
    val step = Step(st.index)
    var diff = sample - st.predictor
    var code = 0
    if (diff < 0) { code = 8; diff = -diff }
    var delta = step >> 3
    if (diff >= step) { code |= 4; diff -= step; delta += step }
    val h = step >> 1
    if (diff >= h) { code |= 2; diff -= h; delta += h }
    val q = step >> 2
    if (diff >= q) { code |= 1; delta += q }
    st.predictor = clampSample(
      if ((code & 8) != 0) st.predictor - delta else st.predictor + delta)
    st.index = clampIndex(st.index + IndexAdj(code & 7))
    code
  }

  /** Decode one 4-bit code → reconstructed sample, advancing `st`. */
  def decodeSample(code: Int, st: State): Int = {
    val step = Step(st.index)
    var delta = step >> 3
    if ((code & 4) != 0) delta += step
    if ((code & 2) != 0) delta += step >> 1
    if ((code & 1) != 0) delta += step >> 2
    st.predictor = clampSample(
      if ((code & 8) != 0) st.predictor - delta else st.predictor + delta)
    st.index = clampIndex(st.index + IndexAdj(code & 7))
    st.predictor
  }

  /** Samples per mono block for a given block size in bytes: the 4-byte
    * block header carries the first sample literally, then two samples
    * per data byte.
    */
  def samplesPerBlock(blockAlign: Int): Int = (blockAlign - 4) * 2 + 1

  private def le16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
  }
  private def le32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
    b.write((v >> 16) & 0xff); b.write((v >> 24) & 0xff)
  }

  /** Encode mono 16-bit samples as a standard IMA-ADPCM WAV payload
    * (fmt tag 0x11 with samplesPerBlock extension + fact chunk): each
    * block reseeds the predictor with its first sample (stored
    * literally in the 4-byte block header) — the layout external
    * decoders expect.
    */
  def encodeWav(
      samples: Array[Int], rate: Int, blockAlign: Int = 256): Array[Byte] = {
    require(blockAlign >= 8 && blockAlign % 4 == 0,
      s"blockAlign must be a multiple of 4, >= 8: $blockAlign")
    val spb = samplesPerBlock(blockAlign)
    val nBlocks =
      if (samples.isEmpty) 0 else (samples.length + spb - 1) / spb
    val data = new java.io.ByteArrayOutputStream()
    val st = new State(0, 0)
    var b = 0
    while (b < nBlocks) {
      val start = b * spb
      val first = samples(start)
      // block header: literal first sample + current index
      st.predictor = clampSample(first)
      le16(data, st.predictor & 0xffff)
      data.write(st.index)
      data.write(0) // reserved
      // nibble payload, low nibble first; short final block pads with
      // repeats of the last sample (decoders trim via the fact count)
      var i = 1
      while (i < spb) {
        def sampleAt(j: Int): Int =
          if (start + j < samples.length) samples(start + j)
          else samples(samples.length - 1)
        val lo = encodeSample(sampleAt(i), st)
        val hi =
          if (i + 1 < spb) encodeSample(sampleAt(i + 1), st) else 0
        data.write(lo | (hi << 4))
        i += 2
      }
      b += 1
    }
    val payload = data.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    // fmt(20) + fact(4) + data(payload) chunks with headers + "WAVE"
    le32(out, 4 + (8 + 20) + (8 + 4) + (8 + payload.length))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII"))
    le32(out, 20)
    le16(out, 0x11) // wFormatTag = IMA ADPCM
    le16(out, 1) // mono
    le32(out, rate)
    le32(out, rate * blockAlign / spb) // avg bytes/sec (informative)
    le16(out, blockAlign)
    le16(out, 4) // bits per (encoded) sample
    le16(out, 2) // cbSize
    le16(out, spb)
    out.write("fact".getBytes("US-ASCII"))
    le32(out, 4)
    le32(out, samples.length)
    out.write("data".getBytes("US-ASCII"))
    le32(out, payload.length)
    out.write(payload)
    out.toByteArray
  }

  private def rd16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def rd32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Decode a mono IMA-ADPCM WAV payload (fmt tag 0x11). Returns
    * (sample rate, 16-bit samples); trailing block padding is trimmed
    * via the fact chunk's sample count when present. Fails LOUDLY on
    * anything that is not a mono 4-bit IMA-ADPCM WAV — the 1:1 batch
    * contract.
    */
  def decodeWavMono(bytes: Array[Byte]): (Int, Array[Int]) = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE",
      "payload is not a RIFF/WAVE file")
    // offsets advance in Long: a crafted len near Int.MaxValue must not
    // wrap the cursor negative and re-enter the walk (fuzz-pinned)
    var off = 12L
    var rate = -1
    var blockAlign = -1
    var spb = -1
    var factSamples = -1
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= bytes.length) {
      val o = off.toInt
      val id = new String(bytes, o, 4, "US-ASCII")
      val len = rd32(bytes, o + 4)
      // A negative 32-bit length (corrupt/crafted payload) would make the
      // offset advance non-positive and spin the walk forever — fail loudly.
      require(len >= 0, s"corrupt RIFF chunk '$id': negative length $len")
      require(off + 8 + len <= bytes.length,
        s"corrupt RIFF chunk '$id': length $len past end of payload")
      id match {
        case "fmt " =>
          require(len >= 16, s"corrupt fmt chunk: length $len < 16")
          val tag = rd16(bytes, o + 8)
          require(tag == 0x11,
            f"not IMA ADPCM (wFormatTag 0x$tag%x; 0x11 expected)")
          require(rd16(bytes, o + 10) == 1, "mono IMA ADPCM only")
          rate = rd32(bytes, o + 12)
          blockAlign = rd16(bytes, o + 20)
          require(rd16(bytes, o + 22) == 4, "4-bit IMA ADPCM only")
          spb =
            if (len >= 20) rd16(bytes, o + 26)
            else samplesPerBlock(blockAlign)
        case "fact" =>
          require(len >= 4, s"corrupt fact chunk: length $len < 4")
          factSamples = rd32(bytes, o + 8)
        case "data" => dataOff = o + 8; dataLen = len
        case _ => ()
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(rate > 0 && blockAlign > 0 && dataOff >= 0,
      "WAV is missing fmt or data chunk")
    // the block loop reads dataLen bytes from dataOff and the header
    // reads 4 bytes per block — both bounded by these two checks
    require(blockAlign >= 8 && blockAlign % 4 == 0,
      s"blockAlign must be a multiple of 4, >= 8: $blockAlign")
    require(dataOff.toLong + dataLen <= bytes.length,
      s"data chunk length $dataLen past end of payload")
    require(spb == samplesPerBlock(blockAlign),
      s"inconsistent samplesPerBlock $spb for blockAlign $blockAlign")
    val nBlocks = dataLen / blockAlign
    val out = new Array[Int](nBlocks * spb)
    var n = 0
    val st = new State(0, 0)
    var b = 0
    while (b < nBlocks) {
      val base = dataOff + b * blockAlign
      st.predictor = rd16(bytes, base).toShort.toInt
      st.index = clampIndex(bytes(base + 2) & 0xff)
      out(n) = st.predictor; n += 1
      var i = 4
      while (i < blockAlign) {
        val byte = bytes(base + i) & 0xff
        out(n) = decodeSample(byte & 0xf, st); n += 1
        out(n) = decodeSample(byte >> 4, st); n += 1
        i += 1
      }
      b += 1
    }
    val total = if (factSamples >= 0) math.min(factSamples, n) else n
    (rate, if (total == n) out else out.take(total))
  }
}
