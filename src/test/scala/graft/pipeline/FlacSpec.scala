package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** [[FlacPcm]] — the same pinning discipline as AdpcmSpec: bit-exact
  * roundtrip (FLAC is lossless — equality is exact, not an envelope),
  * container parse, CRC/MD5 corruption loudness, encoded-byte
  * determinism, and hand-crafted FOREIGN streams exercising the decoder
  * paths our encoder never emits (mid/side stereo, 5-bit Rice method,
  * partition orders > 0, wasted bits, escape partitions). Lives in
  * package graft.pipeline to reach the package-private bit plumbing the
  * crafted streams are built from.
  */
class FlacSpec extends AnyFunSuite {
  import FlacPcm._

  private def sine(n: Int, freq: Double, amp: Int, rate: Int = 8000)
      : Array[Int] =
    Array.tabulate(n)(i =>
      math.round(amp * math.sin(2 * math.Pi * freq * i / rate)).toInt)

  /** Deterministic "noise" (splitmix-style) bounded to 16-bit. */
  private def noise(n: Int): Array[Int] = Array.tabulate(n) { i =>
    var x = i.toLong * 0x9e3779b97f4a7c15L + 0x632be59bd9b4e019L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    ((x >>> 17) % 65536 - 32768).toInt
  }

  // ------------------------------------------------------------ roundtrip

  test("roundtrip is bit-exact across signal shapes and lengths") {
    val shapes: Seq[(String, Array[Int])] = Seq(
      "sine" -> sine(10000, 440, 20000),
      "ramp" -> Array.tabulate(5000)(i => i % 4001 - 2000),
      "constant" -> Array.fill(3000)(-12345),
      "noise" -> noise(4000),
      "mixed" -> (sine(4096, 100, 30000) ++ Array.fill(4096)(7) ++
        noise(300)),
      "tiny1" -> Array(42),
      "tiny2" -> Array(-1, 1),
      "tiny5" -> Array(0, 100, -200, 300, -400),
      "block-exact" -> sine(8192, 250, 15000),
      "empty" -> Array.empty[Int])
    for ((name, x) <- shapes; bs <- Seq(256, 4096)) {
      val flac = encode(x, 8000, blockSize = bs)
      val (rate, back) = decodeMono(flac)
      assert(rate == 8000, name)
      assert(back.sameElements(x), s"$name @bs=$bs not bit-exact")
    }
  }

  test("predictor coverage: the encoder exercises CONSTANT, FIXED and " +
      "LPC subframe decode paths") {
    // a pure sine is the LPC showcase (2-tap recurrence)
    val lpc = decode(encode(sine(8192, 440, 20000), 8000))
    assert(lpc.subframeTypes.exists(_ >= 32),
      s"sine stream never used LPC: ${lpc.subframeTypes}")
    // a flat block is CONSTANT
    val const = decode(encode(Array.fill(4096)(5), 8000))
    assert(const.subframeTypes.contains(0))
    // a quadratic ramp is a fixed-predictor shape
    val fixed = decode(encode(
      Array.tabulate(4096)(i => (i * i) % 3000 - 1500), 8000))
    assert(fixed.subframeTypes.exists(t => t >= 8 && t <= 12),
      s"ramp stream never used a fixed predictor: ${fixed.subframeTypes}")
  }

  test("compression is real on predictable signals") {
    val x = sine(40000, 220, 25000)
    val flac = encode(x, 8000)
    assert(flac.length < x.length * 2 / 2, // < half the 16-bit PCM bytes
      s"FLAC ${flac.length} bytes vs PCM ${x.length * 2}")
  }

  // ------------------------------------------------------------ container

  test("container shape: marker, STREAMINFO fields, total-sample check") {
    val x = sine(5000, 330, 10000)
    val flac = encode(x, 44100)
    assert(new String(flac, 0, 4, "US-ASCII") == "fLaC")
    val s = decode(flac)
    assert(s.rate == 44100 && s.channels == 1 && s.bps == 16)
    assert(s.samples(0).length == 5000)
    // non-FLAC payloads fail loudly
    intercept[IllegalArgumentException](decode(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](
      decode("RIFFxxxxWAVEdata0000".getBytes("US-ASCII")))
  }

  test("corruption is loud: header CRC-8, frame CRC-16, stream MD5, " +
      "truncation") {
    val x = sine(6000, 500, 18000)
    val flac = encode(x, 8000)
    val frameStart = 4 + 4 + 34 // marker + metadata header + STREAMINFO
    // frame header byte (the blocking-strategy/blocksize byte)
    val h = flac.clone(); h(frameStart + 2) = (h(frameStart + 2) ^ 0x01).toByte
    val eh = intercept[IllegalArgumentException](decode(h))
    assert(eh.getMessage.contains("CRC") || eh.getMessage.contains("sync") ||
      eh.getMessage.contains("reserved"), eh.getMessage)
    // frame body byte → CRC-16
    val b = flac.clone(); b(frameStart + 20) = (b(frameStart + 20) ^ 0x40).toByte
    intercept[IllegalArgumentException](decode(b))
    // STREAMINFO MD5 field (bytes 26..41) → every frame decodes, MD5 trips
    val m = flac.clone(); m(30) = (m(30) ^ 0x55).toByte
    val em = intercept[IllegalArgumentException](decode(m))
    assert(em.getMessage.contains("MD5"), em.getMessage)
    // truncation
    intercept[IllegalArgumentException](
      decode(java.util.Arrays.copyOf(flac, flac.length - 3)))
  }

  test("bit determinism: fixed input encodes to pinned bytes") {
    val x = Array.tabulate(5000)(i => (i * 37 % 4001) - 2000)
    val flac = encode(x, 8000)
    var h = 1125899906842597L
    flac.foreach(b => h = h * 31 + b)
    // pinned on first green run; drift means the codec changed behavior,
    // which would silently split FLAC dedup groups
    assert(h == FlacSpecPins.DeterminismHash,
      s"encoded-bytes hash drifted: ${h}L")
  }

  // ----------------------------------------- crafted foreign-shape streams

  /** Assemble a single-frame stream our encoder would never emit. The
    * frame body writer gets a BitWriter positioned after the frame
    * header; this helper writes marker, STREAMINFO (zero MD5 → decode
    * skips the MD5 gate), the frame header with the given channel
    * assignment, and seals CRC-8/CRC-16.
    */
  private def craft(
      blockSize: Int, rate: Int, channels: Int, bps: Int, chCode: Int,
      total: Long, srCode: Int = 0, srTrailing: Option[(Long, Int)] = None,
      ssCode: Int = 0, blockingStrategy: Int = 0, codedNumber: Long = 0L)
      (body: BitWriter => Unit): Array[Byte] = {
    require(blockSize <= 256, "craft uses the 8-bit end-of-header form")
    val si = new BitWriter
    si.writeBits(1L, 1); si.writeBits(0L, 7); si.writeBits(34L, 24)
    si.writeBits(blockSize.toLong, 16); si.writeBits(blockSize.toLong, 16)
    si.writeBits(0L, 24); si.writeBits(0L, 24)
    si.writeBits(rate.toLong, 20)
    si.writeBits((channels - 1).toLong, 3)
    si.writeBits((bps - 1).toLong, 5)
    si.writeBits(total >>> 32, 4); si.writeBits(total & 0xffffffffL, 32)
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    out.write(si.toByteArray)
    out.write(new Array[Byte](16)) // zero MD5: unknown
    val bw = new BitWriter
    bw.writeBits(0x3ffeL, 14); bw.writeBits(0L, 1)
    bw.writeBits(blockingStrategy.toLong, 1)
    bw.writeBits(6L, 4) // block size: 8-bit value at end of header
    bw.writeBits(srCode.toLong, 4)
    bw.writeBits(chCode.toLong, 4)
    bw.writeBits(ssCode.toLong, 3)
    bw.writeBits(0L, 1)
    writeUtf8Number(bw, codedNumber)
    bw.writeBits((blockSize - 1).toLong, 8)
    srTrailing.foreach { case (v, bits) => bw.writeBits(v, bits) }
    bw.alignToByte()
    val head = bw.toByteArray
    val bw2 = new BitWriter
    head.foreach(x => bw2.writeBits((x & 0xff).toLong, 8))
    bw2.writeBits(crc8(head, 0, head.length).toLong, 8)
    body(bw2)
    bw2.alignToByte()
    val frame = bw2.toByteArray
    out.write(frame)
    val c16 = crc16(frame, 0, frame.length)
    out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)
    out.toByteArray
  }

  private def verbatim(bw: BitWriter, xs: Seq[Int], bits: Int): Unit = {
    bw.writeBits(0L, 1); bw.writeBits(1L, 6); bw.writeBits(0L, 1)
    xs.foreach(v => bw.writeBits(v.toLong, bits))
  }

  test("foreign stream: mid/side stereo with a 17-bit side subframe " +
      "reconstructs both channels; decodeMono averages them") {
    val left = Array(100, -200, 300, -400, 500, -600, 700, -800)
    val right = Array(90, -180, 270, -360, 450, -540, 630, -720)
    val mid = left.indices.map(i => (left(i) + right(i)) >> 1)
    val side = left.indices.map(i => left(i) - right(i))
    val flac = craft(8, 8000, 2, 16, chCode = 10, total = 8) { bw =>
      verbatim(bw, mid, 16)
      verbatim(bw, side, 17) // side carries one extra bit
    }
    val s = decode(flac)
    assert(s.channels == 2)
    assert(s.samples(0).sameElements(left), s.samples(0).toSeq)
    assert(s.samples(1).sameElements(right), s.samples(1).toSeq)
    val (_, mono) = decodeMono(flac)
    assert(mono.toSeq == left.indices.map(i =>
      ((left(i).toLong + right(i)) / 2).toInt))
  }

  test("foreign stream: left/side and side/right assignments") {
    val left = Array(10, 20, 30, 40, 50, 60, 70, 80)
    val right = Array(5, 15, 25, 35, 45, 55, 65, 75)
    val side = left.indices.map(i => left(i) - right(i))
    val ls = craft(8, 8000, 2, 16, chCode = 8, total = 8) { bw =>
      verbatim(bw, left, 16); verbatim(bw, side, 17)
    }
    val s1 = decode(ls)
    assert(s1.samples(0).sameElements(left) &&
      s1.samples(1).sameElements(right))
    val sr = craft(8, 8000, 2, 16, chCode = 9, total = 8) { bw =>
      verbatim(bw, side, 17); verbatim(bw, right, 16)
    }
    val s2 = decode(sr)
    assert(s2.samples(0).sameElements(left) &&
      s2.samples(1).sameElements(right))
  }

  test("foreign stream: fixed-order-1 subframe, partition order 1, " +
      "5-bit Rice method (rice2)") {
    val x = Array(1000, 1003, 1001, 1006, 1004, 1009, 1007, 1012)
    val res = (1 until 8).map(i => x(i) - x(i - 1)) // order-1 residuals
    val flac = craft(8, 8000, 1, 16, chCode = 0, total = 8) { bw =>
      bw.writeBits(0L, 1); bw.writeBits(9L, 6); bw.writeBits(0L, 1) // fixed 1
      bw.writeBits(x(0).toLong, 16) // warmup
      bw.writeBits(1L, 2) // method 1: 5-bit params
      bw.writeBits(1L, 4) // partition order 1 → 2 partitions
      // partition 0: 8/2 - order = 3 samples; partition 1: 4 samples
      bw.writeBits(2L, 5) // param 2
      res.take(3).foreach { v =>
        val u = (v << 1) ^ (v >> 31)
        bw.writeUnary((u >>> 2).toLong); bw.writeBits(u.toLong, 2)
      }
      bw.writeBits(3L, 5) // param 3
      res.drop(3).foreach { v =>
        val u = (v << 1) ^ (v >> 31)
        bw.writeUnary((u >>> 3).toLong); bw.writeBits(u.toLong, 3)
      }
    }
    val s = decode(flac)
    assert(s.samples(0).sameElements(x), s.samples(0).toSeq)
    assert(s.subframeTypes == Seq(9))
  }

  test("foreign stream: wasted bits and an escape (raw-bits) partition") {
    // all samples share 2 trailing zero bits → wasted = 2
    val x = Array(4, 8, -12, 16, -20, 24, -28, 32)
    val shifted = x.map(_ >> 2)
    val flac = craft(8, 8000, 1, 16, chCode = 0, total = 8) { bw =>
      bw.writeBits(0L, 1); bw.writeBits(8L, 6) // fixed order 0
      bw.writeBits(1L, 1); bw.writeUnary(1L) // wasted flag + unary(2-1)
      // no warmup (order 0); residual = the 14-bit samples themselves,
      // written as ONE escape partition of raw 14-bit values
      bw.writeBits(0L, 2) // method 0: 4-bit params
      bw.writeBits(0L, 4) // partition order 0
      bw.writeBits(15L, 4) // escape
      bw.writeBits(14L, 5) // raw bits
      shifted.foreach(v => bw.writeBits(v.toLong, 14))
    }
    val s = decode(flac)
    assert(s.samples(0).sameElements(x), s.samples(0).toSeq)
  }

  test("foreign stream: frame-header code tables — table sample rates, " +
      "end-of-header rates, explicit sample sizes, variable blocking " +
      "strategy with a multi-byte coded number (r15)") {
    val x = Array(3, -1, 4, -1, 5, -9, 2, -6)
    // table rate code (1001 = 44.1 kHz) + explicit 16-bit sample size:
    // both parse; STREAMINFO still governs the output rate
    val t1 = craft(8, 44100, 1, 16, chCode = 0, total = 8,
      srCode = 9, ssCode = 4)(verbatim(_, x, 16))
    assert(decode(t1).samples(0).sameElements(x))
    // end-of-header rate forms: 8-bit kHz (code 12), 16-bit Hz (13),
    // 16-bit tens-of-Hz (14) — consumed, not tripped over
    for ((code, v, bits) <- Seq((12, 8L, 8), (13, 8000L, 16),
        (14, 800L, 16))) {
      val s = craft(8, 8000, 1, 16, chCode = 0, total = 8,
        srCode = code, srTrailing = Some((v, bits)))(verbatim(_, x, 16))
      assert(decode(s).samples(0).sameElements(x), s"srCode $code")
    }
    // explicit smaller sample size (8-bit verbatim payload)
    val small = Array(1, -2, 3, -4, 5, -6, 7, -8)
    val t2 = craft(8, 8000, 1, 8, chCode = 0, total = 8,
      ssCode = 1)(verbatim(_, small, 8))
    assert(decode(t2).samples(0).sameElements(small))
    // variable blocking strategy: sample-number coded, multi-byte
    // extended-UTF-8 (here 2^33: a 7-byte encoding)
    val t3 = craft(8, 8000, 1, 16, chCode = 0, total = 8,
      blockingStrategy = 1, codedNumber = 1L << 33)(verbatim(_, x, 16))
    assert(decode(t3).samples(0).sameElements(x))
    // reserved codes fail loudly
    intercept[IllegalArgumentException](decode(
      craft(8, 8000, 1, 16, chCode = 0, total = 8, srCode = 15)(
        verbatim(_, x, 16))))
    intercept[IllegalArgumentException](decode(
      craft(8, 8000, 1, 16, chCode = 0, total = 8, ssCode = 3)(
        verbatim(_, x, 16))))
  }

  test("extended-UTF-8 coded numbers roundtrip across the full 36-bit " +
      "range (r15)") {
    for (v <- Seq(0L, 1L, 0x7fL, 0x80L, 0x7ffL, 0x800L, 0xffffL,
        0x10000L, (1L << 21) - 1, 1L << 21, (1L << 26) - 1, 1L << 26,
        (1L << 31) - 1, 1L << 31, (1L << 36) - 1)) {
      val bw = new BitWriter
      writeUtf8Number(bw, v)
      bw.alignToByte()
      val br = new BitReader(bw.toByteArray, 0)
      // readUtf8Number is private; decode through a crafted frame is
      // covered above — here pin the byte shape: lead-byte prefix
      // length must match the payload size class
      val bytes = bw.toByteArray
      if (v < 0x80) assert(bytes.length == 1)
      else assert((bytes(0) & 0xc0) == 0xc0 &&
        bytes.tail.forall(b => (b & 0xc0) == 0x80), s"$v")
    }
    intercept[IllegalArgumentException] {
      val bw = new BitWriter
      writeUtf8Number(bw, 1L << 36) // out of the 36-bit coded range
    }
  }

  test("foreign stream: metadata blocks other than STREAMINFO are " +
      "skipped (padding block)") {
    val x = Array(7, 7, 7, 7, 7, 7, 7, 7)
    val base = craft(8, 8000, 1, 16, chCode = 0, total = 8) { bw =>
      verbatim(bw, x, 16)
    }
    // splice a PADDING block (type 1, 4 bytes) between STREAMINFO and
    // the frame; clear STREAMINFO's last-block flag
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, 4)
    out.write(base(4) & 0x7f) // STREAMINFO no longer last
    out.write(base, 5, 3 + 34) // STREAMINFO body (34 bytes incl. MD5)
    out.write(0x81); out.write(0); out.write(0); out.write(4) // last+PADDING
    out.write(new Array[Byte](4))
    out.write(base, 4 + 4 + 34, base.length - (4 + 4 + 34))
    val s = decode(out.toByteArray)
    assert(s.samples(0).sameElements(x))
  }

  test("stated contract (r16): 32-bit MULTI-channel streams are " +
      "rejected at STREAMINFO (33-bit side subframes exceed Int " +
      "planes); 32-bit MONO still decodes") {
    // stereo 32-bit: rejected loudly BEFORE any frame is touched
    val stereo = craft(8, 8000, 2, 32, chCode = 1, total = 8) { bw =>
      // body never reached — decode must fail at the header
      verbatim(bw, Array.fill(8)(0), 32)
      verbatim(bw, Array.fill(8)(0), 32)
    }
    val e = intercept[IllegalArgumentException](decode(stereo))
    assert(e.getMessage.contains("32-bit multi-channel"), e.getMessage)
    // mono 32-bit: full-range samples fit Int planes and decode
    val x = Array(Int.MaxValue, Int.MinValue, 0, -1, 123456789,
      -987654321, 42, -42)
    val mono = craft(8, 8000, 1, 32, chCode = 0, total = 8) { bw =>
      verbatim(bw, x, 32)
    }
    val s = decode(mono)
    assert(s.bps == 32 && s.samples(0).sameElements(x))
  }

  test("coded-number lead byte 0xFF is rejected loudly (r16 ADVICE " +
      "pin): all seven flag bits set is invalid per RFC 9639, not a " +
      "lenient 6-continuation read") {
    for (lead <- Seq(0xff, 0x80, 0xbf)) { // 0x80/0xbf: k=0 also invalid
      val br = new BitReader(
        Array(lead.toByte) ++ Array.fill(7)(0x80.toByte), 0)
      val e = intercept[IllegalArgumentException](readUtf8Number(br))
      assert(e.getMessage.contains("lead byte"), f"0x$lead%02x")
    }
    // the valid extremes still read: 0xFE + six continuations (36-bit)
    val br = new BitReader(
      Array(0xfe.toByte) ++ Array.fill(6)(0xbf.toByte), 0)
    assert(readUtf8Number(br) == (1L << 36) - 1)
  }
}

/** Byte-level pins recorded on the first green run. */
object FlacSpecPins {
  val DeterminismHash = 4309845704405940159L
}
