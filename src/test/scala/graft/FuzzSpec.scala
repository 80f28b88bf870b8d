package graft

import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.{Executors, ExecutorService, TimeUnit, TimeoutException}
import java.util.zip.CRC32
import scala.util.Random

/** Deterministic structured-mutation fuzzer over the binary decode
  * surface (verdict r15 item 2). Every hand-rolled or JDK-bridged
  * parser that accepts attacker bytes over the wire or from a corpus
  * gets N seeded mutation cases asserting the loud-failure contract:
  *
  *  - terminates (no hang: per-case wall-clock cap),
  *  - never kills the JVM (no OutOfMemoryError / StackOverflowError),
  *  - fails POLITELY: IllegalArgumentException / IllegalStateException /
  *    IOException family only — never AIOOBE / NPE /
  *    NegativeArraySizeException / MatchError leaking internals.
  *
  * Everything is reproducible: case `i` of target `t` uses
  * `new Random(0x5EED ^ t.hashCode ^ i)`, so a failure message's
  * (target, case) pair replays exactly. Raising `GRAFT_FUZZ_CASES`
  * (default 1500 per target) extends the campaign without changing
  * which payload case `i` denotes.
  *
  * Mutators are format-blind (bit flips, byte stomps, truncate,
  * extend, splice, 32-bit length bombs) plus one format-aware mutator
  * for PNG containers that re-seals chunk CRCs after stomping chunk
  * data — without it every mutation dies at the CRC gate and the
  * interesting code (geometry, sequencing, compositing) never runs.
  */
class FuzzSpec extends AnyFunSuite {

  private val CasesPerTarget =
    sys.env.get("GRAFT_FUZZ_CASES").map(_.toInt).getOrElse(1500)
  private val CaseTimeoutMs = 10000L

  // ------------------------------------------------------------ mutators

  private def bitFlips(b: Array[Byte], rnd: Random): Array[Byte] = {
    val out = b.clone()
    val n = 1 + rnd.nextInt(8)
    var i = 0
    while (i < n && out.nonEmpty) {
      val p = rnd.nextInt(out.length)
      out(p) = (out(p) ^ (1 << rnd.nextInt(8))).toByte
      i += 1
    }
    out
  }

  private def byteStomp(b: Array[Byte], rnd: Random): Array[Byte] = {
    val out = b.clone()
    val n = 1 + rnd.nextInt(16)
    var i = 0
    while (i < n && out.nonEmpty) {
      out(rnd.nextInt(out.length)) = rnd.nextInt(256).toByte
      i += 1
    }
    out
  }

  private def truncate(b: Array[Byte], rnd: Random): Array[Byte] =
    if (b.isEmpty) b
    else java.util.Arrays.copyOf(b, rnd.nextInt(b.length))

  private def extend(b: Array[Byte], rnd: Random): Array[Byte] = {
    val extra = new Array[Byte](1 + rnd.nextInt(64))
    rnd.nextBytes(extra)
    b ++ extra
  }

  private def splice(b: Array[Byte], rnd: Random): Array[Byte] = {
    if (b.length < 8) return byteStomp(b, rnd)
    val out = b.clone()
    val len = 1 + rnd.nextInt(math.min(32, b.length - 1))
    val from = rnd.nextInt(b.length - len)
    val to = rnd.nextInt(b.length - len)
    System.arraycopy(b, from, out, to, len)
    out
  }

  /** Overwrite 4 bytes with an adversarial 32-bit value (length-field
    * bombs: negative, Int.MaxValue, near-overflow) in either
    * endianness — the mutation class that found the RIFF negative-len
    * DoS in r14 and the offset-overflow family this spec pins.
    */
  private val Bombs = Array(
    0xffffffff, 0x7fffffff, 0x80000000, 0x7ffffff0, 0x00ffffff, 0, 1)
  private def intBomb(b: Array[Byte], rnd: Random): Array[Byte] = {
    if (b.length < 4) return byteStomp(b, rnd)
    val out = b.clone()
    val v = Bombs(rnd.nextInt(Bombs.length))
    val p = rnd.nextInt(out.length - 3)
    if (rnd.nextBoolean()) { // big-endian
      out(p) = (v >>> 24).toByte; out(p + 1) = (v >>> 16).toByte
      out(p + 2) = (v >>> 8).toByte; out(p + 3) = v.toByte
    } else { // little-endian
      out(p) = v.toByte; out(p + 1) = (v >>> 8).toByte
      out(p + 2) = (v >>> 16).toByte; out(p + 3) = (v >>> 24).toByte
    }
    out
  }

  private def genericMutate(b: Array[Byte], rnd: Random): Array[Byte] =
    rnd.nextInt(6) match {
      case 0 => bitFlips(b, rnd)
      case 1 => byteStomp(b, rnd)
      case 2 => truncate(b, rnd)
      case 3 => extend(b, rnd)
      case 4 => splice(b, rnd)
      case _ => intBomb(b, rnd)
    }

  /** PNG-aware: stomp bytes inside one chunk's data (or bomb a 4-byte
    * field in it), then recompute that chunk's CRC so the payload
    * passes the container CRC gate and reaches the semantic checks.
    */
  private def pngChunkMutate(png: Array[Byte], rnd: Random): Array[Byte] = {
    // lenient chunk scan: collect (offset, len) of well-formed chunks
    val locs = Vector.newBuilder[(Int, Int)]
    var off = 8
    var ok = png.length >= 8
    while (ok && off + 12 <= png.length) {
      val len = ((png(off) & 0xff) << 24) | ((png(off + 1) & 0xff) << 16) |
        ((png(off + 2) & 0xff) << 8) | (png(off + 3) & 0xff)
      if (len < 0 || off + 12 + len > png.length) ok = false
      else { locs += ((off, len)); off += 12 + len }
    }
    val cs = locs.result()
    if (cs.isEmpty) return genericMutate(png, rnd)
    val (coff, clen) = cs(rnd.nextInt(cs.length))
    val out = png.clone()
    // mutate type (rarely) or data
    if (clen > 0) {
      val n = 1 + rnd.nextInt(8)
      var i = 0
      while (i < n) {
        val p = coff + 8 + rnd.nextInt(clen)
        if (rnd.nextInt(3) == 0 && clen >= 4) {
          val v = Bombs(rnd.nextInt(Bombs.length))
          val q = coff + 8 + rnd.nextInt(clen - 3)
          out(q) = (v >>> 24).toByte; out(q + 1) = (v >>> 16).toByte
          out(q + 2) = (v >>> 8).toByte; out(q + 3) = v.toByte
        } else out(p) = rnd.nextInt(256).toByte
        i += 1
      }
    } else out(coff + 4 + rnd.nextInt(4)) = rnd.nextInt(256).toByte
    // re-seal the CRC over type+data
    val crc = new CRC32()
    crc.update(out, coff + 4, 4 + clen)
    val c = crc.getValue.toInt
    out(coff + 8 + clen) = (c >>> 24).toByte
    out(coff + 9 + clen) = (c >>> 16).toByte
    out(coff + 10 + clen) = (c >>> 8).toByte
    out(coff + 11 + clen) = c.toByte
    out
  }

  // ------------------------------------------------------------- targets

  private final case class Target(
      name: String,
      seeds: Seq[Array[Byte]],
      decode: Array[Byte] => Any,
      mutate: (Array[Byte], Random) => Array[Byte])

  private def polite(t: Throwable): Boolean = t match {
    case _: IllegalArgumentException => true // require() and explicit throws
    case _: IllegalStateException => true
    case _: UnsupportedOperationException => true
    case _: java.io.IOException => true // gzip ZipException/EOF, imageio IIO
    case _: sources.DecodedBodyTooLarge => true // the designed bomb cap
    case _ => false
  }

  private def runTarget(t: Target): Unit = {
    var exec: ExecutorService = Executors.newSingleThreadExecutor { r =>
      val th = new Thread(r, s"fuzz-${t.name}"); th.setDaemon(true); th
    }
    val failures = Vector.newBuilder[String]
    var nFail = 0
    var i = 0
    try {
      while (i < CasesPerTarget && nFail < 5) {
        val rnd = new Random(0x5EED ^ t.name.hashCode.toLong ^ i.toLong)
        val seed = t.seeds(rnd.nextInt(t.seeds.length))
        var payload = t.mutate(seed, rnd)
        // stacked mutations sometimes (deeper corruption)
        if (rnd.nextInt(3) == 0) payload = t.mutate(payload, rnd)
        val fut = exec.submit(new java.util.concurrent.Callable[Option[String]] {
          def call(): Option[String] =
            try { t.decode(payload); None }
            catch {
              case e: Throwable if polite(e) => None
              case e: Throwable =>
                Some(s"${e.getClass.getName}: ${e.getMessage}")
            }
        })
        val verdict =
          try fut.get(CaseTimeoutMs, TimeUnit.MILLISECONDS)
          catch {
            case _: TimeoutException =>
              fut.cancel(true)
              // capture where the worker is wedged before abandoning it
              val stack = Thread.getAllStackTraces.entrySet().stream()
                .filter(e => e.getKey.getName == s"fuzz-${t.name}")
                .findFirst()
                .map[String](e => e.getValue.take(8).mkString(" <- "))
                .orElse("(worker thread not found)")
              exec.shutdownNow()
              exec = Executors.newSingleThreadExecutor { r =>
                val th = new Thread(r, s"fuzz-${t.name}")
                th.setDaemon(true); th
              }
              Some(s"HANG: case exceeded ${CaseTimeoutMs}ms at $stack")
          }
        verdict.foreach { msg =>
          nFail += 1
          failures += s"[${t.name} case $i] $msg"
        }
        i += 1
      }
    } finally exec.shutdownNow()
    val fs = failures.result()
    assert(fs.isEmpty,
      s"${t.name}: ${fs.length} impolite failure(s) in $i cases " +
        s"(replay: Random(0x5EED ^ \"${t.name}\".hashCode ^ case)):\n" +
        fs.mkString("\n"))
  }

  // --------------------------------------------------------------- seeds

  private def rndOf(tag: String) = new Random(tag.hashCode.toLong)

  private lazy val flacSeeds: Seq[Array[Byte]] = {
    val r = rndOf("flac")
    Seq(
      pipeline.FlacPcm.encode(
        Array.tabulate(700)(i =>
          (math.sin(i / 7.0) * 9000).toInt + r.nextInt(64) - 32),
        rate = 8000, blockSize = 256),
      pipeline.FlacPcm.encode(
        Array.fill(120)(r.nextInt(65536) - 32768), rate = 44100,
        blockSize = 64))
  }

  private lazy val adpcmSeeds: Seq[Array[Byte]] = {
    val r = rndOf("adpcm")
    Seq(pipeline.ImaAdpcm.encodeWav(
      Array.tabulate(900)(i => (math.sin(i / 5.0) * 12000).toInt + r.nextInt(32)),
      rate = 8000, blockAlign = 64))
  }

  private lazy val apngSeeds: Seq[Array[Byte]] = {
    import java.awt.image.BufferedImage
    def img(tpe: Int, seed: Int): BufferedImage = {
      val r = new Random(seed)
      val im = new BufferedImage(16, 12, tpe)
      var y = 0
      while (y < 12) {
        var x = 0
        while (x < 16) { im.setRGB(x, y, r.nextInt()); x += 1 }
        y += 1
      }
      im
    }
    Seq(pipeline.Apng.encode(Seq(
      pipeline.Apng.Frame(img(BufferedImage.TYPE_INT_ARGB, 1)),
      pipeline.Apng.Frame(img(BufferedImage.TYPE_INT_ARGB, 2), 2, 10),
      pipeline.Apng.Frame(img(BufferedImage.TYPE_INT_ARGB, 3), 1, 5))))
  }

  private lazy val aviSeeds: Seq[Array[Byte]] = {
    import java.awt.image.BufferedImage
    val jpegs = (0 until 3).map { k =>
      val im = new BufferedImage(16, 12, BufferedImage.TYPE_INT_RGB)
      val r = new Random(k)
      for (y <- 0 until 12; x <- 0 until 16) im.setRGB(x, y, r.nextInt())
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "jpg", bos)
      bos.toByteArray
    }
    Seq(pipeline.MjpegAvi.encode(jpegs, 16, 12, fps = 5))
  }

  private lazy val wavSeeds: Seq[Array[Byte]] = {
    val r = rndOf("wav")
    val n = 400
    val bytes = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val amp = (math.sin(i / 9.0) * 7000).toInt + r.nextInt(16)
      bytes(2 * i) = (amp & 0xff).toByte
      bytes(2 * i + 1) = ((amp >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    Seq(bos.toByteArray)
  }

  private lazy val xorSeeds: Seq[Array[Byte]] = {
    import prometheus.XorChunk
    val r = rndOf("xor")
    var t = 1700000000000L
    val samples = (0 until 200).map { _ =>
      t += 15000 + r.nextInt(200) - 100
      XorChunk.Sample(t, r.nextInt(1000) / 7.0)
    }
    Seq(XorChunk.encode(samples), XorChunk.encode(samples.take(1)))
  }

  private lazy val snappySeeds: Seq[Array[Byte]] = {
    import prometheus.PrometheusRemote
    val r = rndOf("snappy")
    val plain = new Array[Byte](2048)
    r.nextBytes(plain)
    // runs compress well → exercises copy elements on the decode side
    val runs = Array.tabulate[Byte](4096)(i => ((i / 97) % 251).toByte)
    Seq(PrometheusRemote.snappyCompressLiteral(plain),
      PrometheusRemote.snappyCompressLiteral(runs))
  }

  private lazy val writeReqSeeds: Seq[Array[Byte]] = {
    import prometheus.PrometheusRemote._
    val w = new ProtoWriter
    Seq(("http_requests", "job", "api"), ("cpu_seconds", "host", "n1"))
      .foreach { case (m, lk, lv) =>
        val tw = new ProtoWriter
        val lw1 = new ProtoWriter
        lw1.string(1, "__name__"); lw1.string(2, m)
        tw.message(1, lw1)
        val lw2 = new ProtoWriter
        lw2.string(1, lk); lw2.string(2, lv)
        tw.message(1, lw2)
        for (i <- 0 until 5) {
          val sw = new ProtoWriter
          sw.double(1, i / 3.0); sw.int64(2, 1704067200000L + i * 60000L)
          tw.message(2, sw)
        }
        w.message(1, tw)
      }
    Seq(w.result())
  }

  private lazy val readReqSeeds: Seq[Array[Byte]] = {
    import prometheus.PrometheusRemote._
    val mq = new ProtoWriter
    mq.int64(1, 1704067100000L)
    mq.int64(2, 1704067300000L)
    val mw = new ProtoWriter
    mw.int64(1, 0); mw.string(2, "__name__"); mw.string(3, "http_requests")
    mq.message(3, mw)
    val mw2 = new ProtoWriter
    mw2.int64(1, 2); mw2.string(2, "job"); mw2.string(3, "a.*")
    mq.message(3, mw2)
    val rr = new ProtoWriter
    rr.message(1, mq)
    Seq(rr.result())
  }

  private lazy val gzipSeeds: Seq[Array[Byte]] =
    Seq(sources.BodyCodec.gzip("sensor,room=a temp=21.5 1704067200000000000\n" * 40))

  // --------------------------------------------------------------- tests

  test("fuzz: FLAC decoder fails politely on corrupt streams") {
    runTarget(Target("flac", flacSeeds,
      b => pipeline.FlacPcm.decode(b), genericMutate))
  }

  test("fuzz: IMA-ADPCM WAV decoder fails politely on corrupt streams") {
    runTarget(Target("adpcm", adpcmSeeds,
      b => pipeline.ImaAdpcm.decodeWavMono(b), genericMutate))
  }

  test("fuzz: APNG frame decoder fails politely (CRC-resealed mutations)") {
    runTarget(Target("apng", apngSeeds,
      b => pipeline.Apng.frames(b),
      (b, r) =>
        if (r.nextBoolean()) pngChunkMutate(b, r) else genericMutate(b, r)))
  }

  test("fuzz: MJPEG-AVI demuxer fails politely on corrupt containers") {
    runTarget(Target("avi", aviSeeds,
      b => pipeline.MjpegAvi.frames(b), genericMutate))
  }

  test("fuzz: PCM WAV decoder fails politely on corrupt payloads") {
    runTarget(Target("wav", wavSeeds,
      b => pipeline.Multimodal.WavPcm.decodeMono(b), genericMutate))
  }

  test("fuzz: Gorilla XOR chunk decoder fails politely") {
    runTarget(Target("xor", xorSeeds,
      b => prometheus.XorChunk.decode(b), genericMutate))
  }

  test("fuzz: snappy block decompressor fails politely") {
    runTarget(Target("snappy", snappySeeds,
      b => prometheus.PrometheusRemote.snappyDecompress(b, 1 << 20),
      genericMutate))
  }

  test("fuzz: remote-write protobuf parser fails politely") {
    runTarget(Target("writereq", writeReqSeeds,
      b => prometheus.PrometheusRemote.parseWriteRequest(b), genericMutate))
  }

  test("fuzz: remote-read protobuf parser fails politely") {
    runTarget(Target("readreq", readReqSeeds,
      b => prometheus.PrometheusRemote.parseReadRequest(b), genericMutate))
  }

  test("fuzz: gzip body decoder fails politely under the decode cap") {
    runTarget(Target("gzip", gzipSeeds,
      b => sources.BodyCodec.gunzipToString(b, maxDecoded = 1 << 20),
      genericMutate))
  }
}
