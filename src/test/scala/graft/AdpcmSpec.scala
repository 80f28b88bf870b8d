package graft

import graft.pipeline.{FlacPcm, ImaAdpcm, Multimodal}
import graft.pipeline.Multimodal.MediaRow
import org.scalatest.funsuite.AnyFunSuite

/** The IMA ADPCM codec (the real compressed-audio lane, r13 verdict
  * item #3): closed-loop quantizer quality bounds, per-block predictor
  * reseeding, standard WAV 0x11 container shape, bit determinism, and
  * the SPI decoder end-to-end over the distributed decode.
  */
class AdpcmSpec extends AnyFunSuite {

  private def sine(n: Int, amp: Double, period: Double): Array[Int] =
    Array.tabulate(n)(i => (amp * math.sin(2 * math.Pi * i / period)).toInt)

  test("roundtrip quality: 4-bit ADPCM reconstructs a sine within the " +
      "codec's quantization envelope") {
    val x = sine(8000, 8000, 64)
    val wav = ImaAdpcm.encodeWav(x, 8000)
    // ~4:1 compression vs 16-bit PCM (+ container overhead)
    assert(wav.length < x.length * 2 / 3)
    val (rate, y) = ImaAdpcm.decodeWavMono(wav)
    assert(rate == 8000)
    assert(y.length == x.length)
    assert(y(0) == x(0)) // first sample of each block is literal
    val rms = math.sqrt(
      x.indices.map(i => math.pow(x(i) - y(i), 2)).sum / x.length)
    assert(rms < 8000 * 0.05, s"RMS error $rms exceeds 5% of amplitude")
  }

  test("closed-loop encoder: error does NOT accumulate over long input") {
    val x = sine(60000, 12000, 100)
    val (_, y) = ImaAdpcm.decodeWavMono(ImaAdpcm.encodeWav(x, 16000))
    // compare the LAST second against the first: drift-free
    val head = math.sqrt(
      (0 until 8000).map(i => math.pow(x(i) - y(i), 2)).sum / 8000)
    val tail = math.sqrt(
      (52000 until 60000).map(i => math.pow(x(i) - y(i), 2)).sum / 8000)
    assert(tail < head * 3 + 100, s"head=$head tail=$tail")
  }

  test("block boundaries reseed the predictor: a mid-stream corruption " +
      "cannot leak past its block") {
    val x = sine(2000, 6000, 48)
    val wav = ImaAdpcm.encodeWav(x, 8000, blockAlign = 256)
    val spb = ImaAdpcm.samplesPerBlock(256)
    val (_, clean) = ImaAdpcm.decodeWavMono(wav)
    // flip a nibble byte inside block 0's data
    val corrupted = wav.clone()
    val dataOff = new String(wav, "ISO-8859-1").indexOf("data") + 8
    corrupted(dataOff + 100) = (corrupted(dataOff + 100) ^ 0x5f).toByte
    val (_, dirty) = ImaAdpcm.decodeWavMono(corrupted)
    // block 1 onward: the literal header resync bounds the damage —
    // the decoded streams re-agree exactly from the next block header
    // (its literal sample) onward modulo the step-index drift, which
    // the corruption-free index byte also resets
    val resync = (spb until 2 * spb).count(i => clean(i) == dirty(i))
    assert(resync >= spb - 1, s"only $resync/${spb} samples re-agree")
  }

  test("container: standard fmt 0x11 + fact + word-aligned chunks; " +
      "non-ADPCM payloads fail loudly") {
    val wav = ImaAdpcm.encodeWav(sine(100, 1000, 10), 44100)
    assert(new String(wav, 0, 4, "US-ASCII") == "RIFF")
    // wFormatTag (offset 20 in a canonical fmt-first layout)
    assert(((wav(20) & 0xff) | ((wav(21) & 0xff) << 8)) == 0x11)
    val e = intercept[IllegalArgumentException] {
      ImaAdpcm.decodeWavMono("RIFFxxxxWAVE".getBytes("US-ASCII"))
    }
    assert(e.getMessage.contains("missing fmt"))
    intercept[IllegalArgumentException] {
      ImaAdpcm.decodeWavMono(Array[Byte](1, 2, 3))
    }
    // a PCM wav (tag 1) is NOT silently mis-decoded
    val pcm = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(new Array[Byte](20)), fmt, 10L),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val e2 = intercept[IllegalArgumentException](ImaAdpcm.decodeWavMono(pcm))
    assert(e2.getMessage.contains("not IMA ADPCM"))
    // a corrupt negative chunk length fails loudly instead of spinning
    // the RIFF walk forever (r15): poison the fmt chunk's length
    val bad = wav.clone()
    bad(16) = -8; bad(17) = -1; bad(18) = -1; bad(19) = -1
    val e3 = intercept[IllegalArgumentException](ImaAdpcm.decodeWavMono(bad))
    assert(e3.getMessage.contains("negative length"))
  }

  test("bit determinism: fixed input encodes to pinned bytes") {
    val x = Array.tabulate(500)(i => (i * 37 % 4001) - 2000)
    val wav = ImaAdpcm.encodeWav(x, 8000)
    var h = 1125899906842597L
    wav.foreach(b => h = h * 31 + b)
    // pinned on first green run; a drift here means the codec changed
    // behavior, which would silently split ADPCM dedup groups
    assert(h == -8033103297418845878L, s"encoded-bytes hash drifted: $h")
  }

  test("odd lengths and short final blocks: fact-count trim is exact") {
    for (n <- Seq(1, 2, 505, ImaAdpcm.samplesPerBlock(256),
        ImaAdpcm.samplesPerBlock(256) + 1)) {
      val x = sine(n, 3000, 17)
      val (_, y) = ImaAdpcm.decodeWavMono(ImaAdpcm.encodeWav(x, 8000))
      assert(y.length == n, s"n=$n decoded ${y.length}")
    }
    assert(ImaAdpcm.decodeWavMono(
      ImaAdpcm.encodeWav(Array.empty[Int], 8000))._2.isEmpty)
  }
}

/** The SPI decoder over the distributed decode — spark-backed, so a
  * separate suite sharing the session harness.
  */
class AdpcmSparkSpec extends SparkSpec {
  import spark.implicits._

  test("AdpcmAudioDecoder decodes compressed payloads on executors " +
      "with the SAME feature fold as the PCM lane") {
    val samples = Array.tabulate(4096)(i =>
      (7000 * math.sin(2 * math.Pi * i / 80)).toInt)
    val adpcm = ImaAdpcm.encodeWav(samples, 8000)
    val rows = Seq(MediaRow(1L, adpcm, "audio/x-adpcm", 0, 0)).toDS()
    val out = Multimodal.decode(rows, Multimodal.AdpcmAudioDecoder).collect()
    assert(out.length == 1)
    assert(out(0).n_frames == 4096)
    // the envelope of a steady sine is ~uniform across the 8 segments
    val env = out(0).feature
    assert(env.length == 8)
    assert(math.abs(env.sum - 1f) < 1e-3)
    assert(env.forall(e => e > 0.10f && e < 0.15f), env.mkString(","))
  }

  test("FlacAudioDecoder decodes FLAC payloads on executors; features " +
      "are EXACTLY the PCM lane's (lossless) — r15") {
    val samples = Array.tabulate(4096)(i =>
      (7000 * math.sin(2 * math.Pi * i / 80)).toInt)
    val flac = FlacPcm.encode(samples, 8000)
    assert(flac.length < samples.length * 2, "FLAC should compress a sine")
    val wav = {
      val bytes = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        bytes(2 * i) = (samples(i) & 0xff).toByte
        bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(bytes), fmt,
          samples.length.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val fOut = Multimodal.decode(
      Seq(MediaRow(1L, flac, "audio/flac", 0, 0)).toDS(),
      Multimodal.FlacAudioDecoder).collect()
    val wOut = Multimodal.decode(
      Seq(MediaRow(1L, wav, "audio/wav", 0, 0)).toDS(),
      Multimodal.WavAudioDecoder).collect()
    assert(fOut.length == 1 && wOut.length == 1)
    assert(fOut(0).n_frames == 4096)
    // lossless: checksum and envelope EXACTLY equal, not just adjacent
    assert(fOut(0).checksum == wOut(0).checksum)
    assert(fOut(0).feature.toSeq == wOut(0).feature.toSeq)
  }

  test("AutoAudioDecoder dispatches on container magic: FLAC, PCM WAV, " +
      "IMA ADPCM each route to their codec; unknown magic is loud (r15)") {
    val samples = Array.tabulate(2048)(i =>
      (5000 * math.sin(2 * math.Pi * i / 64)).toInt)
    val wav = {
      val bytes = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        bytes(2 * i) = (samples(i) & 0xff).toByte
        bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(bytes), fmt,
          samples.length.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rows = Seq(
      MediaRow(1L, FlacPcm.encode(samples, 8000), "application/octet-stream",
        0, 0),
      MediaRow(2L, wav, "application/octet-stream", 0, 0),
      MediaRow(3L, ImaAdpcm.encodeWav(samples, 8000),
        "application/octet-stream", 0, 0))
    val out = Multimodal.decode(rows.toDS(),
      Multimodal.AutoAudioDecoder).collect().sortBy(_.media_id)
    assert(out.map(_.n_frames).toSeq == Seq(2048, 2048, 2048))
    // the two LOSSLESS lanes agree exactly; ADPCM is adjacent, not equal
    assert(out(0).checksum == out(1).checksum)
    assert(out(2).checksum != out(0).checksum)
    // same sound: the normalized energy envelopes are close even for
    // the lossy lane
    out(2).feature.zip(out(0).feature).foreach { case (a, b) =>
      assert(math.abs(a - b) < 0.01f)
    }
    // unknown magic fails loudly through the batch contract
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decode(
        Seq(MediaRow(9L, "OggS garbage".getBytes("US-ASCII"), "?", 0, 0))
          .toDS(), Multimodal.AutoAudioDecoder).collect()
    }
    assert(String.valueOf(e.getMessage).contains("unrecognized") ||
      Option(e.getCause).exists(c =>
        String.valueOf(c.getMessage).contains("unrecognized")))
  }
}
