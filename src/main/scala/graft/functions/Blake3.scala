package graft.functions

/** Pure-Scala BLAKE3 (hash / keyed hash / derive-key, with XOF output).
  *
  * Implemented from the public BLAKE3 specification
  * (https://github.com/BLAKE3-team/BLAKE3-specs). Needed for
  * content-addressed sensor UUID parity with the reference
  * (reference: src/datamodel/sensor.rs:146-178) — pinned vectors in
  * Blake3Spec.
  */
object Blake3 {
  private val IV = Array(
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19)

  private val MSG_PERM =
    Array(2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)

  final val CHUNK_START = 1
  final val CHUNK_END = 2
  final val PARENT = 4
  final val ROOT = 8
  final val KEYED_HASH = 16
  final val DERIVE_KEY_CONTEXT = 32
  final val DERIVE_KEY_MATERIAL = 64

  private val BLOCK_LEN = 64
  private val CHUNK_LEN = 1024

  @inline private def rotr(x: Int, n: Int): Int = Integer.rotateRight(x, n)

  private def g(s: Array[Int], a: Int, b: Int, c: Int, d: Int, mx: Int, my: Int): Unit = {
    s(a) = s(a) + s(b) + mx
    s(d) = rotr(s(d) ^ s(a), 16)
    s(c) = s(c) + s(d)
    s(b) = rotr(s(b) ^ s(c), 12)
    s(a) = s(a) + s(b) + my
    s(d) = rotr(s(d) ^ s(a), 8)
    s(c) = s(c) + s(d)
    s(b) = rotr(s(b) ^ s(c), 7)
  }

  private def round(s: Array[Int], m: Array[Int]): Unit = {
    g(s, 0, 4, 8, 12, m(0), m(1))
    g(s, 1, 5, 9, 13, m(2), m(3))
    g(s, 2, 6, 10, 14, m(4), m(5))
    g(s, 3, 7, 11, 15, m(6), m(7))
    g(s, 0, 5, 10, 15, m(8), m(9))
    g(s, 1, 6, 11, 12, m(10), m(11))
    g(s, 2, 7, 8, 13, m(12), m(13))
    g(s, 3, 4, 9, 14, m(14), m(15))
  }

  /** Full 16-word compression output (first 8 words = CV). */
  private def compress(
      cv: Array[Int], block: Array[Int], counter: Long,
      blockLen: Int, flags: Int): Array[Int] = {
    val s = new Array[Int](16)
    System.arraycopy(cv, 0, s, 0, 8)
    s(8) = IV(0); s(9) = IV(1); s(10) = IV(2); s(11) = IV(3)
    s(12) = counter.toInt
    s(13) = (counter >>> 32).toInt
    s(14) = blockLen
    s(15) = flags
    var m = block.clone()
    var r = 0
    while (r < 7) {
      round(s, m)
      if (r < 6) {
        val p = new Array[Int](16)
        var i = 0
        while (i < 16) { p(i) = m(MSG_PERM(i)); i += 1 }
        m = p
      }
      r += 1
    }
    val out = new Array[Int](16)
    var i = 0
    while (i < 8) {
      out(i) = s(i) ^ s(i + 8)
      out(i + 8) = s(i + 8) ^ cv(i)
      i += 1
    }
    out
  }

  private def wordsFromBytes(bytes: Array[Byte], off: Int, len: Int): Array[Int] = {
    val w = new Array[Int](16)
    var i = 0
    while (i < len) {
      w(i >>> 2) |= (bytes(off + i) & 0xff) << ((i & 3) * 8)
      i += 1
    }
    w
  }

  /** Root-output node: supports arbitrary-length XOF. */
  private final class Output(
      val cv: Array[Int], val block: Array[Int], val blockLen: Int,
      val counter: Long, val flags: Int) {
    def chainingValue: Array[Int] =
      compress(cv, block, counter, blockLen, flags).take(8)
    def rootBytes(out: Array[Byte]): Unit = {
      var produced = 0
      var t = 0L
      while (produced < out.length) {
        val words = compress(cv, block, t, blockLen, flags | ROOT)
        var i = 0
        while (i < 64 && produced < out.length) {
          out(produced) = ((words(i >>> 2) >>> ((i & 3) * 8)) & 0xff).toByte
          produced += 1
          i += 1
        }
        t += 1
      }
    }
  }

  private def chunkOutput(
      key: Array[Int], chunk: Array[Byte], off: Int, len: Int,
      chunkCounter: Long, flags: Int): Output = {
    var cv = key.clone()
    val nBlocks = math.max(1, (len + BLOCK_LEN - 1) / BLOCK_LEN)
    var b = 0
    var lastBlock: Array[Int] = null
    var lastLen = 0
    var lastFlags = 0
    while (b < nBlocks) {
      val bOff = b * BLOCK_LEN
      val bLen = math.min(BLOCK_LEN, len - bOff)
      val words = wordsFromBytes(chunk, off + bOff, math.max(bLen, 0))
      var f = flags
      if (b == 0) f |= CHUNK_START
      if (b == nBlocks - 1) f |= CHUNK_END
      if (b == nBlocks - 1) {
        lastBlock = words; lastLen = math.max(bLen, 0); lastFlags = f
      } else {
        cv = compress(cv, words, chunkCounter, bLen, f).take(8)
      }
      b += 1
    }
    new Output(cv, lastBlock, lastLen, chunkCounter, lastFlags)
  }

  private def parentOutput(
      key: Array[Int], l: Array[Int], r: Array[Int], flags: Int): Output = {
    val block = new Array[Int](16)
    System.arraycopy(l, 0, block, 0, 8)
    System.arraycopy(r, 0, block, 8, 8)
    new Output(key, block, BLOCK_LEN, 0L, flags | PARENT)
  }

  private def hashInternal(
      key: Array[Int], input: Array[Byte], flags: Int, outLen: Int): Array[Byte] = {
    val nChunks = math.max(1, (input.length + CHUNK_LEN - 1) / CHUNK_LEN)
    val rootOut: Output =
      if (nChunks == 1) {
        chunkOutput(key, input, 0, input.length, 0L, flags)
      } else {
        // iterative binary tree over chunk CVs (left subtrees are the
        // largest power-of-two number of chunks; standard BLAKE3 tree shape)
        def subtree(chunkStart: Int, numChunks: Int): Output = {
          if (numChunks == 1) {
            val off = chunkStart * CHUNK_LEN
            val len = math.min(CHUNK_LEN, input.length - off)
            chunkOutput(key, input, off, len, chunkStart.toLong, flags)
          } else {
            var left = Integer.highestOneBit(numChunks)
            if (left == numChunks) left = numChunks / 2
            val l = subtree(chunkStart, left).chainingValue
            val r = subtree(chunkStart + left, numChunks - left).chainingValue
            parentOutput(key, l, r, flags)
          }
        }
        subtree(0, nChunks)
      }
    val out = new Array[Byte](outLen)
    rootOut.rootBytes(out)
    out
  }

  /** Plain BLAKE3 hash with XOF output length `outLen`. */
  def hash(input: Array[Byte], outLen: Int = 32): Array[Byte] =
    hashInternal(IV, input, 0, outLen)

  /** Keyed BLAKE3 (32-byte key). */
  def keyedHash(key32: Array[Byte], input: Array[Byte], outLen: Int = 32): Array[Byte] = {
    require(key32.length == 32, "BLAKE3 key must be 32 bytes")
    hashInternal(wordsFromBytes(key32, 0, 32).take(8), input, KEYED_HASH, outLen)
  }

  /** BLAKE3 derive_key(context, keyMaterial). */
  def deriveKey(context: String, keyMaterial: Array[Byte]): Array[Byte] = {
    val ctxKey = hashInternal(
      IV, context.getBytes("UTF-8"), DERIVE_KEY_CONTEXT, 32)
    hashInternal(
      wordsFromBytes(ctxKey, 0, 32).take(8), keyMaterial, DERIVE_KEY_MATERIAL, 32)
  }

  def toHex(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02x").mkString
}
