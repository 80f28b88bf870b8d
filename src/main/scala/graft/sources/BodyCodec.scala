package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

/** Decompressed body exceeded the caller's cap — the Gateway maps this to
  * 413 like the wire-size cap. Distinct from IllegalArgumentException
  * (malformed input → 400).
  */
final class DecodedBodyTooLarge(msg: String) extends RuntimeException(msg)

/** HTTP request-body decoding at the ingest edge
  * (reference: src/ingestors/http/influxdb.rs:31-51): `gzip`
  * content-encoding is decompressed, no header means plain UTF-8, anything
  * else is a bad request.
  *
  * `maxDecoded` bounds the DECOMPRESSED size: the wire-size cap alone
  * does not stop a gzip bomb (deflate expands up to ~1000×, so a 10 MB
  * body could otherwise materialize ~10 GB on the heap before any
  * backpressure applies). Reads stop the moment the cap is crossed —
  * the bomb is never buffered.
  */
object BodyCodec {

  def decodeBody(
      bytes: Array[Byte],
      contentEncoding: Option[String],
      maxDecoded: Long = Long.MaxValue): String =
    contentEncoding match {
      case Some("gzip") => gunzipToString(bytes, maxDecoded)
      case Some(other) =>
        throw new IllegalArgumentException(
          s"Unsupported content-encoding: $other")
      case None =>
        if (bytes.length > maxDecoded)
          throw new DecodedBodyTooLarge(
            s"request body ${bytes.length} bytes exceeds decoded limit $maxDecoded")
        new String(bytes, StandardCharsets.UTF_8)
    }

  def gunzipToString(bytes: Array[Byte], maxDecoded: Long = Long.MaxValue): String = {
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](64 * 1024)
      var read = in.read(chunk)
      while (read >= 0) {
        buf.write(chunk, 0, read)
        if (buf.size() > maxDecoded)
          throw new DecodedBodyTooLarge(
            s"decompressed request body exceeds limit $maxDecoded bytes")
        read = in.read(chunk)
      }
      buf.toString(StandardCharsets.UTF_8)
    } finally in.close()
  }

  def gzip(s: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.util.zip.GZIPOutputStream(bos)
    out.write(s.getBytes(StandardCharsets.UTF_8))
    out.close()
    bos.toByteArray
  }
}
