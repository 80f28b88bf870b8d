package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

/** HTTP request-body decoding at the ingest edge
  * (reference: src/ingestors/http/influxdb.rs:31-51): `gzip`
  * content-encoding is decompressed, no header means plain UTF-8, anything
  * else is a bad request.
  */
object BodyCodec {

  def decodeBody(bytes: Array[Byte], contentEncoding: Option[String]): String =
    contentEncoding match {
      case Some("gzip") => gunzipToString(bytes)
      case Some(other) =>
        throw new IllegalArgumentException(
          s"Unsupported content-encoding: $other")
      case None => new String(bytes, StandardCharsets.UTF_8)
    }

  def gunzipToString(bytes: Array[Byte]): String = {
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  def gzip(s: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.util.zip.GZIPOutputStream(bos)
    out.write(s.getBytes(StandardCharsets.UTF_8))
    out.close()
    bos.toByteArray
  }
}
