package graft.prometheus

import scala.collection.mutable.ArrayBuffer

/** Prometheus remote read/write wire codecs (S5/S12/S13), hand-rolled from
  * the public prompb protobuf schema (prometheus/prompb/{types,remote}.proto)
  * and the public snappy block format — no external deps.
  *
  * Reference behavior mirrored:
  *  - remote write: WriteRequest{timeseries{labels, samples}}, `__name__`
  *    label becomes the sensor name, `unit` label the unit, values are
  *    always Float, timestamps ms
  *    (reference: src/ingestors/http/prometheus_write.rs:100-180);
  *  - remote read SAMPLES: ReadResponse{results{timeseries}} with labels
  *    sorted by name (reference: src/parsing/prometheus/converter.rs:41-62);
  *  - remote read STREAMED_XOR_CHUNKS: framed ChunkedReadResponse — varint
  *    length + BE CRC32-Castagnoli + protobuf
  *    (reference: src/parsing/prometheus/stream_writer.rs:8-13).
  */
object PrometheusRemote {

  final case class Label(name: String, value: String)
  final case class Sample(value: Double, timestampMs: Long)
  final case class TimeSeries(labels: Seq[Label], samples: Seq[Sample])
  final case class WriteRequest(timeseries: Seq[TimeSeries])

  // ---------------------------------------------------------------- proto
  final class ProtoWriter {
    val buf = ArrayBuffer.empty[Byte]
    def uvarint(v: Long): Unit = {
      var x = v
      while (java.lang.Long.compareUnsigned(x, 0x80L) >= 0) {
        buf += ((x & 0x7f) | 0x80).toByte
        x = x >>> 7
      }
      buf += x.toByte
    }
    def key(field: Int, wire: Int): Unit = uvarint((field << 3) | wire)
    def int64(field: Int, v: Long): Unit =
      if (v != 0) { key(field, 0); uvarint(v) }
    def double(field: Int, v: Double): Unit = {
      if (v != 0.0 || java.lang.Double.doubleToLongBits(v) != 0L) {
        key(field, 1)
        val bits = java.lang.Double.doubleToLongBits(v)
        var i = 0
        while (i < 8) { buf += ((bits >>> (8 * i)) & 0xff).toByte; i += 1 }
      }
    }
    def bytes(field: Int, v: Array[Byte]): Unit =
      if (v.nonEmpty) { key(field, 2); uvarint(v.length); buf ++= v }
    def string(field: Int, v: String): Unit =
      if (v.nonEmpty) bytes(field, v.getBytes("UTF-8"))
    def message(field: Int, m: ProtoWriter): Unit = {
      key(field, 2); uvarint(m.buf.length); buf ++= m.buf
    }
    def result(): Array[Byte] = buf.toArray
  }

  final class ProtoReader(bytes: Array[Byte], from: Int, to: Int) {
    private var pos = from
    def hasMore: Boolean = pos < to
    // Every read is bounds-checked against the enclosing message's end
    // (`to`, not the array end): a truncated or crafted length must
    // fail LOUDLY here, never AIOOBE or silently read a sibling
    // field's bytes (fuzz-pinned by FuzzSpec writereq/readreq).
    private def need(n: Int): Unit =
      if (n < 0 || pos > to - n)
        throw new IllegalArgumentException(
          s"truncated protobuf: need $n bytes at offset $pos, field ends at $to")
    def uvarint(): Long = {
      var x = 0L; var shift = 0; var b = 0L
      while ({ need(1); b = bytes(pos) & 0xffL; pos += 1; (b & 0x80) != 0 }) {
        if (shift > 63)
          throw new IllegalArgumentException(
            "malformed protobuf: varint longer than 10 bytes")
        x |= (b & 0x7f) << shift; shift += 7
      }
      x | (b << shift)
    }
    /** returns (field, wire) */
    def tag(): (Int, Int) = {
      val k = uvarint()
      ((k >>> 3).toInt, (k & 7).toInt)
    }
    def fixed64(): Long = {
      need(8)
      var v = 0L; var i = 0
      while (i < 8) { v |= (bytes(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def lenDelimited(): (Int, Int) = {
      val len = uvarint()
      if (len < 0 || len > Int.MaxValue)
        throw new IllegalArgumentException(
          s"malformed protobuf: field length $len")
      need(len.toInt)
      val r = (pos, pos + len.toInt)
      pos += len.toInt
      r
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => uvarint()
      case 1 => need(8); pos += 8
      case 2 => lenDelimited()
      case 5 => need(4); pos += 4
      case w => throw new IllegalArgumentException(s"wire type $w")
    }
    def slice(f: Int, t: Int): Array[Byte] = bytes.slice(f, t)
  }

  private def parseLabel(r: ProtoReader): Label = {
    var name = ""; var value = ""
    while (r.hasMore) r.tag() match {
      case (1, 2) => val (f, t) = r.lenDelimited(); name = new String(r.slice(f, t), "UTF-8")
      case (2, 2) => val (f, t) = r.lenDelimited(); value = new String(r.slice(f, t), "UTF-8")
      case (_, w) => r.skip(w)
    }
    Label(name, value)
  }

  private def parseSample(r: ProtoReader): Sample = {
    var v = 0.0; var ts = 0L
    while (r.hasMore) r.tag() match {
      case (1, 1) => v = java.lang.Double.longBitsToDouble(r.fixed64())
      case (2, 0) => ts = r.uvarint()
      case (_, w) => r.skip(w)
    }
    Sample(v, ts)
  }

  /** Flatten a decoded WriteRequest into normalized ingest rows
    * (sensor_name, labels, unit_name, timestamp_us, value) — the ONE
    * definition of remote-write sensor identity (name from `__name__`,
    * unit from the `unit` label, ms→µs), shared by the HTTP endpoint
    * and the streaming file source so the two ingest paths can never
    * silently diverge on derived uuids.
    */
  def writeRequestRows(
      wr: WriteRequest
  ): Seq[(String, Map[String, String], String, Long, Double)] =
    wr.timeseries.flatMap { ts =>
      val labels = ts.labels.map(l => l.name -> l.value).toMap
      val name = labels.getOrElse("__name__",
        throw new IllegalArgumentException(
          "A time serie is missing its __name__ label"))
      ts.samples.map(s =>
        (name, labels, labels.get("unit").orNull,
          s.timestampMs * 1000L, s.value))
    }

  /** Parse a (snappy-decompressed) WriteRequest. */
  def parseWriteRequest(bytes: Array[Byte]): WriteRequest = {
    val series = ArrayBuffer.empty[TimeSeries]
    val r = new ProtoReader(bytes, 0, bytes.length)
    while (r.hasMore) r.tag() match {
      case (1, 2) =>
        val (f, t) = r.lenDelimited()
        val sr = new ProtoReader(bytes, f, t)
        val labels = ArrayBuffer.empty[Label]
        val samples = ArrayBuffer.empty[Sample]
        while (sr.hasMore) sr.tag() match {
          case (1, 2) =>
            val (lf, lt) = sr.lenDelimited()
            labels += parseLabel(new ProtoReader(bytes, lf, lt))
          case (2, 2) =>
            val (sf, st) = sr.lenDelimited()
            samples += parseSample(new ProtoReader(bytes, sf, st))
          case (_, w) => sr.skip(w)
        }
        series += TimeSeries(labels.toSeq, samples.toSeq)
      case (_, w) => r.skip(w)
    }
    WriteRequest(series.toSeq)
  }

  /** One matcher from a remote-read Query; `mtype` is the protobuf enum
    * (0=EQ, 1=NEQ, 2=RE, 3=NRE).
    */
  final case class ReadMatcher(mtype: Int, name: String, value: String)
  final case class ReadQuery(
      startMs: Long, endMs: Long, matchers: Seq[ReadMatcher])

  /** Decode a remote-read ReadRequest: (queries, accepted_response_types)
    * (reference: src/parsing/prometheus/remote_read_models.rs:11-100 —
    * ReadRequest{queries=1, accepted_response_types=2},
    * Query{start_ms=1, end_ms=2, matchers=3, hints=4(ignored)},
    * LabelMatcher{type=1, name=2, value=3}).
    */
  def parseReadRequest(bytes: Array[Byte]): (Seq[ReadQuery], Seq[Int]) = {
    val queries = ArrayBuffer.empty[ReadQuery]
    val accepted = ArrayBuffer.empty[Int]
    val r = new ProtoReader(bytes, 0, bytes.length)
    while (r.hasMore) r.tag() match {
      case (1, 2) =>
        val (qf, qt) = r.lenDelimited()
        val qr = new ProtoReader(bytes, qf, qt)
        var startMs = 0L
        var endMs = 0L
        val ms = ArrayBuffer.empty[ReadMatcher]
        while (qr.hasMore) qr.tag() match {
          case (1, 0) => startMs = qr.uvarint()
          case (2, 0) => endMs = qr.uvarint()
          case (3, 2) =>
            val (mf, mt) = qr.lenDelimited()
            val mr = new ProtoReader(bytes, mf, mt)
            var t = 0
            var n = ""
            var v = ""
            while (mr.hasMore) mr.tag() match {
              case (1, 0) => t = mr.uvarint().toInt
              case (2, 2) =>
                val (f, to) = mr.lenDelimited()
                n = new String(mr.slice(f, to), "UTF-8")
              case (3, 2) =>
                val (f, to) = mr.lenDelimited()
                v = new String(mr.slice(f, to), "UTF-8")
              case (_, w) => mr.skip(w)
            }
            ms += ReadMatcher(t, n, v)
          case (_, w) => qr.skip(w) // hints (4) logged-and-ignored upstream
        }
        queries += ReadQuery(startMs, endMs, ms.toSeq)
      case (2, 0) => accepted += r.uvarint().toInt
      case (2, 2) => // packed enum list
        val (f, t) = r.lenDelimited()
        val pr = new ProtoReader(bytes, f, t)
        while (pr.hasMore) accepted += pr.uvarint().toInt
      case (_, w) => r.skip(w)
    }
    (queries.toSeq, accepted.toSeq)
  }

  /** Encode a remote-read SAMPLES ReadResponse: labels sorted by name,
    * one QueryResult per query.
    */
  def encodeReadResponse(results: Seq[Seq[TimeSeries]]): Array[Byte] = {
    val w = new ProtoWriter
    results.foreach { tss =>
      val qr = new ProtoWriter
      tss.foreach { ts =>
        val tw = new ProtoWriter
        ts.labels.sortBy(_.name).foreach { l =>
          val lw = new ProtoWriter
          lw.string(1, l.name); lw.string(2, l.value)
          tw.message(1, lw)
        }
        ts.samples.foreach { s =>
          val sw = new ProtoWriter
          sw.double(1, s.value); sw.int64(2, s.timestampMs)
          tw.message(2, sw)
        }
        qr.message(1, tw)
      }
      w.message(1, qr)
    }
    w.result()
  }

  /** Encode one framed STREAMED_XOR_CHUNKS message: ChunkedReadResponse
    * { chunked_series, query_index } framed as uvarint length + BE CRC32C
    * + protobuf. One XOR chunk per series (min/max time from the samples).
    */
  def encodeChunkedResponse(
      queryIndex: Long,
      series: Seq[(Seq[Label], Seq[XorChunk.Sample])]): Array[Byte] =
    encodeChunkedResponsePre(queryIndex, series.filter(_._2.nonEmpty).map {
      case (labels, samples) =>
        (labels, XorChunk.encode(samples),
          samples.head.timestampMs, samples.last.timestampMs)
    })

  /** Same framing over pre-encoded chunks — the distributed path hands in
    * (labels, chunkBytes, minTsMs, maxTsMs) already folded per series on
    * the executors.
    */
  def encodeChunkedResponsePre(
      queryIndex: Long,
      series: Seq[(Seq[Label], Array[Byte], Long, Long)]): Array[Byte] = {
    val w = new ProtoWriter
    series.foreach { case (labels, chunk, minTs, maxTs) =>
      val sw = new ProtoWriter
      labels.sortBy(_.name).foreach { l =>
        val lw = new ProtoWriter
        lw.string(1, l.name); lw.string(2, l.value)
        sw.message(1, lw)
      }
      val cw = new ProtoWriter
      cw.int64(1, minTs)
      cw.int64(2, maxTs)
      cw.int64(3, 1) // Encoding.XOR
      cw.bytes(4, chunk)
      sw.message(2, cw)
      w.message(1, sw)
    }
    w.int64(2, queryIndex)
    val payload = w.result()
    val crc = new java.util.zip.CRC32C
    crc.update(payload)
    val frame = new ProtoWriter
    frame.uvarint(payload.length)
    val c = crc.getValue
    frame.buf += ((c >>> 24) & 0xff).toByte
    frame.buf += ((c >>> 16) & 0xff).toByte
    frame.buf += ((c >>> 8) & 0xff).toByte
    frame.buf += (c & 0xff).toByte
    frame.buf ++= payload
    frame.result()
  }

  // --------------------------------------------------------------- snappy
  /** Raw snappy block decompression (public format:
    * google/snappy format_description.txt). Remote-write bodies are
    * snappy-block compressed.
    *
    * `maxLen` bounds the DECLARED uncompressed length — the length
    * varint is attacker-controlled and the output array is allocated
    * up front, so without a cap a 20-byte request declaring 2 GB
    * allocates 2 GB before any validation. Over-cap →
    * [[graft.sources.DecodedBodyTooLarge]] (413 at the Gateway);
    * malformed streams (truncated varint/elements, out-of-range copy
    * offsets) → IllegalArgumentException (400), never a raw
    * ArrayIndexOutOfBounds surfacing as a 500.
    */
  def snappyDecompress(
      input: Array[Byte], maxLen: Long = Long.MaxValue): Array[Byte] =
    try snappyDecompressUnsafe(input, maxLen)
    catch {
      case e: IndexOutOfBoundsException =>
        throw new IllegalArgumentException(
          s"malformed snappy body: ${e.getMessage}")
      case e: NegativeArraySizeException =>
        throw new IllegalArgumentException(
          s"malformed snappy body: negative length ${e.getMessage}")
    }

  private def snappyDecompressUnsafe(
      input: Array[Byte], maxLen: Long): Array[Byte] = {
    var pos = 0
    var uncompressedLen = 0L
    var shift = 0
    var b = 0
    while ({ b = input(pos) & 0xff; pos += 1; (b & 0x80) != 0 }) {
      uncompressedLen |= (b & 0x7fL) << shift; shift += 7
    }
    uncompressedLen |= b.toLong << shift
    if (uncompressedLen > maxLen)
      throw new graft.sources.DecodedBodyTooLarge(
        s"snappy declared uncompressed length $uncompressedLen exceeds limit $maxLen")
    require(uncompressedLen >= 0 && uncompressedLen <= Int.MaxValue - 8,
      s"snappy: unsupported uncompressed length $uncompressedLen")
    val out = new Array[Byte](uncompressedLen.toInt)
    var opos = 0
    while (pos < input.length) {
      val tag = input(pos) & 0xff
      pos += 1
      (tag & 3) match {
        case 0 => // literal
          var len = (tag >>> 2) + 1
          if (len > 60) {
            val extra = len - 60
            len = 0
            var i = 0
            while (i < extra) { len |= (input(pos) & 0xff) << (8 * i); pos += 1; i += 1 }
            len += 1
          }
          System.arraycopy(input, pos, out, opos, len)
          pos += len; opos += len
        case 1 => // copy, 1-byte offset
          val len = ((tag >>> 2) & 0x7) + 4
          val offset = ((tag >>> 5) << 8) | (input(pos) & 0xff)
          pos += 1
          copyWithin(out, opos, offset, len); opos += len
        case 2 => // copy, 2-byte offset
          val len = (tag >>> 2) + 1
          val offset = (input(pos) & 0xff) | ((input(pos + 1) & 0xff) << 8)
          pos += 2
          copyWithin(out, opos, offset, len); opos += len
        case 3 => // copy, 4-byte offset
          val len = (tag >>> 2) + 1
          val offset = (input(pos) & 0xff) | ((input(pos + 1) & 0xff) << 8) |
            ((input(pos + 2) & 0xff) << 16) | ((input(pos + 3) & 0xff) << 24)
          pos += 4
          copyWithin(out, opos, offset, len); opos += len
      }
    }
    require(opos == out.length, s"snappy: expected ${out.length} bytes, got $opos")
    out
  }

  private def copyWithin(out: Array[Byte], opos: Int, offset: Int, len: Int): Unit = {
    // overlapping copies are byte-at-a-time by design (RLE patterns)
    var i = 0
    while (i < len) { out(opos + i) = out(opos + i - offset); i += 1 }
  }

  /** Spec-valid snappy compression emitting only literal elements (correct,
    * not size-optimal; responses at this layer are small).
    */
  def snappyCompressLiteral(input: Array[Byte]): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    var len = input.length.toLong
    while (java.lang.Long.compareUnsigned(len, 0x80L) >= 0) {
      out += ((len & 0x7f) | 0x80).toByte; len = len >>> 7
    }
    out += len.toByte
    var pos = 0
    while (pos < input.length) {
      val chunk = math.min(input.length - pos, 0x10000)
      if (chunk <= 60) out += (((chunk - 1) << 2) & 0xff).toByte
      else if (chunk <= 0x100) {
        out += (60 << 2).toByte
        out += ((chunk - 1) & 0xff).toByte
      } else {
        out += (61 << 2).toByte
        out += ((chunk - 1) & 0xff).toByte
        out += (((chunk - 1) >> 8) & 0xff).toByte
      }
      out ++= input.slice(pos, pos + chunk)
      pos += chunk
    }
    out.toArray
  }
}
