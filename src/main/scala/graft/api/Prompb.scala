package graft.api

/** Hand-rolled codec for the Prometheus remote-write/read protobuf wire
  * format (`prompb`), plus snappy framing — the exact bytes the
  * reference's `/write` and `/read` endpoints speak
  * (`internal/write/write.go:53-83`, `internal/read/read.go:45-126`).
  *
  * The message shapes and field tags mirror the vendored generated code
  * (`prompb/remote.pb.go`, `prompb/types.pb.go`; protobuf encoding is a
  * public, stable spec):
  *
  * {{{
  *   WriteRequest  { repeated TimeSeries timeseries = 1 }
  *   ReadRequest   { repeated Query queries = 1 }
  *   ReadResponse  { repeated QueryResult results = 1 }
  *   Query         { int64 start_timestamp_ms = 1; int64 end = 2;
  *                   repeated LabelMatcher matchers = 3 }
  *   QueryResult   { repeated TimeSeries timeseries = 1 }
  *   TimeSeries    { repeated Label labels = 1; repeated Sample samples = 2 }
  *   Label         { string name = 1; string value = 2 }
  *   Sample        { double value = 1; int64 timestamp = 2 }
  *   LabelMatcher  { enum Type type = 1 (EQ NEQ RE NRE);
  *                   string name = 2; string value = 3 }
  * }}}
  *
  * Encoding matches gogo-proto's writer byte-for-byte: zero-valued
  * scalars are SKIPPED (`Sample.MarshalTo`, `types.pb.go:184-197`), the
  * double travels as its raw IEEE bits in a little-endian fixed64 — so
  * the StaleNaN signalling bit pattern survives the wire intact — and
  * negative int64s take the 10-byte varint form. The decoder skips
  * unknown fields by wire type, like any conforming reader.
  *
  * Snappy framing uses the raw BLOCK format (`golang/snappy.Encode`),
  * which `org.xerial.snappy.Snappy` (on Spark's classpath) implements.
  */
object Prompb {

  final case class Label(name: String, value: String)
  final case class Sample(value: Double, timestamp: Long)
  final case class TimeSeries(labels: Seq[Label], samples: Seq[Sample])
  final case class WriteRequest(timeseries: Seq[TimeSeries])
  /** type: 0 EQ, 1 NEQ, 2 RE, 3 NRE (prompb.LabelMatcher_Type). */
  final case class LabelMatcher(typ: Int, name: String, value: String)
  final case class Query(startMs: Long, endMs: Long,
    matchers: Seq[LabelMatcher])
  final case class ReadRequest(queries: Seq[Query])
  final case class QueryResult(timeseries: Seq[TimeSeries])
  final case class ReadResponse(results: Seq[QueryResult])

  // ---- low-level writer ---------------------------------------------------

  private final class Writer {
    private var buf = new Array[Byte](256)
    private var len = 0
    private def ensure(n: Int): Unit =
      if (len + n > buf.length)
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, len + n))
    def byte(b: Int): Unit = { ensure(1); buf(len) = b.toByte; len += 1 }
    def varint(v0: Long): Unit = {
      var v = v0
      ensure(10)
      while ((v & ~0x7fL) != 0) {
        buf(len) = ((v & 0x7f) | 0x80).toByte; len += 1; v >>>= 7
      }
      buf(len) = v.toByte; len += 1
    }
    def fixed64(v: Long): Unit = {
      ensure(8)
      var i = 0
      while (i < 8) { buf(len + i) = (v >>> (8 * i)).toByte; i += 1 }
      len += 8
    }
    def bytes(b: Array[Byte]): Unit = {
      ensure(b.length); System.arraycopy(b, 0, buf, len, b.length)
      len += b.length
    }
    def lengthDelimited(tag: Int, b: Array[Byte]): Unit = {
      byte(tag); varint(b.length.toLong); bytes(b)
    }
    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  private def utf8(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  // ---- encoders (field order and zero-skipping match gogo-proto) ----------

  private def encLabel(l: Label): Array[Byte] = {
    val w = new Writer
    val n = utf8(l.name); val v = utf8(l.value)
    if (n.nonEmpty) w.lengthDelimited(0x0a, n)
    if (v.nonEmpty) w.lengthDelimited(0x12, v)
    w.result()
  }

  private def encSample(s: Sample): Array[Byte] = {
    val w = new Writer
    val bits = java.lang.Double.doubleToRawLongBits(s.value)
    if (bits != 0L) { w.byte(0x09); w.fixed64(bits) }
    if (s.timestamp != 0L) { w.byte(0x10); w.varint(s.timestamp) }
    w.result()
  }

  private def encTimeSeries(ts: TimeSeries): Array[Byte] = {
    val w = new Writer
    ts.labels.foreach(l => w.lengthDelimited(0x0a, encLabel(l)))
    ts.samples.foreach(s => w.lengthDelimited(0x12, encSample(s)))
    w.result()
  }

  def encodeWriteRequest(r: WriteRequest): Array[Byte] = {
    val w = new Writer
    r.timeseries.foreach(ts => w.lengthDelimited(0x0a, encTimeSeries(ts)))
    w.result()
  }

  private def encMatcher(m: LabelMatcher): Array[Byte] = {
    val w = new Writer
    if (m.typ != 0) { w.byte(0x08); w.varint(m.typ.toLong) }
    val n = utf8(m.name); val v = utf8(m.value)
    if (n.nonEmpty) w.lengthDelimited(0x12, n)
    if (v.nonEmpty) w.lengthDelimited(0x1a, v)
    w.result()
  }

  private def encQuery(q: Query): Array[Byte] = {
    val w = new Writer
    if (q.startMs != 0L) { w.byte(0x08); w.varint(q.startMs) }
    if (q.endMs != 0L) { w.byte(0x10); w.varint(q.endMs) }
    q.matchers.foreach(m => w.lengthDelimited(0x1a, encMatcher(m)))
    w.result()
  }

  def encodeReadRequest(r: ReadRequest): Array[Byte] = {
    val w = new Writer
    r.queries.foreach(q => w.lengthDelimited(0x0a, encQuery(q)))
    w.result()
  }

  def encodeReadResponse(r: ReadResponse): Array[Byte] = {
    val w = new Writer
    r.results.foreach { qr =>
      val inner = new Writer
      qr.timeseries.foreach(ts =>
        inner.lengthDelimited(0x0a, encTimeSeries(ts)))
      w.lengthDelimited(0x0a, inner.result())
    }
    w.result()
  }

  // ---- low-level reader ---------------------------------------------------

  private final class Reader(buf: Array[Byte], start: Int, end: Int) {
    var pos: Int = start
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var out = 0L
      while (shift < 64) {
        if (pos >= end) throw new IllegalArgumentException("truncated varint")
        val b = buf(pos); pos += 1
        out |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
      }
      throw new IllegalArgumentException("malformed varint")
    }
    def fixed64(): Long = {
      if (pos + 8 > end) throw new IllegalArgumentException("truncated fixed64")
      var out = 0L; var i = 0
      while (i < 8) { out |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; out
    }
    def fixed32(): Int = {
      if (pos + 4 > end) throw new IllegalArgumentException("truncated fixed32")
      var out = 0; var i = 0
      while (i < 4) { out |= (buf(pos + i) & 0xff) << (8 * i); i += 1 }
      pos += 4; out
    }
    /** (offset, length) of a length-delimited field payload. */
    def delimited(): (Int, Int) = {
      val n = varint()
      // compare as `n > end - pos` (both sides small): a hostile length
      // near Long.MaxValue would overflow `pos + n` to negative and
      // sail past the bound, corrupting the parse position
      if (n < 0 || n > end - pos)
        throw new IllegalArgumentException("truncated length-delimited field")
      val off = pos; pos += n.toInt; (off, n.toInt)
    }
    def string(): String = {
      val (off, n) = delimited()
      new String(buf, off, n, java.nio.charset.StandardCharsets.UTF_8)
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => fixed64()
      case 2 => delimited()
      case 5 => fixed32()
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  // ---- decoders -----------------------------------------------------------

  private def decLabel(buf: Array[Byte], off: Int, len: Int): Label = {
    val r = new Reader(buf, off, off + len)
    var name = ""; var value = ""
    while (r.hasMore) {
      val tag = r.varint()
      (tag >>> 3, (tag & 7).toInt) match {
        case (1L, 2) => name = r.string()
        case (2L, 2) => value = r.string()
        case (_, w) => r.skip(w)
      }
    }
    Label(name, value)
  }

  private def decSample(buf: Array[Byte], off: Int, len: Int): Sample = {
    val r = new Reader(buf, off, off + len)
    var value = 0.0; var ts = 0L
    while (r.hasMore) {
      val tag = r.varint()
      (tag >>> 3, (tag & 7).toInt) match {
        case (1L, 1) => value = java.lang.Double.longBitsToDouble(r.fixed64())
        case (2L, 0) => ts = r.varint()
        case (_, w) => r.skip(w)
      }
    }
    Sample(value, ts)
  }

  private def decTimeSeries(buf: Array[Byte], off: Int, len: Int): TimeSeries = {
    val r = new Reader(buf, off, off + len)
    val labels = Seq.newBuilder[Label]
    val samples = Seq.newBuilder[Sample]
    while (r.hasMore) {
      val tag = r.varint()
      (tag >>> 3, (tag & 7).toInt) match {
        case (1L, 2) => val (o, n) = r.delimited(); labels += decLabel(buf, o, n)
        case (2L, 2) => val (o, n) = r.delimited(); samples += decSample(buf, o, n)
        case (_, w) => r.skip(w)
      }
    }
    TimeSeries(labels.result(), samples.result())
  }

  def decodeWriteRequest(buf: Array[Byte]): WriteRequest = {
    val r = new Reader(buf, 0, buf.length)
    val out = Seq.newBuilder[TimeSeries]
    while (r.hasMore) {
      val tag = r.varint()
      (tag >>> 3, (tag & 7).toInt) match {
        case (1L, 2) =>
          val (o, n) = r.delimited(); out += decTimeSeries(buf, o, n)
        case (_, w) => r.skip(w)
      }
    }
    WriteRequest(out.result())
  }

  private def decMatcher(buf: Array[Byte], off: Int, len: Int): LabelMatcher = {
    val r = new Reader(buf, off, off + len)
    var typ = 0; var name = ""; var value = ""
    while (r.hasMore) {
      val tag = r.varint()
      (tag >>> 3, (tag & 7).toInt) match {
        case (1L, 0) => typ = r.varint().toInt
        case (2L, 2) => name = r.string()
        case (3L, 2) => value = r.string()
        case (_, w) => r.skip(w)
      }
    }
    LabelMatcher(typ, name, value)
  }

  private def decQuery(buf: Array[Byte], off: Int, len: Int): Query = {
    val r = new Reader(buf, off, off + len)
    var startMs = 0L; var endMs = 0L
    val ms = Seq.newBuilder[LabelMatcher]
    while (r.hasMore) {
      val tag = r.varint()
      (tag >>> 3, (tag & 7).toInt) match {
        case (1L, 0) => startMs = r.varint()
        case (2L, 0) => endMs = r.varint()
        case (3L, 2) => val (o, n) = r.delimited(); ms += decMatcher(buf, o, n)
        case (_, w) => r.skip(w)
      }
    }
    Query(startMs, endMs, ms.result())
  }

  def decodeReadRequest(buf: Array[Byte]): ReadRequest = {
    val r = new Reader(buf, 0, buf.length)
    val out = Seq.newBuilder[Query]
    while (r.hasMore) {
      val tag = r.varint()
      (tag >>> 3, (tag & 7).toInt) match {
        case (1L, 2) => val (o, n) = r.delimited(); out += decQuery(buf, o, n)
        case (_, w) => r.skip(w)
      }
    }
    ReadRequest(out.result())
  }

  def decodeReadResponse(buf: Array[Byte]): ReadResponse = {
    val r = new Reader(buf, 0, buf.length)
    val out = Seq.newBuilder[QueryResult]
    while (r.hasMore) {
      val tag = r.varint()
      (tag >>> 3, (tag & 7).toInt) match {
        case (1L, 2) =>
          val (o, n) = r.delimited()
          val inner = new Reader(buf, o, o + n)
          val ts = Seq.newBuilder[TimeSeries]
          while (inner.hasMore) {
            val itag = inner.varint()
            (itag >>> 3, (itag & 7).toInt) match {
              case (1L, 2) =>
                val (io, in2) = inner.delimited()
                ts += decTimeSeries(buf, io, in2)
              case (_, w) => inner.skip(w)
            }
          }
          out += QueryResult(ts.result())
        case (_, w) => r.skip(w)
      }
    }
    ReadResponse(out.result())
  }

  // ---- snappy framing -----------------------------------------------------

  def snappyCompress(b: Array[Byte]): Array[Byte] =
    org.xerial.snappy.Snappy.compress(b)

  def snappyUncompress(b: Array[Byte]): Array[Byte] =
    org.xerial.snappy.Snappy.uncompress(b)
}
