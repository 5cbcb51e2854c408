package graft.api

import java.net.{HttpURLConnection, URI}
import java.nio.file.Files

import graft.SparkTestBase
import graft.exec.PromQLEngine
import graft.model.Samples
import graft.storage.Ingest

/** prompb wire-format tests: codec round-trips, a byte-level golden
  * vector against the gogo-proto encoding rules
  * (`prompb/types.pb.go:184-310`), and the snappy+protobuf
  * write-then-read-back acceptance mirror of
  * `internal/test/acceptance/acceptance_test.go:163-268`. */
class PrompbSpec extends SparkTestBase {
  import Prompb._

  test("WriteRequest encode/decode round-trips, including raw NaN bits") {
    val req = WriteRequest(Seq(
      TimeSeries(
        Seq(Label("__name__", "m"), Label("job", "j")),
        Seq(Sample(1.5, 1000L), Sample(Samples.StaleNaN, 2000L),
          Sample(-0.0, 3000L), Sample(Double.PositiveInfinity, -5L))),
      TimeSeries(Seq(Label("__name__", "n")), Seq(Sample(0.0, 0L)))))
    val dec = decodeWriteRequest(encodeWriteRequest(req))
    assert(dec == req || {
      // NaN != NaN under ==; compare via raw bits
      val a = req.timeseries.flatMap(_.samples)
        .map(s => (java.lang.Double.doubleToRawLongBits(s.value), s.timestamp))
      val b = dec.timeseries.flatMap(_.samples)
        .map(s => (java.lang.Double.doubleToRawLongBits(s.value), s.timestamp))
      a == b && req.timeseries.map(_.labels) == dec.timeseries.map(_.labels)
    })
    // the staleness marker's signalling-NaN bit pattern survives
    val bits = decodeWriteRequest(encodeWriteRequest(req))
      .timeseries.head.samples(1).value
    assert(java.lang.Double.doubleToRawLongBits(bits) == Samples.StaleNaNBits)
  }

  test("golden bytes: gogo-proto field tags, zero-skipping, fixed64 LE") {
    // Label{__name__,m}: 0a 08 <8 bytes> 12 01 6d          (13 bytes)
    // Sample{2.0, 3}:    09 00..00 40 10 03                (11 bytes)
    // TimeSeries:        0a 0d <label> 12 0b <sample>      (28 bytes)
    // WriteRequest:      0a 1c <ts>
    val req = WriteRequest(Seq(TimeSeries(
      Seq(Label("__name__", "m")), Seq(Sample(2.0, 3L)))))
    val hex = encodeWriteRequest(req).map("%02x".format(_)).mkString
    assert(hex ==
      "0a1c" + "0a0d" + "0a08" + "5f5f6e616d655f5f" + "1201" + "6d" +
        "120b" + "09" + "0000000000000040" + "10" + "03")
    // zero-valued sample fields are SKIPPED like gogo's writer
    val zero = encodeWriteRequest(
      WriteRequest(Seq(TimeSeries(Nil, Seq(Sample(0.0, 0L))))))
    assert(zero.map("%02x".format(_)).mkString == "0a02" + "1200")
  }

  test("ReadRequest/ReadResponse round-trip; negative varints; unknown fields") {
    val rr = ReadRequest(Seq(Query(-1L, 9999999999999L, Seq(
      LabelMatcher(0, "__name__", "m"), LabelMatcher(3, "job", "a|b")))))
    assert(decodeReadRequest(encodeReadRequest(rr)) == rr)
    val resp = ReadResponse(Seq(QueryResult(Seq(TimeSeries(
      Seq(Label("a", "b")), Seq(Sample(4.25, 17L)))))))
    assert(decodeReadResponse(encodeReadResponse(resp)) == resp)
    // a conforming decoder skips unknown fields by wire type: append
    // field 15 varint + field 14 length-delimited to a Query payload
    val q = encodeReadRequest(rr)
    val unknown = Array[Byte](0x78, 0x2a, 0x72, 0x02, 0x68, 0x69)
    val patched = q ++ Array[Byte](0x0a, unknown.length.toByte) ++ unknown
    // (that appends an empty-ish Query carrying only unknown fields)
    val dec = decodeReadRequest(patched)
    assert(dec.queries.length == 2 && dec.queries.head == rr.queries.head)
    assert(dec.queries(1) == Query(0L, 0L, Nil))
  }

  test("snappy framing round-trips and matches the block format") {
    val data = Array.fill[Byte](1000)(7)
    val c = snappyCompress(data)
    assert(c.length < data.length) // block format compresses runs
    assert(snappyUncompress(c).toSeq == data.toSeq)
  }

  // ---- acceptance: remote write then remote read back (wire format) ------

  private def postBytes(port: Int, path: String, body: Array[Byte],
      headers: Map[String, String]): (Int, Array[Byte]) = {
    val url = new URI(s"http://127.0.0.1:$port$path").toURL
    val conn = url.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    conn.getOutputStream.write(body)
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    (code, stream.readAllBytes())
  }

  test("remote write → remote read round trip, proto equality " +
      "(acceptance_test.go:163-268)") {
    val path = Files.createTempDirectory("prompb-ingest").toString
    val nowMs = 1704067200000L
    val metric = "rw_acceptance_metric"

    // ---- write: snappy+protobuf through the reference's route ----
    val writeApi = new HttpApi(spark,
      new PromQLEngine(spark, samplesDF()),
      writeSink = Some(df => Ingest.append(df, path)))
    val wrotePort = writeApi.start()
    try {
      val wreq = WriteRequest(Seq(TimeSeries(
        Seq(Label("__name__", metric)), Seq(Sample(1234.0, nowMs)))))
      val (wc, _) = postBytes(wrotePort, "/write",
        snappyCompress(encodeWriteRequest(wreq)),
        Map("Content-Encoding" -> "snappy",
          "Content-Type" -> "application/x-protobuf",
          "X-Prometheus-Remote-Write-Version" -> "0.1.0"))
      assert(wc == 200, s"write returned $wc")
    } finally writeApi.stop()

    // ---- read: snappy+protobuf ReadRequest over the stored table ----
    val readApi = new HttpApi(spark,
      new PromQLEngine(spark, Ingest.readTable(spark, path)))
    val readPort = readApi.start()
    try {
      val rreq = ReadRequest(Seq(Query(nowMs, nowMs, Seq(
        LabelMatcher(0, "__name__", metric)))))
      val (rc, rbody) = postBytes(readPort, "/read",
        snappyCompress(encodeReadRequest(rreq)),
        Map("Content-Encoding" -> "snappy",
          "Content-Type" -> "application/x-protobuf",
          "X-Prometheus-Remote-Read-Version" -> "0.1.0"))
      assert(rc == 200, s"read returned $rc: ${new String(rbody)}")
      val resp = decodeReadResponse(snappyUncompress(rbody))
      assert(resp.results.nonEmpty, "got no results")
      assert(resp.results.head.timeseries.nonEmpty,
        "got no timeseries in result")
      // the reference asserts reflect.DeepEqual on the full TimeSeries
      val expected = TimeSeries(
        Seq(Label("__name__", metric)), Seq(Sample(1234.0, nowMs)))
      assert(resp.results.head.timeseries.head == expected)
    } finally readApi.stop()
  }

  test("remote read serves staleness markers with exact StaleNaN bits: " +
      "a reader that never sees the end marker would resurrect the series") {
    import graft.model.Samples
    val path = Files.createTempDirectory("prompb-stale").toString
    val nowMs = 1704067200000L
    val metric = "rw_stale_metric"

    val writeApi = new HttpApi(spark,
      new PromQLEngine(spark, samplesDF()),
      writeSink = Some(df => Ingest.append(df, path)))
    val wrotePort = writeApi.start()
    try {
      // a live sample followed by the series' staleness marker — the
      // raw signalling bits travel through prompb's fixed64 intact
      val wreq = WriteRequest(Seq(TimeSeries(
        Seq(Label("__name__", metric)),
        Seq(Sample(7.5, nowMs), Sample(Samples.StaleNaN, nowMs + 60000)))))
      val (wc, _) = postBytes(wrotePort, "/write",
        snappyCompress(encodeWriteRequest(wreq)),
        Map("Content-Encoding" -> "snappy",
          "Content-Type" -> "application/x-protobuf",
          "X-Prometheus-Remote-Write-Version" -> "0.1.0"))
      assert(wc == 200, s"write returned $wc")
    } finally writeApi.stop()

    val readApi = new HttpApi(spark,
      new PromQLEngine(spark, Ingest.readTable(spark, path)))
    val readPort = readApi.start()
    try {
      val rreq = ReadRequest(Seq(Query(nowMs, nowMs + 60000, Seq(
        LabelMatcher(0, "__name__", metric)))))
      val (rc, rbody) = postBytes(readPort, "/read",
        snappyCompress(encodeReadRequest(rreq)),
        Map("Content-Encoding" -> "snappy",
          "Content-Type" -> "application/x-protobuf",
          "X-Prometheus-Remote-Read-Version" -> "0.1.0"))
      assert(rc == 200, s"read returned $rc: ${new String(rbody)}")
      val resp = decodeReadResponse(snappyUncompress(rbody))
      val ts = resp.results.head.timeseries.head
      assert(ts.samples.map(_.timestamp) == Seq(nowMs, nowMs + 60000))
      assert(ts.samples.head.value == 7.5)
      // NaN payload equality must compare RAW bits (NaN != NaN)
      assert(java.lang.Double.doubleToRawLongBits(ts.samples(1).value) ==
        Samples.StaleNaNBits, "marker must arrive as StaleNaN, bit-exact")
    } finally readApi.stop()
  }

  test("malformed proto writes are 400, not 500 (write.go:61-74)") {
    val api = new HttpApi(spark, new PromQLEngine(spark, samplesDF()),
      writeSink = Some(_ => 0L))
    val port = api.start()
    try {
      // valid snappy, garbage proto
      val (c1, _) = postBytes(port, "/write",
        snappyCompress(Array[Byte](0x09, 0x01)),
        Map("Content-Type" -> "application/x-protobuf"))
      assert(c1 == 400)
      // invalid snappy
      val (c2, _) = postBytes(port, "/write", Array[Byte](-1, -1, -1),
        Map("Content-Type" -> "application/x-protobuf"))
      assert(c2 == 400)
      // empty request containing zero timeseries
      val (c3, _) = postBytes(port, "/write",
        snappyCompress(Array.empty[Byte]),
        Map("Content-Type" -> "application/x-protobuf"))
      assert(c3 == 400)
      // hostile length-delimited field: varint length near Long.MaxValue
      // must be rejected as truncated (an overflowing `pos + n` bound
      // check would sail past it and corrupt the parse position) — a
      // clean 400, never a 500
      val hostile = Array[Byte](0x0a.toByte) ++ // field 1, wire type 2
        Array.fill(8)(0xff.toByte) :+ 0x7f.toByte // varint ~Long.MaxValue
      val (c4, _) = postBytes(port, "/write", snappyCompress(hostile),
        Map("Content-Type" -> "application/x-protobuf"))
      assert(c4 == 400)
    } finally api.stop()
  }
}
