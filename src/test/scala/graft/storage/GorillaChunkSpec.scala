package graft.storage

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Samples

/** Pure codec round-trip: every (strictly increasing t, arbitrary
  * value bits) stream must decode to exactly the input, including
  * NaN payloads, ±Inf, staleness-marker bits and denormals — the
  * codec works on raw bits, nothing may be canonicalized. */
class GorillaChunkSpec extends AnyFunSuite {

  private def roundTrip(ts: Array[Long], vs: Array[Long]): Unit = {
    val (t2, v2) = GorillaChunk.decode(GorillaChunk.encode(ts, vs))
    assert(t2.toSeq == ts.toSeq)
    assert(v2.toSeq == vs.toSeq)
  }

  test("empty, single and two-sample chunks") {
    roundTrip(Array.empty, Array.empty)
    roundTrip(Array(1704067200123L), Array(java.lang.Double.doubleToRawLongBits(3.14)))
    roundTrip(Array(-5L, 1000L), Array(0L, -1L))
  }

  test("special value bit patterns survive") {
    val specials = Array(
      java.lang.Double.doubleToRawLongBits(Double.NaN),
      Samples.StaleNaNBits, // signalling NaN payload — MUST NOT canonicalize
      java.lang.Double.doubleToRawLongBits(Double.PositiveInfinity),
      java.lang.Double.doubleToRawLongBits(Double.NegativeInfinity),
      java.lang.Double.doubleToRawLongBits(-0.0),
      1L, // denormal
      java.lang.Double.doubleToRawLongBits(Double.MaxValue))
    roundTrip(Array.tabulate(specials.length)(i => i * 15000L), specials)
  }

  test("dod bucket boundaries (the asymmetric ±2^(n-1) ranges)") {
    // deltas engineered to hit dod = 0, ±small, and each bucket's
    // EDGES: +2^(n-1) is in-bucket (positive), -(2^(n-1)-1) is the
    // most negative in-bucket value; one step beyond forces the next
    // bucket — the decoder's strict-greater rule is what keeps
    // +2^(n-1) positive
    val dods = Seq(0L, 1L, -1L, 8192L, -8191L, 8193L, -8192L,
      65536L, -65535L, 65537L, 524288L, -524287L, 524289L,
      (1L << 40), -(1L << 40))
    val ts = Array.newBuilder[Long]
    var t = 0L
    var delta = 1L << 41 // large base delta keeps every t increasing
    ts += t
    t += delta; ts += t
    for (dod <- dods) { delta += dod; t += delta; ts += t }
    val arr = ts.result()
    roundTrip(arr, Array.fill(arr.length)(java.lang.Double.doubleToRawLongBits(1.0)))
  }

  test("property: random increasing timestamps × mixed values round-trip") {
    val rnd = new scala.util.Random(0x9e3779b97f4a7c15L)
    for (_ <- 0 until 300) {
      val n = 1 + rnd.nextInt(400)
      var t = rnd.nextLong() % 1700000000000L
      val ts = new Array[Long](n)
      val bits = new Array[Long](n)
      for (i <- 0 until n) {
        ts(i) = t
        t += (rnd.nextInt(4) match {
          case 0 => 1L + rnd.nextInt(100)
          case 1 => 15000L
          case 2 => 15001L
          case _ => 1L + (rnd.nextLong() & ((1L << 22) - 1))
        })
        bits(i) = rnd.nextInt(4) match {
          case 0 => rnd.nextLong()
          case 1 => java.lang.Double.doubleToRawLongBits(42.0)
          case 2 => Samples.StaleNaNBits
          case _ => java.lang.Double.doubleToRawLongBits(rnd.nextInt(100).toDouble)
        }
      }
      roundTrip(ts, bits)
    }
  }

  test("regular scrape + slowly varying values compress far below raw") {
    // the Gorilla sweet spot: constant cadence (dod=0 after sample 3)
    // and a gauge drifting in a narrow band — the published figure is
    // 1.37 bytes/sample on production metrics; exact constants
    // compress to ~1.2 bits/sample here
    val n = 240
    val ts = Array.tabulate(n)(i => 1704067200000L + i * 15000L)
    val vs = Array.fill(n)(java.lang.Double.doubleToRawLongBits(250.0))
    val blob = GorillaChunk.encode(ts, vs)
    val bytesPerSample = blob.length.toDouble / n
    assert(bytesPerSample < 1.0, s"constant series: $bytesPerSample B/sample")
    val drifting = Array.tabulate(n)(i =>
      java.lang.Double.doubleToRawLongBits(250.0 + (i % 7)))
    val blob2 = GorillaChunk.encode(ts, drifting)
    assert(blob2.length.toDouble / n < 4.0,
      s"drifting series: ${blob2.length.toDouble / n} B/sample")
    // raw is 16 B/sample before general-purpose compression
  }

  test("encoder rejects non-increasing timestamps (ErrAmendSample stance)") {
    intercept[IllegalArgumentException] {
      GorillaChunk.encode(Array(10L, 10L), Array(1L, 2L))
    }
    intercept[IllegalArgumentException] {
      GorillaChunk.encode(Array(10L, 9L), Array(1L, 2L))
    }
  }

  test("chunk sample-count cap is enforced") {
    intercept[IllegalArgumentException] {
      GorillaChunk.encode(Array.tabulate(65536)(_.toLong),
        new Array[Long](65536))
    }
  }
}
