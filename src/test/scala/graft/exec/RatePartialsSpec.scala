package graft.exec

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Pure-function properties of the rate-partials algebra (no Spark):
  * folding per-bucket partials in time order must reproduce the
  * sequential Go scan (`extrapolatedRate`) exactly for exact-integer
  * values, under ANY contiguous bucketing, and pre-merging any prefix
  * of partials ([[PromUdfs.mergeRateParts]] — the q > 1 materialized
  * route) must not change the result. These are the invariants the
  * engine-level PartialsRoutingSpec pins end-to-end; here they get
  * 200 random bucketings per shape instead of two fixtures. */
class RatePartialsSpec extends AnyFunSuite {

  /** Reference per-bucket partial built with the sequential in-bucket
    * loop (the shape `Ingest.foldPartials` materializes). */
  private def partial(j: Long, pts: Seq[(Long, Double)]): Row = {
    var corr = 0.0
    pts.sliding(2).foreach {
      case Seq((_, a), (_, b)) => if (b < a) corr += a
      case _ =>
    }
    Row(j, pts.head._1, pts.head._2, pts.last._1, pts.last._2, corr,
      pts.size.toLong)
  }
  private def pointRows(pts: Seq[(Long, Double)]): Seq[Row] =
    pts.map { case (t, v) => Row(t, v) }

  test("partial fold == sequential scan under random bucketings; " +
      "pre-merged prefixes associate exactly (integer values)") {
    val rnd = new scala.util.Random(0x5eed5eedL)
    for (trial <- 0 until 200) {
      val n = 2 + rnd.nextInt(40)
      var t = 0L
      val pts = (0 until n).map { _ =>
        t += 1 + rnd.nextInt(5000)
        // integer-valued doubles: every sum in the fold is exact, so
        // fold-vs-scan equality is EXACT, not epsilon
        (t, rnd.nextInt(1000).toDouble)
      }
      val rangeEnd = t + rnd.nextInt(1000)
      val rangeMs = (rangeEnd - pts.head._1) + 1 + rnd.nextInt(10000)
      val rangeStart = rangeEnd - rangeMs
      for (isCounter <- Seq(true, false); isRate <- Seq(true, false)) {
        val direct = PromUdfs.extrapolatedRate(pointRows(pts), rangeEnd,
          0L, rangeMs, isCounter, isRate)
        // random contiguous bucketing of the same points
        val groups = {
          val out = Seq.newBuilder[Seq[(Long, Double)]]
          var rest: Seq[(Long, Double)] = pts
          while (rest.nonEmpty) {
            val k = 1 + rnd.nextInt(rest.size)
            out += rest.take(k); rest = rest.drop(k)
          }
          out.result()
        }
        val parts = groups.zipWithIndex.map { case (g, i) =>
          partial(i.toLong, g) }
        val folded = PromUdfs.ratePartials(parts, rangeStart, rangeEnd,
          rangeMs, isCounter, isRate)
        assert(folded == direct,
          s"fold != scan (trial=$trial counter=$isCounter rate=$isRate " +
            s"buckets=${parts.size})")
        // pre-merge a random prefix into one partial and re-fold — the
        // materialized route's q-sub-bucket merge must be transparent
        if (parts.size >= 2) {
          val cut = 1 + rnd.nextInt(parts.size - 1)
          val m = PromUdfs.mergeRateParts(parts.take(cut))
          val mergedRow = Row(0L, m._1, m._2, m._3, m._4, m._5, m._6)
          val refolded = PromUdfs.ratePartials(mergedRow +: parts.drop(cut),
            rangeStart, rangeEnd, rangeMs, isCounter, isRate)
          assert(refolded == folded,
            s"pre-merge changed the fold (trial=$trial cut=$cut)")
        }
      }
    }
  }

  test("NaN mid-stream: no reset detected across or at the NaN, " +
      "matching the Go comparison semantics") {
    // values 10, 20, NaN, 30, 40 — Go sees no decrease anywhere
    val pts = Seq((1000L, 10.0), (2000L, 20.0), (3000L, Double.NaN),
      (4000L, 30.0), (5000L, 40.0))
    val direct = PromUdfs.extrapolatedRate(pointRows(pts), 6000L, 0L,
      6000L, true, false)
    // bucket the NaN at a seam: {10,20,NaN} | {30,40} — the boundary
    // comparison 30 < NaN must NOT fire (Java/Go: false)
    val parts = Seq(partial(0, pts.take(3)), partial(1, pts.drop(3)))
    val folded = PromUdfs.ratePartials(parts, 0L, 6000L, 6000L, true, false)
    assert(folded == direct)
    assert(folded.exists(!_.isNaN)) // increase = 40 - 10 extrapolated
  }
}
