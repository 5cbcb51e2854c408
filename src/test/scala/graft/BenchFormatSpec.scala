package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver captures only the last ~2000 chars of Bench stdout; the
  * one JSON line must survive that window WITH the trailing sbt
  * `[success]` line (~80 chars) still fitting behind it. Rounds 2 and
  * 3 shipped lines that overran it — the driver recorded
  * `parsed: null` both times. This pins the renderer so adding a
  * query can never silently re-break the contract.
  */
class BenchFormatSpec extends AnyFunSuite {
  private val names = SparkEntry.queries.keys.toSeq.sorted

  test("bench stdout line stays under the 1800-char budget at worst-case widths") {
    // worst case: every query reads 99.99s, totals/qps at max width
    val results = names.map(n => (n, 99.999, 99.999))
    val line = BenchFormat.line(results, 9999.999, 99.999, 99.999, "0.1")
    assert(line.length < 1800, s"line is ${line.length} chars")
    assert(line.startsWith("{\"metric\":\"total\""))
    assert(line.endsWith("\"sf\":0.1}"))
  }

  test("short keys are unique and prefix-faithful") {
    val short = BenchFormat.shortKeys(names)
    assert(short.size == names.size)
    assert(short.values.toSet.size == names.size, "abbreviations collide")
    names.foreach { n =>
      assert(n == short(n) || n.startsWith(short(n) + "_"),
        s"$n -> ${short(n)} is not a token prefix")
    }
  }

  test("full json carries every query under its full name") {
    val results = names.map(n => (n, 1.0, 0.5))
    val full = BenchFormat.fullJson(results, 1.0, 2.0, 3.0, "0.01")
    names.foreach(n => assert(full.contains("\"" + n + "\":{")))
  }
}
