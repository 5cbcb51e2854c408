package graft.model

import org.scalatest.funsuite.AnyFunSuite

import graft.exec.{PromUdfs, TopK}

/** Seeded randomized properties for the load-bearing encodings: the
  * canonical label string must be collision-free and decodable, float
  * formatting must round-trip, and the exact quantile must match a
  * naive reference. */
class PropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  private def randLabel(): String = {
    // deliberately include the canonical-format metachars ; : = digits
    val chars = "abz09;:=ÿþ \"\\"
    (0 until (1 + rnd.nextInt(8)))
      .map(_ => chars(rnd.nextInt(chars.length))).mkString
  }

  private def randLabels(): Map[String, String] =
    (0 until rnd.nextInt(5)).map(_ => randLabel() -> randLabel()).toMap

  test("canonical label string round-trips through decodeLabels") {
    (1 to 500).foreach { _ =>
      val m = randLabels()
      assert(TopK.decodeLabels(Samples.canonical(m)) == m,
        s"roundtrip failed for $m")
    }
  }

  test("canonical label string is collision-free across distinct maps") {
    val maps = (1 to 800).map(_ => randLabels()).distinct
    val canon = maps.map(Samples.canonical)
    assert(canon.distinct.size == maps.size)
    // the historic collision class: separator chars inside values
    val a = Map("a" -> "1", "b" -> "2")
    val b = Map("a" -> "1;1:b=1:2")
    assert(Samples.canonical(a) != Samples.canonical(b))
  }

  test("goFormatFloat round-trips doubles") {
    val specials = Seq(0.0, -0.0, 1.0, -1.5, 1e-300, 1e300, 0.1,
      Double.MaxValue, Double.MinPositiveValue)
    val randoms = (1 to 500).map(_ => java.lang.Double.longBitsToDouble(rnd.nextLong()))
      .filterNot(d => d.isNaN || d.isInfinite)
    (specials ++ randoms).foreach { v =>
      val s = PromUdfs.goFormatFloat(v)
      assert(s.toDouble == v, s"$v formatted as $s")
    }
  }

  test("exact quantile matches naive sort-and-interpolate") {
    (1 to 200).foreach { _ =>
      val n = 1 + rnd.nextInt(50)
      val values = Array.fill(n)(rnd.nextDouble() * 200 - 100)
      val q = rnd.nextDouble()
      val sorted = values.sorted
      val rank = q * (n - 1)
      val lo = math.floor(rank).toInt
      val hi = math.min(n - 1, lo + 1)
      val w = rank - lo
      val expected = sorted(lo) * (1 - w) + sorted(hi) * w
      val got = PromUdfs.quantile(q, values)
      assert(math.abs(got - expected) <= 1e-12 * math.max(1.0, math.abs(expected)))
    }
  }

  test("simhash of permuted tokens is order-insensitive; near-dup is close") {
    import graft.llm.Dedup
    val tokens = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val h1 = Dedup.simhash64(tokens)
    val h2 = Dedup.simhash64(rnd.shuffle(tokens))
    assert(h1 == h2) // bag-of-tokens: order must not matter
    val h3 = Dedup.simhash64(tokens.updated(0, "omega"))
    assert(java.lang.Long.bitCount(h1 ^ h3) < 32) // small perturbation
  }
}
