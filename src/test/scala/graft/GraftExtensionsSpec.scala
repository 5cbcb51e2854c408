package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The extension entry point registers the optimizer rule and the SQL
  * function a pure-SQL consumer would get from
  * `spark.sql.extensions=graft.GraftExtensions`. */
class GraftExtensionsSpec extends SparkTestBase {

  test("extensions register IntDivPushdown and word_shingles") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    assert(org.apache.spark.sql.GraftTestBridge.optimizerRules(ext, spark)
      .contains(graft.plans.IntDivPushdown))

    org.apache.spark.sql.GraftTestBridge.registerFunctions(
      ext, spark.sessionState.functionRegistry)
    val r = spark.sql("SELECT word_shingles('a b c d', 2) AS s")
      .head.getSeq[String](0)
    assert(r == Seq("a b", "b c", "c d"))
    // distinct (default) vs positional windows
    val dflt = spark.sql("SELECT word_shingles('a b a b', 2) AS s")
      .head.getSeq[String](0)
    assert(dflt == Seq("a b", "b a"))
    val pos = spark.sql("SELECT word_shingles('a b a b', 2, false) AS s")
      .head.getSeq[String](0)
    assert(pos == Seq("a b", "b a", "a b"))
    // non-literal n rejects with a clear message
    val err = intercept[Exception] {
      spark.sql("SELECT word_shingles('a b', length('xx')) AS s").collect()
    }
    assert(err.getMessage.contains("integer literal"))

    // array_dot: ascending fold over the common prefix
    assert(spark.sql(
      "SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head.getDouble(0) == 11.0)
    assert(spark.sql(
      "SELECT array_dot(array(1.0d), array(5.0d, 7.0d)) AS d")
      .head.getDouble(0) == 5.0)

    // stopword_hits: per-profile counts, one foldable array per profile
    val hits = spark.sql(
      "SELECT stopword_hits('THE of de xyz', array('the', 'of'), " +
        "array('de', 'la')) AS h").head.getSeq[Int](0)
    assert(hits == Seq(2, 1))
    val err2 = intercept[Exception] {
      // non-foldable profile (uuid() is non-deterministic) rejects
      spark.sql("SELECT stopword_hits('a b', array(uuid())) AS h").collect()
    }
    assert(err2.getMessage.contains("literal"))
  }
}
