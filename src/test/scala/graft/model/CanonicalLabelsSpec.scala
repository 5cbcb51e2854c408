package graft.model

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** The native `canonical_labels` expression (r12) must be
  * BIT-IDENTICAL to the HOF pipeline it replaced — every persisted
  * sig, oracle string, and topk tie key depends on the encoding, so
  * the pin is against the literal former expression, evaluated on
  * adversarial label sets (metachars, non-ASCII, empty strings,
  * null values, empty maps). */
class CanonicalLabelsSpec extends SparkTestBase {

  /** The exact pre-r12 formulation. */
  private def hofSigStr(labels: org.apache.spark.sql.Column) =
    array_join(
      transform(array_sort(map_entries(labels)),
        e => concat(
          length(e.getField("key")), lit(":"), e.getField("key"), lit("="),
          length(e.getField("value")), lit(":"), e.getField("value"))),
      ";")

  test("native canonical_labels equals the HOF pipeline on adversarial " +
      "label sets (metachars, unicode, empties, null values)") {
    val rnd = new scala.util.Random(7)
    val chars = "abz09;:=ÿþ€😀 \"\\"
    def rs(): String = (0 until (1 + rnd.nextInt(8)))
      .map(_ => chars(rnd.nextInt(chars.length))).mkString
    val cases: Seq[Map[String, String]] =
      (1 to 300).map(_ =>
        (0 until rnd.nextInt(6)).map(_ => rs() -> rs()).toMap) ++ Seq(
        Map.empty[String, String],
        Map("" -> ""),
        Map("a" -> "", "" -> "b"),
        Map("k" -> null), // null value: entry drops, no separator residue
        Map("a" -> "1", "k" -> null, "z" -> "2"))
    val schema = StructType(Seq(StructField("labels",
      MapType(StringType, StringType), nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(cases.map(Row(_)), 4), schema)
    val out = df.select(
        Samples.sigStr(col("labels")).as("native"),
        hofSigStr(col("labels")).as("hof"))
      .collect()
    out.zip(cases).foreach { case (r, m) =>
      assert(r.getString(0) == r.getString(1),
        s"mismatch on $m: native='${r.getString(0)}' hof='${r.getString(1)}'")
    }
    // and the hash built on it is unchanged too
    val sigs = df.select(Samples.sigExpr(col("labels")).as("s"),
        xxhash64(hofSigStr(col("labels"))).as("h")).collect()
    sigs.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("canonical_labels stays codegen (no interpreted lambda HOFs in " +
      "the projected plan)") {
    import spark.implicits._
    val df = Seq(Map("a" -> "b")).toDF("labels")
      .select(Samples.sigStr(col("labels")))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("canonical_labels"), p)
    assert(!p.contains("lambdafunction"), s"HOF crept back:\n$p")
  }
}
