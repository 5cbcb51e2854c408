package graft.exec

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The native `first_labels` aggregate ([[FirstMap]], r12): a
  * TypedImperativeAggregate over raw MapData whose buffer is the
  * first-seen map — ZERO per-row decode after the first row of a
  * group. These tests force both framework paths the zero-decode
  * claim must survive: in-task update/merge across many partitions
  * (partial buffers ship through serialize/deserialize) and the
  * hash-based plan itself. */
class FirstLabelsSpec extends SparkTestBase {

  import spark.implicits._

  test("picks a member map per group across a multi-partition shuffle " +
      "(merge + serialize/deserialize round-trip)") {
    // every row of a group carries the SAME content (the sig-grouped
    // contract) — a correct first must return exactly that map
    val rows = (0 until 1000).map { i =>
      val g = i % 7
      (g.toLong, Map("name" -> s"m$g", "idx" -> g.toString))
    }
    val df = rows.toDF("g", "labels").repartition(16)
    val got = df.groupBy(col("g"))
      .agg(FirstLabels.first(col("labels")).as("labels"))
      .collect()
      .map(r => r.getLong(0) -> r.getMap[String, String](1).toMap)
      .toMap
    assert(got.size == 7)
    (0 until 7).foreach { g =>
      assert(got(g.toLong) == Map("name" -> s"m$g", "idx" -> g.toString))
    }
  }

  test("heterogeneous group content returns SOME member, never a blend") {
    val df = Seq(
      (1L, Map("a" -> "1")),
      (1L, Map("b" -> "2")),
      (2L, Map("c" -> "3"))).toDF("g", "labels").repartition(4)
    val got = df.groupBy(col("g"))
      .agg(FirstLabels.first(col("labels")).as("labels"))
      .collect()
      .map(r => r.getLong(0) -> r.getMap[String, String](1).toMap)
      .toMap
    assert(Set(Map("a" -> "1"), Map("b" -> "2")).contains(got(1L)),
      s"blended or foreign map: ${got(1L)}")
    assert(got(2L) == Map("c" -> "3"))
  }

  test("null maps are ignored; an all-null group yields null") {
    val df = Seq[(Long, Option[Map[String, String]])](
      (1L, None), (1L, Some(Map("k" -> "v"))),
      (2L, None), (2L, None)).toDF("g", "labels").repartition(3)
    val got = df.groupBy(col("g"))
      .agg(FirstLabels.first(col("labels")).as("labels"))
      .collect()
      .map(r => r.getLong(0) ->
        Option(r.getMap[String, String](1)).map(_.toMap))
      .toMap
    assert(got(1L).contains(Map("k" -> "v")))
    assert(got(2L).isEmpty)
  }

  test("plans ObjectHashAggregate, never SortAggregate (the builtin " +
      "first-over-map demotion this aggregate exists to avoid)") {
    val df = Seq((1L, Map("a" -> "b"))).toDF("g", "labels")
      .groupBy(col("g")).agg(FirstLabels.first(col("labels")))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"not hash-based:\n$p")
    assert(!p.contains("SortAggregate"), s"demoted to SortAggregate:\n$p")
  }

  test("rejects non-map input at analysis time") {
    val e = intercept[Exception] {
      Seq((1L, "x")).toDF("g", "labels")
        .groupBy(col("g")).agg(FirstLabels.first(col("labels")))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("map"), e.getMessage)
  }
}
