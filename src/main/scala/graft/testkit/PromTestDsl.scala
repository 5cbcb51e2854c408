package graft.testkit

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.exec.PromQLEngine
import graft.model.Samples
import graft.promql.Lexer

/** Runner for the Prometheus test DSL (`promql/test.go:36-193`):
  *
  * {{{
  *   load 5m
  *     http_requests{job="api", instance="0"} 0+10x10
  *     errors_total 0 1 _ 3
  *
  *   eval instant at 50m sum by (job) (http_requests)
  *     {job="api"} 100
  *
  *   eval_ordered instant at 50m sort(http_requests)
  *     ...
  *
  *   eval_fail instant at 50m bad_function(http_requests)
  *
  *   clear
  * }}}
  *
  * Series notation `a+bxn` expands to n+1 points stepped by the load
  * interval (`promql/parse.go:171-250`); `_` skips a sample. Values
  * compare with epsilon 1e-6 like the reference (`test.go:513-531`).
  * This makes the upstream `.test` corpus format runnable against the
  * Spark engine.
  */
object PromTestDsl {

  case class DslError(line: Int, msg: String)
    extends AssertionError(s"line $line: $msg")

  private val SeriesRe =
    """^([a-zA-Z_:][a-zA-Z0-9_:]*)?(\{[^}]*\})?\s*(.*)$""".r
  private val LabelRe = """([a-zA-Z_][a-zA-Z0-9_]*)="((?:[^"\\]|\\.)*)"""".r
  private val ExpandRe = """^(-?\d+(?:\.\d+)?)(?:([+-]\d+(?:\.\d+)?)x(\d+))?$""".r

  def run(spark: SparkSession, script: String): Unit = {
    var samples = Vector.empty[(Map[String, String], Long, Double)]
    var engine: Option[PromQLEngine] = None
    def getEngine: PromQLEngine = {
      if (engine.isEmpty) engine = Some(new PromQLEngine(spark, toDF(spark, samples)))
      engine.get
    }

    val lines = script.split('\n').zipWithIndex
      .map { case (l, i) => (stripComment(l), i + 1) }
    var i = 0
    while (i < lines.length) {
      val (line, lineNo) = lines(i)
      val t = line.trim
      if (t.isEmpty) i += 1
      else if (t == "clear") { samples = Vector.empty; engine = None; i += 1 }
      else if (t.startsWith("load ")) {
        val stepMs = Lexer.modelDuration(t.stripPrefix("load ").trim)
        i += 1
        while (i < lines.length && lines(i)._1.startsWith(" ") &&
          lines(i)._1.trim.nonEmpty) {
          samples ++= parseSeries(lines(i)._1.trim, stepMs, lines(i)._2)
          engine = None
          i += 1
        }
      } else if (t.startsWith("eval")) {
        val (mode, rest) =
          if (t.startsWith("eval_fail ")) ("fail", t.stripPrefix("eval_fail "))
          else if (t.startsWith("eval_ordered ")) ("ordered", t.stripPrefix("eval_ordered "))
          else ("eval", t.stripPrefix("eval "))
        val m = """^instant\s+at\s+(\S+)\s+(.*)$""".r.findFirstMatchIn(rest.trim)
          .getOrElse(throw DslError(lineNo, s"cannot parse eval clause: $t"))
        val ts = Lexer.modelDuration(m.group(1))
        val query = m.group(2)
        i += 1
        val expected = Vector.newBuilder[(Map[String, String], Double)]
        while (i < lines.length && lines(i)._1.startsWith(" ") &&
          lines(i)._1.trim.nonEmpty) {
          expected += parseExpected(lines(i)._1.trim, lines(i)._2)
          i += 1
        }
        check(getEngine, query, ts, expected.result(), mode, lineNo)
      } else throw DslError(lineNo, s"unknown command: $t")
    }
  }

  private def stripComment(l: String): String = {
    val i = l.indexOf('#')
    if (i >= 0) l.substring(0, i) else l
  }

  private def parseSelector(s: String, lineNo: Int): Map[String, String] =
    s match {
      case SeriesRe(name, labels, _) =>
        val base = Option(labels).map(l =>
          LabelRe.findAllMatchIn(l).map(m =>
            m.group(1) -> unescape(m.group(2))).toMap).getOrElse(Map.empty)
        Option(name).map(n => base + (Samples.MetricNameLabel -> n)).getOrElse(base)
      case _ => throw DslError(lineNo, s"cannot parse series selector: $s")
    }

  private def unescape(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  /** `metric{l="v"} 0+10x5 _ 3` → expanded points. */
  private def parseSeries(line: String, stepMs: Long,
      lineNo: Int): Seq[(Map[String, String], Long, Double)] = line match {
    case SeriesRe(name, labelsPart, valuesPart) =>
      if (name == null && labelsPart == null)
        throw DslError(lineNo, s"cannot parse series: $line")
      val labels = parseSelector(
        Option(name).getOrElse("") + Option(labelsPart).getOrElse(""), lineNo)
      var idx = 0
      val out = Vector.newBuilder[(Map[String, String], Long, Double)]
      valuesPart.trim.split("\\s+").filter(_.nonEmpty).foreach {
        case "_" => idx += 1
        case "stale" =>
          out += ((labels, idx * stepMs, Samples.StaleNaN)); idx += 1
        case "NaN" =>
          out += ((labels, idx * stepMs, Double.NaN)); idx += 1
        case "Inf" | "+Inf" =>
          out += ((labels, idx * stepMs, Double.PositiveInfinity)); idx += 1
        case "-Inf" =>
          out += ((labels, idx * stepMs, Double.NegativeInfinity)); idx += 1
        case ExpandRe(start, null, null) =>
          out += ((labels, idx * stepMs, start.toDouble)); idx += 1
        case ExpandRe(start, delta, times) =>
          val s = start.toDouble; val d = delta.toDouble
          (0 to times.toInt).foreach { k =>
            out += ((labels, idx * stepMs, s + k * d)); idx += 1
          }
        case other => throw DslError(lineNo, s"cannot parse value spec '$other'")
      }
      out.result()
    case _ => throw DslError(lineNo, s"cannot parse series: $line")
  }

  private def parseExpected(line: String, lineNo: Int): (Map[String, String], Double) = {
    val sp = line.lastIndexOf(' ')
    if (sp < 0) throw DslError(lineNo, s"expected '<selector> <value>': $line")
    val (sel, value) = (line.substring(0, sp).trim, line.substring(sp + 1))
    val v = value match {
      case "NaN" => Double.NaN
      case "Inf" | "+Inf" => Double.PositiveInfinity
      case "-Inf" => Double.NegativeInfinity
      case x => x.toDouble
    }
    (parseSelector(sel, lineNo), v)
  }

  private def toDF(spark: SparkSession,
      samples: Seq[(Map[String, String], Long, Double)]): DataFrame = {
    val rows = samples.map { case (l, t, v) =>
      Row(l, t, v,
        java.lang.Double.doubleToRawLongBits(v) == Samples.StaleNaNBits)
    }
    val schema = StructType(Seq(
      StructField("labels", MapType(StringType, StringType), nullable = false),
      StructField("t", LongType, nullable = false),
      StructField("v", DoubleType, nullable = false),
      StructField("stale", BooleanType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  private def check(engine: PromQLEngine, query: String, ts: Long,
      expected: Seq[(Map[String, String], Double)], mode: String,
      lineNo: Int): Unit = {
    if (mode == "fail") {
      val failed =
        try { engine.instant(query, ts).collect(); false }
        catch { case _: Throwable => true }
      if (!failed) throw DslError(lineNo, s"expected query to fail: $query")
      return
    }
    val got =
      try engine.instant(query, ts).collect().toSeq.map { r =>
        (r.getMap[String, String](0).toMap, r.getLong(1), r.getDouble(2))
      } catch {
        case e: Throwable =>
          throw DslError(lineNo, s"query failed: $query — ${e.getMessage}")
      }
    if (got.size != expected.size)
      throw DslError(lineNo, s"$query: expected ${expected.size} samples, " +
        s"got ${got.size}: $got")
    if (mode == "ordered") {
      got.zip(expected).zipWithIndex.foreach { case (((gl, _, gv), (el, ev)), k) =>
        if (gl != el || !close(gv, ev))
          throw DslError(lineNo,
            s"$query: position $k expected $el=$ev, got $gl=$gv")
      }
    } else {
      val gotMap = got.map { case (l, _, v) => l -> v }.toMap
      expected.foreach { case (el, ev) =>
        gotMap.get(el) match {
          case None => throw DslError(lineNo,
            s"$query: missing series $el (got ${gotMap.keys})")
          case Some(gv) if !close(gv, ev) =>
            throw DslError(lineNo, s"$query: series $el expected $ev, got $gv")
          case _ =>
        }
      }
    }
  }

  /** Epsilon compare like the reference harness (test.go:41-43). */
  private def close(a: Double, b: Double): Boolean =
    (a.isNaN && b.isNaN) || a == b ||
      math.abs(a - b) <= 1e-6 * math.max(math.abs(a), math.abs(b))
}
