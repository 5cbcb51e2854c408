package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{ArrayDot, StopwordHits, WordShingles}

/** Library entry point for Spark's extension mechanism: a user adds
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) and every session
  * gets the engine's Catalyst additions without touching graft code —
  *  - [[graft.plans.IntDivPushdown]]: rewrites `t = ts DIV 1e6`
  *    comparisons into raw-nanos bounds so time predicates reach
  *    parquet row groups through the epoch-nanos adapter;
  *  - `word_shingles(text, n[, distinct])` in SQL, the native
  *    [[graft.functions.WordShingles]] expression.
  *
  * `PromQLEngine` installs the rule itself when constructed directly,
  * so the extension is optional for the programmatic path; it exists
  * for pure-SQL consumers (thrift server, notebooks, spark-submit
  * with --conf) where no graft object is ever instantiated.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.IntDivPushdown)
    ext.injectFunction(GraftExtensions.wordShinglesFunction)
    ext.injectFunction(GraftExtensions.arrayDotFunction)
    ext.injectFunction(GraftExtensions.stopwordHitsFunction)
  }
}

object GraftExtensions {
  /** `word_shingles(text, n[, distinct=true])` — the SQL surface of
    * [[WordShingles]]. n and distinct must be literals (they are
    * plan-time parameters of the expression, not per-row inputs). */
  val wordShinglesFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("word_shingles"),
    new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
    (args: Seq[Expression]) => {
      if (args.size < 2 || args.size > 3)
        throw new IllegalArgumentException(
          "word_shingles(text, n[, distinct]) takes 2 or 3 arguments")
      val n = args(1) match {
        case Literal(i: Int, _) => i
        case Literal(l: Long, _) => l.toInt
        case other => throw new IllegalArgumentException(
          s"word_shingles: n must be an integer literal, got $other")
      }
      val distinct = if (args.size < 3) true else args(2) match {
        case Literal(b: Boolean, _) => b
        case other => throw new IllegalArgumentException(
          s"word_shingles: distinct must be a boolean literal, got $other")
      }
      WordShingles(args.head, n, distinct)
    }
  )

  /** `array_dot(a, b)` — ascending-index dot product of two
    * array<double> columns ([[ArrayDot]]). */
  val arrayDotFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("array_dot"),
    new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
    (args: Seq[Expression]) => {
      if (args.size != 2)
        throw new IllegalArgumentException("array_dot(a, b) takes 2 arguments")
      ArrayDot(args(0), args(1))
    }
  )

  /** `stopword_hits(text, array('the','a',...), array('der',...), ...)`
    * — the SQL surface of [[StopwordHits]]: per-profile hit counts as
    * one array<int>, one profile per foldable array<string> argument
    * (plan-time parameters of the expression, not per-row inputs). */
  val stopwordHitsFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("stopword_hits"),
    new ExpressionInfo(classOf[StopwordHits].getName, "stopword_hits"),
    (args: Seq[Expression]) => {
      if (args.size < 2)
        throw new IllegalArgumentException(
          "stopword_hits(text, profile...) takes a text column plus >=1 profile")
      val profiles = args.tail.map { e =>
        if (!e.foldable) throw new IllegalArgumentException(
          s"stopword_hits: profiles must be array<string> literals, got $e")
        e.eval() match {
          case a: org.apache.spark.sql.catalyst.util.ArrayData =>
            a.toObjectArray(org.apache.spark.sql.types.StringType)
              .map(_.toString).toSeq
          case other => throw new IllegalArgumentException(
            s"stopword_hits: profiles must be array<string> literals, got $other")
        }
      }
      StopwordHits(args.head, profiles)
    }
  )
}
