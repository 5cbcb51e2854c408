package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.exec.PromQLEngine
import graft.storage.Ingest

/** Recording rules: precomputed PromQL results written back to the
  * store as first-class series — the standard Prometheus mechanism for
  * making expensive aggregations cheap to query. The reference engine
  * has no rule evaluator (timbala serves raw queries only), so this is
  * an extension, but its SEMANTICS follow the public Prometheus rule
  * contract:
  *
  *  - a rule is `record: <name>  expr: <promql>  labels: {...}`; rules
  *    evaluate in groups at a fixed interval, sequentially within a
  *    group, so a later rule can read an earlier rule's output;
  *  - the result keeps the expression's labels, then `__name__` is set
  *    to the record name and the rule's labels overwrite on collision;
  *  - a series that was present at the previous evaluation and absent
  *    at this one gets a STALENESS MARKER, so instant queries stop
  *    returning it immediately instead of resurrecting the last value
  *    for a full lookback window (the same marker-hides-series
  *    semantics the engine applies to scraped series,
  *    `vendor/.../promql/engine.go:789-798`, `pkg/value/value.go:20-34`
  *    — here carried by the store's `stale` flag, since raw NaN bits
  *    do not survive Tungsten).
  *
  * Spark-first shape: evaluation is EVENT-TIME driven, not wall-clock —
  * each pass evaluates exactly the interval-aligned steps the ingested
  * data has covered since the last recorded step. That makes results
  * deterministic (a replayed micro-batch recomputes identical rows and
  * the resume point, derived from the recorded data itself, skips
  * them), makes catch-up after downtime automatic, and composes with
  * [[Ingest.stream]]'s at-least-once micro-batching.
  *
  * Scale: one evaluation touches (a) the rule's query over
  * `[lo − window, hi]` — date-partition-pruned like any engine query;
  * (b) resume-point discovery over the trailing
  * `maxBackfillSteps × interval` window — date-pruned by the same
  * bound, NEVER a full-history scan; (c) an append of series × steps
  * rows. A rule added over deep history starts `maxBackfillSteps`
  * behind the newest sample rather than backfilling years (Prometheus
  * likewise starts at "now").
  */
object RecordingRules {

  /** One rule: evaluate `expr`, record the result as `record`, with
    * `labels` overlaid on the result's label sets. */
  case class Rule(record: String, expr: String,
      labels: Map[String, String] = Map.empty)

  /** An alerting rule: elements returned by `expr` are ACTIVE; an
    * element continuously active for at least `forMs` is `firing`,
    * else `pending` (the public alerting-rule contract). Each active
    * element records two series per step: `ALERTS{alertname, alertstate,
    * <element labels>, <rule labels>} = 1`, and
    * `ALERTS_FOR_STATE{alertname, ...} = activeAt` (the run's start,
    * epoch ms as a double) — the state-restore series, exactly the
    * mechanism Prometheus uses to survive restarts. */
  case class AlertRule(alert: String, expr: String, forMs: Long = 0L,
      labels: Map[String, String] = Map.empty,
      annotations: Map[String, String] = Map.empty) {
    require(forMs >= 0, "alert `for` duration must be non-negative")
  }

  /** Expand the template subset the alert annotations support:
    * `{{ $labels.<name> }}` and `{{ $value }}` (the two bindings the
    * public template contract guarantees per alert element; full Go
    * templating is out of scope and documented as such). Unknown
    * labels expand to the empty string, like a missing map key in a
    * Go template. Annotations are API-read-time strings — they are
    * never stored in the TSDB, matching Prometheus. */
  private[graft] val TemplateRe =
    """\{\{\s*\$(?:labels\.([a-zA-Z_][a-zA-Z0-9_]*)|(value))\s*\}\}""".r
  private[graft] def expandTemplate(tpl: String,
      labels: Map[String, String], value: Double): String =
    TemplateRe.replaceAllIn(tpl, m =>
      scala.util.matching.Regex.quoteReplacement(
        if (m.group(2) != null) graft.exec.PromUdfs.goFormatFloat(value)
        else labels.getOrElse(m.group(1), "")))

  /** A rule group: shared evaluation interval, sequential rule order
    * (recording rules first, then alerting rules).
    * `maxBackfillSteps` bounds how far behind the newest sample an
    * evaluation pass may reach (backfill cap AND the bound that keeps
    * resume-point discovery date-pruned). */
  case class Group(intervalMs: Long, rules: Seq[Rule],
      maxBackfillSteps: Int = 256, alerts: Seq[AlertRule] = Nil) {
    require(intervalMs > 0, "rule group interval must be positive")
    require(maxBackfillSteps > 0 && maxBackfillSteps <= 10000,
      "maxBackfillSteps must be in [1, 10000]")
  }

  /** Evaluate one rule over the aligned step grid `[startMs, endMs]`
    * and return rows in the store's canonical sample shape (labels
    * renamed, `stale` = false). Pure query — no writes. */
  def evalRule(spark: SparkSession, samples: DataFrame, rule: Rule,
      startMs: Long, endMs: Long, stepMs: Long): DataFrame =
    rename(new PromQLEngine(spark, samples)
      .rangeQuery(rule.expr, startMs, endMs, stepMs), rule)

  /** `__name__` := record; rule labels overwrite result labels (the
    * public rule-output contract). Entry order is canonicalized by the
    * store's append path, so overlay order here is free. */
  private def rename(out: DataFrame, rule: Rule): DataFrame = {
    val fixed = ("__name__" -> rule.record) +: rule.labels.toSeq
    val dropKeys = fixed.map(_._1)
    val overlay = map(fixed.flatMap {
      case (k, v) => Seq(lit(k), lit(v)) }: _*)
    out.withColumn("labels", map_concat(
      graft.functions.FilterLabels.drop(col("labels"), dropKeys),
      overlay))
  }

  /** One evaluation pass of a group against the date-partitioned store
    * at `path`: for each rule in order, evaluate every interval-aligned
    * step in `(last recorded step, floor(max sample time))`, write the
    * renamed results plus staleness markers for series that
    * disappeared, and append to the SAME store — recorded series are
    * immediately queryable (and visible to the group's later rules).
    *
    * `knownMaxT` lets the streaming path pass the micro-batch's own
    * maximum event time instead of scanning the store for it. */
  def evalGroup(spark: SparkSession, path: String, group: Group,
      knownMaxT: Option[Long] = None): Unit = {
    val step = group.intervalMs
    val maxT = knownMaxT.orElse {
      val r = Ingest.readTable(spark, path).agg(max(col("t"))).head()
      if (r.isNullAt(0)) None else Some(r.getLong(0))
    }
    maxT.foreach { mt =>
      val hi = Math.floorDiv(mt, step) * step
      // everything this pass RECORDS lies in the trailing window —
      // including the previous-step row staleness detection reads
      val windowLo = hi - step * group.maxBackfillSteps.toLong
      // re-read per rule: earlier rules' output must be visible
      def recentFrom(bound: Long) = Ingest.readTable(spark, path)
        .filter(col("t") >= bound)
      // The frame the rule's QUERY evaluates over must reach further
      // back than the evaluation grid by the expression's own history
      // reach (range windows + offsets + the instant lookback,
      // `Ast.maxLookbackMs`): evaluating `x[1d]` at the first backfill
      // steps over a frame truncated at windowLo would silently record
      // undercounts that the advancing resume point then makes
      // permanent. Resume/staleness discovery stays bounded at
      // windowLo; only the eval input widens, by the rule's own
      // window — both remain date-pruned.
      def lookOf(expr: String): Long = graft.promql.Ast.maxLookbackMs(
        graft.promql.Parser.parse(expr), PromQLEngine.DefaultLookbackMs)
      group.rules.foreach(rule =>
        evalRuleIncremental(spark, path, recentFrom(windowLo),
          recentFrom(windowLo - lookOf(rule.expr)), rule, hi, step))
      group.alerts.foreach(a =>
        evalAlertIncremental(spark, path, recentFrom(windowLo),
          recentFrom(windowLo - lookOf(a.expr)), a, hi, step))
    }
  }

  private def nameIs(record: String): Column =
    col("labels")("__name__") === record

  /** Resume point: after the newest row matching `recorded` (markers
    * included — a marker IS an evaluation result); first evaluation
    * starts at the first aligned step the window's data covers. None =
    * nothing to evaluate. */
  private def resumeLo(recent: DataFrame, recorded: Column,
      step: Long): Option[Long] = {
    val b = recent.agg(
      max(when(recorded, col("t"))).as("rec"),
      min(col("t")).as("mn")).head()
    if (b.isNullAt(1)) None
    else if (!b.isNullAt(0)) Some(b.getLong(0) + step)
    else Some(Math.floorDiv(b.getLong(1) + step - 1, step) * step) // ceil
  }

  /** Append `out` (canonical (labels, t, v) rows for steps [lo, hi])
    * plus staleness markers: a series matching `owned` present at step
    * s-1 (recorded or in `out`) and absent at s gets a marker at s.
    * One marker, no cascade — markers never count as "present".
    * Disappearance at `hi` itself is detected by the NEXT pass, whose
    * grid starts at hi + step.
    *
    * Series identity for the anti-join is the entry-sorted entries
    * array — `sort_array` (natural struct ordering), NOT
    * `Samples.sigExpr`: lambda-bearing expressions (array_sort with a
    * comparator, transform) are UNSAFE as join keys. NamedLambdaVariable
    * carries per-instance mutable state, join-key evaluation contexts
    * (HashedRelationBroadcastMode build vs probe-side tasks) can share
    * one instance across threads in local mode, and the race bakes a
    * wrong key into the broadcast relation — observed here as an
    * intermittent phantom marker that append-dedup then collapsed
    * with the real row into a stale one. Materialized sig COLUMNS
    * (what the engine joins on everywhere) are unaffected. */
  private def recordWithMarkers(path: String, recent: DataFrame,
      owned: Column, out: DataFrame, lo: Long, hi: Long,
      step: Long): Unit = {
    val presentPrev = recent
      .filter(owned && col("t") === lo - step && !col("stale"))
      .select(col("labels"), col("t"))
      .union(out.select(col("labels"), col("t")))
      .withColumn("t", col("t") + step)
      .filter(col("t") <= hi)
    val markers = presentPrev
      .join(
        out.select(sort_array(map_entries(col("labels"))).as("_ce"),
          col("t").as("_ct")),
        sort_array(map_entries(col("labels"))) === col("_ce") &&
          col("t") === col("_ct"),
        "left_anti")
      .select(col("labels"), col("t"),
        lit(Double.NaN).as("v"), lit(true).as("stale"))
    Ingest.append(
      out.withColumn("stale", lit(false)).unionByName(markers), path)
  }

  private def evalRuleIncremental(spark: SparkSession, path: String,
      recent: DataFrame, evalFrame: DataFrame, rule: Rule, hi: Long,
      step: Long): Unit =
    resumeLo(recent, nameIs(rule.record), step)
      .filter(_ <= hi).foreach { lo =>
        val out = evalRule(spark, evalFrame, rule, lo, hi, step)
          .localCheckpoint(true) // evaluated once: reused as past-step state
        recordWithMarkers(path, recent, nameIs(rule.record), out, lo, hi, step)
      }

  private val Alerts = "ALERTS"
  private val ForState = "ALERTS_FOR_STATE"

  /** One incremental alerting pass. State (how long has this element
    * been continuously active) is reconstructed SET-AT-ONCE, not by a
    * per-step loop: `expr` evaluates over the whole [lo, hi] grid in
    * one range query, a gaps-and-islands window over each element's
    * active steps finds the start of the current run, and the
    * `ALERTS_FOR_STATE` row at lo − step seeds runs that began before
    * this pass — so a restart (or a months-long catch-up) replays the
    * state machine in one distributed plan. */
  private def evalAlertIncremental(spark: SparkSession, path: String,
      recent: DataFrame, evalFrame: DataFrame, a: AlertRule, hi: Long,
      step: Long): Unit = {
    val owned = (nameIs(Alerts) || nameIs(ForState)) &&
      col("labels")("alertname") === a.alert
    resumeLo(recent, owned, step).filter(_ <= hi).foreach { lo =>
      // active elements per step, keyed by the alert identity: element
      // labels minus __name__/alertstate, plus alertname + rule labels
      val fixed = ("alertname" -> a.alert) +: a.labels.toSeq
      val dropKeys = "__name__" +: "alertstate" +: fixed.map(_._1)
      val overlay = map(fixed.flatMap {
        case (k, v) => Seq(lit(k), lit(v)) }: _*)
      val base = new PromQLEngine(spark, evalFrame)
        .rangeQuery(a.expr, lo, hi, step)
        .withColumn("labels", map_concat(
          graft.functions.FilterLabels.drop(col("labels"), dropKeys),
          overlay))
        .select(col("labels"), col("t"),
          lit(null).cast("double").as("_seedAt"))
      val seed = recent
        .filter(nameIs(ForState) && col("labels")("alertname") === a.alert &&
          col("t") === lo - step && !col("stale"))
        .select(graft.functions.FilterLabels.drop(col("labels"),
            Seq("__name__")).as("labels"),
          col("t"), col("v").as("_seedAt"))
      // gaps-and-islands: consecutive active steps share
      // step-index − row-number; activeAt = run minimum (a seed row
      // contributes the activeAt it recorded, chaining runs across
      // passes). Identity key is the lambda-free entries array (see
      // recordWithMarkers on why not sigExpr).
      val byEnts = Window.partitionBy(col("_ents")).orderBy(col("t"))
      val runs = base.unionByName(seed)
        .withColumn("_ents", sort_array(map_entries(col("labels"))))
        .withColumn("_run",
          (col("t") / lit(step)).cast("long") - row_number().over(byEnts))
        .withColumn("activeAt",
          min(coalesce(col("_seedAt"), col("t").cast("double")))
            .over(Window.partitionBy(col("_ents"), col("_run"))))
        .filter(col("t") >= lo) // drop the seed echo
      val forState = runs.select(
        map_concat(col("labels"),
          map(lit("__name__"), lit(ForState))).as("labels"),
        col("t"), col("activeAt").as("v"))
      val alerts = runs.select(
        map_concat(col("labels"), map(
          lit("__name__"), lit(Alerts),
          lit("alertstate"),
          when(col("t") - col("activeAt") >= a.forMs, "firing")
            .otherwise("pending"))).as("labels"),
        col("t"), lit(1.0).as("v"))
      val out = forState.unionByName(alerts).localCheckpoint(true)
      recordWithMarkers(path, recent, owned, out, lo, hi, step)
    }
  }

  /** Streaming ingest with rule evaluation: each micro-batch is
    * appended through the standard ingest path, then the group
    * evaluates the newly covered steps. Sharing the batch boundary
    * means recorded series lag raw data by at most one trigger — the
    * streaming twin of Prometheus's evaluation loop. Replay-safe end
    * to end: raw rows go through [[Ingest.appendOnce]]'s batch-id
    * commit markers, and rule output is naturally idempotent because
    * the resume point is derived from the recorded data. */
  def stream(edge: Dataset[Ingest.WriteSample], path: String,
      checkpoint: String, group: Group): StreamingQuery =
    Ingest.canonicalize(edge).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val bMax = batch.agg(max(col("t"))).head()
        Ingest.appendOnce(batch, path, checkpoint, id)
        if (!bMax.isNullAt(0))
          evalGroup(spark, path, group, Some(bMax.getLong(0)))
      }
      .start()
}
