package graft

import org.apache.spark.sql.execution.ExplainMode

/** Whole-surface plan-smell GATE (r12, promoting `tools/PlanAudit`
  * from a manual sweep to CI): every driver entry's formatted plan
  * must contain ZERO `SortAggregate` and ZERO `CartesianProduct`
  * nodes, and `BroadcastNestedLoopJoin` only in the adjudicated
  * allowlist below. The r11 audit proved these demotions enter
  * silently — `min(struct(...))` and builtin `first(map)` both look
  * innocent at the call site and each demoted a sample-volume hash
  * aggregate to an in-partition sort of the full volume (the exact
  * shape that dies at 100×) — so the invariant lives in `sbt test`,
  * not in a tool someone must remember to run.
  *
  * The allowlist entries are all deliberate `crossJoin(broadcast(...))`
  * of a SCALAR or k-row side — a broadcast cross join IS the planned
  * shape there, and dedicated plan guards elsewhere pin the broadcast
  * (PlanShapeSpec). An entry leaving the list (op
  * rewritten without the cross join) just passes; an entry ENTERING
  * BNLJ without adjudication fails here.
  */
class PlanAuditSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** entry -> one-line justification for its BroadcastNestedLoopJoin. */
  private val bnljAllowlist: Map[String, String] = Map(
    "d7_embed_lsh" -> "recall witness: candidate pairs cross-joined with broadcast scalar truth-count",
    "d8_embed_blocked" -> "recall witness: same scalar-truth broadcast cross as d7",
    "t10_tfidf" -> "corpus-N scalar (1 row) broadcast-crossed onto term rows for idf",
    "t16_importance" -> "corpus aggregate scalar broadcast-crossed onto docs",
    "t20_lm_score" -> "global char-lm normalizer scalar broadcast-crossed onto docs",
    "t23_cooccurrence" -> "total-window scalar broadcast-crossed onto pair rows for PMI",
    "t24_source_kl" -> "per-source totals (k rows) broadcast-crossed for normalization",
    "t30_bm25" -> "corpus N + avgdl scalars (1 row) broadcast-crossed for the bm25 formula",
    "x1_sim_topk" -> "query vectors (k rows) broadcast-crossed onto the corpus scan",
    "x2_sim_ann" -> "query + recall-truth scalars broadcast-crossed",
    "x3_sim_ivf" -> "query vector crossed onto centroid table (k rows) then probed cells",
    "x5_sim_pq" -> "query + per-subspace codebooks (k rows) broadcast-crossed",
    "x8_centroid_assign" -> "k-row centroid table broadcast-crossed onto the corpus",
    "x9_kmeans_rounds" -> "k-row centroid table broadcast-crossed per Lloyd round")

  test("no driver entry plans SortAggregate, CartesianProduct, " +
      "or an unadjudicated BroadcastNestedLoopJoin") {
    val violations = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val p = fn(spark, sf).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      // the numbered detail section lists each distinct operator once
      // ("(12) SortAggregate"), reused nodes included
      def n(smell: String): Int = s"\\(\\d+\\) $smell".r.findAllIn(p).size
      val sort = n("SortAggregate")
      val cart = n("CartesianProduct")
      val bnlj = n("BroadcastNestedLoopJoin")
      if (sort > 0) violations += s"$name: SortAggregate=$sort"
      if (cart > 0) violations += s"$name: CartesianProduct=$cart"
      if (bnlj > 0 && !bnljAllowlist.contains(name))
        violations += s"$name: BroadcastNestedLoopJoin=$bnlj (not allowlisted)"
    }
    assert(violations.isEmpty,
      s"plan-smell gate:\n${violations.mkString("\n")}\n" +
        "(a SortAggregate here means an aggregation buffer went " +
        "immutable — min(struct)/first(map)/min(string) class; use the " +
        "typed aggregates in graft.exec or restructure the keys)")
  }
}
