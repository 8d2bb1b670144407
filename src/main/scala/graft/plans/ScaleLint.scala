package graft.plans

import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST, Expand, HintInfo, Join, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.rules.Rule

/** Advisory optimizer rule: flags plan shapes that are correct at test
  * scale but melt at 100 TB, without changing the plan. The two classic
  * foot-guns it catches are exactly the ones this library had to design
  * around (docs/SCALE.md):
  *
  *   - a window function with NO partition spec — every row flows
  *     through one task (the q20 hazard; use plans/GlobalOrder);
  *   - a join with no condition — an all-pairs cartesian/cross product
  *     (the s02 hazard; use bucketed candidates, s05/s06) — UNLESS one
  *     side is broadcast-hinted or below the auto-broadcast threshold,
  *     in which case the product is a deliberate small-side broadcast
  *     (s01's plane tables, s06's centroids) and not a hazard;
  *   - multiple DISTINCT aggregates over DIFFERENT columns in one
  *     Aggregate — Catalyst rewrites it with an Expand that multiplies
  *     every input row (1 + #distinct-groups)× through every aggregate
  *     buffer (the round-6 p01 hazard: 5× write amplification on the
  *     profiling scan). Caught in both shapes: the pre-rewrite Aggregate
  *     (when this rule runs among the operator-optimization rules) and
  *     the post-rewrite Expand, recognized by its `gid` attribute so
  *     rollup/cube/grouping-sets Expands (`spark_grouping_id`) never
  *     false-positive. Fix: one distinct agg per column, tiny results
  *     broadcast-joined back (q11/q25/p01's shape).
  *
  * Findings are logged and recorded in [[ScaleLint.findings]] so tests
  * (and interactive users) can inspect them; each (plan, message) pair is
  * recorded once per session even though the optimizer re-runs the rule
  * every fixed-point iteration. Injected by [[graft.GraftExtensions]]; or
  * add to an existing session via `spark.experimental.extraOptimizations`.
  */
object ScaleLint extends Rule[LogicalPlan] with Logging {

  /** Recent findings (bounded; advisory only — never cleared by the rule
    * itself, callers may clear between inspections).
    */
  val findings = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val MaxFindings = 256

  // one record per (node semanticHash, finding kind): the optimizer runs
  // rules to a fixed point, so the same node revisits this rule several
  // times per query — without the key set every iteration would re-log.
  private val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[(Int, Int)]()
  private val MaxSeen = 8192

  /** Clear findings AND the per-node dedup memory (tests). */
  def reset(): Unit = { findings.clear(); seen.clear() }

  private def record(node: LogicalPlan, kind: Int, msg: String): Unit = {
    if (seen.size() > MaxSeen) seen.clear()
    if (seen.add((node.semanticHash(), kind))) {
      logWarning(s"[graft-scale-lint] $msg")
      findings.add(msg)
      while (findings.size() > MaxFindings) findings.poll()
    }
  }

  /** A condition-less join side that will be broadcast is fine: the pairs
    * are generated streaming against an in-memory small table, never
    * materialized as a shuffle.
    */
  private def broadcastable(side: LogicalPlan, hint: Option[HintInfo]): Boolean =
    hint.exists(_.strategy.contains(BROADCAST)) || {
      val threshold = conf.autoBroadcastJoinThreshold
      threshold > 0 && side.stats.sizeInBytes <= threshold
    }

  private val multiDistinctMsg =
    "multiple DISTINCT aggregates over different columns in one aggregate: " +
    "Catalyst Expands every input row (1 + #distinct-groups)x through every " +
    "aggregate buffer - split into one distinct agg per column and " +
    "broadcast-join the small results back (see q11/q25/p01)"

  /** Number of distinct-aggregate argument groups in one Aggregate — the
    * same grouping RewriteDistinctAggregates uses: the CANONICALIZED
    * non-foldable children (so countDistinct(a+b) and countDistinct(b+a)
    * share a group, as Catalyst's semantic grouping does), falling back
    * to the first child when every child is foldable (all-literal
    * distincts still each form a group in the rewrite). > 1 means
    * Catalyst will plan the Expand.
    */
  private def distinctGroups(a: Aggregate): Int =
    a.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression if ae.isDistinct =>
        val unfoldable = ae.aggregateFunction.children.filterNot(_.foldable)
        (if (unfoldable.isEmpty) ae.aggregateFunction.children.take(1) else unfoldable)
          .map(_.canonicalized).toSet
    }).distinct.size

  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.foreach {
      case w: Window if w.partitionSpec.isEmpty =>
        record(w, 1,
          "window with no PARTITION BY: all rows flow through one task at scale " +
          "- consider the two-pass global-order plan (graft.plans.GlobalOrder)")
      case j: Join if j.condition.isEmpty &&
          (j.joinType == Cross || j.joinType == Inner) &&
          !broadcastable(j.left, j.hint.leftHint) &&
          !broadcastable(j.right, j.hint.rightHint) =>
        record(j, 2,
          "join with no condition (cartesian product): O(n^2) pairs at scale " +
          "- consider bucketed candidate generation (LSH/IVF ops) or a broadcast-size side")
      case a: Aggregate if distinctGroups(a) > 1 =>
        record(a, 3, multiDistinctMsg)
      // the distinct-rewrite Expand is recognized by its `gid` attribute;
      // rollup/cube/grouping-sets Expands always carry spark_grouping_id,
      // so their presence exempts the node even when a USER column named
      // gid rides through (SemDedup's coarse group id makes that name
      // live in this codebase)
      case e: Expand if e.output.exists(_.name == "gid") &&
          !e.output.exists(_.name == "spark_grouping_id") =>
        record(e, 3, multiDistinctMsg)
      case _ => ()
    }
    plan // advisory: never rewrites
  }
}
