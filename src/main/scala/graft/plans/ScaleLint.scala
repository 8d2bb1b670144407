package graft.plans

import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST, Expand, GlobalLimit, HintInfo, Join, LocalLimit, LogicalPlan, Sample, Window}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

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
  *     the post-rewrite Expand, recognized by the `gid` attribute the
  *     rewrite PRODUCES so rollup/cube/grouping-sets Expands
  *     (`spark_grouping_id`) and pass-through user columns named gid
  *     never false-positive. Fix: one distinct agg per column, tiny
  *     results broadcast-joined back (q11/q25/p01's shape);
  *   - a broadcast HINT on a side derived from an UNCAPPED corpus-table
  *     scan — Spark obeys explicit hints regardless of size, so a frame
  *     that grows with the corpus rides into every executor (and through
  *     the driver) at 100 TB. Capped shapes (limit, aggregate,
  *     hash-threshold sample) pass; the raw scan flags.
  *
  * Findings are logged and recorded in [[ScaleLint.findings]] so tests
  * (and interactive users) can inspect them; each (plan, message) pair is
  * recorded once per session even though the optimizer re-runs the rule
  * every fixed-point iteration. Injected by [[graft.GraftExtensions]]; or
  * add to an existing session via `spark.experimental.extraOptimizations`.
  */
object ScaleLint extends Rule[LogicalPlan] with Logging
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

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

  /** Recorded waivers: registry queries whose flagged shape is
    * DELIBERATE and whose blast radius is documented. A waived query
    * must still trip the lint (the sweep asserts it does, so a waiver
    * can't outlive the hazard it excuses) and must never run on a full
    * corpus — these are the exact-baseline legs that exist to audit the
    * bucketed operators (s12 consumes s01-style exact search on a
    * LIMIT-capped 64-query batch, which is the production pattern).
    */
  val waivers: Map[String, String] = Map(
    "s01_cosine_knn" ->
      "exact O(n^2) cosine top-k baseline; audit-scale only - the scale path is s03/s06/s07/s09, and the capped production shape is s12's limit-bounded query batch",
    "s02_cosine_neardup" ->
      "exact O(n^2) threshold-pair baseline; audit-scale only - the scale path is s05's bucketed LSH threshold join")

  private def record(node: LogicalPlan, kind: Int, msg: String): Unit =
    recordKeyed(node.semanticHash(), kind, msg)

  private def recordKeyed(key: Int, kind: Int, msg: String): Unit = {
    if (seen.size() > MaxSeen) seen.clear()
    if (seen.add((key, kind))) {
      logWarning(s"[graft-scale-lint] $msg")
      findings.add(msg)
      while (findings.size() > MaxFindings) findings.poll()
    }
  }

  /** Hash/sort-merge partitioning needs at least one conjunct equating
    * an expression over the left side with one over the right — the same
    * test ExtractEquiJoinKeys applies before Spark falls back to
    * nested-loop/cartesian strategies.
    */
  private def hasEquiKeys(j: Join): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, Expression}
    def sidesSplit(l: Expression, r: Expression): Boolean =
      (l.references.subsetOf(j.left.outputSet) && r.references.subsetOf(j.right.outputSet)) ||
        (l.references.subsetOf(j.right.outputSet) && r.references.subsetOf(j.left.outputSet))
    j.condition.exists(splitConjunctivePredicates(_).exists {
      case EqualTo(l, r)       => sidesSplit(l, r)
      case EqualNullSafe(l, r) => sidesSplit(l, r)
      case _                   => false
    })
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

  /** Tables whose row count grows with the corpus (the TPC-H facts plus
    * the training-data tables). nation/region are genuinely constant and
    * part/customer/supplier are conventional broadcast dims; everything
    * here is the 100 TB side of the schema.
    */
  private val corpusTables =
    Seq("lineitem", "orders", "events", "documents", "embeddings")

  private def scansCorpusTable(p: LogicalPlan): Boolean =
    p.collectLeaves().exists { l =>
      // a LogicalRelation's default string carries only the schema — the
      // table identity lives in the file location; cached frames carry it
      // in the cached physical plan's scan node
      val s = (l match {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.mkString(",")
            case r => r.toString
          }
        case im: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
          im.cachedPlan.toString
        case other => other.toString
      }).toLowerCase(java.util.Locale.ROOT)
      corpusTables.exists(s.contains)
    }

  /** A corpus-derived subtree is "capped" when something between the scan
    * and the broadcast bounds its size: a limit, a sample, an aggregate
    * (the group-to-small-result pattern — q33/t09/s04; an empty grouping
    * collapses to one row, SemDedup's broadcast array), or the library's
    * deterministic md5-hash-threshold sample filter (SemDedup/s07's
    * fixed-fraction selection). Heuristic, not proof: an aggregate
    * grouped on a corpus-cardinality key would still slip through — the
    * advisory's job is catching the RAW uncapped scan, the shape that
    * melts first.
    */
  private def capped(p: LogicalPlan): Boolean =
    p.exists {
      case _: GlobalLimit | _: LocalLimit | _: Sample | _: Aggregate => true
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.toString.contains("md5")
      // a persisted frame substitutes as an opaque InMemoryRelation leaf;
      // look through to its cached PHYSICAL plan for the same cap shapes
      // (q25's per-group band aggregate and s07's global stats both
      // persist — the Aggregate that bounds them lives inside the cache)
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        val s = r.cachedPlan.toString
        s.contains("Aggregate") || s.contains("Limit") ||
          s.contains("TakeOrderedAndProject") || s.contains("Sample") ||
          s.contains("md5")
      case _ => false
    }

  private def checkBroadcastSide(j: Join, side: LogicalPlan,
                                 hint: Option[HintInfo], which: String): Unit =
    if (hint.exists(_.strategy.contains(BROADCAST)) &&
        scansCorpusTable(side) && !capped(side))
      record(j, 4,
        s"broadcast-hinted $which side derives from an UNCAPPED corpus-table scan: " +
        "the broadcast grows with the corpus and melts the driver/executors at " +
        "100 TB - bound it (limit, aggregate, hash-threshold sample; see s07's " +
        "limit-bounded query batch) or drop the hint and let it shuffle")

  /** A frame whose row count is LIMIT-capped somewhere below: a window
    * (or any single-task construct) over it is constant-size work at any
    * corpus scale, so kind 1 stays silent. Deliberately STRICTER than
    * [[capped]]: an Aggregate does NOT qualify (a global window over
    * word counts is exactly the one-task hazard kind 1 exists to catch —
    * group cardinality grows with the corpus), only an explicit limit
    * (t18's top-50 rank/cum-sum frame, TakeOrdered shapes) does.
    */
  private def limitBounded(p: LogicalPlan): Boolean =
    p.exists {
      case _: GlobalLimit | _: LocalLimit => true
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        val s = r.cachedPlan.toString
        s.contains("TakeOrderedAndProject") || s.contains("Limit")
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.foreach {
      case w: Window if w.partitionSpec.isEmpty && !limitBounded(w.child) =>
        record(w, 1,
          "window with no PARTITION BY: all rows flow through one task at scale " +
          "- consider the two-pass global-order plan (graft.plans.GlobalOrder)")
      case j: Join =>
        if (j.condition.isEmpty &&
            (j.joinType == Cross || j.joinType == Inner)) {
          if (!broadcastable(j.left, j.hint.leftHint) &&
              !broadcastable(j.right, j.hint.rightHint))
            record(j, 2,
              "join with no condition (cartesian product): O(n^2) pairs at scale " +
              "- consider bucketed candidate generation (LSH/IVF ops) or a broadcast-size side")
        }
        // kind 5: corpus x corpus cartesian. A crossJoin().filter(...)
        // optimizes into a Join WITH a condition, but without an
        // equi-key Spark can only plan nested-loop/cartesian — and the
        // broadcast-size exemption of kind 2 is a TEST-SCALE fiction
        // when both sides derive from uncapped corpus-table scans: at
        // 100 TB neither side broadcasts and the product is O(n^2).
        // Deliberate exact baselines carry a recorded [[waivers]] entry.
        if ((j.joinType == Cross || j.joinType == Inner) &&
            !hasEquiKeys(j) &&
            scansCorpusTable(j.left) && !capped(j.left) &&
            scansCorpusTable(j.right) && !capped(j.right))
          record(j, 5,
            "corpus x corpus cartesian: an equi-key-less join whose sides both derive " +
            "from uncapped corpus-table scans - broadcast-size at test scale grows into " +
            "an O(n^2) product at 100 TB; audit-scale only (requires a ScaleLint.waivers " +
            "entry; scale paths: s03/s05/s06 bucketed candidates, s12's capped query batch)")
        checkBroadcastSide(j, j.left, j.hint.leftHint, "left")
        checkBroadcastSide(j, j.right, j.hint.rightHint, "right")
      // kind 3 is keyed on (CHILD semantic hash, projection count): the
      // pre-rewrite Aggregate and the post-rewrite Expand are different
      // nodes over the SAME child, and a node-keyed dedup would report
      // one hazard twice when the rule sees both shapes in one query —
      // while a child-only key would silently merge two DIFFERENT
      // multi-distinct aggregates sharing one scan. The rewrite plans
      // 1 + #distinct-groups Expand projections, so both shapes derive
      // the same composite key (best-effort: an all-distinct agg with no
      // regular aggregate may differ by one and record twice — advisory,
      // so over-reporting beats under-reporting)
      case a: Aggregate if distinctGroups(a) > 1 =>
        recordKeyed(a.child.semanticHash() * 31 + (1 + distinctGroups(a)), 3, multiDistinctMsg)
      // the distinct-rewrite Expand is recognized by the `gid` attribute
      // it PRODUCES: an IntegerType output attribute absent from the
      // child's output — a user column named gid riding through an
      // unpivot/melt Expand (SemDedup's coarse group id makes that name
      // live) is pass-through child output and never matches;
      // rollup/cube/grouping-sets Expands carry spark_grouping_id and
      // are exempted explicitly
      case e: Expand if e.output.exists(a =>
            a.name == "gid" && a.dataType == IntegerType &&
              !e.child.outputSet.contains(a)) &&
          !e.output.exists(_.name == "spark_grouping_id") =>
        recordKeyed(e.child.semanticHash() * 31 + e.projections.size, 3, multiDistinctMsg)
      case _ => ()
    }
    plan // advisory: never rewrites
  }
}
