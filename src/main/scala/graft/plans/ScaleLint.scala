package graft.plans

import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Window}
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
  *     (the s02 hazard; use bucketed candidates, s05/s06).
  *
  * Findings are logged and recorded in [[ScaleLint.findings]] so tests
  * (and interactive users) can inspect them. Injected by
  * [[graft.GraftExtensions]]; or add to an existing session via
  * `spark.experimental.extraOptimizations`.
  */
object ScaleLint extends Rule[LogicalPlan] with Logging {

  /** Recent findings (bounded; advisory only — never cleared by the rule
    * itself, callers may clear between inspections).
    */
  val findings = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val MaxFindings = 256

  private def record(msg: String): Unit = {
    logWarning(s"[graft-scale-lint] $msg")
    findings.add(msg)
    while (findings.size() > MaxFindings) findings.poll()
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.foreach {
      case w: Window if w.partitionSpec.isEmpty =>
        record("window with no PARTITION BY: all rows flow through one task at scale " +
          "- consider the two-pass global-order plan (graft.plans.GlobalOrder)")
      case j: Join if j.condition.isEmpty &&
          (j.joinType == Cross || j.joinType == Inner) =>
        record("join with no condition (cartesian product): O(n^2) pairs at scale " +
          "- consider bucketed candidate generation (LSH/IVF ops) or a broadcast-size side")
      case _ => ()
    }
    plan // advisory: never rewrites
  }
}
