package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Physical-plan inspection that cannot pass vacuously. TreeNode.collect /
  * collectLeaves DO NOT descend into AdaptiveSparkPlanExec (it is a
  * leaf-shaped wrapper holding the real executed plan in a field), so a
  * numFiles pin written as `executedPlan.collectLeaves().flatMap(metrics)`
  * on an AQE-wrapped join plan sums an EMPTY sequence — `0 < total` then
  * passes without measuring anything (a latent false pin this helper
  * replaced, round 11).
  */
object PlanTestUtil {

  /** Every physical node of an executed plan, descending through the
    * adaptive wrappers.
    */
  def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case o => o.children
    }
    p +: inner.flatMap(allNodes)
  }

  /** Total parquet files the executed plan's file scans planned. None when
    * the plan holds NO file scan at all — callers must .get, so a pruning
    * pin can never silently pass on an unexpectedly opaque plan.
    */
  def scannedFiles(df: DataFrame): Option[Long] = {
    val scans = allNodes(df.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    if (scans.isEmpty) None
    else Some(scans.flatMap(_.metrics.get("numFiles").map(_.value)).sum)
  }
}
