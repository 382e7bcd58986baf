package graft.operators

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}

import graft.plans.TopKPerKeyPlan

/** Column-API surface for the custom per-key top-k operator (see
  * graft.plans.TopKPerKeyPlan for why it exists). The session must carry
  * GraftExtensions (which injects the planner strategy).
  */
object TopK {

  /** Exact top-k rows per key. `orderBy` is (columnName, ascending) —
    * pass a TOTAL order (include a unique tiebreak column) for
    * deterministic results. Output row set equals the window
    * `row_number <= k` formulation; output ORDER is unspecified (heaps) —
    * sort afterwards if needed.
    */
  def perKey(df: DataFrame, keys: Seq[String], orderBy: Seq[(String, Boolean)],
             k: Int): DataFrame = {
    val plan = df.queryExecution.analyzed
    def attr(name: String) = plan.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"no column '$name' in ${plan.output.map(_.name).mkString(", ")}"))
    val order = orderBy.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    GraftSqlBridge.ofRows(df.sparkSession,
      TopKPerKeyPlan(keys.map(attr), order, k, plan))
  }
}
