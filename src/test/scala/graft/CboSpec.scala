package graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based optimizer evidence (round-5 verdict #4 — the one Catalyst
  * surface the registry never exercised): `ANALYZE TABLE … COMPUTE
  * STATISTICS FOR COLUMNS` feeds rowCount + per-column NDV/min/max into
  * the catalog, and with CBO + join reorder enabled Catalyst re-plans a
  * badly-written join ORDER from estimated cardinalities — the stats-era
  * complement to AQE's runtime re-planning (which can only pick build
  * sides/coalesce within the order it was handed; at 100 TB the join
  * ORDER is decided before the first shuffle runs, so only stats can fix
  * it up front).
  *
  * The demonstration: a star-chain query written worst-first —
  * `lineitem ⋈ orders ⋈ customer ⋈ (σ nation)` — whose selective
  * predicate sits on the LAST, 25-row table. Syntactic order builds the
  * full fact⋈orders product first; with statistics, the reorderer starts
  * from the filtered dimension chain instead.
  */
class CboSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"
  val db = "graft_cbo"

  /** Leaf catalog-table names in join order, left-to-right. */
  private def leafOrder(plan: LogicalPlan): Seq[String] =
    plan.collectLeaves().flatMap {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.catalogTable.map(_.identifier.table)
      case r: org.apache.spark.sql.catalyst.catalog.HiveTableRelation =>
        Some(r.tableMeta.identifier.table)
      case _ => None
    }

  test("column statistics + CBO reorder the join; AQE alone keeps syntactic order") {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      Seq(
        "lineitem_t" -> Tables.lineitem(spark, sf)
          .select("l_orderkey", "l_partkey", "l_quantity"),
        "orders_t" -> Tables.orders(spark, sf)
          .select("o_orderkey", "o_custkey"),
        "customer_t" -> Tables.customer(spark, sf)
          .select("c_custkey", "c_nationkey"),
        "nation_t" -> Tables.nation(spark, sf)
          .select("n_nationkey", "n_name")
      ).foreach { case (n, df) =>
        df.write.mode("overwrite").saveAsTable(s"$db.$n")
        spark.sql(s"ANALYZE TABLE $db.$n COMPUTE STATISTICS FOR ALL COLUMNS")
      }
      // the catalog now carries rowCount AND per-column stats (read from
      // the catalog directly — plan-level stats only surface under CBO)
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("lineitem_t", Some(db)))
      assert(meta.stats.exists(_.rowCount.isDefined), "ANALYZE did not record a rowCount")
      assert(meta.stats.exists(_.colStats.nonEmpty), "ANALYZE did not record column stats")
      val q =
        s"""SELECT count(*) AS n, round(sum(l_quantity), 2) AS qty
           |FROM $db.lineitem_t l
           |JOIN $db.orders_t o ON l.l_orderkey = o.o_orderkey
           |JOIN $db.customer_t c ON o.o_custkey = c.c_custkey
           |JOIN $db.nation_t n ON c.c_nationkey = n.n_nationkey
           |WHERE n.n_name = 'FRANCE'""".stripMargin
      def planWith(cbo: Boolean): (Seq[String], org.apache.spark.sql.Row) = {
        val saved = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
          .map(k => k -> spark.conf.getOption(k))
        try {
          spark.conf.set("spark.sql.cbo.enabled", cbo.toString)
          spark.conf.set("spark.sql.cbo.joinReorder.enabled", cbo.toString)
          val df = spark.sql(q)
          (leafOrder(df.queryExecution.optimizedPlan), df.head())
        } finally saved.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None)    => spark.conf.unset(k)
        }
      }
      val (orderOff, resultOff) = planWith(cbo = false)
      val (orderOn, resultOn) = planWith(cbo = true)
      info(s"join order without CBO: ${orderOff.mkString(" ⋈ ")}")
      info(s"join order with CBO:    ${orderOn.mkString(" ⋈ ")}")
      assert(orderOff === Seq("lineitem_t", "orders_t", "customer_t", "nation_t"),
        "without stats-based reorder the syntactic (worst) order must survive")
      assert(orderOn !== orderOff,
        s"CBO did not reorder the join: ${orderOn.mkString(" ⋈ ")}")
      // the selective nation chain must move off the tail: the fact table
      // no longer anchors a fact⋈orders product as the first join
      assert(orderOn.indexOf("nation_t") < orderOn.indexOf("lineitem_t"),
        s"filtered dimension still joins after the fact table: $orderOn")
      assert(resultOn === resultOff, "reorder changed the result")
    } finally spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }
}
