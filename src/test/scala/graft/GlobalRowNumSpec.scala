package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GlobalRowNum

/** Scalable contiguous global row numbering: the two-pass offset scheme
  * must equal the single-partition `row_number() OVER (ORDER BY …)` while
  * its plan contains NO single-partition exchange and NO window operator.
  */
class GlobalRowNumSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  lazy val spark = SparkTestSession.spark

  private def sample = {
    import spark.implicits._
    // non-unique primary key (v) forces the tiebreak column to matter
    (0L until 5000L).map(i => (i, (i * 37) % 250)).toDF("id", "v")
      .repartition(16)
  }

  test("matches the single-partition window formulation exactly") {
    import spark.implicits._
    val two = GlobalRowNum.withRowNumber(sample, Seq(col("v"), col("id")), 8)
      .select("id", "rn").as[(Long, Long)].collect().toMap
    val win = sample
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("v"), col("id"))))
      .select("id", "rn").as[(Long, Int)].collect().toMap
    assert(two.size === 5000)
    assert(two === win.map { case (k, v) => k -> v.toLong })
  }

  test("numbering is contiguous from 1 and follows the sort order") {
    import spark.implicits._
    val rows = GlobalRowNum.withRowNumber(sample, Seq(col("v"), col("id")), 8)
      .select("v", "id", "rn").as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(rows.map(_._3).toSeq === (1L to 5000L))
    // rn order must agree with (v, id) lexicographic order
    assert(rows.map(r => (r._1, r._2)).toSeq === rows.map(r => (r._1, r._2)).sortBy(identity).toSeq)
  }

  test("plan has no single-partition exchange and no window operator") {
    val df = GlobalRowNum.withRowNumber(sample, Seq(col("v"), col("id")), 8)
    val plan = df.queryExecution.executedPlan
    val singleParts = collect(plan) {
      case e: ShuffleExchangeExec if e.outputPartitioning.numPartitions == 1 => e
    }
    val windows = collect(plan) { case w: WindowExec => w }
    assert(singleParts.isEmpty, "global numbering must not funnel rows through one partition")
    assert(windows.isEmpty, "global numbering must not be a window in disguise")
    // while here: the counting pass really is metadata-sized
    val parts = df.rdd.getNumPartitions
    assert(parts === 8)
  }

  test("empty input numbers nothing and does not throw") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
    assert(GlobalRowNum.withRowNumber(empty, Seq(col("v")), 4).count() === 0)
  }
}
