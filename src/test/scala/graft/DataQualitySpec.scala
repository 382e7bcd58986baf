package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DataQuality._

class DataQualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("suite evaluates in one pass and reports failures instead of throwing") {
    import spark.implicits._
    // 4 rows: one null name, duplicate key 2, value range [1, 50]
    val df = Seq((1L, Some("a"), 10.0), (2L, Some("b"), 50.0),
      (2L, None, 1.0), (3L, Some("a"), 25.0))
      .toDF("k", "name", "v")
    val rep = report(df, Seq(
      Check("complete_name", completeness(col("name")), _ === 1.0),
      Check("unique_k", uniquenessRatio(col("k")), _ === 1.0),
      Check("v_max_le_40", max(col("v")).cast("double"), _ <= 40.0),
      Check("v_min_ge_0", min(col("v")).cast("double"), _ >= 0.0),
      Check("name_in_set", inSetRatio(col("name"), Seq("a", "b")), _ === 1.0)))
    val rows = rep.collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    assert(rows.toSeq === Seq(
      ("complete_name", 0.75, false),
      ("name_in_set", 0.75, false), // the NULL name is not in-set
      ("unique_k", 0.75, false),
      ("v_max_le_40", 50.0, false),
      ("v_min_ge_0", 1.0, true)))
    // one aggregate pass: exactly one HashAggregate chain, no repeated scan
    val plan = rep.queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), s"suite fanned into repeated scans:\n$plan")
  }

  test("duplicate check names and empty suites are rejected") {
    import spark.implicits._
    val df = Seq((1L, 1.0)).toDF("k", "v")
    intercept[IllegalArgumentException](report(df, Seq.empty))
    intercept[IllegalArgumentException](report(df, Seq(
      Check("x", count(lit(1)), _ > 0), Check("x", max(col("v")), _ > 0))))
  }
}
