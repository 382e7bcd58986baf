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

  test("pass predicates gate on the RAW metric; rounding is display-only") {
    import spark.implicits._
    // a 1-in-10M miss: raw 0.9999999 rounds to 1.0 for display but MUST
    // fail an exactness gate — gating on the rounded value is how
    // incomplete data gets published
    val df = Seq(1).toDF("x")
    val rows = report(df, Seq(
      Check("near_one", max(lit(0.9999999)), _ === 1.0)))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    assert(rows.toSeq === Seq(("near_one", 1.0, false)))
  }

  test("streaming gate: per-trigger report equals the batch report over that trigger's rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val checks = Seq(
      Check("complete_name", completeness(col("name")), _ === 1.0),
      Check("v_max_le_40", max(col("v")).cast("double"), _ <= 40.0))
    val input = MemoryStream[(Long, Option[String], Double)]
    val reports = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Double, Boolean)]
    val q = graft.streaming.Streaming.dqGate(
      input.toDF().toDF("k", "name", "v"), checks) { (rep, bid) =>
      reports ++= rep.collect().map(r =>
        (r.getAs[Long]("batch_id"), r.getString(0), r.getDouble(1), r.getBoolean(2)))
    }
    try {
      // trigger 1: clean rows — both checks pass
      input.addData((1L, Some("a"), 10.0), (2L, Some("b"), 40.0))
      q.processAllAvailable()
      // trigger 2: a null name and an out-of-range value — both fail
      input.addData((3L, None, 99.0), (4L, Some("c"), 5.0))
      q.processAllAvailable()
      assert(reports.toSet === Set(
        (0L, "complete_name", 1.0, true), (0L, "v_max_le_40", 40.0, true),
        (1L, "complete_name", 0.5, false), (1L, "v_max_le_40", 99.0, false)))
    } finally q.stop()
  }

  test("PSI drift: near-zero on identical populations, fires on a shifted one, smoothing kills ln(0)") {
    import spark.implicits._
    // baseline: uniform over [0, 100); shifted: mass moved to [60, 160)
    val base = (0 until 1000).map(i => (i.toLong, (i % 100).toDouble)).toDF("id", "v")
    val same = (0 until 1000).map(i => (i.toLong, ((i * 7) % 100).toDouble)).toDF("id", "v")
    val shifted = (0 until 1000).map(i => (i.toLong, 60.0 + (i % 100))).toDF("id", "v")
    def psiOf(cur: org.apache.spark.sql.DataFrame) =
      graft.operators.DataQuality.psiDrift(base, cur, col("v"), 10, 20.0)
    val calm = psiOf(same).collect()
    assert(calm.forall(r => r.getDouble(6) < 0.01),
      s"identical populations reported drift: ${calm.head.getDouble(6)}")
    val hot = psiOf(shifted).collect()
    assert(hot.head.getDouble(6) > 0.25,
      s"significant shift not detected: ${hot.head.getDouble(6)}")
    // bins 0-2 are EMPTY on the shifted side: smoothing must keep every
    // contribution finite
    assert(hot.forall(r => !r.getDouble(5).isNaN && !r.getDouble(5).isInfinite))
    assert(hot.length === 10) // full spine, empty bins included
  }

  test("streaming PSI gate: calm trigger stays calm, shifted trigger fires") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val baseline = (0 until 1000).map(i => (i % 100).toDouble).toDF("v")
    val input = MemoryStream[Double]
    val psis = scala.collection.mutable.Map.empty[Long, Double]
    val q = graft.streaming.Streaming.psiGate(
      input.toDF().toDF("v"), baseline, col("v"), 10, 20.0) { (rep, bid) =>
      psis(bid) = rep.select(col("psi")).head().getDouble(0)
    }
    try {
      input.addData((0 until 500).map(i => ((i * 3) % 100).toDouble): _*) // same shape
      q.processAllAvailable()
      input.addData((0 until 500).map(i => 60.0 + (i % 100)): _*) // shifted
      q.processAllAvailable()
    } finally q.stop()
    assert(psis(0L) < 0.01, s"calm trigger reported drift: ${psis(0L)}")
    assert(psis(1L) > 0.25, s"shifted trigger not detected: ${psis(1L)}")
  }

  test("duplicate check names and empty suites are rejected") {
    import spark.implicits._
    val df = Seq((1L, 1.0)).toDF("k", "v")
    intercept[IllegalArgumentException](report(df, Seq.empty))
    intercept[IllegalArgumentException](report(df, Seq(
      Check("x", count(lit(1)), _ > 0), Check("x", max(col("v")), _ > 0))))
  }
}
