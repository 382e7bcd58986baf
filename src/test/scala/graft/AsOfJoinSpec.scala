package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  test("backward as-of: picks latest right at-or-before left, null when none") {
    val left = Seq(
      (1L, ts(10000000L), 100L, 5.0),  // after r@4s  → carried 40.0
      (1L, ts(3000000L), 101L, 6.0),   // after r@2s  → carried 20.0
      (1L, ts(1000000L), 102L, 7.0),   // before all  → null
      (2L, ts(5000000L), 103L, 8.0)    // key 2, only r@5s (equal ts, inclusive)
    ).toDF("user_id", "ts", "event_id", "value")
    val right = Seq(
      (1L, ts(2000000L), 200L, 20.0),
      (1L, ts(4000000L), 201L, 40.0),
      (2L, ts(5000000L), 202L, 50.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = AsOfJoin.backward(left, right, "user_id", "ts", "event_id",
      Map("value" -> "rv"))
      .select($"event_id", $"rv").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out(100L) === Some(40.0))
    assert(out(101L) === Some(20.0))
    assert(out(102L) === None)
    assert(out(103L) === Some(50.0)) // equal ts is inclusive
  }

  test("backward as-of: matched row is atomic — null payload column is NOT backfilled") {
    // r@4s has a null v1; DuckDB ASOF carries the matched row's values
    // (nulls included), never stitching v1 from the older r@2s row.
    val left = Seq((1L, ts(10000000L), 100L)).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts(2000000L), 200L, Some(20.0), Some("old")),
      (1L, ts(4000000L), 201L, None: Option[Double], Some("new"))
    ).toDF("user_id", "ts", "event_id", "v1", "v2")
    val r = AsOfJoin.backward(left, right, "user_id", "ts", "event_id",
      Map("v1" -> "rv1", "v2" -> "rv2")).head()
    assert(r.isNullAt(r.fieldIndex("rv1")), "null in matched row must be carried as null")
    assert(r.getAs[String]("rv2") === "new")
  }

  test("asof_join query: every purchase row present, click precedes purchase") {
    val rows = SparkEntry.queries("asof_join")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.filter(!_.isNullAt(5)).foreach { r =>
      assert(r.getAs[Long]("click_ts_us") <= r.getAs[Long]("ts_us"))
    }
  }
}
