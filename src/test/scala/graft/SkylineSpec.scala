package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skyline

/** The two-pass distributed skyline must equal the quadratic dominance
  * definition, under any partitioning, with ties handled per the strict-
  * dominance rule (equal-on-both-axes rows all survive together).
  */
class SkylineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def bruteForce(df: org.apache.spark.sql.DataFrame) = {
    val q = df.select(col("p_retailprice").as("qx"), col("p_size").as("qy"))
    df.join(q,
        col("qx") <= col("p_retailprice") && col("qy") >= col("p_size") &&
          (col("qx") < col("p_retailprice") || col("qy") > col("p_size")),
        "left_anti")
  }

  test("skyline equals the quadratic dominance definition") {
    val parts = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
    val fast = Skyline.skyline(parts, "p_retailprice", "p_size")
      .select(col("p_partkey")).collect().map(_.getLong(0)).sorted
    val slow = bruteForce(parts)
      .select(col("p_partkey")).collect().map(_.getLong(0)).sorted
    assert(fast.nonEmpty && fast.sameElements(slow),
      s"fast=${fast.mkString(",")} slow=${slow.mkString(",")}")
  }

  test("result is invariant to the range-partition count") {
    val parts = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
    val r1 = Skyline.skyline(parts, "p_retailprice", "p_size", numPartitions = 1)
      .select(col("p_partkey")).collect().map(_.getLong(0)).sorted
    val r8 = Skyline.skyline(parts, "p_retailprice", "p_size", numPartitions = 8)
      .select(col("p_partkey")).collect().map(_.getLong(0)).sorted
    assert(r1.sameElements(r8))
  }

  test("duplicate champion pairs all survive; strictly-dominated ties die") {
    import spark.implicits._
    // (x, y): (1, 10) twice (both survive), (1, 5) (same x, smaller y —
    // dominated), (2, 10) (same y, larger x — dominated by (1,10)),
    // (2, 12) (survives: bigger y than anything cheaper)
    val df = Seq((1L, 1.0, 10), (2L, 1.0, 10), (3L, 1.0, 5),
        (4L, 2.0, 10), (5L, 2.0, 12))
      .toDF("p_partkey", "p_retailprice", "p_size")
    val got = Skyline.skyline(df, "p_retailprice", "p_size", numPartitions = 3)
      .select(col("p_partkey")).collect().map(_.getLong(0)).sorted
    assert(got.sameElements(Array(1L, 2L, 5L)), got.mkString(","))
  }
}
