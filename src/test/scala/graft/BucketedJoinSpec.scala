package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing evidence: two tables bucketed on the join key join WITHOUT
  * any Exchange — the co-located fact⋈fact layout that removes the
  * biggest shuffle of the star schema at 100 TB (write once bucketed,
  * join forever shuffle-free).
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bucketed tables join with no shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a crashed earlier run can orphan the managed-table dirs (the fresh
    // in-memory catalog no longer knows them) — remove before re-creating
    Seq("b_orders", "b_lineitem").foreach { t =>
      val d = new java.io.File(s"spark-warehouse/$t")
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(d)
      }
    }
    Tables.orders(spark, sf)
      .write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("b_orders")
    Tables.lineitem(spark, sf)
      .write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(round(sum(col("l_quantity")), 2).as("qty"))

    // tiny test tables would broadcast — force the shuffle-join path the
    // bucketing is designed for, and execute THIS queryExecution so AQE
    // finalizes its plan
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (result, plan) =
      try {
        val r = joined.collect().sortBy(_.getString(0)).toSeq
        (r, joined.queryExecution.executedPlan.toString)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
    // the join itself must not shuffle either side (bucket layout is the
    // exchange); only the final aggregation exchanges its digests
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a bucket-friendly join in:\n$plan")
    val joinKeyExchanges = "Exchange hashpartitioning\\((l|o)_orderkey".r
      .findAllIn(plan).length
    assert(joinKeyExchanges === 0,
      s"join inputs were shuffled despite bucketing:\n$plan")

    // and the result matches the plain (shuffling) join
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(round(sum(col("l_quantity")), 2).as("qty"))
    assert(result === plain.collect().sortBy(_.getString(0)).toSeq)
  }
}
