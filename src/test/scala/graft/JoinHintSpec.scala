package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Join-strategy control: every Spark join hint must select its physical
  * operator, and all strategies must agree on the result. At 100 TB
  * choosing the right physical join is the difference between a broadcast
  * (zero shuffle of the big side), one shuffle (hash), or a shuffle+sort
  * (merge) — the hints are how a pipeline pins the choice when statistics
  * mislead the optimizer.
  */
class JoinHintSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def li = Tables.lineitem(spark, sf)
    .select(col("l_orderkey"), col("l_quantity"))
  private def o = Tables.orders(spark, sf)
    .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))

  private def agg(df: org.apache.spark.sql.DataFrame) =
    df.agg(count(lit(1)).as("n"),
      round(sum(col("l_quantity") * col("o_totalprice")), 2).as("s")).head()

  test("each join hint selects its physical operator; all agree on the result") {
    val cases = Seq(
      ("broadcast", "BroadcastHashJoin"),
      ("merge", "SortMergeJoin"),
      ("shuffle_hash", "ShuffledHashJoin"))
    val expected = agg(li.join(o, "l_orderkey"))
    for ((hint, exec) <- cases) {
      val joined = li.join(o.hint(hint), Seq("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains(exec), s"hint '$hint' did not plan $exec:\n$plan")
      assert(agg(joined) === expected, s"hint '$hint' changed the result")
    }
  }

  test("broadcast hint beats the size estimate: a 'big' side can still be pinned broadcast") {
    // simulate a misleading estimate: disable auto-broadcast entirely,
    // then pin it back with the hint — the planner must obey the hint
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val auto = li.join(o, Seq("l_orderkey"))
      assert(!auto.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "expected no auto-broadcast with threshold -1")
      val pinned = li.join(broadcast(o), Seq("l_orderkey"))
      assert(pinned.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "broadcast() did not override the disabled threshold")
      assert(agg(pinned) === agg(auto))
    } finally spark.conf.set(key, old)
  }
}
