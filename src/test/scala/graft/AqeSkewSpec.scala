package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join evidence: a deliberately hot join key makes Spark's
  * adaptive execution split the skewed partition at runtime (the built-in
  * alternative to the manual `Skew.saltedJoin`), and the result equals the
  * plain join exactly.
  */
class AqeSkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("AQE splits a skewed sort-merge join and preserves the exact result") {
    import spark.implicits._
    // 200k rows, 95% on one hot key — far past the default skew factor
    val big = spark.range(200000)
      .select((when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id") % 1000))
        .as("k"), col("id").as("payload"))
    val small = spark.range(1000).select(col("id").as("k"),
      (col("id") * 10).as("w"))

    val expected = big.join(small, "k", "inner").agg(
      count(lit(1)).as("n"), sum(col("payload") + col("w")).as("s")).head()

    withSkewConf {
      val joined = big.join(small, "k").agg(
        count(lit(1)).as("n"), sum(col("payload") + col("w")).as("s"))
      // collect() (not head()) so THIS dataset's QueryExecution runs and
      // carries the final adaptive plan
      val rows = joined.collect()
      assert(rows.length === 1 && rows.head === expected)

      // the adaptive plan actually engaged skew handling on the join
      val adaptive = joined.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }
      assert(adaptive.isDefined, "no AdaptiveSparkPlanExec in plan")
      val finalPlan = adaptive.get.executedPlan.toString
      assert(finalPlan.contains("isSkew=true") || finalPlan.contains("skewed"),
        s"skew handling not engaged:\n$finalPlan")
    }
  }

  /** Force the skewed SMJ shape: no broadcast (threshold off), low skew
    * thresholds so the fixture-sized hot partition trips the optimization.
    */
  private def withSkewConf[T](body: => T): T = {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      body
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
