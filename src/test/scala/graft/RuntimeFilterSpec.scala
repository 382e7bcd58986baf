package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime pruning evidence: the two optimizer features that make
  * selective fact⋈dim joins cheap at scale without touching the query —
  * dynamic partition pruning (partition dirs skipped via the dim filter at
  * runtime) and injected runtime bloom filters (row-level pre-filter on
  * the shuffle side).
  */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    val dir = Files.createTempDirectory("graft_dpp").toFile.getAbsolutePath
    // fact: lineitem partitioned by returnflag (low-cardinality partition col)
    Tables.lineitem(spark, sf)
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(dir)
    val fact = spark.read.parquet(dir)
    // the filter is on a NON-join dim column, so the surviving join keys
    // are only known at runtime — static constant propagation (which
    // handles a direct key equality) cannot prune; DPP must
    import spark.implicits._
    // dim must be a real source (a LocalRelation folds the Filter away and
    // DPP requires a surviving selective predicate on the filtering side)
    Seq(("A", "kept"), ("N", "kept"), ("R", "returned"))
      .toDF("l_returnflag", "status")
      .write.mode("overwrite").parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim")
      .filter(col("status") === "returned")

    val keys = Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled",
      "spark.sql.optimizer.dynamicPartitionPruning.useStats",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "10")
      val joined = fact.join(dim, "l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
      val expected = Tables.lineitem(spark, sf)
        .filter(col("l_returnflag") === "R")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty")).head()
      val rows = joined.collect()
      assert(rows.head === expected)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"no dynamic pruning in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter injected on a selective fact⋈dim join") {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      val li = Tables.lineitem(spark, sf)
      val sel = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("l_orderkey"))
      val joined = li.join(sel, "l_orderkey")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter_agg") || plan.contains("might_contain"),
        s"no runtime bloom filter in:\n$plan")
      // and it is semantics-preserving
      val expected = li.join(sel, "l_orderkey").count()
      assert(joined.head().getLong(0) === expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
