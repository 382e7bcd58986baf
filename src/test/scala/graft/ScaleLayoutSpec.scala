package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Evidence for the 100 TB design claims: IVF cell layout really prunes
  * partitions, and salted joins really equal their plain counterparts.
  */
class ScaleLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("IVF layout: label-partitioned parquet prunes to one cell at scan time") {
    val dir = Files.createTempDirectory("graft_ivf").toFile.getAbsolutePath
    Tables.embeddings(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").partitionBy("label").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("label") === 3)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filters in:\n$plan")
    // only 1 of the 10 label directories is read
    val scanned = pruned.queryExecution.executedPlan.collectLeaves().head
      .metrics.get("numFiles")
    pruned.count() // materialize metrics
    scanned.foreach(m => assert(m.value <= 2, s"read ${m.value} files — pruning failed"))
    assert(pruned.count() === Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter(col("label") === 3).count())
  }

  test("range-sorted layout: parquet min/max stats skip row groups on a point predicate") {
    // The clustering/z-order-lite claim: writing the table range-
    // partitioned + sorted on the lookup key gives every file a disjoint
    // key range, so a point/range predicate pushed to the parquet reader
    // (PushedFilters) eliminates all but one file's row groups via
    // footer min/max stats — the scan emits a tiny fraction of the table
    // without any partition-directory scheme. At 100 TB this is the
    // secondary-index substitute for the non-partition key.
    val dir = Files.createTempDirectory("graft_sorted").toFile.getAbsolutePath
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("value"))
    val total = ev.count()
    ev.repartitionByRange(8, col("event_id"))
      .sortWithinPartitions(col("event_id"))
      .write.mode("overwrite").parquet(dir)
    val probe = ev.orderBy(col("event_id")).limit(1).head().getLong(0) + 3
    val point = spark.read.parquet(dir).filter(col("event_id") === probe)
    point.collect()
    val plan = point.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(event_id.*"),
      s"predicate not pushed to the reader:\n$plan")
    val outRows = point.queryExecution.executedPlan.collectLeaves().head
      .metrics.get("numOutputRows").map(_.value)
    // stats skipping: the scan must emit far fewer rows than the table
    // (≤ one file's worth of the 8 disjoint ranges)
    outRows.foreach(n => assert(n <= total / 4,
      s"scan emitted $n of $total rows — row-group stats did not skip"))
  }

  test("salted join equals the plain join exactly") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, "l_orderkey")
      .agg(count(lit(1)), round(sum(col("l_quantity") * col("o_totalprice")), 2))
      .head()
    val salted = Skew.saltedJoin(li, o, "l_orderkey", salts = 8)
      .agg(count(lit(1)), round(sum(col("l_quantity") * col("o_totalprice")), 2))
      .head()
    assert(plain === salted)
  }
}
