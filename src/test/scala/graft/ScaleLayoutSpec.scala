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
