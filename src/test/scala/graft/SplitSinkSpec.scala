package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Prepare

/** The train/val/test handoff layout: data_split → Hive-partitioned sink →
  * per-split readers with partition pruning. The write side of the
  * training-data pipeline's last stage.
  */
class SplitSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("partitioned sink: split dirs round-trip and prune at read time") {
    val dir = Files.createTempDirectory("graft_split").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sf)
    val split = SparkEntry.queries("data_split")(spark, sf).select("doc_id", "split")
    val tagged = docs.join(split, "doc_id")
    Prepare.partitionedSink(tagged, dir, "split")

    // every split directory exists and the union round-trips exactly
    val back = spark.read.parquet(dir)
    assert(back.count() === docs.count())
    val perSplit = back.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSplit.keySet === Set("train", "val", "test"))
    val expected = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSplit === expected)

    // reading one split prunes to that directory's files only
    val train = back.filter(col("split") === "train")
    val plan = train.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filters in:\n$plan")
    train.count() // materialize scan metrics
    val trainFiles = train.queryExecution.executedPlan.collectLeaves().head
      .metrics.get("numFiles").map(_.value)
    val allFiles = back.inputFiles.length.toLong
    trainFiles.foreach(n => assert(n < allFiles,
      s"train read $n of $allFiles files — pruning failed"))

    // split assignment in the files matches the hash rule (pure doc_id fn)
    val wrong = back.withColumn("bucket",
        expr("((doc_id * 2654435761) % 4294967296) div 65536 % 100"))
      .filter(
        (col("bucket") < 80 && col("split") =!= "train") ||
        (col("bucket") >= 80 && col("bucket") < 90 && col("split") =!= "val") ||
        (col("bucket") >= 90 && col("split") =!= "test"))
    assert(wrong.count() === 0)
  }
}
