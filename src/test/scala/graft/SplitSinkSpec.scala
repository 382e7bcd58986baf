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
    // .get — a plan with no measurable file scan must FAIL, not skip
    val trainFiles = PlanTestUtil.scannedFiles(train).get
    val allFiles = back.inputFiles.length.toLong
    assert(trainFiles < allFiles,
      s"train read $trainFiles of $allFiles files — pruning failed")

    // split assignment in the files matches the hash rule (pure doc_id fn)
    val wrong = back.withColumn("bucket",
        expr("((doc_id * 2654435761) % 4294967296) div 65536 % 100"))
      .filter(
        (col("bucket") < 80 && col("split") =!= "train") ||
        (col("bucket") >= 80 && col("bucket") < 90 && col("split") =!= "val") ||
        (col("bucket") >= 90 && col("split") =!= "test"))
    assert(wrong.count() === 0)
  }

  test("dynamic partition overwrite: rewriting one partition leaves the others byte-identical") {
    // The incremental warehouse-maintenance lever: a daily job recomputes
    // ONE partition and overwrites the table — dynamic mode replaces only
    // the partitions present in the incoming data, where static mode
    // truncates the whole table first. At 100 TB this is the difference
    // between rewriting one day and rewriting three years.
    def listing(dir: String, part: String): Set[(String, Long)] = {
      val d = new java.io.File(s"$dir/lang=$part")
      if (!d.exists()) Set.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length())).toSet
    }
    val dir = Files.createTempDirectory("graft_dynpo").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "source", "n_chars", "lang")
    docs.write.partitionBy("lang").mode("overwrite").parquet(dir)
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    assert(langs.length >= 3)
    val target = "en"
    val othersBefore = langs.filterNot(_ == target)
      .map(l => l -> listing(dir, l)).toMap
    val before = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      docs.filter(col("lang") === target)
        .withColumn("n_chars", col("n_chars") + 1000000L)
        .write.partitionBy("lang").mode("overwrite").parquet(dir)
    } finally before match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // untouched partitions: identical file names AND sizes
    othersBefore.foreach { case (l, files) =>
      assert(listing(dir, l) === files, s"partition lang=$l was rewritten")
    }
    // the rewritten partition carries the new content; totals conserved
    val back = spark.read.parquet(dir)
    assert(back.filter(col("lang") === target)
      .agg(min("n_chars")).head().getLong(0) >= 1000000L)
    assert(back.filter(col("lang") =!= target)
      .agg(max("n_chars")).head().getLong(0) < 1000000L)
    assert(back.count() === docs.count())
  }
}
