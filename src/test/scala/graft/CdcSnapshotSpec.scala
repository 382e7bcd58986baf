package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CdcSnapshot

class CdcSnapshotSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def snapshotMap(path: String): Map[Long, Double] =
    CdcSnapshot.read(spark, path).collect()
      .map(r => r.getAs[Long]("key") -> r.getAs[Double]("value")).toMap

  test("changesets rewrite only affected buckets; merge precedence and NOT-MATCHED inserts hold") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_cdc").toFile.getAbsolutePath + "/snap"
    CdcSnapshot.init(
      (0L until 100L).map(k => (k, k.toDouble)).toDF("key", "value"), path)
    // untouched-bucket witness: bucket 7 keys are 7, 23, 39, ... — the
    // changeset below touches buckets of keys {3, 17, 5, 200} = {3, 1, 5, 8}
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def listing(b: Int) = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$path/bucket=$b"))
      .map(s => (s.getPath.getName, s.getModificationTime)).toSet
    val bucket7Before = listing(7)

    val changes = Seq(
      (3L, "d", 0.0), (17L, "d", 0.0),   // deletes
      (5L, "u", 500.0),                   // update
      (200L, "i", 200.0),                 // insert (new key)
      (6L, "i", 999.0)                    // insert on a LIVE key → ignored
    ).toDF("key", "op", "value")
    CdcSnapshot.applyBatch(spark, path, changes)

    val expect1 = ((0L until 100L).map(k => k -> k.toDouble).toMap
      - 3L - 17L + (5L -> 500.0) + (200L -> 200.0))
    assert(snapshotMap(path) === expect1)
    assert(listing(7) === bucket7Before,
      "an untouched bucket was rewritten — COW granularity broken")

    // batch 2: the deleted key 3 can now be inserted (NOT MATCHED again);
    // key 200 updates; a whole-bucket delete leaves no dangling dir
    val changes2 = Seq(
      (3L, "i", 33.0), (200L, "u", 201.0)).toDF("key", "op", "value")
    CdcSnapshot.applyBatch(spark, path, changes2)
    val expect2 = expect1 + (3L -> 33.0) + (200L -> 201.0)
    assert(snapshotMap(path) === expect2)

    // a typo'd op must be refused BEFORE any bucket is touched — the
    // alternative is a silent delete of every matched row
    val pre = snapshotMap(path)
    intercept[IllegalArgumentException](CdcSnapshot.applyBatch(spark, path,
      Seq((5L, "upsert", 1.0)).toDF("key", "op", "value")))
    assert(snapshotMap(path) === pre, "refused batch still mutated the snapshot")

    // IDEMPOTENCE — the crash-recovery property: foreachBatch is
    // at-least-once, so a redelivered changeset must be a no-op (delete
    // of an absent key, update carrying the already-applied value,
    // insert against a now-live key — every op re-applies harmlessly)
    CdcSnapshot.applyBatch(spark, path, changes2)
    assert(snapshotMap(path) === expect2,
      "re-applied changeset changed the snapshot — redelivery unsafe")
  }

  test("crash between the swap renames: the next apply restores the holdout bucket first") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_cdcx").toFile.getAbsolutePath + "/snap"
    CdcSnapshot.init(
      (0L until 32L).map(k => (k, k.toDouble)).toDF("key", "value"), path)
    // simulate a death between rename(live→old) and rename(tmp→live):
    // bucket 3's only copy sits in the dot-prefixed holdout
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$path/bucket=3"),
      new org.apache.hadoop.fs.Path(s"$path/.bucket=3.old")))
    // the redelivered changeset touches bucket 3 — without repair it
    // would read the bucket as empty and then destroy the backup
    CdcSnapshot.applyBatch(spark, path,
      Seq((3L, "u", 333.0)).toDF("key", "op", "value"))
    val expect = (0L until 32L).map(k => k -> k.toDouble).toMap + (3L -> 333.0)
    assert(snapshotMap(path) === expect,
      "bucket contents lost across the simulated crash")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/.bucket=3.old")))
  }

  test("stream enrichment sees each CDC version at the very next trigger") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = Files.createTempDirectory("graft_cdce").toFile.getAbsolutePath + "/snap"
    CdcSnapshot.init(
      (0L until 10L).map(k => (k, k.toDouble)).toDF("key", "value"), path)
    val input = MemoryStream[Long]
    val seen = scala.collection.mutable.Map.empty[(Long, Long), Option[Double]]
    val q = graft.streaming.Streaming.enrichWithSnapshot(
      input.toDF().toDF("key"), path) { (rep, bid) =>
      rep.collect().foreach(r =>
        seen((bid, r.getLong(0))) = Option(r.get(1)).map(_.asInstanceOf[Double]))
    }
    try {
      input.addData(1L, 99L) // 99 is not in the reference
      q.processAllAvailable()
      // the reference changes between triggers
      CdcSnapshot.applyBatch(spark, path,
        Seq((1L, "u", 100.0), (99L, "i", 9.9)).toDF("key", "op", "value"))
      input.addData(1L, 99L)
      q.processAllAvailable()
    } finally q.stop()
    assert(seen((0L, 1L)) === Some(1.0))
    assert(seen((0L, 99L)) === None) // unmatched enriches to NULL, not dropped
    assert(seen((1L, 1L)) === Some(100.0)) // next trigger sees the update
    assert(seen((1L, 99L)) === Some(9.9))  // and the insert
  }

  test("point lookup partition-prunes to one bucket directory") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_cdcl").toFile.getAbsolutePath + "/snap"
    CdcSnapshot.init(
      (0L until 64L).map(k => (k, k.toDouble)).toDF("key", "value"), path)
    val q = CdcSnapshot.lookup(spark, path, 37L)
    assert(q.collect().map(r => (r.getAs[Long]("key"), r.getAs[Double]("value")))
      .toSeq === Seq((37L, 37.0)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filter:\n$plan")
    // .get — a plan with no measurable file scan must FAIL, not skip
    val files = PlanTestUtil.scannedFiles(q).get
    assert(files <= 1,
      s"read $files files for a point lookup — bucket pruning failed")
  }

  test("streaming loop: per-trigger changesets keep the snapshot queryable and right") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = Files.createTempDirectory("graft_cdcs").toFile.getAbsolutePath + "/snap"
    CdcSnapshot.init(
      (0L until 40L).map(k => (k, k.toDouble)).toDF("key", "value"), path)
    val input = MemoryStream[(Long, String, Double)]
    var batches = 0L
    val q = graft.streaming.Streaming.cdcApply(
      input.toDF().toDF("key", "op", "value"), path) { _ => batches += 1 }
    try {
      input.addData((1L, "u", 100.0), (2L, "d", 0.0))
      q.processAllAvailable()
      assert(snapshotMap(path) ===
        ((0L until 40L).map(k => k -> k.toDouble).toMap - 2L + (1L -> 100.0)))
      input.addData((2L, "i", 22.0), (50L, "i", 50.0))
      q.processAllAvailable()
      assert(snapshotMap(path) ===
        ((0L until 40L).map(k => k -> k.toDouble).toMap
          + (1L -> 100.0) + (2L -> 22.0) + (50L -> 50.0)))
      assert(batches === 2L)
    } finally q.stop()
  }
}
