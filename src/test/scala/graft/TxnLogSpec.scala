package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TxnLog

/** Transaction-log contract: atomic pointer-flip commits, cross-file
  * snapshot isolation, time travel, crash-orphan invisibility, vacuum
  * retention.
  */
class TxnLogSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, sf)
    .select("doc_id", "lang", "n_chars")

  private def freshRoot(): String =
    Files.createTempDirectory("graft_txn").toFile.getAbsolutePath + "/t"

  private def lifecycle(root: String): Unit = {
    TxnLog.init(docs.filter(col("doc_id") < 300)
      .repartitionByRange(2, col("doc_id")), root)
    TxnLog.append(docs.filter(col("doc_id") >= 300)
      .repartitionByRange(2, col("doc_id")), root)
    TxnLog.deleteWhere(spark, root, pmod(col("doc_id"), lit(7L)) === 2L)
    TxnLog.compact(spark, root)
  }

  test("lifecycle: every version stays readable; compact preserves content") {
    val root = freshRoot()
    lifecycle(root)
    assert(TxnLog.latestVersion(spark, root) === 4)
    val total = docs.count()
    val deleted = docs.filter(pmod(col("doc_id"), lit(7L)) === 2L).count()
    assert(TxnLog.read(spark, root, Some(1)).count() === 300)
    assert(TxnLog.read(spark, root, Some(2)).count() === total)
    assert(TxnLog.read(spark, root, Some(3)).count() === total - deleted)
    val v3 = TxnLog.read(spark, root, Some(3)).orderBy("doc_id").collect()
    val v4 = TxnLog.read(spark, root, Some(4)).orderBy("doc_id").collect()
    assert(v3.toSeq === v4.toSeq)
  }

  test("snapshot isolation: a resolved reader is immune to later commits") {
    val root = freshRoot()
    lifecycle(root)
    // resolve version 2's file list NOW (TxnLog.read lists eagerly)
    val frozen = TxnLog.read(spark, root, Some(2))
    val before = frozen.count()
    // concurrent writer commits twice more (another delete + compact)
    TxnLog.deleteWhere(spark, root, col("lang") === "de")
    TxnLog.compact(spark, root)
    assert(TxnLog.latestVersion(spark, root) === 6)
    // the frozen reader still sees version 2, bit-for-bit
    assert(frozen.count() === before)
    assert(TxnLog.read(spark, root, Some(2)).count() === before)
  }

  test("a manifest without a pointer flip (crash window) is invisible") {
    val root = freshRoot()
    lifecycle(root)
    val latest = TxnLog.latestVersion(spark, root)
    // simulate a writer that died after writing its manifest but before
    // flipping the pointer: a fake future-version manifest appears
    import spark.implicits._
    Seq(("data", "part-ghost.parquet")).toDF("kind", "file_name")
      .write.parquet(s"$root/manifests/version=${latest + 1}")
    assert(TxnLog.latestVersion(spark, root) === latest)
    // readers still resolve the committed version and its real files
    assert(TxnLog.read(spark, root).count() ===
      TxnLog.read(spark, root, Some(latest)).count())
  }

  test("vacuum reclaims only what retained versions cannot reach") {
    val root = freshRoot()
    lifecycle(root)
    // retaining v3+v4 reclaims NOTHING: v3 still references every original
    // data file and the delete delta — reachability, not age, decides
    assert(TxnLog.vacuum(spark, root, keepVersions = 2) === Nil)
    val keepReadV4 = TxnLog.read(spark, root, Some(4)).orderBy("doc_id").collect()
    // retaining only v4 (post-compact) orphans the 4 original data files
    // and the delete delta
    val dropped = TxnLog.vacuum(spark, root, keepVersions = 1)
    assert(dropped.length === 5, s"expected 4 data + 1 delta dropped, got $dropped")
    // the retained version is unaffected, bit-for-bit
    assert(TxnLog.read(spark, root, Some(4)).orderBy("doc_id").collect().toSeq
      === keepReadV4.toSeq)
    // vacuumed versions are genuinely gone
    intercept[Exception] { TxnLog.read(spark, root, Some(1)).count() }
    intercept[Exception] { TxnLog.read(spark, root, Some(3)).count() }
  }

  test("delta log: a 1-file append writes an O(1)-row manifest on a many-file table") {
    val root = freshRoot() + "-delta"
    TxnLog.init(docs.repartition(8, col("doc_id")), root)           // v1
    TxnLog.append(docs.limit(50).repartition(4), root)              // v2
    val nTableFiles = TxnLog.manifest(spark, root, 2)
      .filter(col("kind") === "data").count()
    assert(nTableFiles >= 9, s"fixture too small: $nTableFiles files")
    TxnLog.append(docs.limit(5).repartition(1), root)               // v3
    // THE scaling claim: the commit's physical manifest is the delta —
    // one add row — not a rewrite of the N-file list
    val m3 = spark.read.parquet(s"$root/manifests/version=3")
    assert(m3.count() === 1,
      s"append manifest should hold exactly the 1 new file, got ${m3.count()}")
    assert(m3.head().getAs[String]("action") === "add")
    // and the RESOLVED view still carries every live file + its stats
    assert(TxnLog.manifest(spark, root, 3)
      .filter(col("kind") === "data").count() === nTableFiles + 1)
    assert(TxnLog.read(spark, root).count() ===
      docs.count() + 50 + 5)
  }

  test("checkpoint: auto-fold every K commits; vacuumed delta prefix stays resolvable") {
    val root = freshRoot() + "-cp"
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    (1 to 6).foreach { i => TxnLog.append(docs.limit(10 * i), root) }
    // CheckpointInterval=4 → an automatic checkpoint exists at v4
    assert(f.exists(new org.apache.hadoop.fs.Path(
      s"$root/checkpoints/version=${TxnLog.CheckpointInterval}")),
      "no auto-checkpoint at the interval boundary")
    val wantV5 = TxnLog.read(spark, root, Some(5)).count()
    val wantV6 = TxnLog.read(spark, root, Some(6)).count()
    // vacuum keeps v5..v6, drops manifests 1..4 — resolution for the
    // retained versions must re-base onto the checkpoint vacuum folds
    // at keepFrom, not the (gone) version-1 delta prefix
    TxnLog.vacuum(spark, root, keepVersions = 2)
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$root/manifests/version=1")))
    assert(f.exists(new org.apache.hadoop.fs.Path(s"$root/checkpoints/version=5")))
    assert(TxnLog.read(spark, root, Some(5)).count() === wantV5)
    assert(TxnLog.read(spark, root, Some(6)).count() === wantV6)
    // manual checkpoint verb is idempotent and current
    assert(TxnLog.checkpoint(spark, root) === 6)
    assert(TxnLog.read(spark, root, Some(6)).count() === wantV6)
  }

  test("vacuum during a WAP window keeps the staged (unpublished) version's files") {
    // write-audit-publish: v3 is staged (manifest written, pointer not
    // flipped) while vacuum runs — its data files are invisible to
    // readers but MUST survive, or the eventual publish flips to a
    // version with missing files
    val root = freshRoot() + "-wap"
    TxnLog.commitTables(spark, root, Seq(("t", docs.limit(10), true)))  // v1
    TxnLog.commitTables(spark, root, Seq(("t", docs.limit(20), true)))  // v2
    val staged = TxnLog.stageTablesNoFlip(spark, root,
      Seq(("t", docs.limit(30), true)))                                 // v3 staged
    TxnLog.vacuum(spark, root, keepVersions = 1)
    TxnLog.publish(spark, root, staged)
    assert(TxnLog.readTable(spark, root, "t").count() === 30,
      "vacuum reclaimed files of the staged WAP version")
  }

  test("vacuum sweeps abandoned staging dirs (a writer that died mid-stage)") {
    val root = freshRoot()
    lifecycle(root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/.stage-deadbeef"))
    val before = TxnLog.read(spark, root).count()
    TxnLog.vacuum(spark, root, keepVersions = 2)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/.stage-deadbeef")))
    assert(TxnLog.read(spark, root).count() === before)
  }

  test("optimistic concurrency: a commit based on a stale read refuses; retry succeeds") {
    val root = freshRoot()
    lifecycle(root)
    val myRead = TxnLog.latestVersion(spark, root) // 4
    // another writer lands first
    TxnLog.append(docs.limit(0), root)             // 5
    val extra = docs.filter(col("doc_id") < 5)
    intercept[TxnLog.CommitConflict] {
      TxnLog.append(extra, root, expectedVersion = Some(myRead))
    }
    // the failed commit left no trace a reader can see
    assert(TxnLog.latestVersion(spark, root) === 5)
    // re-read and retry — the optimistic loop's second iteration
    val v = TxnLog.append(extra, root,
      expectedVersion = Some(TxnLog.latestVersion(spark, root)))
    assert(v === 6)
  }

  test("two writers racing to the same version: the loser dies at the manifest write") {
    val root = freshRoot()
    lifecycle(root)
    // simulate the other racer having just written manifest v5
    import spark.implicits._
    Seq(("data", "part-racer.parquet")).toDF("kind", "file_name")
      .write.parquet(s"$root/manifests/version=5")
    intercept[Exception] { TxnLog.append(docs.limit(1), root) }
    // pointer never flipped — readers still at v4, table intact
    assert(TxnLog.latestVersion(spark, root) === 4)
    assert(TxnLog.read(spark, root).count() ===
      TxnLog.read(spark, root, Some(4)).count())
  }

  test("schema evolution: an added column surfaces as null for old files; time travel keeps the old schema") {
    val root = freshRoot()
    lifecycle(root)
    TxnLog.append(
      docs.filter(col("doc_id") < 3).withColumn("quality", lit(0.9)), root)
    val latest = TxnLog.read(spark, root)
    assert(latest.columns.contains("quality"))
    assert(latest.filter(col("quality").isNotNull).count() === 3)
    assert(latest.filter(col("quality").isNull).count() === latest.count() - 3)
    // the pre-evolution version still reads the pre-evolution schema
    assert(!TxnLog.read(spark, root, Some(4)).columns.contains("quality"))
  }

  test("evo layout: the MOR delete subtracts across BOTH schema generations") {
    // the staged demo behind tt_evolved_read: v1 old schema, v2 evolved
    // (+quality), v3 delete doc_id % 50 == 0 — which hits rows on both
    // sides of the evolution boundary, so the delete join must compose
    // with the merged-schema scan, not just the new files
    val root = TxnLog.evoLayout(spark, sf)
    val latest = TxnLog.read(spark, root)
    assert(latest.filter(pmod(col("doc_id"), lit(50L)) === 0L).count() === 0)
    val n = Tables.documents(spark, sf).count()
    val deleted = Tables.documents(spark, sf)
      .filter(pmod(col("doc_id"), lit(50L)) === 0L).count()
    assert(latest.count() === n - deleted)
    assert(deleted > 0, "fixture must actually delete something")
    // nulls exactly on the pre-evolution generation, values on the new one
    assert(latest.filter(col("quality").isNull)
      .filter(col("doc_id") >= 250).count() === 0)
    assert(latest.filter(col("quality").isNotNull)
      .filter(col("doc_id") < 250).count() === 0)
    assert(latest.filter(col("quality").isNotNull).count() > 0)
    assert(latest.filter(col("quality").isNull).count() > 0)
  }

  test("manifest stats prune the file list before any footer opens; result is exactly the plain filter") {
    val root = freshRoot()
    lifecycle(root)
    // v2 holds 4 range-clustered files (~0-150, ~150-300, ~300-400,
    // ~400-500); a [100,150] range must skip at least the two ≥300 files
    val pruned = TxnLog.readPruned(spark, root, 100L, 150L, Some(2))
    val scanned = pruned.select(col("_metadata.file_path")).distinct().count()
    assert(scanned <= 2, s"scanned $scanned files — manifest stats did not prune")
    val plain = TxnLog.read(spark, root, Some(2))
      .filter(col("doc_id").between(100L, 150L))
      .orderBy("doc_id").collect()
    assert(pruned.orderBy("doc_id").collect().toSeq === plain.toSeq)
    // stats recorded for every data file in every version's manifest
    val m = TxnLog.manifest(spark, root, 2).filter(col("kind") === "data")
    assert(m.filter(col("min_id").isNull).count() === 0)
    // compact re-clusters: pruning power survives the rewrite — the
    // LATEST version (2 compacted files) still skips for a narrow range
    val prunedLatest = TxnLog.readPruned(spark, root, 100L, 150L)
    assert(prunedLatest.select(col("_metadata.file_path")).distinct().count() === 1,
      "post-compact manifest lost pruning power — rewrite must re-cluster")
    assert(prunedLatest.count() ===
      TxnLog.read(spark, root).filter(col("doc_id").between(100L, 150L)).count())
  }

  test("change-data feed: file-diff yields exactly the row-level diff; rewrite windows refuse") {
    val root = freshRoot()
    lifecycle(root)
    val ch = TxnLog.changes(spark, root, 1, 3)
    // row-level ground truth from the two version reads
    val v1 = TxnLog.read(spark, root, Some(1)).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val v3 = TxnLog.read(spark, root, Some(3)).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val ins = ch.filter(col("op") === "insert").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val del = ch.filter(col("op") === "delete").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ins === v3 -- v1, "insert set != set difference of the version reads")
    assert(del === v1 -- v3, "delete set != set difference of the version reads")
    // v3→v4 is the compact rewrite: file diff cannot represent it
    intercept[IllegalArgumentException] { TxnLog.changes(spark, root, 3, 4) }
    // an in-window insert-then-delete nets to no change
    assert(ch.filter(col("op") === "insert")
      .filter(pmod(col("doc_id"), lit(7L)) === 2L).count() === 0)
  }

  test("streaming appends: one atomic commit per trigger; CDF windows recover each batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = freshRoot()
    TxnLog.init(docs.filter(col("doc_id") < 10), root) // v1
    val input = MemoryStream[Long]
    val commits = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int)]()
    val q = graft.streaming.Streaming.txnAppendStream(
      input.toDF().select(col("value").as("doc_id"),
        lit("xx").as("lang"), lit(1L).as("n_chars")), root) {
      (id, v) => commits.add((id, v)); ()
    }
    try {
      input.addData(100L, 101L)
      q.processAllAvailable()
      input.addData(200L)
      q.processAllAvailable()
      assert(commits.toArray.toSeq === Seq((0L, 2), (1L, 3)))
      // each version boundary is exactly one trigger batch
      assert(TxnLog.changes(spark, root, 1, 2).select("doc_id")
        .collect().map(_.getLong(0)).toSet === Set(100L, 101L))
      assert(TxnLog.changes(spark, root, 2, 3).select("doc_id")
        .collect().map(_.getLong(0)).toSet === Set(200L))
      // a reader pinned before the stream started is unaffected
      assert(TxnLog.read(spark, root, Some(1)).count() === 10)
    } finally q.stop()
  }

  test("write-audit-publish: staging is invisible, publish is what was audited, abort reopens the slot") {
    import graft.operators.DataQuality
    val root = freshRoot()
    TxnLog.init(docs.filter(col("doc_id") < 300)
      .repartitionByRange(2, col("doc_id")), root)
    val checks = Seq(
      DataQuality.Check("doc_id_complete", DataQuality.completeness(col("doc_id")),
        _ === 1.0),
      DataQuality.Check("doc_id_unique", DataQuality.uniquenessRatio(col("doc_id")),
        _ === 1.0))

    // 1. a GOOD batch: staged → audited → published
    val good = docs.filter(col("doc_id") >= 300)
    val staged = TxnLog.stageAppend(good, root)
    // between stage and publish, default readers still resolve v1
    assert(TxnLog.latestVersion(spark, root) === 1)
    assert(TxnLog.read(spark, root).count() === 300)
    // ...while the audit sees the full candidate snapshot
    assert(TxnLog.read(spark, root, Some(staged)).count() === docs.count())
    TxnLog.publish(spark, root, staged)
    assert(TxnLog.latestVersion(spark, root) === 2)
    assert(TxnLog.read(spark, root).count() === docs.count())

    // 2. a BAD batch (duplicate ids): wapAppend audits, refuses, aborts
    val bad = docs.filter(col("doc_id") < 50) // re-append existing ids
    val before = TxnLog.read(spark, root).orderBy("doc_id").collect()
    val (published, report) = TxnLog.wapAppend(bad, root, checks)
    assert(!published, "a uniqueness-violating batch must not publish")
    assert(report.filter(col("check_name") === "doc_id_unique" && !col("passed"))
      .count() === 1L, "the report must name the failing check")
    // the table is untouched: same version, same rows, no orphan files
    assert(TxnLog.latestVersion(spark, root) === 2)
    assert(TxnLog.read(spark, root).orderBy("doc_id").collect().toSeq === before.toSeq)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val onDisk = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/files"))
      .count(_.getPath.getName.startsWith("part-"))
    assert(onDisk === TxnLog.manifest(spark, root, 2)
      .filter(col("kind") === "data").count(),
      s"aborted stage left orphan data files: $onDisk on disk")

    // 3. the version slot reopened: a corrected batch lands normally
    val (ok2, _) = TxnLog.wapAppend(
      good.withColumn("doc_id", col("doc_id") + 100000L), root, checks)
    assert(ok2, "the corrected batch must publish into the reopened slot")
    assert(TxnLog.latestVersion(spark, root) === 3)
  }

  test("TIMESTAMP AS OF: wall-clock resolves to the version live at that instant") {
    val root = freshRoot()
    TxnLog.init(docs.filter(col("doc_id") < 200)
      .repartitionByRange(2, col("doc_id")), root)
    Thread.sleep(30) // distinct manifest mtimes (ms resolution)
    val betweenV1andV2 = System.currentTimeMillis()
    Thread.sleep(30)
    TxnLog.append(docs.filter(col("doc_id") >= 200), root)
    Thread.sleep(30)
    val afterV2 = System.currentTimeMillis()
    assert(TxnLog.versionAsOf(spark, root, betweenV1andV2) === 1)
    assert(TxnLog.versionAsOf(spark, root, afterV2) === 2)
    assert(TxnLog.readAsOf(spark, root, betweenV1andV2).count() === 200)
    assert(TxnLog.readAsOf(spark, root, afterV2).count() === docs.count())
    // before the first commit: refuse loudly, not an empty table
    intercept[IllegalArgumentException] {
      TxnLog.versionAsOf(spark, root, 1000L)
    }
  }

  test("exactly-once appendOnce: redelivery is a no-op; the watermark survives other commits and compaction") {
    val root = freshRoot()
    TxnLog.init(docs.filter(col("doc_id") < 200)
      .repartitionByRange(2, col("doc_id")), root)
    val b0 = docs.filter(col("doc_id") >= 200 && col("doc_id") < 300)

    // first delivery applies
    assert(TxnLog.appendOnce(b0, root, "ingest-a", 0L) === Some(2))
    val afterFirst = TxnLog.read(spark, root).count()
    // redelivery of the SAME batch: provable no-op, version unmoved
    assert(TxnLog.appendOnce(b0, root, "ingest-a", 0L) === None)
    assert(TxnLog.latestVersion(spark, root) === 2)
    assert(TxnLog.read(spark, root).count() === afterFirst)
    // a SECOND app's batch 0 is independent (watermarks are per appId)
    assert(TxnLog.appendOnce(docs.filter(col("doc_id") >= 300 && col("doc_id") < 350),
      root, "ingest-b", 0L).isDefined)
    // ordinary commits and a rewrite must CARRY the watermark — dropping
    // it would let a redelivery double-apply right after
    TxnLog.deleteWhere(spark, root, col("doc_id") === 250L)
    TxnLog.compact(spark, root)
    assert(TxnLog.appendOnce(b0, root, "ingest-a", 0L) === None,
      "compaction dropped the txn watermark — redelivery double-applied")
    // ...while the app's NEXT batch still lands
    assert(TxnLog.appendOnce(docs.filter(col("doc_id") >= 350 && col("doc_id") < 400),
      root, "ingest-a", 1L).isDefined)
  }

  test("exactly-once streaming ingestion: per-trigger appendOnce commits, watermark visible in the manifest") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = freshRoot()
    TxnLog.init(Seq((1L, "en")).toDF("doc_id", "lang"), root)
    val applied = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Option[Int])]()
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.Streaming.txnAppendStreamOnce(
      input.toDF().toDF("doc_id", "lang"), root, "stream-app") {
      (id, v) => applied.add((id, v)); ()
    }
    try {
      input.addData((2L, "de")); q.processAllAvailable()
      input.addData((3L, "fr")); q.processAllAvailable()
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    assert(applied.asScala.toSeq.sortBy(_._1).map(_._2) === Seq(Some(2), Some(3)))
    assert(TxnLog.read(spark, root).count() === 3)
    // the watermark is INSPECTABLE state: the latest manifest carries it
    val wm = TxnLog.manifest(spark, root, 3)
      .filter(col("kind") === "txn").select("file_name")
      .collect().map(_.getString(0))
    assert(wm.toSeq === Seq("stream-app:1"))
  }

  test("crashed audit: the staged slot blocks commits until abortStaged repairs it") {
    val root = freshRoot()
    TxnLog.init(docs.filter(col("doc_id") < 300)
      .repartitionByRange(2, col("doc_id")), root)
    // the auditor stages... and dies (no publish, no abort)
    val staged = TxnLog.stageAppend(docs.filter(col("doc_id") >= 300), root)
    // the reservation blocks every later commit — loudly, not silently
    val boom = intercept[Exception] {
      TxnLog.append(docs.filter(col("doc_id") >= 400), root)
    }
    assert(boom.getMessage != null)
    assert(TxnLog.latestVersion(spark, root) === 1,
      "a blocked commit must not move the pointer")
    // restart-side repair: abortStaged's precondition still holds
    // (nothing can publish past the reservation), so it reopens the slot
    TxnLog.abortStaged(spark, root, staged)
    val v = TxnLog.append(docs.filter(col("doc_id") >= 300), root)
    assert(v === 2)
    assert(TxnLog.read(spark, root).count() === docs.count())
  }

  test("reads never list data directories: only manifest-listed files are scanned") {
    val root = freshRoot()
    lifecycle(root)
    // v4 (compacted) lists exactly 2 files; the files dir holds 6 (v1:2 +
    // v2:2 + v4:2) — the scan must touch only the manifest's 2
    val scanned = TxnLog.read(spark, root, Some(4))
      .select(col("_metadata.file_path")).distinct().count()
    assert(scanned === 2)
    val onDisk = new java.io.File(s"$root/files").list().count(_.startsWith("part-"))
    assert(onDisk === 6)
  }

  test("maintenance policy: healthy log serves; the verb is a no-op") {
    val root = freshRoot()
    TxnLog.init(docs.repartitionByRange(2, col("doc_id")), root)
    val plan = TxnLog.maintenancePlan(spark, root).head()
    assert(plan.getAs[String]("decision") === "serve")
    assert(plan.getAs[Long]("reclaimable_files") === 0L)
    val v = TxnLog.latestVersion(spark, root)
    assert(TxnLog.maintainTable(spark, root) === "serve")
    assert(TxnLog.latestVersion(spark, root) === v,
      "a healthy-table maintenance tick committed something")
  }

  test("maintenance policy cascade: delete debt → optimize → reclaim debt → vacuum → serve") {
    // the maintLayout recipe rebuilt on a spec-owned root (the staged demo
    // stays unmaintained for the oracle replay)
    val root = freshRoot()
    TxnLog.init(docs.filter(col("doc_id") < 200)
      .repartitionByRange(3, col("doc_id")), root)
    TxnLog.append(docs.filter(col("doc_id") >= 200 && col("doc_id") < 350)
      .repartitionByRange(3, col("doc_id")), root)
    TxnLog.append(docs.filter(col("doc_id") >= 350)
      .repartitionByRange(3, col("doc_id")), root)
    TxnLog.deleteWhere(spark, root, pmod(col("doc_id"), lit(9L)) === 1L)
    TxnLog.deleteWhere(spark, root, pmod(col("doc_id"), lit(9L)) === 2L)
    val plan1 = TxnLog.maintenancePlan(spark, root).head()
    assert(plan1.getAs[Long]("live_data_files") === 9L)
    assert(plan1.getAs[Long]("live_delete_files") === 2L)
    assert(plan1.getAs[Double]("delete_ratio") > TxnLog.MaintDeleteRatio)
    assert(plan1.getAs[String]("decision") === "optimize")
    val before = TxnLog.read(spark, root).orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq
    // tick 1: the rewrite folds deletes + re-clusters; rows preserved
    assert(TxnLog.maintainTable(spark, root) === "optimize")
    assert(TxnLog.read(spark, root).orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq === before,
      "the optimize tick changed the served rows")
    // the just-folded files are still reachable from the retained
    // horizon (the pre-rewrite version), so the very next plan is serve —
    // vacuum debt only spikes once the horizon moves past the rewrite
    assert(TxnLog.maintenancePlan(spark, root).head()
      .getAs[String]("decision") === "serve")
    TxnLog.append(docs.filter(col("doc_id") < 10), root)
    val plan2 = TxnLog.maintenancePlan(spark, root).head()
    assert(plan2.getAs[Long]("reclaimable_files") === 11L,
      s"want the 9 folded data + 2 delete files reclaimable, got $plan2")
    assert(plan2.getAs[String]("decision") === "vacuum")
    val before2 = TxnLog.read(spark, root).count()
    // tick 2: vacuum harvests exactly the plan's reclaimable files
    assert(TxnLog.maintainTable(spark, root) === "vacuum")
    val plan3 = TxnLog.maintenancePlan(spark, root).head()
    assert(plan3.getAs[Long]("reclaimable_files") === 0L)
    assert(plan3.getAs[String]("decision") === "serve")
    assert(TxnLog.read(spark, root).count() === before2,
      "vacuum touched reachable rows")
    assert(TxnLog.maintainTable(spark, root) === "serve")
  }

  test("maintenance policy: a multi-table log never trips the single-table rewrite verb") {
    // commitTables logs have no whole-log compact; their data:<t> files
    // must not count into the optimize trigger (vacuum still covers
    // their reclaim debt). Nine per-table files would trip
    // MaintMaxDataFiles if miscounted.
    val root = freshRoot()
    (0 until 3).foreach { i =>
      TxnLog.commitTables(spark, root, Seq(
        ("a", docs.filter(col("doc_id") % 3 === i).repartition(2), false),
        ("b", docs.filter(col("doc_id") % 3 === i).limit(10), false)))
    }
    val plan = TxnLog.maintenancePlan(spark, root).head()
    assert(plan.getAs[Long]("live_data_files") === 0L,
      "multi-table files counted into the single-table rewrite trigger")
    assert(plan.getAs[String]("decision") === "serve")
    assert(TxnLog.maintainTable(spark, root) === "serve")
    assert(TxnLog.readTable(spark, root, "a").count() > 0)
  }

  test("maintenance policy: a lost checkpoint is detected and repaired") {
    val root = freshRoot()
    // five appends: the interval checkpoint lands at v4
    (0 until 5).foreach { i =>
      if (i == 0) TxnLog.init(docs.filter(col("doc_id") < 100), root)
      else TxnLog.append(
        docs.filter(col("doc_id") >= i * 100 && col("doc_id") < (i + 1) * 100), root)
    }
    // forge the failure the lag guard exists for: the checkpoint dir dies
    val cpd = new org.apache.hadoop.fs.Path(s"$root/checkpoints")
    cpd.getFileSystem(spark.sessionState.newHadoopConf()).delete(cpd, true)
    val plan = TxnLog.maintenancePlan(spark, root).head()
    assert(plan.getAs[Long]("checkpoint_lag") >= TxnLog.CheckpointInterval)
    assert(plan.getAs[String]("decision") === "checkpoint")
    assert(TxnLog.maintainTable(spark, root) === "checkpoint")
    val plan2 = TxnLog.maintenancePlan(spark, root).head()
    assert(plan2.getAs[Long]("checkpoint_lag") === 0L)
    assert(plan2.getAs[String]("decision") === "serve")
  }
}
