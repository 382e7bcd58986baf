package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TxnLog

/** Contracts of the two round-8 txn-log extensions:
  *
  *  - OPTIMIZE (z-order rewrite commit): same logical rows, strictly
  *    better manifest-stats pruning, CDF refusal across the rewrite
  *    window, txn watermarks survive;
  *  - multi-table atomic commit: a reader observes old-old or new-new
  *    across the table pair, never mixed — including through the crash
  *    window between manifest write and pointer flip.
  */
class TxnOptimizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, sf)
    .select("doc_id", "lang", "n_chars")

  private def freshRoot(): String =
    Files.createTempDirectory("graft_txnopt").toFile.getAbsolutePath + "/t"

  // hash-scattered init → MOR delete → z-order optimize (the demo shape)
  private def optimized(root: String): Unit = {
    TxnLog.init(docs.repartition(8, col("doc_id")), root)
    TxnLog.deleteWhere(spark, root, pmod(col("doc_id"), lit(11L)) === 3L)
    TxnLog.optimize(spark, root, "doc_id", "n_chars")
  }

  test("optimize preserves content exactly (set-equal to pre-optimize)") {
    val root = freshRoot()
    optimized(root)
    val before = TxnLog.read(spark, root, Some(2)).orderBy("doc_id").collect()
    val after = TxnLog.read(spark, root, Some(3)).orderBy("doc_id").collect()
    assert(before.toSeq === after.toSeq)
  }

  test("optimize shrinks the manifest-pruned file list for a range predicate") {
    val root = freshRoot()
    optimized(root)
    val pre = TxnLog.dataFilesOverlapping(spark, root, 100, 150, Some(2))
    val post = TxnLog.dataFilesOverlapping(spark, root, 100, 150, Some(3))
    // hash-scattered: every pre-optimize file spans (most of) the id
    // range, so the probe window prunes nothing before the rewrite.
    // Don't pin the exact file count — repartition(8) may emit fewer
    // non-empty files if the fixture or hash distribution shifts; the
    // load-bearing claims are "no pre-optimize file is pruned" and
    // "optimize makes the same probe prune".
    val allPre = TxnLog.dataFilesOverlapping(spark, root, Long.MinValue,
      Long.MaxValue, Some(2))
    assert(pre.size === allPre.size,
      s"probe window already pruned pre-optimize: ${pre.size} of ${allPre.size}")
    assert(post.size < pre.size,
      s"optimize did not improve pruning: ${post.size} vs ${pre.size}")
    // and the pruned read still answers exactly
    val got = TxnLog.readPruned(spark, root, 100, 150, Some(3))
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    val want = docs.filter(col("doc_id").between(100, 150) &&
        pmod(col("doc_id"), lit(11L)) =!= 3L)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    assert(got.toSeq === want.toSeq)
  }

  test("optimize prunes on the SECOND z-order dimension too") {
    val root = freshRoot()
    optimized(root)
    // n_chars is not the stats column, so manifest stats cannot prune it —
    // but the z-order layout clusters it, so the FILES' doc_id stats still
    // shrink for a joint predicate; here we assert the physical layout:
    // post-optimize, per-file doc_id spans are narrower than the full range
    val spans = TxnLog.read(spark, root, Some(3), keepMeta = true)
      .groupBy(col("__file"))
      .agg((max(col("doc_id")) - min(col("doc_id"))).as("span"))
      .collect().map(_.getLong(1))
    val full = docs.agg(max(col("doc_id")) - min(col("doc_id"))).head().getLong(0)
    assert(spans.count(_ < full / 2) >= spans.length / 2,
      s"z-order left most files spanning the full range: ${spans.mkString(",")}")
  }

  test("CDF refuses a window spanning the optimize rewrite") {
    val root = freshRoot()
    optimized(root)
    intercept[IllegalArgumentException] {
      TxnLog.changes(spark, root, 2, 3).collect()
    }
    // but the pre-rewrite window still serves
    assert(TxnLog.changes(spark, root, 1, 2).count() > 0)
  }

  test("optimize carries txn watermarks (redelivery still no-ops after it)") {
    val root = freshRoot()
    TxnLog.init(docs.filter(col("doc_id") < 100), root)
    assert(TxnLog.appendOnce(docs.filter(col("doc_id").between(100, 199)),
      root, "appA", 7L).nonEmpty)
    TxnLog.optimize(spark, root, "doc_id", "n_chars")
    // the redelivered batch must still be recognized as applied
    assert(TxnLog.appendOnce(docs.filter(col("doc_id").between(100, 199)),
      root, "appA", 7L).isEmpty)
  }

  // ------------------------------------------------------- multi-table

  private def postings(d: org.apache.spark.sql.DataFrame) = d
    .select(col("doc_id"),
      explode(graft.functions.TextOps.tokens(col("text"))).as("term"))
    .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))

  private def meta(d: org.apache.spark.sql.DataFrame) = d
    .agg(count(lit(1)).as("n_docs"))

  private def fullDocs = Tables.documents(spark, sf).select("doc_id", "text")

  test("multi-table commit: postings and meta can never be observed desynced") {
    val root = freshRoot()
    val first = fullDocs.filter(col("doc_id") < 300)
    TxnLog.commitTables(spark, root, Seq(
      ("postings", postings(first), false), ("meta", meta(first), true)))
    // invariant at v1: meta.n_docs == distinct docs in postings
    def check(v: Int): Unit = {
      val n = TxnLog.readTable(spark, root, "meta", Some(v))
        .head().getLong(0)
      val d = TxnLog.readTable(spark, root, "postings", Some(v))
        .select(countDistinct(col("doc_id"))).head().getLong(0)
      assert(n === d, s"v$v: meta says $n docs, postings cover $d")
    }
    check(1)
    TxnLog.commitTables(spark, root, Seq(
      ("postings", postings(fullDocs.filter(col("doc_id") >= 300)), false),
      ("meta", meta(fullDocs), true)))
    check(1) // time travel: the old PAIR still agrees
    check(2)
  }

  test("crash between manifest write and pointer flip leaves old-old visible") {
    val root = freshRoot()
    val first = fullDocs.filter(col("doc_id") < 300)
    TxnLog.commitTables(spark, root, Seq(
      ("postings", postings(first), false), ("meta", meta(first), true)))
    val nBefore = TxnLog.readTable(spark, root, "meta").head().getLong(0)
    // stage v2 fully (files + manifest) but crash before the flip
    val staged = TxnLog.stageTablesNoFlip(spark, root, Seq(
      ("postings", postings(fullDocs.filter(col("doc_id") >= 300)), false),
      ("meta", meta(fullDocs), true)))
    assert(staged === 2)
    // a reader resolving the table now sees the OLD pair, consistent
    assert(TxnLog.latestVersion(spark, root) === 1)
    assert(TxnLog.readTable(spark, root, "meta").head().getLong(0) === nBefore)
    assert(TxnLog.readTable(spark, root, "postings")
      .select(countDistinct(col("doc_id"))).head().getLong(0) === nBefore)
    // recovery publishes the staged pair atomically → new-new
    TxnLog.publish(spark, root, staged)
    val nAfter = TxnLog.readTable(spark, root, "meta").head().getLong(0)
    assert(nAfter === fullDocs.count())
    assert(TxnLog.readTable(spark, root, "postings")
      .select(countDistinct(col("doc_id"))).head().getLong(0) === nAfter)
  }

  test("vacuum on a multi-table log reclaims superseded sidecar files, keeps live pair") {
    val root = freshRoot()
    val first = fullDocs.filter(col("doc_id") < 300)
    TxnLog.commitTables(spark, root, Seq(
      ("postings", postings(first), false), ("meta", meta(first), true)))
    TxnLog.commitTables(spark, root, Seq(
      ("postings", postings(fullDocs.filter(col("doc_id") >= 300)), false),
      ("meta", meta(fullDocs), true)))
    // v1's meta file was REPLACED at v2 → unreferenced once v1 is dropped
    val dropped = TxnLog.vacuum(spark, root, keepVersions = 1)
    assert(dropped.exists(_.startsWith("meta/")),
      s"superseded meta file not reclaimed: $dropped")
    assert(!dropped.exists(_.startsWith("postings/")),
      s"live postings must survive vacuum: $dropped")
    // the surviving pair still reads consistently
    val n = TxnLog.readTable(spark, root, "meta").head().getLong(0)
    val d = TxnLog.readTable(spark, root, "postings")
      .select(countDistinct(col("doc_id"))).head().getLong(0)
    assert(n === d && n === fullDocs.count())
  }

  test("multi-table optimistic concurrency: stale base version refuses") {
    val root = freshRoot()
    TxnLog.commitTables(spark, root, Seq(("meta", meta(fullDocs), true)))
    intercept[TxnLog.CommitConflict] {
      TxnLog.commitTables(spark, root,
        Seq(("meta", meta(fullDocs), true)), expected = Some(0))
    }
  }

  test("multi-table slot collision: a reserved version slot refuses the second writer loudly") {
    val root = freshRoot()
    TxnLog.commitTables(spark, root, Seq(("meta", meta(fullDocs), true))) // v1
    // writer B reserves v2 (staged, not yet published — the WAP window)
    TxnLog.stageTablesNoFlip(spark, root, Seq(("meta", meta(fullDocs), true)))
    // writer A, also based on v1, must die at the occupied errorifexists
    // slot — the collision guard commitTables' single version read relies
    // on (re-reading the version after the OCC check would instead derive
    // a FREE slot and clobber B)
    intercept[Throwable] {
      TxnLog.commitTables(spark, root, Seq(("meta", meta(fullDocs), true)))
    }
    // B's reservation is intact and the table still resolves v1
    assert(TxnLog.latestVersion(spark, root) === 1)
  }
}
