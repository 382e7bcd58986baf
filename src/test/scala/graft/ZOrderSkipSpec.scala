package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SkipIndex, ZOrderSkip}

/** Z-order layout: per-file min/max stats must be selective on BOTH
  * clustered dimensions — the property no single-key sort can give — and
  * the pruned read must stay a superset-then-refilter.
  */
class ZOrderSkipSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("stats prune on EITHER dimension; the single-key layout prunes only its own") {
    val total = ZOrderSkip.dataFiles(spark, sf).length
    // a narrow range on each dimension alone selects a strict subset
    val byId = ZOrderSkip.selectFiles(spark, sf, Some((100L, 199L)), None).length
    val byCh = ZOrderSkip.selectFiles(spark, sf, None, Some((200L, 400L))).length
    assert(byId < total, s"no pruning on doc_id: $byId of $total")
    assert(byCh < total, s"no pruning on n_chars: $byCh of $total")
    // contrast: the range-clustered (doc_id-sorted) SkipIndex layout has
    // full-span n_chars in every file — its stats CANNOT prune on the
    // second dimension (this is the premise that motivates z-order)
    val skipStats = spark.read.parquet(SkipIndex.layout(spark, sf) + "/stats").count()
    assert(skipStats.toInt > 0) // layout exists; its sidecar has no n_chars column at all
  }

  test("2-D pruned read ≡ plain filter; combined ranges prune at least as hard as each alone") {
    val got = ZOrderSkip.prunedRead(spark, sf, 100L, 299L, 200L, 700L)
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id").collect().map(_.toSeq)
    val want = Tables.documents(spark, sf)
      .filter(col("doc_id").between(100L, 299L) && col("n_chars").between(200L, 700L))
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(got.toSeq === want.toSeq)
    assert(got.nonEmpty)
    val both = ZOrderSkip.selectFiles(spark, sf,
      Some((100L, 299L)), Some((200L, 700L))).length
    val idOnly = ZOrderSkip.selectFiles(spark, sf, Some((100L, 299L)), None).length
    val chOnly = ZOrderSkip.selectFiles(spark, sf, None, Some((200L, 700L))).length
    assert(both <= math.min(idOnly, chOnly))
  }

  test("empty range: no files read, no error") {
    assert(ZOrderSkip.prunedRead(spark, sf, 10000000L, 10000001L, 0L, 10L).count() === 0L)
  }
}
