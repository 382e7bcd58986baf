package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parquet footer AGGREGATE pushdown (`PushedAggregation`) — the scan-
  * surface complement to the CBO (CboSpec), runtime bloom (BloomJoinSpec)
  * and DSv2 runtime-filtering (SourcesSpec) optimizer evidence. With the
  * v2 parquet source, MIN/MAX/COUNT over a table (optionally grouped by
  * partition columns) is answered from row-group footer statistics and
  * directory listing alone — at 100 TB the difference between "read every
  * byte to count rows" and a metadata-only job. The guard semantics
  * matter as much as the mechanism: any data filter disqualifies the
  * rewrite (footer stats can't apply row predicates), so the spec pins
  * both the firing and the non-firing case with identical results.
  */
class AggPushdownSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def withConfs[A](confs: Seq[(String, String)])(body: => A): A = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { confs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private val pushConfs = Seq(
    // aggregate pushdown is a DSv2-only rewrite; parquet defaults to the
    // v1 file source, so route it through v2 for the duration
    "spark.sql.sources.useV1SourceList" -> "",
    "spark.sql.parquet.aggregatePushdown" -> "true")

  test("global MIN/MAX/COUNT is answered from parquet footers (PushedAggregation)") {
    val agg = withConfs(pushConfs) {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val q = li.agg(count(lit(1)).as("n"),
        min(col("l_quantity")).as("qmin"), max(col("l_quantity")).as("qmax"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation: [COUNT(*)"),
        s"aggregate not pushed to the parquet scan:\n$plan")
      assert(plan.contains("MIN(l_quantity)") && plan.contains("MAX(l_quantity)"),
        s"min/max not pushed:\n$plan")
      q.head()
    }
    // same numbers as the ordinary full-scan aggregate (v1 path)
    val li = Tables.lineitem(spark, sf)
    val full = li.agg(count(lit(1)).as("n"),
      min(col("l_quantity")).as("qmin"), max(col("l_quantity")).as("qmax")).head()
    assert(agg === full, s"pushed $agg != scanned $full")
  }

  test("group-by over partition columns pushes down too (PushedGroupBy); a data filter disqualifies it") {
    val dir = Files.createTempDirectory("graft_aggpd").toFile.getAbsolutePath
    Tables.embeddings(spark, sf)
      .write.mode("overwrite").partitionBy("label").parquet(dir)
    val (pushed, guarded) = withConfs(pushConfs) {
      val t = spark.read.parquet(dir)
      val q = t.groupBy(col("label")).agg(count(lit(1)).as("n"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation: [COUNT(*)"),
        s"grouped count not pushed:\n$plan")
      assert(plan.contains("PushedGroupBy: [label]"),
        s"group-by columns not pushed:\n$plan")
      // guard: a predicate on a DATA column cannot be answered by footer
      // stats — the rewrite must NOT fire, and the result must still be
      // exactly right through the ordinary scan+agg path
      val g = t.filter(col("vec_id") % 2 === 0)
        .groupBy(col("label")).agg(count(lit(1)).as("n"))
      val gplan = g.queryExecution.executedPlan.toString
      assert(!gplan.contains("PushedAggregation: [COUNT(*)"),
        s"pushdown fired through a data filter:\n$gplan")
      (q.collect().map(r => (r.getInt(0), r.getLong(1))).toMap,
        g.collect().map(r => (r.getInt(0), r.getLong(1))).toMap)
    }
    val base = Tables.embeddings(spark, sf)
    val exp = base.groupBy(col("label")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val gexp = base.filter(col("vec_id") % 2 === 0)
      .groupBy(col("label")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(pushed === exp, "footer-answered group counts differ from scan")
    assert(guarded === gexp, "guarded path changed the result")
  }
}
