package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.MvRegistry

/** Transparent materialized-view rewrite (plans/MvRewrite): the exact
  * user query over the SOURCE must silently read the groups-sized summary,
  * results must match the direct computation, staleness must be caught by
  * the fingerprint-driven refresh, and non-covered shapes must fall
  * through untouched.
  */
class MvRewriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def freshSource(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_src").toString
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def query(src: String) = spark.read.parquet(src)
    .groupBy(col("lang"))
    .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))

  /** Root paths of every parquet relation in the optimized plan. */
  private def scannedPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case org.apache.spark.sql.execution.datasources.LogicalRelation(
          fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
          _, _, _, _) =>
        fs.location.rootPaths.map(_.toString.stripPrefix("file:"))
    }.flatten

  test("covered aggregate reads the MV, results equal the direct plan") {
    val src = freshSource()
    val mv = src + "-mv"
    try {
      // control BEFORE registration — direct plan, direct results
      val direct = query(src).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      MvRegistry.register(spark, src, mv, "lang", Seq("n_chars"))
      val q = query(src)
      val scanned = scannedPaths(q)
      assert(scanned.nonEmpty && scanned.forall(_.startsWith(mv)),
        s"plan should scan ONLY the MV, scanned: $scanned")
      val got = q.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === direct && got.nonEmpty)
    } finally MvRegistry.unregister(src)
  }

  test("non-covered shapes fall through: filters, other group keys, other aggregates") {
    val src = freshSource()
    val mv = src + "-mv"
    try {
      MvRegistry.register(spark, src, mv, "lang", Seq("n_chars"))
      val filtered = spark.read.parquet(src)
        .filter(col("doc_id") >= 100)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      assert(!scannedPaths(filtered).exists(_.startsWith(mv)),
        "a FILTERED aggregate must never read the whole-table MV")
      val otherKey = spark.read.parquet(src)
        .groupBy(col("n_chars")).agg(count(lit(1)).as("n"))
      assert(!scannedPaths(otherKey).exists(_.startsWith(mv)))
      val otherAgg = spark.read.parquet(src)
        .groupBy(col("lang")).agg(avg(col("n_chars")).as("m"))
      assert(!scannedPaths(otherAgg).exists(_.startsWith(mv)),
        "avg is not covered by (count, sum) columns — must fall through")
      // the filtered result must reflect the filter (i.e. really ran direct)
      val full = query(src).agg(sum(col("n_docs"))).head().getLong(0)
      val part = filtered.agg(sum(col("n_docs"))).head().getLong(0)
      assert(part < full)
    } finally MvRegistry.unregister(src)
  }

  test("stale MV serves stale rows; fingerprint refresh repairs it") {
    val src = freshSource()
    val mv = src + "-mv"
    try {
      MvRegistry.register(spark, src, mv, "lang", Seq("n_chars"))
      val before = query(src).agg(sum(col("n_docs"))).head().getLong(0)
      // source grows behind the MV's back
      spark.range(7).select((col("id") + 90000).as("doc_id"),
          lit("zz").as("lang"), lit(11L).as("n_chars"))
        .write.mode("append").parquet(src)
      // un-refreshed: the rewrite still serves the OLD summary — the
      // documented failure mode of every MV system
      val stale = query(src).agg(sum(col("n_docs"))).head().getLong(0)
      assert(stale === before, "expected the stale MV to show (that's the point)")
      // fingerprint catches the drift, rebuild, correct rows
      assert(MvRegistry.refreshIfStale(spark, src), "drift not detected")
      val fresh = query(src).agg(sum(col("n_docs"))).head().getLong(0)
      assert(fresh === before + 7)
      // idempotent: no drift → no rebuild
      assert(!MvRegistry.refreshIfStale(spark, src))
    } finally MvRegistry.unregister(src)
  }

  test("streaming MV maintenance: per-trigger refresh keeps the rewrite serving fresh rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val src = freshSource()
    val mv = src + "-mv"
    try {
      MvRegistry.register(spark, src, mv, "lang", Seq("n_chars"))
      val base = query(src).agg(sum(col("n_docs"))).head().getLong(0)
      val input = MemoryStream[(Long, String, Long)]
      // the MV maintenance loop a lakehouse runs: each micro-batch lands
      // in the source, then refreshIfStale re-summarizes — serving
      // queries keep hitting the MV and see each trigger's rows
      val q = input.toDF().toDF("doc_id", "lang", "n_chars")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(src)
          MvRegistry.refreshIfStale(spark, src)
          ()
        }.start()
      try {
        input.addData((91000L, "zz", 5L), (91001L, "zz", 7L))
        q.processAllAvailable()
        assert(scannedPaths(query(src)).exists(_.startsWith(mv)),
          "serving query stopped reading the MV")
        assert(query(src).agg(sum(col("n_docs"))).head().getLong(0) === base + 2)
        input.addData((91002L, "qq", 9L))
        q.processAllAvailable()
        assert(query(src).agg(sum(col("n_docs"))).head().getLong(0) === base + 3)
      } finally q.stop()
    } finally MvRegistry.unregister(src)
  }

  test("rollup subsumption: a GLOBAL count/sum is answered by re-aggregating the MV") {
    val src = freshSource()
    val mv = src + "-mv"
    try {
      val direct = spark.read.parquet(src)
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("tc")).head()
      MvRegistry.register(spark, src, mv, "lang", Seq("n_chars"))
      val rolled = spark.read.parquet(src)
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("tc"))
      assert(scannedPaths(rolled).forall(_.startsWith(mv)),
        "global aggregate should re-aggregate the MV")
      val got = rolled.head()
      assert(got.getLong(0) === direct.getLong(0))
      assert(got.getLong(1) === direct.getLong(1))
      // a global aggregate the MV can NOT answer falls through
      val gmin = spark.read.parquet(src).agg(min(col("n_chars")).as("m"))
      assert(!scannedPaths(gmin).exists(_.startsWith(mv)),
        "min does not re-aggregate from (count, sum) — must fall through")
    } finally MvRegistry.unregister(src)
  }

  test("unregister restores the direct plan") {
    val src = freshSource()
    val mv = src + "-mv"
    MvRegistry.register(spark, src, mv, "lang", Seq("n_chars"))
    assert(scannedPaths(query(src)).exists(_.startsWith(mv)))
    MvRegistry.unregister(src)
    assert(scannedPaths(query(src)) === Seq(src))
  }
}
