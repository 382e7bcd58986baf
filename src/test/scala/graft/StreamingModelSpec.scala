package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Conformal, Kll, LogReg, QuantileReg}

/** Streaming twins of the round-8 trained-state operators: the dumped
  * artifacts (logreg weights, KLL sketch) must serve on a STREAM exactly
  * as they do in batch — scoring is a map-only expression so per-trigger
  * output must be bit-equal to the batch query; the KLL typed Aggregator
  * is mergeable by construction, so folding it across triggers must keep
  * its self-certified rank bound sound over the full prefix.
  */
class StreamingModelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("streaming logreg scoring: per-trigger map-only scores equal the batch query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val w = LogReg.model(spark, sf).toSeq
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val scored = input.toDF().toDF("doc_id", "text")
      .select(col("doc_id"),
        round(LogReg.sigmoid(LogReg.linear(col("text"), w)), 6).as("p"))
    val q = scored.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("stream_logreg").start()
    try {
      docs.grouped(200).foreach { chunk =>
        input.addData(chunk.toSeq); q.processAllAvailable()
      }
      val got = spark.table("stream_logreg").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toMap
      val want = SparkEntry.queries("logreg_quality")(spark, sf).collect()
        .map(r => (r.getLong(0), r.getDouble(2))).toMap
      assert(got.size === want.size)
      assert(got === want, "streamed scores diverge from the batch query")
    } finally q.stop()
  }

  test("streaming conformal intervals: per-trigger coverage flags equal the batch report") {
    // the serving face of Conformal: dumped (a, b, q̂) score an event
    // stream map-only — every arriving (x, y) gets its interval verdict
    // with zero state, so per-trigger output must be bit-equal to batch
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val m = Conformal.model(spark, sf)
    val rows = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 3 === 2)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    val input = MemoryStream[(Long, Int, Double, Double)]
    val flagged = input.toDF().toDF("k", "ln", "x", "y")
      .select(col("k"), col("ln"),
        (abs(col("y") - (lit(m.a) + lit(m.b) * col("x"))) <= lit(m.qhat))
          .as("inside"))
    val q = flagged.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("stream_conformal").start()
    try {
      rows.grouped(100).foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic
      // lineitem — compare sorted MULTISETS, never keyed maps
      val got = spark.table("stream_conformal").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).sorted
      val want = Tables.lineitem(spark, sf)
        .filter(col("l_orderkey") % 3 === 2)
        .select(col("l_orderkey"), col("l_linenumber"),
          (abs(col("l_extendedprice") -
            (lit(m.a) + lit(m.b) * col("l_quantity"))) <= lit(m.qhat))
            .as("inside"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).sorted
      assert(got.length === want.length)
      assert(got.sameElements(want), "streamed verdicts diverge from batch")
      // and the aggregate marginal coverage matches the oracled report
      // (report coverage is rounded to 6 per group — allow that wobble)
      val rep = Conformal.coverageReport(spark, sf).collect()
      val n = rep.map(_.getAs[Long]("n_test")).sum
      val cov = rep.map(r => r.getAs[Double]("coverage") * r.getAs[Long]("n_test")).sum
      val streamed = got.count(_._3).toDouble / got.length
      assert(n === got.length.toLong)
      assert(math.abs(streamed - cov / n) < 1e-5)
    } finally q.stop()
  }

  test("streaming KLL maintenance: sketch folds across triggers, certificate sound on the full prefix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vals = (1 to 4000).map(i => ((i * 2654435761L) % 1000) / 7.0)
    val input = MemoryStream[Double]
    val agg = input.toDS().groupByKey(_ => 0)
      .agg(Kll.sketchAgg.toColumn.name("sk"))
    val q = agg.toDF("g", "sk").writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("stream_kll").start()
    try {
      vals.grouped(800).foreach { c =>
        input.addData(c.toSeq); q.processAllAvailable()
      }
      val sk = spark.table("stream_kll")
        .selectExpr("sk.levels AS levels", "sk.err AS err")
        .as[Kll.Buf].head()
      val its = Kll.items(sk)
      // exact weight conservation across every trigger fold
      assert(its.map(_._2).sum === vals.length.toLong)
      // rank certificate sound at the quartiles + p90 over the FULL data
      val n = vals.length
      for (p <- Seq(0.25, 0.5, 0.75, 0.9)) {
        val est = Kll.estimate(its, p)
        val rLo = vals.count(_ < est) + 1
        val rHi = vals.count(_ <= est)
        assert(rHi >= p * n - sk.err && rLo <= p * n + sk.err,
          s"q=$p est=$est rank[$rLo,$rHi] outside ${p * n} ± ${sk.err}")
      }
      // the certificate is not vacuous after streaming folds either
      assert(sk.err < n / 4, s"streaming folds inflated err to ${sk.err}")
    } finally q.stop()
  }

  test("streaming quantile-band tagging: per-trigger interval flags equal batch") {
    // the serving face of QuantileReg: the dumped (tau, a, b) lines tag
    // every arriving (x, y) with its conditional-quantile band — below
    // the median line / between median and q90 / above q90 — map-only
    // with zero state, so per-trigger output must be bit-equal to the
    // same expression evaluated in batch (the anomaly-band monitor a
    // revenue stream would actually run).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val fits = QuantileReg.model(spark, sf)
    val med = fits.find(_.tau == 0.5).get
    val hi = fits.find(_.tau == 0.9).get
    def band(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      when(y < lit(med.a) + lit(med.b) * x, "below_median")
        .when(y < lit(hi.a) + lit(hi.b) * x, "mid_band")
        .otherwise("above_q90")
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("double"), col("l_extendedprice"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    val input = MemoryStream[(Long, Int, Double, Double)]
    val tagged = input.toDF().toDF("k", "ln", "x", "y")
      .select(col("k"), col("ln"), band(col("x"), col("y")).as("band"))
    val q = tagged.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("stream_qreg").start()
    try {
      rows.grouped(1500).foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      // (k, ln) is not unique in the synthetic lineitem — sorted multisets
      val got = spark.table("stream_qreg").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
      val want = Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_linenumber"),
          band(col("l_quantity").cast("double"), col("l_extendedprice"))
            .as("band"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
      assert(got.length === want.length)
      assert(got.sameElements(want), "streamed bands diverge from batch")
      // the bands carry the calibration property end-to-end: ~50% below
      // the median line, ~10% above the q90 line (finite-sample wobble)
      val n = got.length.toDouble
      val below = got.count(_._3 == "below_median") / n
      val above = got.count(_._3 == "above_q90") / n
      assert(math.abs(below - 0.5) < 0.05, s"below-median share $below")
      assert(math.abs(above - 0.1) < 0.05, s"above-q90 share $above")
    } finally q.stop()
  }
}
