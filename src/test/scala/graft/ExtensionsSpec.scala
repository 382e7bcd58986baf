package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streaming

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("cosine_sim is available in bare SQL via GraftExtensions (no register call)") {
    val r = spark.sql(
      "SELECT cosine_sim(array(3.0F, 4.0F), array(3.0F, 4.0F)) AS s").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }

  private def ivfQuery(path: String) = {
    import graft.expressions.GraftFunctions
    GraftFunctions.register(spark)
    val ivf = spark.read.parquet(path)
    val qVec = ivf.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    ivf.filter(col("vec_id") =!= 0)
      .withColumn("sim", round(GraftFunctions.cosineSim(col("embedding"), lit(qVec)), 6))
      .select(col("vec_id"), col("label"), col("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(5)
  }

  test("IvfTopKRewrite prunes an exact top-k query to one cell, transparently") {
    val dir = "/root/testdata/sf0.001"
    val path = graft.operators.Ann.ivfLayout(spark, dir)
    try {
      // without a registered index the exact query scans everything
      graft.plans.IvfIndexRegistry.clear()
      val unpruned = ivfQuery(path)
      assert(!unpruned.queryExecution.executedPlan.toString
        .matches("(?s).*PartitionFilters: \\[[^\\]]*label[^\\]]*=.*"))
      // register → the SAME query now partition-prunes
      graft.plans.IvfIndexRegistry.register(spark, path, "label", "vec_id", "embedding")
      val pruned = ivfQuery(path)
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*label[^\\]]*=.*"),
        s"no cell PartitionFilters in:\n$plan")
      // the rewrite must preserve the LocalLimit (round-2 advice: rebuilding
      // only the GlobalLimit dropped per-partition top-k), so the physical
      // plan stays TakeOrderedAndProject, not a global Sort + single-
      // partition shuffle over the probed cell
      assert(plan.contains("TakeOrderedAndProject"),
        s"rewritten plan lost per-partition top-k:\n$plan")
      val rows = pruned.collect()
      // .get — a plan with no measurable file scan must FAIL, not skip
      val nf = PlanTestUtil.scannedFiles(pruned).get
      assert(nf <= 2, s"read $nf files — pruning failed")
      // identical output to the explicit probe-and-prune operator
      val explicit = SparkEntry.queries("ann_ivf")(spark, dir).collect()
      assert(rows.map(r => (r.getLong(0), r.getDouble(2))).toSeq ===
        explicit.map(r => (r.getLong(0), r.getDouble(2))).toSeq)
    } finally graft.plans.IvfIndexRegistry.clear()
  }
}

class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streaming dedup drops replayed event ids across triggers") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streaming.Ev]
    val deduped = Streaming.dedupStream(
      input.toDF().withColumn("ts", timestamp_micros($"tsMicros")))
    val q = deduped.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_out").start()
    try {
      val min = 60L * 1000 * 1000
      input.addData(Streaming.Ev(1L, 10L, 1 * min, 1.0),
        Streaming.Ev(1L, 10L, 1 * min, 1.0), // duplicate in-batch
        Streaming.Ev(1L, 11L, 2 * min, 2.0))
      q.processAllAvailable()
      input.addData(Streaming.Ev(1L, 10L, 1 * min, 1.0)) // replay across trigger
      q.processAllAvailable()
      val ids = spark.table("dedup_out").collect().map(_.getAs[Long]("event_id"))
      assert(ids.sorted.toSeq === Seq(10L, 11L))
    } finally q.stop()
  }
}
