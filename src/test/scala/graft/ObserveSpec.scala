package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.funsuite.AnyFunSuite

/** `Dataset.observe` + `QueryExecutionListener` — in-flight pipeline
  * telemetry: named aggregates computed WHILE a job runs (accumulator-
  * backed, no second scan, no extra action) and delivered to a listener.
  * This is how a 100 TB curation job reports rows-kept / rows-dropped /
  * bytes-moved counters without re-running any stage: the metrics ride
  * the same task results the job already produces.
  */
class ObserveSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.01"

  test("observe delivers named metrics from the running job, matching a direct aggregate") {
    val seen = new ConcurrentLinkedQueue[Row]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.get("doc_metrics").foreach(seen.add)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val docs = Tables.documents(spark, sf)
        .observe("doc_metrics",
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          count(when(col("lang") === "en", 1)).as("n_en"))
      // one real action drives both the result and the metrics
      val kept = docs.filter(col("n_chars") > 100).count()
      assert(kept > 0)
      // listener delivery is async; poll briefly instead of touching the
      // private listener bus
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(!seen.isEmpty, "observed metrics never reached the listener")
      val m = seen.peek()
      val want = Tables.documents(spark, sf)
        .agg(count(lit(1)), sum(col("n_chars")),
          count(when(col("lang") === "en", 1))).head()
      assert(m.getLong(m.fieldIndex("n_docs")) === want.getLong(0))
      assert(m.getLong(m.fieldIndex("total_chars")) === want.getLong(1))
      assert(m.getLong(m.fieldIndex("n_en")) === want.getLong(2))
      // the observation sees PRE-filter rows: it sits below the filter,
      // so n_docs counts the whole scan, not the kept subset
      assert(m.getLong(m.fieldIndex("n_docs")) > kept)
    } finally spark.listenerManager.unregister(listener)
  }

  test("streaming observe: per-trigger metrics ride StreamingQueryProgress") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)]
    val q = input.toDF().toDF("k", "v")
      .observe("batch_metrics", count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .writeStream.outputMode("append")
      .format("memory").queryName("obs_stream").start()
    try {
      input.addData((1L, 2.0), (2L, 3.0))
      q.processAllAvailable()
      input.addData((3L, 5.0))
      q.processAllAvailable()
      // each trigger reports ITS batch's metrics — cumulative telemetry
      // is the listener's fold, exactly like production counters
      val per = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("batch_metrics")))
        .map(r => (r.getLong(r.fieldIndex("n")), r.getDouble(r.fieldIndex("sv"))))
        .filter(_._1 > 0)
      assert(per.toSet === Set((2L, 5.0), (1L, 5.0)),
        s"per-trigger observed metrics wrong: $per")
    } finally q.stop()
  }
}
