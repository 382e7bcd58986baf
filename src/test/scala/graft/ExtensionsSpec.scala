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
