package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streaming

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("streaming windowed agg equals the batch events_window result") {
    val streamed = Streaming.runToMemory(spark,
      Streaming.windowedAgg(Streaming.readEventsStream(spark, sf)),
      "stream_win")
      .orderBy(col("hour_start"), col("event_type"))
      .collect()
    val batch = SparkEntry.queries("events_window")(spark, sf).collect()
    assert(streamed.length === batch.length)
    streamed.zip(batch).foreach { case (s0, b0) =>
      assert(s0.getAs[java.sql.Timestamp]("hour_start") === b0.getAs[java.sql.Timestamp]("hour_start"))
      assert(s0.getAs[String]("event_type") === b0.getAs[String]("event_type"))
      assert(s0.getAs[Long]("n") === b0.getAs[Long]("n"))
      assert(math.abs(s0.getAs[Double]("total_value") - b0.getAs[Double]("total_value")) < 1e-9)
    }
  }

  test("stateful sessionization: gap splits sessions, state carries across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mins = 60L * 1000 * 1000
    val input = MemoryStream[Streaming.Ev]
    // batch 1: two events 5 min apart (one session)
    input.addData(Streaming.Ev(1L, 1L, 0 * mins, 1.0),
      Streaming.Ev(1L, 2L, 5 * mins, 2.0))
    val out = Streaming.sessionizeStream(spark,
      input.toDF().withColumn("ts", timestamp_micros(col("tsMicros"))))
    val q = out.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("sessions").start()
    try {
      q.processAllAvailable()
      val afterB1 = spark.table("sessions").collect()
      assert(afterB1.map(r => (r.getAs[Int]("session_seq"), r.getAs[Long]("n_events"))).toSeq
        === Seq((1, 2L)))
      // batch 2: 45-min gap → new session (state survived the trigger)
      input.addData(Streaming.Ev(1L, 3L, 50 * mins, 3.0))
      q.processAllAvailable()
      val afterB2 = spark.table("sessions").collect()
        .map(r => (r.getAs[Int]("session_seq"), r.getAs[Long]("n_events"))).toSet
      assert(afterB2.contains((2, 1L)))
    } finally q.stop()
  }

  test("batch sessionize query: session bounds are consistent") {
    val rows = SparkEntry.queries("sessionize")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("session_end_us") >= r.getAs[Long]("session_start_us"))
      assert(r.getAs[Long]("n_events") >= 1L)
    }
    // session_seq is dense 1..k per user
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val seqs = rs.map(_.getAs[Long]("session_seq")).sorted
      assert(seqs === (1L to seqs.length).toArray.toSeq)
    }
  }
}
