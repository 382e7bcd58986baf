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

  test("bounded ingestion: maxFilesPerTrigger caps per-trigger work, AvailableNow drains everything") {
    import scala.jdk.CollectionConverters._
    // the file-source backpressure lever (the Kafka maxOffsetsPerTrigger
    // twin): a backlog of N files must drain in N bounded micro-batches,
    // not one unbounded catch-up batch — at 100 TB the difference between
    // a restartable checkpointed backfill and an OOM'd executor fleet
    val dir = java.nio.file.Files.createTempDirectory("graft_bounded").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "n_chars")
    docs.repartition(6).write.mode("overwrite").parquet(dir)
    val nFiles = spark.read.parquet(dir).inputFiles.length
    assert(nFiles >= 6)
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.add((id, b.count())); ()
      }.start()
    try { q.awaitTermination(120000) } finally q.stop()
    val got = batches.asScala.toSeq
    val maxPerFile = spark.read.parquet(dir)
      .groupBy(col("_metadata.file_path")).count()
      .agg(max("count")).head().getLong(0)
    // every trigger bounded by one file's rows; the whole backlog drained
    assert(got.count(_._2 > 0) === nFiles,
      s"expected $nFiles single-file triggers, got $got")
    assert(got.forall(_._2 <= maxPerFile))
    assert(got.map(_._2).sum === docs.count())
  }

  test("streaming sliding-window agg equals the batch sliding_window_agg result") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("win_start_us"), r.getAs[String]("event_type"),
        r.getAs[Long]("n"), r.getAs[Double]("total_value"))
    val streamed = Streaming.runToMemory(spark,
      Streaming.slidingWindowAgg(Streaming.readEventsStream(spark, sf)),
      "stream_slide_win")
      .collect().map(key).toSet
    val batch = SparkEntry.queries("sliding_window_agg")(spark, sf)
      .collect().map(key).toSet
    assert(streamed === batch, "sliding-window stream diverged from batch")
    assert(batch.nonEmpty)
    // the hop really overlaps: 4 window starts per hour of data, so
    // distinct sliding starts must outnumber the tumbling face's
    // distinct hours
    val tumblingHours = SparkEntry.queries("events_window")(spark, sf)
      .select("hour_start").distinct().count()
    assert(batch.map(_._1).size > tumblingHours,
      "slide produced no overlapping windows")
  }

  test("chained stateful operators: hourly agg re-windowed into 4-hour rollups in ONE query") {
    // Two window aggregations chained in a single streaming query — the
    // rollup cascade (raw → hourly → 4-hourly) without an intermediate
    // topic + second job. The downstream agg must finalize a 4-hour
    // window only when the watermark proves all its hourly partials
    // final; the plan must really carry TWO state stores.
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("win4_start_us"), r.getAs[String]("event_type"),
        r.getAs[Long]("n"), r.getAs[Double]("total_value"))
    val q = Streaming.chainedWindowAgg(Streaming.readEventsStream(spark, sf))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("stream_chained").start()
    val progress = try { q.processAllAvailable(); q.lastProgress } finally q.stop()
    assert(progress.stateOperators.length === 2,
      s"expected 2 stateful operators in one query, got ${progress.stateOperators.length}")
    val streamed = spark.table("stream_chained").collect().map(key).toSet
    val batch = SparkEntry.queries("chained_window_agg")(spark, sf)
      .collect().map(key).toSet
    // append mode: emitted ⊆ batch exactly; anything missing must be a
    // 4-hour window still inside the unclosed watermark horizon
    assert(streamed.nonEmpty && streamed.subsetOf(batch),
      s"chained stream diverged from batch: ${(streamed -- batch).take(3)}")
    val maxUs = Tables.events(spark, sf)
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val watermarkUs = maxUs - 2L * 3600 * 1000 * 1000
    val pending = batch -- streamed
    assert(pending.forall(_._1 + 4L * 3600 * 1000 * 1000 >= watermarkUs),
      s"closed 4-hour windows never emitted: ${pending.take(3)}")
  }

  test("streaming session_window: emitted sessions equal the batch twin; only unclosed tail sessions pend") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_us"),
        r.getAs[Long]("session_end_us"), r.getAs[Long]("n_events"),
        r.getAs[Double]("value_sum"))
    val streamed = Streaming.runToMemory(spark,
      Streaming.sessionWindowAgg(Streaming.readEventsStream(spark, sf)),
      "stream_sess_win", OutputMode.Append())
      .collect().map(key).toSet
    val batch = SparkEntry.queries("session_window_agg")(spark, sf)
      .collect().map(key).toSet
    // append mode emits a session only once the watermark proves it
    // closed; at end-of-stream the watermark rests 2h behind max event
    // time, so tail sessions legitimately pend — every EMITTED session
    // must match the batch twin exactly, and every missing one must sit
    // inside the unclosed horizon
    assert(streamed.nonEmpty && streamed.subsetOf(batch),
      s"streamed rows diverge from batch: ${(streamed -- batch).take(3)}")
    val maxUs = Tables.events(spark, sf)
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val watermarkUs = maxUs - 2L * 3600 * 1000 * 1000
    val pending = batch -- streamed
    assert(pending.forall(_._3 >= watermarkUs),
      s"closed sessions were never emitted: ${pending.filter(_._3 < watermarkUs).take(3)}")
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

  test("stream-stream interval join equals the batch interval_join result") {
    val ev = Tables.events(spark, sf)
    val stream = Streaming.readEventsStream(spark, sf)
    val joined = Streaming.clickViewJoin(
      stream.filter(col("event_type") === "click").withWatermark("ts", "2 hours"),
      stream.filter(col("event_type") === "view").withWatermark("ts", "2 hours"))
    val streamed = Streaming.runToMemory(spark, joined, "ss_join", OutputMode.Append())
      .orderBy(col("click_id"), col("view_id")).collect()
    val batch = SparkEntry.queries("interval_join")(spark, sf).collect()
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
    assert(batch.nonEmpty) // the fixture must actually exercise the join
  }

  test("stream-stream LEFT OUTER interval join: matches emit eagerly, no-match clicks null-pad only on watermark expiry") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hour = 3600L * 1000 * 1000
    val min = 60L * 1000 * 1000
    val clicksIn = MemoryStream[(Long, Long, Long)] // (user_id, event_id, tsMicros)
    val viewsIn = MemoryStream[(Long, Long, Long)]
    def asDf(ms: MemoryStream[(Long, Long, Long)]) =
      ms.toDF().toDF("user_id", "event_id", "tsMicros")
        .withColumn("ts", timestamp_micros(col("tsMicros")))
    val joined = Streaming.clickViewJoinLeftOuter(
      asDf(clicksIn).withWatermark("ts", "10 minutes"),
      asDf(viewsIn).withWatermark("ts", "10 minutes"))
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ss_louter").start()
    try {
      // click 100 @10h has view 200 @9h30 in its hour; click 101 @13h has none
      clicksIn.addData((1L, 100L, 10 * hour), (1L, 101L, 13 * hour))
      viewsIn.addData((1L, 200L, 10 * hour - 30 * min))
      q.processAllAvailable()
      def rows = spark.table("ss_louter").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long])))
        .toSet
      // the MATCH emits eagerly; the no-view click must NOT have null-
      // padded yet — a view in (12h, 13h] could still arrive
      assert(rows === Set((1L, 100L, Some(200L))),
        s"premature outer emission: $rows")
      // advance BOTH watermarks past 13h (disjoint users/times: the flush
      // click stays pending itself, the flush view matches nothing)
      clicksIn.addData((9L, 999L, 20 * hour))
      viewsIn.addData((8L, 998L, 20 * hour))
      q.processAllAvailable()
      // now the no-match verdict is in evidence: exactly one null row
      assert(rows === Set((1L, 100L, Some(200L)), (1L, 101L, None)),
        s"outer row missing or duplicated after expiry: $rows")
      // the null row rode on state eviction, and the engine says so
      assert(q.recentProgress.exists(
          _.stateOperators.exists(_.numRowsRemoved > 0)),
        "no join state was evicted")
      // per-trigger union ≡ the batch left-outer twin over the same
      // pre-flush events (the pending flush click is not yet evidence)
      val bc = Seq((1L, 100L, 10 * hour), (1L, 101L, 13 * hour))
        .toDF("user_id", "event_id", "tsMicros")
        .withColumn("ts", timestamp_micros(col("tsMicros")))
      val bv = Seq((1L, 200L, 10 * hour - 30 * min))
        .toDF("user_id", "event_id", "tsMicros")
        .withColumn("ts", timestamp_micros(col("tsMicros")))
      val batch = Streaming.clickViewJoinLeftOuter(bc, bv).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long])))
        .toSet
      assert(rows === batch, s"streamed $rows != batch twin $batch")
    } finally q.stop()
  }

  test("stream-stream FULL OUTER interval join: both unmatched sides null-pad on their own eviction horizons") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hour = 3600L * 1000 * 1000
    val min = 60L * 1000 * 1000
    val clicksIn = MemoryStream[(Long, Long, Long)]
    val viewsIn = MemoryStream[(Long, Long, Long)]
    def asDf(ms: MemoryStream[(Long, Long, Long)]) =
      ms.toDF().toDF("user_id", "event_id", "tsMicros")
        .withColumn("ts", timestamp_micros(col("tsMicros")))
    val joined = Streaming.clickViewJoinFullOuter(
      asDf(clicksIn).withWatermark("ts", "10 minutes"),
      asDf(viewsIn).withWatermark("ts", "10 minutes"))
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ss_fouter").start()
    try {
      // click 100 @10h matches view 200 @9h30; click 101 @13h has no view;
      // view 201 @11h is claimable only by clicks in [11h, 12h] — none come
      clicksIn.addData((1L, 100L, 10 * hour), (1L, 101L, 13 * hour))
      viewsIn.addData((1L, 200L, 10 * hour - 30 * min), (1L, 201L, 11 * hour))
      q.processAllAvailable()
      def rows = spark.table("ss_fouter").collect()
        .map(r => (r.getLong(0),
          Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Long])))
        .toSet
      // the match emits eagerly; click 101's no-view verdict is NOT in
      // evidence yet (watermark 12h50 < 13h) — premature null-pad is the bug
      val r1 = rows
      assert(r1.contains((1L, Some(100L), Some(200L))), s"match missing: $r1")
      assert(!r1.contains((1L, Some(101L), None)),
        s"premature click-side outer emission: $r1")
      // advance both watermarks past every horizon (disjoint user/time)
      clicksIn.addData((9L, 999L, 20 * hour))
      viewsIn.addData((8L, 998L, 20 * hour))
      q.processAllAvailable()
      // both verdicts now in evidence: the no-view click AND the
      // never-claimed view null-pad exactly once each
      val expected = Set(
        (1L, Option(100L), Option(200L)),
        (1L, Option(101L), Option.empty[Long]),
        (1L, Option.empty[Long], Option(201L)))
      assert(rows === expected, s"full-outer rows wrong: $rows")
      // eviction evidence: on the full-outer path Spark 4.1 generates the
      // null rows in the state-cleanup pass WITHOUT ticking numRowsRemoved
      // (observed; the left-outer flush path does tick it), so assert the
      // state footprint itself shrank: peak buffered rows > final buffered
      // rows (final = only the two pending flush probes)
      val totals = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsTotal)).toSeq
      assert(totals.nonEmpty && totals.max > totals.last,
        s"join state never shrank: $totals")
      // per-trigger union ≡ the batch full-outer twin on pre-flush events
      val bc = Seq((1L, 100L, 10 * hour), (1L, 101L, 13 * hour))
        .toDF("user_id", "event_id", "tsMicros")
        .withColumn("ts", timestamp_micros(col("tsMicros")))
      val bv = Seq((1L, 200L, 10 * hour - 30 * min), (1L, 201L, 11 * hour))
        .toDF("user_id", "event_id", "tsMicros")
        .withColumn("ts", timestamp_micros(col("tsMicros")))
      val batch = Streaming.clickViewJoinFullOuter(bc, bv).collect()
        .map(r => (r.getLong(0),
          Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Long])))
        .toSet
      assert(rows === batch, s"streamed $rows != batch twin $batch")
    } finally q.stop()
  }

  test("watermark drops late events: a row older than the watermark never reaches the aggregate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hour = 3600L * 1000 * 1000 // micros
    val min = 60L * 1000 * 1000
    val input = MemoryStream[(Long, String, Double)]
    val agged = Streaming.windowedAgg(
      input.toDF().toDF("tsMicros", "event_type", "value")
        .withColumn("ts", timestamp_micros(col("tsMicros"))))
    val q = agged.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("late_drop").start()
    try {
      // on-time: hour-100 and hour-110 events; after this trigger the
      // watermark sits at 110h − 2h = 108h, far past hour 100's window
      input.addData((100 * hour + 10 * min, "click", 1.0),
        (110 * hour, "click", 7.0))
      q.processAllAvailable()
      // LATE: event-time hour 100 + 15 min — 8 hours older than the
      // watermark. It must be DROPPED before the aggregate, not merged
      // into (or re-emit) the finalized window.
      input.addData((100 * hour + 15 * min, "click", 100.0))
      q.processAllAvailable()
      // flush: advance the watermark past hour 110 so everything emits
      input.addData((120 * hour, "view", 3.0))
      q.processAllAvailable()
      val h100 = spark.table("late_drop").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("hour_start").getTime,
          r.getAs[String]("event_type"), r.getAs[Long]("n"),
          r.getAs[Double]("total_value")))
        .filter(_._1 == 100L * 3600 * 1000)
      // exactly the on-time contents: one row, n=1, the late 100.0 absent
      assert(h100.toSeq === Seq((100L * 3600 * 1000, "click", 1L, 1.0)),
        s"late event leaked into the finalized window: ${h100.toSeq}")
      // and the engine reports the drop in its state-operator metrics
      assert(q.recentProgress.exists(
          _.stateOperators.exists(_.numRowsDroppedByWatermark > 0)),
        "no rows were reported dropped by the watermark")
    } finally q.stop()
  }

  test("dedup within watermark: replay inside the horizon dropped, after state expiry re-emitted") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hour = 3600L * 1000 * 1000 // micros
    val min = 60L * 1000 * 1000
    val input = MemoryStream[(Long, Long)]
    val deduped = Streaming.dedupStream(
      input.toDF().toDF("tsMicros", "event_id")
        .withColumn("ts", timestamp_micros(col("tsMicros"))))
    val q = deduped.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_wm").start()
    try {
      // first sightings: both emit
      input.addData((100 * hour, 1L), (100 * hour + 10 * min, 2L))
      q.processAllAvailable()
      // replay of id 1 WITHIN the 1h lateness horizon: state still holds
      // the id — dropped, nothing new emitted
      input.addData((100 * hour + 20 * min, 1L))
      q.processAllAvailable()
      // jump event time 10 hours: watermark (max ts − 1 h) passes far
      // beyond id 1's first sighting, so its dedup state is EVICTED —
      // that bounded state is the whole point of the within-watermark form
      input.addData((110 * hour, 3L))
      q.processAllAvailable()
      // id 1 again, post-eviction: a fresh first sighting — emits again
      input.addData((110 * hour + 10 * min, 1L))
      q.processAllAvailable()
      val ids = spark.table("dedup_wm").collect()
        .map(_.getAs[Long]("event_id")).groupBy(identity)
        .view.mapValues(_.length).toMap
      assert(ids === Map(1L -> 2, 2L -> 1, 3L -> 1),
        s"within-horizon replay must dedup, post-expiry replay must pass: $ids")
    } finally q.stop()
  }

  test("streaming image dedup: per-trigger phash-vs-index equals the batch rescore") {
    import spark.implicits._
    import graft.operators.{MediaCodec, Multimodal, Phash}
    implicit val sqlCtx = spark.sqlContext
    // static index: the historical corpus's phash bands
    val staticDocs = graft.Tables.documents(spark, sf)
    val index = Phash.hashBands(Multimodal.synthesizeMedia(staticDocs))
      .cache()
    // arrivals: two ids re-synthesizing EXISTING images (same (w, h,
    // format class) as static docs → exact dups), plus one engineered to
    // a (w, h, class) combo absent from the static set → novel
    val statics = staticDocs.select("doc_id", "n_chars")
      .as[(Long, Long)].collect()
    val present = statics.map { case (id, n) =>
      (1 + id % 31, 1 + n % 29, id % 4)
    }.toSet
    // a combo absent from the static set is not enough — small images can
    // land within the rescore radius by coincidence; pick one whose hash
    // provably clears it against every static hash
    val staticHashes = index.as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(a => a.sortBy(_._2).map(_._3)).toMap
    val novel = (for {
      w <- 1L to 31L; h <- 1L to 29L
      if !present.contains((w, h, 1L)) // png0 class: id%4==1
    } yield (w, h)).find { case (w, h) =>
      val cb = Phash.aHashBands(
        MediaCodec.decodePixels(MediaCodec.encodePng(w.toInt, h.toInt, 0)))
      staticHashes.values.forall(sb =>
        (0 until 4).map(i => java.lang.Long.bitCount(cb(i) ^ sb(i))).sum > 2)
    }.get
    val dupA = statics(0); val dupB = statics(1)
    // an id congruent mod lcm(31,4)=124 with the same n_chars residue
    // synthesizes the byte-identical payload under a fresh id
    val novelId = (0L until 124L)
      .find(i => i % 31 == novel._1 - 1 && i % 4 == 1).get + 124 * 200
    val arr = Seq(
      (dupA._1 + 124 * 100, dupA._2),
      (dupB._1 + 124 * 100, dupB._2),
      (novelId, novel._2 - 1))
    val input = MemoryStream[(Long, Long)]
    val arriving = Multimodal.synthesizeMedia(
      input.toDF().toDF("doc_id", "n_chars"))
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = Phash.hashBands(arriving).writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= Phash.dupAgainstIndex(batch, index, maxHamming = 2)
          .as[(Long, Long, Long)].collect()
        ()
      }.start()
    try {
      input.addData(arr.take(2)); q.processAllAvailable()
      input.addData(arr.drop(2)); q.processAllAvailable()
      // batch equivalent over the same arrivals
      val batchBands = Phash.hashBands(Multimodal.synthesizeMedia(
        arr.toDF("doc_id", "n_chars")))
      val want = Phash.dupAgainstIndex(batchBands, index, maxHamming = 2)
        .as[(Long, Long, Long)].collect().toSet
      assert(got.toSet === want, "per-trigger dedup diverged from batch")
      // the two replayed images are exact dups of their static originals
      assert(got.exists(t => t._1 == arr(0)._1 && t._2 == dupA._1 && t._3 == 0L))
      assert(got.exists(t => t._1 == arr(1)._1 && t._2 == dupB._1 && t._3 == 0L))
      // the engineered novel image collides with nothing
      assert(!got.exists(_._1 == novelId), "novel image wrongly matched the index")
    } finally { q.stop(); index.unpersist() }
  }

  test("streaming funnel state machine equals the batch funnel stage counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // feed the whole events fixture in event-time order across 3 batches;
    // chains that straddle batch boundaries must still be detected (state
    // carries the horizon-pruned view/click sets across triggers)
    val all = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .as[(Long, String, Long)].collect().sortBy(_._3)
    val thirds = all.grouped((all.length + 2) / 3).toSeq
    val input = MemoryStream[(Long, String, Long)]
    val stream = Streaming.funnelStream(spark,
      input.toDF().toDF("user_id", "event_type", "us")
        .withColumn("ts", timestamp_micros(col("us"))))
    val q = stream.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("funnel_stream").start()
    try {
      thirds.foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
      val got = spark.table("funnel_stream")
        .groupBy(col("stage")).agg(countDistinct(col("user_id")).as("n_users"))
        .as[(String, Long)].collect().toMap
      val want = graft.SparkEntry.queries("funnel_stages")(spark, sf)
        .as[(String, Long)].collect().toMap
      assert(got === want, s"streaming funnel diverged from batch: $got vs $want")
      // each transition emitted exactly once per user
      val dups = spark.table("funnel_stream")
        .groupBy(col("user_id"), col("stage")).count()
        .filter(col("count") > 1).count()
      assert(dups === 0, "a stage transition was emitted more than once")
    } finally q.stop()
  }

  test("transformWithState TTL dedup: replay dropped while state lives, re-emitted after expiry") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store; scope the
    // provider override to this query and restore the default after
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, String)]
    val deduped = Streaming.dedupTtlStream(spark,
      input.toDF().toDF("k", "v"), java.time.Duration.ofSeconds(5))
    // A TTL processor has pending state-expiry work every trigger, so the
    // engine schedules batches continuously: processAllAvailable never
    // latches and even Trigger.AvailableNow keeps running timer batches
    // (measured: 2 500+ committed batches without terminating). So never
    // WAIT on the query — leave it running under the default trigger and
    // poll, using the source offset recorded in query progress to know a
    // given addData batch was fully processed before asserting on output.
    val q = deduped.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ttl_dedup").start()
    def table(): Seq[(Long, String)] =
      spark.table("ttl_dedup").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    def awaitProcessed(off: org.apache.spark.sql.connector.read.streaming.Offset): Unit = {
      val want = off.json.toLong
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while ({
        val lp = q.lastProgress
        lp == null || lp.sources.isEmpty || {
          val end = lp.sources.head.endOffset
          end == null || end.toLong < want
        }
      }) {
        if (System.nanoTime() > deadline) fail(s"stream never reached offset $want")
        Thread.sleep(50)
      }
    }
    try {
      awaitProcessed(input.addData((1L, "a"), (1L, "a-dup-in-batch"), (2L, "b")))
      assert(table().toSet === Set((1L, "a"), (2L, "b")),
        s"within-batch dup must keep first sighting only: ${table()}")
      // replay while the 5s TTL state is alive: still deduped
      awaitProcessed(input.addData(Seq((1L, "a-replay"))))
      assert(table().toSet === Set((1L, "a"), (2L, "b")),
        s"within-TTL replay must emit nothing new: ${table()}")
      // let the TTL lapse in processing time, then replay: fresh sighting
      Thread.sleep(6500)
      awaitProcessed(input.addData(Seq((1L, "a-after-ttl"))))
      assert(table().toSet === Set((1L, "a"), (2L, "b"), (1L, "a-after-ttl")),
        s"post-TTL replay must be re-emitted: ${table()}")
    } finally {
      q.stop()
      prev match { case Some(p) => spark.conf.set(provKey, p)
                   case None => spark.conf.unset(provKey) }
    }
  }

  test("streaming gap monitor detects cross-trigger silences and matches batch ts_gaps") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("tsMicros"), col("event_id"))
      .as[Streaming.GapEv].collect().sortBy(e => (e.tsMicros, e.event_id))
    val cut = evs(evs.length / 2).tsMicros
    val input = MemoryStream[Streaming.GapEv]
    val q = Streaming.gapStream(spark, input.toDF())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("gap_stream").start()
    try {
      input.addData(evs.filter(_.tsMicros <= cut).toIndexedSeq)
      q.processAllAvailable()
      input.addData(evs.filter(_.tsMicros > cut).toIndexedSeq)
      q.processAllAvailable()
      val got = spark.table("gap_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val want = SparkEntry.queries("ts_gaps")(spark, sf).collect()
        .map(r => (r.getLong(0),
          r.getAs[java.sql.Timestamp]("gap_start").getTime * 1000,
          r.getAs[java.sql.Timestamp]("gap_end").getTime * 1000,
          r.getLong(3))).toSet
      // ms→µs via getTime loses sub-ms precision; compare at ms grain
      def ms(s: Set[(Long, Long, Long, Long)]) = s.map(t => (t._1, t._2 / 1000, t._3 / 1000, t._4))
      assert(ms(got) === ms(want), "streaming gaps diverged from the batch monitor")
      assert(got.nonEmpty, "fixture must contain at least one gap")
    } finally q.stop()
  }

  test("streaming fingerprint: every trigger's emission equals the batch fingerprint of rows-so-far") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val chunks = docs.grouped((docs.length + 2) / 3).toSeq
    assert(chunks.length === 3)
    val input = MemoryStream[(Long, String)]
    val canon = concat_ws("|", col("_1"), col("_2"))
    val q = Streaming.fingerprintStream(input.toDF(), canon)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("fp_stream").start()
    try {
      var seen = Seq.empty[(Long, String)]
      chunks.foreach { chunk =>
        input.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
        seen = seen ++ chunk
        val got = spark.table("fp_stream").collect()
        assert(got.length === 1)
        // batch fingerprint of the prefix — the SAME helper over a batch
        // frame (one definition, two execution modes)
        val want = Streaming.fingerprintStream(seen.toDF("_1", "_2"), canon).head()
        assert(got.head.getLong(0) === want.getLong(0), "n_rows diverged")
        assert(got.head.getLong(1) === want.getLong(1),
          s"fingerprint diverged after ${seen.length} rows")
      }
      assert(seen.length === docs.length)
    } finally q.stop()
  }

  test("streaming decayed counter: incremental-decay fold matches the batch weights within 1e-9 relative") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lambda = 0.09902102579427789 // ln2 / 7 days, the batch query's λ
    val evs = Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("tsMicros"), col("value"))
      .collect().map(r => Streaming.DecayEv(r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_.tsMicros)
    val cut = evs(evs.length / 2).tsMicros
    val input = MemoryStream[Streaming.DecayEv]
    val q = Streaming.decayedCountStream(spark, input.toDF(), lambda)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("decay_stream").start()
    try {
      input.addData(evs.filter(_.tsMicros <= cut).toIndexedSeq)
      q.processAllAvailable()
      input.addData(evs.filter(_.tsMicros > cut).toIndexedSeq)
      q.processAllAvailable()
      val got = spark.table("decay_stream")
        .groupBy(col("event_type"))
        .agg(max(struct(col("n_raw"), col("decayed_n"), col("decayed_sum"),
          col("last_us"))).as("st"))
        .select(col("event_type"), col("st.*"))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
        .toMap
      // batch twin computed per type at each type's own last-event instant
      // (the state the stream holds), same Σ e^(−λ(ref−t)) weights
      val batch = evs.groupBy(_.event_type).map { case (k, es) =>
        val ref = es.map(_.tsMicros).max
        val dn = es.map(e => math.exp(-lambda * (ref - e.tsMicros) / 86400000000.0)).sum
        val dv = es.map(e => e.value * math.exp(-lambda * (ref - e.tsMicros) / 86400000000.0)).sum
        k -> (es.length.toLong, dn, dv, ref)
      }
      assert(got.keySet === batch.keySet)
      got.foreach { case (k, (n, dn, dv, last)) =>
        val (bn, bdn, bdv, bref) = batch(k)
        assert(n === bn && last === bref)
        assert(math.abs(dn - bdn) / bdn < 1e-9,
          s"$k decayed_n: stream $dn vs batch $bdn")
        assert(math.abs(dv - bdv) / math.abs(bdv) < 1e-9,
          s"$k decayed_sum: stream $dv vs batch $bdv")
      }
    } finally q.stop()
  }

  test("streaming CUSUM continues across triggers and matches the batch fold's final state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the daily-count digest + offline baseline, exactly what the batch
    // query computes before its fold
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("x"))
      .select(col("event_type"), unix_micros(col("day")).as("dayUs"), col("x"))
      .collect().map(r => Streaming.CusumEv(r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(e => (e.dayUs, e.event_type))
    val mu = daily.groupBy(_.event_type)
      .map { case (k, es) => k -> es.map(_.x).sum / es.length }
    val cut = daily(daily.length / 2).dayUs
    val input = MemoryStream[Streaming.CusumEv]
    val q = Streaming.cusumStream(spark, input.toDF(), mu)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("cusum_stream").start()
    try {
      input.addData(daily.filter(_.dayUs <= cut).toIndexedSeq)
      q.processAllAvailable()
      input.addData(daily.filter(_.dayUs > cut).toIndexedSeq)
      q.processAllAvailable()
      val got = spark.table("cusum_stream")
        .groupBy(col("event_type"))
        .agg(max(struct(col("n_days"), col("s"))).as("st"))
        .select(col("event_type"), col("st.n_days").as("n_days"),
          round(col("st.s"), 6).as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      // batch twin: last row per type of cusum_shift (the fold's endpoint)
      val batch = SparkEntry.queries("cusum_shift")(spark, sf)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"), max(struct(col("day"), col("s"))).as("last"))
        .select(col("event_type"), col("n_days"), round(col("last.s"), 6).as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === batch, s"streaming CUSUM diverged: $got vs $batch")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("streaming EWMA fold continues across triggers and matches the batch query exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the real corpus, split into two time-ordered triggers at the median
    // ts — the fold must CONTINUE from checkpointed state, not restart
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("tsMicros"),
        col("event_id"), col("value"))
      .as[Streaming.EwmaEv].collect().sortBy(e => (e.tsMicros, e.event_id))
    val cut = evs(evs.length / 2).tsMicros
    val input = MemoryStream[Streaming.EwmaEv]
    val q = Streaming.ewmaStream(spark, input.toDF())
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("ewma_stream").start()
    try {
      input.addData(evs.filter(_.tsMicros <= cut).toIndexedSeq)
      q.processAllAvailable()
      input.addData(evs.filter(_.tsMicros > cut).toIndexedSeq)
      q.processAllAvailable()
      // latest emission per user (max n_events) ≡ the one-shot batch fold
      val got = spark.table("ewma_stream")
        .groupBy(col("user_id"))
        .agg(max(struct(col("n_events"), col("ewma"))).as("st"))
        .select(col("user_id"), col("st.n_events").as("n_events"),
          round(col("st.ewma"), 6).as("ewma"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = SparkEntry.queries("ewma_user_value")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === want, "streaming EWMA diverged from the batch fold")
      assert(want.nonEmpty)
    } finally q.stop()
  }

  test("streaming Holt level+trend fold continues across triggers and matches the batch query exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("tsMicros"),
        col("event_id"), col("value"))
      .as[Streaming.EwmaEv].collect().sortBy(e => (e.tsMicros, e.event_id))
    val cut = evs(evs.length / 2).tsMicros
    val input = MemoryStream[Streaming.EwmaEv]
    val q = Streaming.holtStream(spark, input.toDF())
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("holt_stream").start()
    try {
      input.addData(evs.filter(_.tsMicros <= cut).toIndexedSeq)
      q.processAllAvailable()
      input.addData(evs.filter(_.tsMicros > cut).toIndexedSeq)
      q.processAllAvailable()
      val got = spark.table("holt_stream")
        .groupBy(col("user_id"))
        .agg(max(struct(col("n_events"), col("level"), col("trend"),
          col("forecast3"))).as("st"))
        .select(col("user_id"), col("st.n_events").as("n_events"),
          round(col("st.level"), 6).as("level"),
          round(col("st.trend"), 6).as("trend"),
          round(col("st.forecast3"), 6).as("forecast3"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4))).toSet
      val want = SparkEntry.queries("holt_forecast")(spark, sf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4))).toSet
      assert(got === want, "streaming Holt diverged from the batch fold")
      assert(want.nonEmpty)
      // a single-event key must read (level = x_0, trend = 0): the
      // batch init contract carried by the streaming first-event branch
      val singles = want.filter(_._2 == 1L)
      assert(singles.forall(t => t._4 == 0.0 && t._5 == t._3),
        "single-event keys must carry zero trend")
    } finally q.stop()
  }

  test("streaming Holt-Winters: buffered init + fold continuation matches the batch query exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("tsMicros"),
        col("event_id"), col("value"))
      .as[Streaming.EwmaEv].collect().sortBy(e => (e.tsMicros, e.event_id))
    // cut INSIDE many keys' first two seasons so the buffered-init path
    // provably crosses a trigger boundary for some users
    val cut = evs(evs.length / 3).tsMicros
    val input = MemoryStream[Streaming.EwmaEv]
    val q = Streaming.holtWintersStream(spark, input.toDF())
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("hw_stream").start()
    try {
      input.addData(evs.filter(_.tsMicros <= cut).toIndexedSeq)
      q.processAllAvailable()
      input.addData(evs.filter(_.tsMicros > cut).toIndexedSeq)
      q.processAllAvailable()
      val got = spark.table("hw_stream")
        .groupBy(col("user_id"))
        .agg(max(struct(col("n_events"), col("ready"), col("level"),
          col("trend"), col("s_next"), col("forecast1"))).as("st"))
        .filter(col("st.ready"))
        .select(col("user_id"), col("st.n_events").as("n_events"),
          round(col("st.level"), 6).as("level"),
          round(col("st.trend"), 6).as("trend"),
          round(col("st.s_next"), 6).as("s_next"),
          round(col("st.forecast1"), 6).as("forecast1"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5))).toSet
      val want = SparkEntry.queries("holt_winters")(spark, sf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5))).toSet
      assert(got === want, "streaming Holt-Winters diverged from the batch fold")
      assert(want.nonEmpty)
      // below-two-seasons keys must be suppressed, not emitted with a
      // half-initialized model
      val notReady = spark.table("hw_stream").filter(!col("ready"))
      assert(notReady.filter(col("n_events") >= 8).count() === 0L)
    } finally q.stop()
  }

  test("streaming sparse serve: per-trigger text queries equal the batch search over the same queries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val q1 = Seq(1L -> Seq("data", "table"), 2L -> Seq("query", "join"))
    val q2 = Seq(3L -> Seq("scan"))
    val results = scala.collection.mutable.Map[Long, Array[(Long, Long, Double)]]()
    val input = MemoryStream[(Long, Seq[String])]
    val q = Streaming.sparseServe(input.toDF().toDF("qid", "terms"), sf) {
      (df, id) =>
        results(id) = df.collect().map(r =>
          (r.getAs[Long]("qid"), r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
        ()
    }
    try {
      input.addData(q1: _*); q.processAllAvailable()
      input.addData(q2: _*); q.processAllAvailable()
    } finally q.stop()
    def batch(qs: Seq[(Long, Seq[String])]) =
      graft.operators.InvertedIndex.sparseSearchBatch(spark, sf, qs)
        .collect().map(r =>
          (r.getAs[Long]("qid"), r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
    assert(results(0L).toSeq === batch(q1).toSeq)
    assert(results(1L).toSeq === batch(q2).toSeq)
    assert(results(0L).nonEmpty && results(1L).nonEmpty)
  }

  test("streaming WAP ingestion: good triggers publish atomically, a poisoned trigger quarantines itself") {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{DataQuality, TxnLog}
    val root = java.nio.file.Files.createTempDirectory("graft_wap_stream")
      .toFile.getAbsolutePath + "/t"
    TxnLog.init(Seq((1L, "en"), (2L, "de")).toDF("doc_id", "lang"), root)
    val checks = Seq(
      DataQuality.Check("ids_unique", DataQuality.uniquenessRatio(col("doc_id")),
        _ === 1.0),
      DataQuality.Check("lang_known", DataQuality.inSetRatio(col("lang"),
        Seq("en", "de", "fr")), _ === 1.0))
    val verdicts = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Boolean)]()
    val input = MemoryStream[(Long, String)]
    val q = Streaming.wapIngestStream(spark,
      input.toDF().toDF("doc_id", "lang"), root, checks, verdicts)
    try {
      input.addData((3L, "fr"), (4L, "en"))        // good
      q.processAllAvailable()
      input.addData((3L, "en"), (5L, "xx"))        // poisoned: dup id + bad lang
      q.processAllAvailable()
      input.addData((6L, "de"))                    // good again
      q.processAllAvailable()
    } finally q.stop()
    val vs = verdicts.asScala.toSeq.sortBy(_._1).map(_._2)
    assert(vs === Seq(true, false, true), s"verdicts: $vs")
    // the table holds exactly the published batches — the poisoned rows
    // never landed, and the version history shows 3 commits (init + 2)
    assert(TxnLog.latestVersion(spark, root) === 3)
    val ids = TxnLog.read(spark, root).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 2L, 3L, 4L, 6L))
  }

  test("state store + state-metadata sources: checkpointed dedup state is introspectable offline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hour = 3600L * 1000 * 1000
    val input = MemoryStream[(Long, Long)]
    val deduped = Streaming.dedupStream(
      input.toDF().toDF("event_id", "tsMicros")
        .withColumn("ts", timestamp_micros(col("tsMicros"))))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ss_ckpt").toString
    val q = deduped.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ss_introspect")
      .option("checkpointLocation", ckpt).start()
    try {
      input.addData((1L, 100 * hour), (2L, 100 * hour + 1), (1L, 100 * hour + 2))
      q.processAllAvailable()
    } finally q.stop()
    // the checkpoint IS a queryable table after the query stops — the ops
    // face for debugging a production stream's state without replaying it
    val meta = spark.read.format("state-metadata").load(ckpt)
      .select(col("operatorName")).collect().map(_.getString(0))
    assert(meta.exists(_.toLowerCase.contains("dedup")),
      s"dedup operator not visible in state metadata: ${meta.toSeq}")
    val keys = spark.read.format("statestore").load(ckpt)
      .select(col("key.event_id")).collect().map(_.getLong(0)).toSet
    assert(keys === Set(1L, 2L),
      s"checkpointed dedup state must hold exactly the first-seen keys: $keys")
  }

  test("restart from checkpoint: a new query resumes the old state, not a blank one") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hour = 3600L * 1000 * 1000
    val input = MemoryStream[(Long, Long)]
    def dedup = Streaming.dedupStream(
      input.toDF().toDF("event_id", "tsMicros")
        .withColumn("ts", timestamp_micros(col("tsMicros"))))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_restart").toString
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    def start() = dedup.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        emitted ++= b.select(col("event_id")).collect().map(_.getLong(0))
        ()
      }
      .start()
    // incarnation 1: keys 1 and 2 enter state
    val q1 = start()
    try {
      input.addData((1L, 100 * hour), (2L, 100 * hour + 1))
      q1.processAllAvailable()
      assert(emitted.sorted.toSeq === Seq(1L, 2L))
    } finally q1.stop()
    // incarnation 2: SAME checkpoint — the crash-recovery path. A replay
    // of key 1 must still be suppressed (state restored from the store,
    // not rebuilt blank — a blank restart would emit 1 again), a fresh
    // key 3 passes.
    val q2 = start()
    try {
      input.addData((1L, 100 * hour + 2), (3L, 100 * hour + 3))
      q2.processAllAvailable()
      assert(emitted.sorted.toSeq === Seq(1L, 2L, 3L),
        s"restart broke dedup state: ${emitted.sorted.toSeq}")
    } finally q2.stop()
  }

  test("flatMapGroupsWithState emits each closed session exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mins = 60L * 1000 * 1000
    val input = MemoryStream[Streaming.Ev]
    val out = Streaming.sessionizeClosed(spark,
      input.toDF().withColumn("ts", timestamp_micros(col("tsMicros"))))
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("closed_sessions").start()
    try {
      // session 1 (events 1,2) closed by the gap to event 3 (session 2).
      // Base offset keeps ts clear of the initial watermark (epoch 0),
      // which drops ts<=0 as late.
      val base = 100 * mins
      input.addData(Streaming.Ev(7L, 1L, base + 0 * mins, 1.0),
        Streaming.Ev(7L, 2L, base + 5 * mins, 2.0),
        Streaming.Ev(7L, 3L, base + 60 * mins, 3.0))
      q.processAllAvailable()
      val afterB1 = spark.table("closed_sessions").collect()
        .map(r => (r.getAs[Int]("session_seq"), r.getAs[Long]("n_events"),
          r.getAs[Double]("value_sum")))
      assert(afterB1.toSeq === Seq((1, 2L, 3.0)))
      // batch 2 advances the watermark far past session 2's gap horizon —
      // the EventTimeTimeout closes it with no same-user event needed
      input.addData(Streaming.Ev(8L, 4L, base + 500 * mins, 4.0))
      q.processAllAvailable()
      input.addData(Streaming.Ev(8L, 5L, base + 900 * mins, 5.0))
      q.processAllAvailable()
      val seqs = spark.table("closed_sessions").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("session_seq"),
          r.getAs[Long]("n_events"))).toSet
      assert(seqs.contains((7L, 1, 2L)) && seqs.contains((7L, 2, 1L)))
    } finally q.stop()
  }

  test("streaming retrieval: per-trigger top-k equals the batch top-k over each batch's docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the watched query set: first 2 docs embedded with the batch kernel
    val queries = Tables.documents(spark, sf).filter(col("doc_id") < 2)
      .select(col("doc_id").as("qid"),
        graft.functions.TextOps.hashEmbedFused(
          graft.functions.TextOps.passageText(col("text"))).as("q_emb"))
      .localCheckpoint()
    case class Doc(doc_id: Long, text: String)
    val allDocs = Tables.documents(spark, sf).filter(col("doc_id") >= 2)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val (batch1, batch2) = allDocs.splitAt(allDocs.length / 2)

    val input = MemoryStream[(Long, String)]
    val sink = java.nio.file.Files.createTempDirectory("graft_retr").toFile.getAbsolutePath
    val scored = Streaming.retrievalScores(
      input.toDF().toDF("doc_id", "text"), queries)
    val q = scored.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // per-trigger ranking in the sink: top-k per query for THIS batch
        Streaming.topKPerQuery(df, k = 3)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(sink)
      }
      .start()
    try {
      input.addData(batch1.toSeq)
      q.processAllAvailable()
      input.addData(batch2.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    // each trigger's emitted top-k must equal the batch-mode top-k
    // computed over exactly that trigger's documents
    val emitted = spark.read.parquet(sink)
    for ((docsIn, bid) <- Seq((batch1, 0L), (batch2, 1L))) {
      val got = emitted.filter(col("batch_id") === bid)
        .select("qid", "doc_id", "sim", "rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      val expect = Streaming.topKPerQuery(
          Streaming.retrievalScores(docsIn.toSeq.toDF("doc_id", "text"), queries), k = 3)
        .select("qid", "doc_id", "sim", "rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(got === expect, s"trigger $bid top-k diverged from batch")
      assert(got.nonEmpty)
    }
  }

  test("streaming IVF serve: per-trigger results equal the batch trained-index search") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Ann
    val (path, cents) = Ann.kmeansLayout(spark, sf)
    val centsDf = Ann.centroidsDf(spark, cents).localCheckpoint()
    val qAll = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 6)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
    val (b1, b2) = qAll.partition(_._1 < 3)
    val input = MemoryStream[(Long, Seq[Float])]
    val sink = java.nio.file.Files.createTempDirectory("graft_ivfserve")
      .toFile.getAbsolutePath
    val q = Streaming.ivfServe(
      input.toDF().toDF("qid", "q_emb"), path, centsDf, k = 3, nprobe = 2) {
      (res, bid) =>
        res.withColumn("batch_id", lit(bid))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(sink)
    }
    try {
      input.addData(b1.toSeq)
      q.processAllAvailable()
      input.addData(b2.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    // each trigger's results must equal the BATCH trained-index search
    // (ann_ivf_kmeans_batch's plan) over exactly that trigger's queries
    val emitted = spark.read.parquet(sink)
    val ivf = spark.read.parquet(path)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("qid"), col("vec_id"), col("cell"), col("sim"), col("rnk"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3), r.getInt(4)))
        .toSet
    for ((qs, bid) <- Seq((b1, 0L), (b2, 1L))) {
      val got = asSet(emitted.filter(col("batch_id") === bid))
      val expect = asSet(Ann.ivfSearchBatch(ivf, qs.toSeq.toDF("qid", "q_emb"),
        "cell", centsDf, "vec_id", "embedding", k = 3, nprobe = 2))
      assert(got === expect, s"trigger $bid diverged from the batch index search")
      assert(got.nonEmpty)
    }
  }

  test("streaming bm25 scores against the frozen snapshot equal the batch scorer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val qTerms = Seq("data", "table", "query")
    val stats = Streaming.bm25Snapshot(spark, sf, qTerms)
    // batch expected: the bm25_search pipeline's per-doc scores (no limit)
    val tf = graft.queries.TextQueries.bm25Tf(spark, sf)
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val dfT = tf.filter(col("tok").isin(qTerms: _*))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val batch = tf.filter(col("tok").isin(qTerms: _*))
      .join(dl, "doc_id").join(broadcast(dfT), "tok")
      .withColumn("idf",
        log((lit(stats.nDocs) - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("contrib",
        col("idf") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / lit(stats.avgdl))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("contrib")), 6).as("score"), count(lit(1)).as("n_terms_hit"))
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap

    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val out = Streaming.bm25Stream(input.toDF().toDF("doc_id", "text"), stats, qTerms)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("bm25_stream").start()
    try {
      input.addData(docs.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("bm25_stream").collect()
    assert(streamed.length === batch.size)
    streamed.foreach { r =>
      val (expScore, expHits) = batch(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_terms_hit") === expHits)
      assert(math.abs(r.getAs[Double]("score") - expScore) < 1e-9,
        s"doc ${r.getAs[Long]("doc_id")}: ${r.getAs[Double]("score")} vs $expScore")
    }
  }

  test("streaming contamination equals the batch contamination gate per doc") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = SparkEntry.queries("contamination")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_hit"),
          r.getAs[Double]("hit_frac"), r.getAs[Boolean]("contaminated")))
      .toMap
    val benchSh = Tables.documents(spark, sf).filter(col("doc_id") % 97 === 0)
      .select(explode(graft.operators.Dedup.shingleHashes(
        graft.functions.TextOps.tokenHashes(col("text")))).as("sh"))
      .distinct().as[Long].collect()
    val trainDocs = Tables.documents(spark, sf).filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()

    val input = MemoryStream[(Long, String)]
    val out = Streaming.contaminationStream(
      input.toDF().toDF("doc_id", "text"), benchSh)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("contam_stream").start()
    try {
      input.addData(trainDocs.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("contam_stream").collect()
    assert(streamed.length === batch.size)
    streamed.foreach { r =>
      val got = (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_hit"),
        r.getAs[Double]("hit_frac"), r.getAs[Boolean]("contaminated"))
      assert(got === batch(r.getAs[Long]("doc_id")),
        s"doc ${r.getAs[Long]("doc_id")} diverged from batch gate")
    }
  }

  test("foreachBatch sink: micro-batches land as idempotent parquet appends") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_feb").toFile.getAbsolutePath
    val input = MemoryStream[Streaming.Ev]
    val q = input.toDF().writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // batchId partition → replays overwrite their own partition only
        df.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(dir)
      }
      .start()
    try {
      input.addData(Streaming.Ev(1L, 1L, 1000L, 1.0), Streaming.Ev(1L, 2L, 2000L, 2.0))
      q.processAllAvailable()
      input.addData(Streaming.Ev(2L, 3L, 3000L, 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val back = spark.read.parquet(dir)
    assert(back.count() === 3)
    assert(back.select("event_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
    assert(back.select("batch_id").distinct().count() === 2)
  }

  test("streaming index maintenance: arriving vectors appended to the trained IVF layout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Ann
    val (srcPath, cents) = Ann.kmeansLayout(spark, sf)
    val centsDf = Ann.centroidsDf(spark, cents)
    // clone the layout so the shared kmLayouts dir stays pristine
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfkm_stream")
      .toFile.getAbsolutePath
    spark.read.parquet(srcPath)
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    val before = spark.read.parquet(dir).count()
    // the "live ingest": clones of vectors 0-5 under new ids arrive in two
    // micro-batches; each trigger assigns map-only against the broadcast
    // trained centers and appends into the cell directories (foreachBatch
    // → Ann.appendToLayout — the batch index-update operator IS the sink)
    val vecs = Tables.embeddings(spark, sf).filter(col("vec_id") < 6)
      .select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Seq[Float], Int)].collect()
    val (b1, b2) = vecs.splitAt(3)
    val input = MemoryStream[(Long, Seq[Float], Int)]
    val q = input.toDF().toDF("vec_id", "embedding", "label")
      .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding"), col("label"))
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        Ann.appendToLayout(df, centsDf, dir, "vec_id", "embedding")
      }
      .start()
    try {
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val ivf = spark.read.parquet(dir)
    assert(ivf.count() === before + 6)
    // per-trigger streamed assignments ≡ one batch assignCells pass
    val streamed = ivf.filter(col("vec_id") >= 2000000L)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val expect = Ann.assignCells(
        Tables.embeddings(spark, sf).filter(col("vec_id") < 6)
          .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding")),
        centsDf, "vec_id", "embedding")
      .select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(streamed === expect)
    // a search immediately finds the streamed clone of vec 0, still pruned
    val qv = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val res = Ann.ivfSearchCells(ivf, qv, "cell", centsDf, "vec_id",
      "embedding", k = 5, excludeId = Some(0L))
    assert(res.collect().map(_.getLong(0)).contains(2000000L))
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || plan.contains("dynamicpruning"),
      s"streamed append broke pruning:\n$plan")
  }

  test("streaming IVFADC serve: per-trigger results equal the batch residual search") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Ivfpq
    val vecs = Tables.embeddings(spark, sf).filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val (b1, b2) = vecs.splitAt(3)
    val input = MemoryStream[(Long, Seq[Float])]
    val perTrigger = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Array[(Long, Long, Double, Int)])]
    val q = Streaming.ivfpqServe(
      input.toDF().toDF("qid", "q_emb"), sf, k = 5, nprobe = 3) {
      (df, batchId) =>
        perTrigger += batchId -> df.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    }
    try {
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val nonEmpty = perTrigger.filter(_._2.nonEmpty)
    assert(nonEmpty.map(_._2.map(_._1).distinct.length).sum === 5,
      s"expected 3+2 qids across triggers: ${nonEmpty.map(_._2.toSeq)}")
    // per-trigger streamed output ≡ the batch search over exactly that
    // trigger's queries
    for ((_, rows) <- nonEmpty) {
      val qids = rows.map(_._1).distinct.sorted
      val qs = qids.map { qid =>
        qid -> Tables.embeddings(spark, sf).filter(col("vec_id") === qid)
          .select(graft.functions.VectorOps.l2Normalize(
            graft.functions.VectorOps.toDoubleArray(col("embedding"))).as("n"))
          .head().getSeq[Double](0).toArray
      }.toSeq
      val batch = Ivfpq.searchBatchResidual(spark, sf, qs, k = 5,
          shortlistN = 20, nprobe = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      assert(rows.sorted.toSeq === batch.sorted.toSeq)
    }
  }

  test("streaming deletes: per-trigger tombstones excluded from IVFADC serving immediately") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Ivfpq
    // caller-owned clone; the memoized shared layout stays pristine
    val codesDir = java.nio.file.Files.createTempDirectory("graft_resdel_stream")
      .toFile.getAbsolutePath + "/codes"
    spark.read.parquet(Ivfpq.resCodesLayout(spark, sf))
      .write.partitionBy("cell").parquet(codesDir)
    val qn = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select(graft.functions.VectorOps.l2Normalize(
        graft.functions.VectorOps.toDoubleArray(col("embedding"))).as("n"))
      .head().getSeq[Double](0).toArray
    def search = Ivfpq.searchResidual(spark, sf, qn, excludeId = None,
        k = 5, shortlistN = 20, nprobe = 3, codesDirOverride = Some(codesDir))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(search.head._1 === 0L, "self-match should rank first pre-delete")
    // a stream of delete EVENTS: each trigger's ids land in the tombstone
    // sidecar (map-only append) and the very next search excludes them —
    // GDPR-style takedown latency is one trigger, no cell file rewritten
    val input = MemoryStream[Long]
    val q = input.toDF().toDF("vec_id").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        Ivfpq.deleteFromResLayout(df, codesDir)
      }
      .start()
    try {
      input.addData(0L); q.processAllAvailable()
      val t1 = search
      assert(!t1.exists(_._1 === 0L), s"tombstoned id still served: $t1")
      // second trigger accumulates into the same sidecar
      val second = t1.head._1
      input.addData(second); q.processAllAvailable()
      val t2 = search
      assert(!t2.exists(r => r._1 === 0L || r._1 === second),
        s"second-trigger delete not served: $t2")
    } finally q.stop()
  }

  test("streaming auto-compaction: the append loop compacts itself when the file-count policy trips") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Ivfpq
    val base = java.nio.file.Files.createTempDirectory("graft_autocompact")
      .toFile.getAbsolutePath
    val codesDir = base + "/codes"
    val vecsDir = base + "/vecs"
    spark.read.parquet(Ivfpq.resCodesLayout(spark, sf))
      .write.partitionBy("cell").parquet(codesDir)
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).write.parquet(vecsDir)
    // four ingest triggers under a files-per-cell threshold of 2: without
    // the policy the cell dirs accumulate one file per trigger forever
    // (the small-files death); with it, compaction fires inside the loop
    val vecs = Tables.embeddings(spark, sf).filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val compactions = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    val input = MemoryStream[(Long, Seq[Float])]
    val q = input.toDF().toDF("vec_id", "embedding")
      .select((col("vec_id") + 3000000L).as("vec_id"), col("embedding"))
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        compactions += Ivfpq.appendAndMaybeCompact(spark, sf, df, codesDir,
          filesPerCellThreshold = 2, targetRowsPerFile = 4096)
        df.write.mode("append").parquet(vecsDir)
      }
      .start()
    try {
      vecs.grouped(2).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
    } finally q.stop()
    assert(compactions.contains(true),
      s"policy never fired across ${compactions.length} triggers: $compactions")
    // the loop's invariant: file counts stay bounded by the policy (a
    // compaction run leaves exactly ⌈rows/target⌉ = 1 file per cell here)
    assert(Ivfpq.maxFilesPerCell(spark, codesDir) <= 3,
      "file accumulation not repaired by the in-loop compaction")
    // and everything ever appended is still served: the streamed clone of
    // query vector 0 ranks top-1 at sim 1.0 through the full IVFADC path
    val qn = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select(graft.functions.VectorOps.l2Normalize(
        graft.functions.VectorOps.toDoubleArray(col("embedding"))).as("n"))
      .head().getSeq[Double](0).toArray
    val res = Ivfpq.searchResidual(spark, sf, qn, excludeId = Some(0L),
        k = 5, shortlistN = 20, nprobe = 3,
        codesDirOverride = Some(codesDir), rescoreDirOverride = Some(vecsDir))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(res.head._1 === 3000000L && res.head._2 >= 0.999999,
      s"appended duplicate lost across auto-compactions: ${res.toSeq}")
  }

  test("streaming residual-codes maintenance: per-trigger appends served by IVFADC without retraining") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Ivfpq
    // caller-owned clones of the codes + full-precision halves (the
    // memoized shared layouts stay pristine under the test)
    val base = java.nio.file.Files.createTempDirectory("graft_resmaint_stream")
      .toFile.getAbsolutePath
    val codesDir = base + "/codes"
    val vecsDir = base + "/vecs"
    spark.read.parquet(Ivfpq.resCodesLayout(spark, sf))
      .write.partitionBy("cell").parquet(codesDir)
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).write.parquet(vecsDir)
    // live ingest in two triggers: clones of vectors 0-5 under new ids;
    // each trigger residual-encodes against the FROZEN anchors + books
    // (map-only against broadcast metadata) and appends into the cell
    // dirs — the daily IVFADC freshness job as a stream
    val vecs = Tables.embeddings(spark, sf).filter(col("vec_id") < 6)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val (b1, b2) = vecs.splitAt(3)
    val input = MemoryStream[(Long, Seq[Float])]
    val q = input.toDF().toDF("vec_id", "embedding")
      .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding"))
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        Ivfpq.appendToResLayout(spark, sf, df, codesDir)
        df.write.mode("append").parquet(vecsDir)
      }
      .start()
    try {
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    assert(spark.read.parquet(codesDir).filter(col("vec_id") >= 2000000L)
      .count() === 6)
    // the streamed exact duplicate of query vector 0 is immediately
    // servable through the full IVFADC path (pruned codes scan → ADC with
    // the anchor term → exact rescore): top-1 at sim 1.0
    val qn = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select(graft.functions.VectorOps.l2Normalize(
        graft.functions.VectorOps.toDoubleArray(col("embedding"))).as("n"))
      .head().getSeq[Double](0).toArray
    val res = Ivfpq.searchResidual(spark, sf, qn, excludeId = Some(0L),
        k = 5, shortlistN = 20, nprobe = 3,
        codesDirOverride = Some(codesDir), rescoreDirOverride = Some(vecsDir))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(res.head._1 === 2000000L && res.head._2 >= 0.999999,
      s"streamed duplicate not served: ${res.toSeq}")
  }

  test("stream-static anti join equals the batch anti join (incremental dedup face)") {
    val static = Tables.events(spark, sf).filter(col("event_id") % 3 === 0)
      .select(col("event_id"))
    val streamed = Streaming.runToMemory(spark,
      Streaming.antiJoinStatic(
        Streaming.readEventsStream(spark, sf).select(col("event_id"), col("ts")),
        static, "event_id"),
      "ss_anti", OutputMode.Append())
      .select(col("event_id")).collect().map(_.getLong(0)).sorted
    val batch = Tables.events(spark, sf)
      .join(static, Seq("event_id"), "left_anti")
      .select(col("event_id")).collect().map(_.getLong(0)).sorted
    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
    assert(streamed.forall(_ % 3 != 0))
  }

  test("streaming embed equals batch embed bit-for-bit (stateless map-only stream)") {
    val streamed = Streaming.runToMemory(spark,
      Streaming.embedStream(Streaming.readDocumentsStream(spark, sf)),
      "stream_embed", OutputMode.Append())
      .orderBy(col("doc_id")).collect()
    val batch = Streaming.embedStream(Tables.documents(spark, sf))
      .orderBy(col("doc_id")).collect()
    assert(streamed.length === batch.length && streamed.nonEmpty)
    streamed.zip(batch).foreach { case (s0, b0) =>
      assert(s0.getLong(0) === b0.getLong(0))
      assert(s0.getSeq[Double](1) === b0.getSeq[Double](1))
    }
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
