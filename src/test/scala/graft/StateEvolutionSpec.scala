package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streaming

/** State-store schema evolution across a checkpoint restart — the
  * operational gap the plain restart spec stops short of: a long-lived
  * streaming job ships generation 2 of its stateful operator with a
  * GROWN state struct and restarts on generation 1's checkpoint.
  *
  * Pinned both ways:
  *  - Avro state encoding + additive Option field → the restart RESUMES,
  *    old per-key state intact, missing field read as None;
  *  - default UnsafeRow encoding → the restart REFUSES LOUDLY at query
  *    start (schema check), never silently resumes with blank state.
  */
class StateEvolutionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val provKey = "spark.sql.streaming.stateStore.providerClass"
  private val encKey = "spark.sql.streaming.stateStore.encodingFormat"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  // (k, n, lastLen) rows emitted across all incarnations; the memory sink
  // cannot recover from a checkpoint, so the spec collects via foreachBatch
  // (the restart-spec pattern)
  private def harness(input: MemoryStream[(Long, String)], ckpt: String,
                      out: scala.collection.mutable.ArrayBuffer[(Long, Long, Long)])
                     (gen2: Boolean) =
    Streaming.runningCountStream(spark, input.toDF().toDF("k", "v"), gen2 = gen2)
      .writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        out ++= b.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        ()
      }
      .start()

  test("avro encoding: gen-2 restart resumes gen-1 state, added field defaults to None") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withConfs(provKey -> rocks, encKey -> "avro") {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_evo").toString
      val input = MemoryStream[(Long, String)]
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      // incarnation 1 (gen 1): key 1 counted twice, key 2 once
      val q1 = harness(input, ckpt, rows)(gen2 = false)
      try {
        input.addData((1L, "aa"), (1L, "bb"), (2L, "c"))
        q1.processAllAvailable()
        assert(rows.toSet === Set((1L, 2L, -1L), (2L, 1L, -1L)), rows.toSeq)
      } finally q1.stop()
      // incarnation 2 (gen 2, SAME checkpoint): the count must CONTINUE
      // from gen-1 state (a blank restart would report 1), and the field
      // gen 1 never wrote surfaces as the documented None default until
      // gen 2 writes it
      rows.clear()
      val q2 = harness(input, ckpt, rows)(gen2 = true)
      try {
        input.addData((1L, "dddd"), (3L, "e"))
        q2.processAllAvailable()
        assert(rows.toSet === Set((1L, 3L, 4L), (3L, 1L, 1L)),
          s"gen-2 restart mangled gen-1 state: ${rows.toSeq}")
      } finally q2.stop()
    }
  }

  test("default encoding: gen-2 restart on gen-1 state refuses loudly, not silently") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withConfs(provKey -> rocks) {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_evo_ref").toString
      val input = MemoryStream[(Long, String)]
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      val q1 = harness(input, ckpt, rows)(gen2 = false)
      try {
        input.addData((1L, "aa"))
        q1.processAllAvailable()
        assert(rows.toSet === Set((1L, 1L, -1L)))
      } finally q1.stop()
      rows.clear()
      val thrown = intercept[Throwable] {
        val q2 = harness(input, ckpt, rows)(gen2 = true)
        try {
          input.addData((1L, "bb"))
          q2.processAllAvailable()
          // if the engine accepted the grown struct it MUST have kept the
          // state — silent blank-state resumption is the one outcome this
          // spec exists to rule out (message deliberately free of the
          // keywords the engine-error check below matches on)
          assert(rows.toSet === Set((1L, 2L, 2L)),
            s"silent blank-state resume detected: ${rows.toSeq}")
          fail("UPGRADE_RESUMED_WITH_STATE") // reached only on resume-with-state
        } finally q2.stop()
      }
      def msgs(t: Throwable): String =
        if (t == null) "" else String.valueOf(t.getMessage) + "|" + msgs(t.getCause)
      // our own inner assertion firing means the engine resumed WITHOUT
      // the state — the silent-data-loss outcome: fail the test with it
      thrown match {
        case tfe: org.scalatest.exceptions.TestFailedException
            if !msgs(tfe).contains("UPGRADE_RESUMED_WITH_STATE") => throw tfe
        case _ =>
      }
      // either surviving outcome is loud: a state-schema error at/after
      // start, or (if a future Spark learns UnsafeRow evolution) the
      // fail-marker proving state survived
      val msg = msgs(thrown)
      assert(msg.contains("UPGRADE_RESUMED_WITH_STATE") ||
        msg.toUpperCase.contains("SCHEMA") || msg.toUpperCase.contains("EVOLUT"),
        s"restart neither refused on schema grounds nor kept state: $msg")
    }
  }
}
