package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HeavyHitters

class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // skewed synthetic: hot 5000, warm 1200, 200 tail values x 20 each
  private def skewed(parts: Int) = {
    import spark.implicits._
    val rows = Seq.fill(5000)("hot") ++ Seq.fill(1200)("warm") ++
      (0 until 200).flatMap(i => Seq.fill(20)(s"tail_$i"))
    rows.toDF("v").repartition(parts)
  }

  test("MG candidates contain every phi-heavy value despite eviction pressure") {
    // 202 distinct values >> k=16: the sketch must evict constantly, yet
    // the pigeonhole guarantee keeps hot (48%) and warm (11%) nominated
    val cands = HeavyHitters.candidates(skewed(10), col("v"), 16)
      .collect().map(_.getString(0)).toSet
    assert(cands.contains("hot") && cands.contains("warm"),
      s"guaranteed heavy hitters evicted: $cands")
    // and the nomination list stays sketch-sized, not domain-sized
    assert(cands.size <= 16 * 10, s"candidate set too large: ${cands.size}")
  }

  test("heavy hitters are exact and independent of partitioning") {
    val exp = Set(("hot", 5000L, 0.490196), ("warm", 1200L, 0.117647))
    for (parts <- Seq(1, 7, 32)) {
      val got = HeavyHitters.heavyHitters(skewed(parts), col("v"), 16, 0.1)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === exp, s"parts=$parts: $got")
    }
  }

  test("streaming MG summary: cross-trigger merge keeps every heavy value within the n/k bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val k = 16
    // three triggers; hot appears in all, warm only in the middle one,
    // each trigger brings 100 fresh tail values (300 distinct total)
    val t1 = Seq.fill(2000)("hot") ++ (0 until 100).flatMap(i => Seq.fill(10)(s"tail_$i"))
    val t2 = Seq.fill(1500)("hot") ++ Seq.fill(1200)("warm") ++
      (100 until 200).flatMap(i => Seq.fill(10)(s"tail_$i"))
    val t3 = Seq.fill(1500)("hot") ++ (200 until 300).flatMap(i => Seq.fill(10)(s"tail_$i"))
    val n = (t1 ++ t2 ++ t3).length
    val truth = (t1 ++ t2 ++ t3).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val input = MemoryStream[String]
    val journal = java.nio.file.Files
      .createTempDirectory("graft_hh").toString + "/mg-journal"
    var last = Map.empty[String, Long]
    val q = graft.streaming.Streaming.heavyHittersStream(
      input.toDF().toDF("v"), col("v"), k, journal) { (s, _) => last = s }
    try {
      for (t <- Seq(t1, t2, t3)) { input.addData(t); q.processAllAvailable() }
    } finally q.stop()
    // redelivery: re-applying an already-journaled batchId must NOT
    // double-merge (the never-overcounts guarantee under at-least-once)
    val redelivered = graft.operators.HeavyHitters
      .applyJournaled(journal, 2L, Seq("hot" -> 999L), k)
    assert(redelivered === last, "redelivered trigger double-merged")
    // restart: a fresh incarnation loads the journal, not a blank summary
    assert(graft.operators.HeavyHitters.loadJournal(journal)
      .map(_._2) === Some(last), "journal lost across restart")
    assert(last.size <= k, s"summary exceeded capacity: ${last.size}")
    // every value with true frequency > n/k must still be present
    val bound = n.toLong / k
    for ((v, c) <- truth if c > bound)
      assert(last.contains(v), s"heavy value $v (true $c > n/k $bound) evicted: $last")
    // estimates never overcount and undercount by at most n/k
    for ((v, est) <- last) {
      assert(est <= truth(v), s"$v overcounted: est $est > true ${truth(v)}")
      assert(est >= truth(v) - bound, s"$v undershot the bound: est $est, true ${truth(v)}, n/k $bound")
    }
  }

  test("per-group heavy hitters: each group judged against its OWN total, partitioning-independent") {
    import spark.implicits._
    // g1: hot dominates (80%); g2: uniform (10% each) — nothing heavy
    val rows = Seq.fill(80)(("g1", "hot")) ++
      (0 until 20).map(i => ("g1", s"t$i")) ++
      (0 until 10).flatMap(i => Seq.fill(10)(("g2", s"u$i")))
    for (parts <- Seq(1, 13)) {
      val df = rows.toDF("g", "v").repartition(parts)
      val got = HeavyHitters.heavyHittersByGroup(df, col("g"), col("v"), 4, 0.5)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSeq
      assert(got === Seq(("g1", "hot", 80L, 0.8)), s"parts=$parts: $got")
    }
  }

  test("nulls are skipped; guarantees below 1/k are refused") {
    import spark.implicits._
    val df = Seq(Some("a"), Some("a"), None, Some("b")).toDF("v")
    val hh = HeavyHitters.heavyHitters(df, col("v"), 8, 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(hh.toSeq === Seq(("a", 2L))) // share 2/3 of NON-NULL rows
    intercept[IllegalArgumentException](
      HeavyHitters.heavyHitters(df, col("v"), 8, 0.05)) // 0.05 < 1/8
  }
}
