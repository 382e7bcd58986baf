package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann

/** Skewed-cell ANN hardening (round-5 verdict #7): a trained IVF layout
  * can develop a flash-crowd cell — a celebrity cluster holding half the
  * corpus — and batch search must not let per-task work grow with the
  * hottest cell. Two structural defenses, both asserted here on a
  * 60%-hot-cell layout:
  *
  *  1. the corpus side of the scoring join is BROADCAST-joined against
  *     the probe set — tasks read uniform input splits, never
  *     one-task-per-cell, so the hot cell spreads across tasks like any
  *     other rows;
  *  2. the per-qid ranking exchange — the one place the hot cell's
  *     candidates could converge on a few reduce tasks — is pruned
  *     map-side to ≤ k rows per qid per partition before it ships, in
  *     BOTH formulations: the explicit TopKPerKey partial/final operator,
  *     and (on current Spark) the window twin via the WindowGroupLimit
  *     rewrite of the `row_number ≤ k` idiom. The spec pins the
  *     mechanism in each plan, not just the byte counts, so a Spark
  *     upgrade that stopped matching the idiom would fail loudly.
  */
class AnnSkewSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("flash-crowd cell: TopKPerKey batch search bounds the qid shuffle, results identical") {
    val emb = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    // celebrity cluster: ~60% of vectors crowd cell 0; the rest spread 1..9
    val skewed = emb.withColumn("cell",
        when(col("vec_id") % 10 < 6, lit(0))
          .otherwise((col("vec_id") % 9 + 1).cast("int")))
      .repartition(16)
    val total = skewed.count()
    val hot = skewed.filter(col("cell") === 0).count()
    assert(hot * 2 >= total, s"fixture not skewed: $hot of $total in the hot cell")
    // medoids materialized to a LOCAL 10-row frame so the medoid build's
    // own window shuffle doesn't appear inside either measured plan
    val centsLocal = {
      import spark.implicits._
      Ann.cellMedoids(skewed, "cell", "vec_id", "embedding")
        .collect().map(r => (r.getInt(0), r.getSeq[Float](1))).toSeq
        .toDF("cell", "centroid")
    }
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
    val windowed = Ann.ivfSearchBatch(skewed, queries, "cell", centsLocal,
      "vec_id", "embedding", k = 5, nprobe = 3)
    val heaped = Ann.ivfSearchBatchTopK(skewed, queries, "cell", centsLocal,
      "vec_id", "embedding", k = 5, nprobe = 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3), r.getInt(4))).toSet
    val (wRows, hRows) = (rows(windowed), rows(heaped))
    assert(hRows === wRows, "skew-hardened search changed results")
    assert(wRows.size === 8 * 5)
    def maxShuffleRecords(df: org.apache.spark.sql.DataFrame): Long =
      collect(df.queryExecution.executedPlan) { case e: ShuffleExchangeExec => e }
        .flatMap(_.metrics.collectFirst {
          case (name, m) if name.toLowerCase.contains("records") => m.value
        }).max
    val wMax = maxShuffleRecords(windowed)
    val hMax = maxShuffleRecords(heaped)
    info(s"max exchange records: window=$wMax topk=$hMax (corpus $total, hot cell $hot)")
    // EVERY exchange in both plans is bounded by k·qids·partitions — the
    // hot cell's ~2.7k scored candidate rows never ship anywhere (they
    // die in the map-side heaps / group limits). Without the pruning the
    // ranking exchange would carry all scored candidates, dominated by
    // hot-cell volume ≈ qids·hot ≈ 2400 rows.
    assert(hMax <= 16L * 8 * 5, s"TopKPerKey shuffle not bounded: $hMax records")
    assert(wMax <= 16L * 8 * 5, s"window shuffle not bounded: $wMax records")
    // pin the MECHANISM, not just the numbers: the heap plan must carry
    // the partial+final TopKPerKeyExec pair...
    val heapExecs = collect(heaped.queryExecution.executedPlan) {
      case t: graft.plans.TopKPerKeyExec => t.partial
    }
    assert(heapExecs.sorted === Seq(false, true),
      s"expected partial+final TopKPerKeyExec in the heap plan")
    // ...and the window plan is only safe because the rank-filter idiom
    // matched the WindowGroupLimit rewrite (map-side per-key limit); if a
    // Spark upgrade stops matching it, this fails loudly instead of the
    // hot cell silently converging on one reduce task
    val groupLimits = collect(windowed.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }
    assert(groupLimits.nonEmpty, "WindowGroupLimit rewrite did not fire for the window twin")
    // and the corpus side reaches the scorer through a broadcast join —
    // no exchange repartitions the corpus by cell, so tasks read uniform
    // splits regardless of the cell histogram
    val bhj = collect(heaped.queryExecution.executedPlan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty, "scoring join is not broadcast")
  }
}
