package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TopK
import graft.plans.TopKPerKeyExec

/** The custom whole-operator extension (logical node + strategy +
  * physical exec): per-key bounded-heap top-k with a map-side partial
  * pass. Must equal the window `row_number <= k` formulation row-for-row
  * while shuffling only each partition's per-key survivors.
  */
class TopKSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  lazy val spark = SparkTestSession.spark

  private def sample = {
    import spark.implicits._
    // 10k rows, 4 keys, unique (score, id) total order, spread wide
    (0L until 10000L).map(i => (i % 4, i, ((i * 37) % 1001).toDouble))
      .toDF("key", "id", "score")
      .repartition(16)
  }

  test("custom operator equals the window row_number formulation") {
    val df = sample
    val custom = TopK.perKey(df, Seq("key"), Seq(("score", false), ("id", true)), k = 7)
      .select("key", "id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val w = Window.partitionBy(col("key")).orderBy(col("score").desc, col("id").asc)
    val windowed = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 7)
      .select("key", "id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(custom === windowed)
    assert(custom.size === 4 * 7)
  }

  test("plans as partial + exchange + final; shuffle carries only per-key survivors") {
    val df = sample
    val top = TopK.perKey(df, Seq("key"), Seq(("score", false), ("id", true)), k = 5)
    top.collect() // finalize AQE + metrics
    val plan = top.queryExecution.executedPlan
    val execs = collect(plan) { case t: TopKPerKeyExec => t }
    assert(execs.map(_.partial).sorted === Seq(false, true),
      s"expected partial+final TopKPerKeyExec pair in:\n$plan")
    val exchanges = collect(plan) { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, s"no exchange between partial and final:\n$plan")
    // the map side emits ≤ k rows per key per input partition: with 16
    // input partitions, 4 keys, k=5 the shuffle writes ≤ 320 records of
    // the 10000 input rows — the operator's reason to exist
    val written = exchanges.head.metrics.collectFirst {
      case (name, m) if name.toLowerCase.contains("records") => m.value
    }
    written.foreach(n => assert(n <= 16L * 4 * 5,
      s"shuffle wrote $n records — partial top-k did not prune"))
    // and no global sort of the input appears below the exchange
    assert(!collect(plan) { case s: org.apache.spark.sql.execution.SortExec => s }
      .exists(_ => true), s"unexpected full sort in:\n$plan")
  }

  test("boundary ties resolve by the total order, k larger than group passes all rows") {
    import spark.implicits._
    val tied = Seq((1L, 1L, 5.0), (1L, 2L, 5.0), (1L, 3L, 5.0), (1L, 4L, 1.0))
      .toDF("key", "id", "score")
    val top2 = TopK.perKey(tied, Seq("key"), Seq(("score", false), ("id", true)), k = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(top2 === Set(1L, 2L)) // ties at the boundary: lowest ids win
    val topAll = TopK.perKey(tied, Seq("key"), Seq(("score", false), ("id", true)), k = 10)
    assert(topAll.count() === 4)
  }
}
