package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a mergeable typed
  * Aggregator — the fixed-size frequency summary for "how often did key x
  * occur" over a stream/corpus too large for an exact map. depth×width
  * counters; each of `depth` pairwise-independent hash rows increments one
  * of `width` buckets; a point estimate is the MIN over the rows, which
  * never under-counts (est ≥ true) and over-counts by ≤ εN with
  * probability 1−δ (ε = e/width, δ = e^−depth).
  *
  * Spark shape: `Aggregator[Long, Array[Long], Array[Long]]` — per-
  * partition sketches built map-side, merged by flat element-wise add
  * (commutative + associative, so partial aggregation applies); the
  * final sketch is depth·width longs of driver metadata, like a trained
  * index. Complements [[HeavyHitters]]' Misra-Gries (which answers "WHICH
  * keys are heavy"; CMS answers "how heavy is THIS key" for any key).
  *
  * Hash family: h_i(x) = ((a_i·x + b_i) mod p) mod width with p = 2³¹−1
  * (Mersenne) and fixed (a_i, b_i) — universal-family constants chosen
  * once, integer-only arithmetic, so the whole sketch is a deterministic
  * pure function of the input multiset and the DuckDB oracle replays
  * estimates exactly (an estimate for key k is the min over rows i of the
  * COUNT of inputs hashing to h_i(k) — the sketch never needs to
  * materialize SQL-side).
  */
object CountMin {

  val Depth = 4
  val Width = 256
  val P = 2147483647L // 2^31 - 1
  // fixed universal-family constants; a_i·x stays far inside Long for any
  // id the fixtures carry
  val A: Array[Long] = Array(1103515245L, 134775813L, 69069L, 1664525L)
  val B: Array[Long] = Array(12345L, 1L, 7L, 1013904223L)

  /** Row-i bucket of key x (x ≥ 0; fixture ids are non-negative — plain
    * `%` keeps Spark and SQL agreeing without a pmod dance).
    */
  def bucket(i: Int, x: Long): Int = (((A(i) * x + B(i)) % P) % Width).toInt

  val sketchAgg: Aggregator[Long, Array[Long], Array[Long]] =
    new Aggregator[Long, Array[Long], Array[Long]] {
      def zero: Array[Long] = new Array[Long](Depth * Width)
      def reduce(buf: Array[Long], x: Long): Array[Long] = {
        var i = 0
        while (i < Depth) { buf(i * Width + bucket(i, x)) += 1; i += 1 }
        buf
      }
      def merge(l: Array[Long], r: Array[Long]): Array[Long] = {
        var i = 0
        while (i < l.length) { l(i) += r(i); i += 1 }
        l
      }
      def finish(buf: Array[Long]): Array[Long] = buf
      def bufferEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
      def outputEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }

  /** Point estimate from a finished sketch. */
  def estimate(sketch: Array[Long], x: Long): Long =
    (0 until Depth).map(i => sketch(i * Width + bucket(i, x))).min

  /** Sketch the events table's user_id stream, then probe the top-`k`
    * true-heaviest users: (user_id, true_cnt, est, ok) where ok asserts
    * the CMS lower-bound guarantee est ≥ true_cnt. The exact counts double
    * as both the probe set and the per-key ground truth — the shape of a
    * sketch-accuracy audit job.
    */
  def probeTopUsers(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame = {
    import spark.implicits._
    val events = graft.Tables.events(spark, sfDir).select(col("user_id"))
    val sketch = events.as[Long].select(sketchAgg.toColumn).head()
    val top = events.groupBy(col("user_id")).agg(count(lit(1)).as("true_cnt"))
      .orderBy(col("true_cnt").desc, col("user_id").asc)
      .limit(k)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    top.map { case (uid, cnt) =>
      val est = estimate(sketch, uid)
      (uid, cnt, est, est >= cnt)
    }.toSeq.toDF("user_id", "true_cnt", "est", "ok")
      .orderBy(col("user_id"))
  }
}
