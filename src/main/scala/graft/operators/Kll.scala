package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch (the KLL family — Karnin, Lang & Liberty
  * 2016) as a typed Aggregator — completes the shippable-sketch-state
  * family: HLL (distinct), KMV (distinct + set ops), CMS (point
  * frequency), Misra-Gries (heavy keys) all dump mergeable state; this
  * adds QUANTILES, the one summary the family lacked (GK
  * `approx_percentiles` is oracled but its state never ships).
  *
  * Structure: a ladder of levels; level l holds items of weight 2^l.
  * Inserts land in level 0; when a level reaches capacity K its sorted
  * buffer is COMPACTED — keep the odd-indexed half at doubled weight,
  * promote it one level up. This is the DETERMINISTIC derandomization of
  * KLL's coin-flip compactor (KLL §2 notes deterministic compaction gives
  * the worst-case O(H/k) rank error; the coin only improves constants):
  * determinism buys exact replayability — the dumped sketch is a pure
  * function of the per-partition input order, and every estimate drawn
  * from it is a pure function of the dump.
  *
  * SELF-CERTIFYING ERROR BOUND: each compaction of level l perturbs any
  * rank query by at most 2^l (the classic compactor analysis), so the
  * sketch carries `err` = Σ 2^l over every compaction it ever performed —
  * a sound worst-case rank bound REGARDLESS of merge order or partition
  * layout (merge sums the two sides' budgets before cascading). The
  * audit query asserts each estimate's true rank lands within q·N ± err
  * using the sketch's own certificate, so the oracled booleans can never
  * flake on a different task schedule.
  *
  * Mergeability is the point: merge = level-wise concat + the same
  * cascade, associative up to the (tracked) error budget — sketch state
  * ships across 1000 executors / days of partitions and unions without
  * re-scanning, exactly like the HLL/KMV/CMS dumps. Total weight is
  * conserved by construction (2m items → m at weight 2w), so Σ weight of
  * the dumped items is EXACTLY N — the sketch self-reports corpus size.
  *
  * 100 TB shape: one map-side-combinable typed-Agg pass builds it
  * (partials are ≤ K·H doubles); the dumped state is KBs of driver-side
  * metadata (the trained-index posture); the audit's counting pass is
  * one map-side-combinable aggregate over a 4-row broadcast.
  */
object Kll {

  val K = 128 // per-level capacity; rank error ~ N·H/K over H ≈ log2(N/K) levels

  final case class Buf(levels: Seq[Seq[Double]], err: Long)

  /** Cascade-compact every overfull level, charging 2^l per compaction to
    * the error budget. Keeps the ODD-indexed half (even would always keep
    * the minimum — a one-sided bias); a leftover item on odd sizes stays
    * at its level, preserving total weight exactly.
    */
  private def compactAll(levels0: Vector[Vector[Double]], err0: Long): (Vector[Vector[Double]], Long) = {
    var levels = levels0
    var err = err0
    var l = 0
    while (l < levels.length) {
      if (levels(l).length >= K) {
        val sorted = levels(l).sorted
        val m = (sorted.length / 2) * 2
        val keep = (1 until m by 2).map(sorted)
        val rest = sorted.drop(m)
        levels = levels.updated(l, rest.toVector)
        val promoted =
          (if (l + 1 < levels.length) levels(l + 1) else Vector.empty[Double]) ++ keep
        levels =
          if (l + 1 < levels.length) levels.updated(l + 1, promoted)
          else levels :+ promoted
        err += 1L << l
      } else l += 1 // only advance when this level is settled: a promotion may overfill l+1
    }
    (levels, err)
  }

  val sketchAgg: Aggregator[Double, Buf, Buf] = new Aggregator[Double, Buf, Buf] {
    def zero: Buf = Buf(Seq(Seq.empty), 0L)
    def reduce(b: Buf, x: Double): Buf = {
      // hot path: plain append until level 0 fills; the full cascade
      // (and its vector conversion) runs once per K rows
      val l0 = b.levels.head :+ x
      if (l0.length < K) Buf(b.levels.updated(0, l0), b.err)
      else {
        val lv = b.levels.map(_.toVector).toVector
        val (levels, err) = compactAll(lv.updated(0, l0.toVector), b.err)
        Buf(levels, err)
      }
    }
    def merge(a: Buf, b: Buf): Buf = {
      val h = math.max(a.levels.length, b.levels.length)
      val lv = Vector.tabulate(h) { l =>
        (if (l < a.levels.length) a.levels(l).toVector else Vector.empty[Double]) ++
          (if (l < b.levels.length) b.levels(l) else Seq.empty)
      }
      val (levels, err) = compactAll(lv, a.err + b.err)
      Buf(levels, err)
    }
    def finish(b: Buf): Buf = b
    def bufferEncoder: Encoder[Buf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Buf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** (value, weight) items of a finished sketch. */
  def items(b: Buf): Seq[(Double, Long)] =
    b.levels.zipWithIndex.flatMap { case (lv, l) => lv.map(v => (v, 1L << l)) }

  /** Rank-estimate quantile q from items: the smallest value whose
    * cumulative weight (value-ascending) reaches q·W. Pure function of the
    * dump — the DuckDB oracle computes the identical fold.
    */
  def estimate(its: Seq[(Double, Long)], q: Double): Double = {
    val w = its.map(_._2).sum
    val sorted = its.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    var cum = 0L
    for ((v, wt) <- sorted) { cum += wt; if (cum >= q * w) return v }
    sorted.last._1
  }

  def itemsPath(sfDir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-kll-" + Ann.pathToken(sfDir)

  def metaPath(sfDir: String): String = itemsPath(sfDir) + "-meta"

  private val memo = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build the sketch over events.value in one distributed typed-Agg pass
    * and dump (value, weight) items + (err, n) meta — the mergeable-state
    * artifact both the audit query and the oracle replay from.
    */
  def layout(spark: SparkSession, sfDir: String): String =
    memo.computeIfAbsent(sfDir, { _ =>
      import spark.implicits._
      val sk = graft.Tables.events(spark, sfDir)
        .select(col("value")).as[Double]
        .select(sketchAgg.toColumn).head()
      val its = items(sk)
      its.toDF("value", "weight").coalesce(1)
        .write.mode("overwrite").parquet(itemsPath(sfDir))
      Seq((sk.err, its.map(_._2).sum)).toDF("err", "n").coalesce(1)
        .write.mode("overwrite").parquet(metaPath(sfDir))
      itemsPath(sfDir)
    })

  private[graft] def resetMemos(): Unit = memo.clear()
}
