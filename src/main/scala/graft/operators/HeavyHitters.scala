package graft.operators

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Distributed heavy hitters via per-partition Misra-Gries sketches
  * (Misra & Gries 1982; the distributed argument is the standard
  * pigeonhole: if a value's GLOBAL frequency exceeds n/k, some partition
  * must see it more than n_p/k times, so it survives that partition's
  * sketch — the union of per-partition survivors therefore contains
  * every global φ-heavy hitter whenever φ ≥ 1/k).
  *
  * The sketch only NOMINATES. The output is an exact recount of the
  * candidate set: corpus → semi-join the (≤ k·partitions)-row broadcast
  * candidate list → partial+final count → φ threshold against the 1-row
  * total. False candidates die at the threshold; true heavy hitters
  * cannot be missed — so the result is EXACT and independent of
  * partitioning, which is what makes it oracle-checkable by a plain
  * GROUP BY/HAVING. At 100 TB the first pass reads every row but
  * shuffles only the candidate digests; the naive alternative (full
  * GROUP BY on a web-scale value column just to find the top handful)
  * shuffles the whole distinct domain.
  */
object HeavyHitters {

  /** Per-partition Misra-Gries summaries: at most k (value, est) rows per
    * input partition. Estimates carry the classic MG guarantee per
    * partition — never over the true partition count, under by at most
    * n_p/k — and MG summaries are MERGEABLE (Agarwal et al. 2012): sum
    * matching counters, then trim back to k by subtracting the (k+1)-th
    * largest, and the combined bound is (n1+n2)/k. That mergeability is
    * what the streaming face rides. NULLs are skipped (they are a
    * completeness problem, not a frequency one).
    */
  def summaries(df: DataFrame, value: Column, k: Int): DataFrame = {
    require(k > 0, "sketch capacity must be positive")
    df.select(value.cast("string").as("value"))
      .as(Encoders.STRING)
      .mapPartitions { it =>
        val counters = mutable.HashMap.empty[String, Long]
        it.foreach { v =>
          if (v != null) {
            counters.get(v) match {
              case Some(c) => counters.update(v, c + 1)
              case None =>
                if (counters.size < k) counters.update(v, 1L)
                else {
                  // classic MG step: decrement every counter, drop zeros
                  val dead = mutable.ArrayBuffer.empty[String]
                  counters.foreach { case (key, c) =>
                    if (c == 1L) dead += key else counters.update(key, c - 1)
                  }
                  dead.foreach(counters.remove)
                }
            }
          }
        }
        counters.iterator.map { case (v, c) => (v, c) }
      }(Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .toDF("value", "est")
  }

  /** MG summary merge (Agarwal et al. 2012 §3): sum counters by value;
    * if more than k survive, subtract the (k+1)-th largest count from
    * all and drop the non-positive. Never overcounts; total undercount
    * across any merge tree stays ≤ n/k.
    */
  def mergeSummaries(pairs: Iterable[(String, Long)],
                     k: Int): Map[String, Long] = {
    require(k > 0, "sketch capacity must be positive")
    val summed = pairs.groupMapReduce(_._1)(_._2)(_ + _)
    if (summed.size <= k) summed
    else {
      val d = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.collect { case (v, c) if c - d > 0 => v -> (c - d) }
    }
  }

  /** Per-partition MG survivors, deduplicated: the nomination list for
    * the exact-recount path. Estimates dropped on purpose — candidacy is
    * the only thing the batch path consumes.
    */
  def candidates(df: DataFrame, value: Column, k: Int): DataFrame =
    summaries(df, value, k).select(col("value")).distinct()

  /** Per-GROUP Misra-Gries as a typed Aggregator UDAF: one bounded
    * k-counter sketch per group key, partial sketches merged with the
    * same mergeable-summaries rule. The per-group guarantee is the
    * global one scoped to the group: a value with frequency > n_g/k in
    * group g survives g's sketch. Buffer/output ride the Catalyst map
    * encoder so the result column explodes straight into candidate rows.
    */
  class MgSketch(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        String, Map[String, Long], Map[String, Long]] {
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], v: String): Map[String, Long] =
      if (v == null) b
      else b.get(v) match {
        case Some(c) => b.updated(v, c + 1)
        case None if b.size < k => b.updated(v, 1L)
        case None => // decrement-all, drop zeros (classic MG step)
          b.flatMap { case (key, c) =>
            if (c == 1L) None else Some(key -> (c - 1)) }
      }
    def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] =
      mergeSummaries(b1.toSeq ++ b2.toSeq, k)
    def finish(r: Map[String, Long]): Map[String, Long] = r
    def bufferEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Exact φ-heavy hitters PER GROUP — "top terms per language": per-group
    * MG sketches nominate (≤ k values per group), the exact recount of
    * the (group, candidate) pairs decides against each group's own
    * total. Same exactness/partitioning-independence argument as the
    * global operator, scoped per group.
    * Output: (grp, value, n, share) ordered by (grp, value).
    */
  def heavyHittersByGroup(df: DataFrame, group: Column, value: Column,
                          k: Int, phi: Double): DataFrame = {
    require(phi > 0 && phi < 1, s"phi must be in (0,1): $phi")
    require(phi >= 1.0 / k,
      s"phi=$phi below the sketch guarantee 1/k=${1.0 / k}")
    val sketch = udaf(new MgSketch(k))
    val vals = df
      .select(group.cast("string").as("grp"), value.cast("string").as("value"))
      .filter(col("grp").isNotNull && col("value").isNotNull)
    val cands = vals.groupBy(col("grp"))
      .agg(sketch(col("value")).as("summary"))
      .select(col("grp"), explode(map_keys(col("summary"))).as("value"))
    val counts = vals.join(cands, Seq("grp", "value"))
      .groupBy(col("grp"), col("value")).agg(count(lit(1)).as("n"))
    val totals = vals.groupBy(col("grp")).agg(count(lit(1)).as("n_total"))
    counts.join(totals, Seq("grp"))
      .filter(col("n") > lit(phi) * col("n_total"))
      .select(col("grp"), col("value"), col("n"),
        round(col("n").cast("double") / col("n_total"), 6).as("share"))
      .orderBy(col("grp"), col("value"))
  }

  // --- durable journal for the streaming face ----------------------------
  // foreachBatch is at-least-once and a restarted query loses closure
  // state, so the cross-trigger summary must live OUTSIDE the query:
  // a KB-sized (batchId, summary) journal, written atomically
  // (tmp + ATOMIC_MOVE) and idempotent by batchId — a redelivered trigger
  // returns the saved summary instead of double-merging. At scale the
  // journal rides the same durable store as the query checkpoint.

  private def journalPaths(path: String) =
    (java.nio.file.Paths.get(path), java.nio.file.Paths.get(path + ".tmp"))

  def loadJournal(path: String): Option[(Long, Map[String, Long])] = {
    val (p, _) = journalPaths(path)
    if (!java.nio.file.Files.exists(p)) None
    else {
      val lines = java.nio.file.Files.readAllLines(p)
      val summary = lines.asScala.drop(1).filter(_.nonEmpty).map { l =>
        val Array(v, c) = l.split(" ", 2)
        java.net.URLDecoder.decode(v, "UTF-8") -> c.toLong
      }.toMap
      Some((lines.get(0).toLong, summary))
    }
  }

  def saveJournal(path: String, batchId: Long,
                  summary: Map[String, Long]): Unit = {
    val (p, tmp) = journalPaths(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    val body = (Seq(batchId.toString) ++ summary.toSeq.sortBy(_._1).map {
      case (v, c) => s"${java.net.URLEncoder.encode(v, "UTF-8")} $c"
    }).mkString("\n")
    java.nio.file.Files.writeString(tmp, body)
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** One journaled merge step: load, skip if this batchId was already
    * applied (redelivery), else merge + save. Returns the summary that is
    * current AFTER the step either way.
    */
  def applyJournaled(journalPath: String, batchId: Long,
                     pairs: Seq[(String, Long)], k: Int): Map[String, Long] = {
    val (lastApplied, saved) =
      loadJournal(journalPath).getOrElse((-1L, Map.empty[String, Long]))
    if (batchId <= lastApplied) saved
    else {
      val merged = mergeSummaries(saved.toSeq ++ pairs, k)
      saveJournal(journalPath, batchId, merged)
      merged
    }
  }

  /** Exact φ-heavy hitters (frequency > phi·n) of `value`, found by
    * sketch-nominate + exact-recount. Requires phi ≥ 1/k or the sketch
    * cannot guarantee completeness (enforced).
    * Output: (value, n, share) ordered by value.
    */
  def heavyHitters(df: DataFrame, value: Column, k: Int,
                   phi: Double): DataFrame = {
    require(phi > 0 && phi < 1, s"phi must be in (0,1): $phi")
    require(phi >= 1.0 / k,
      s"phi=$phi below the sketch guarantee 1/k=${1.0 / k}")
    val vals = df.select(value.cast("string").as("value"))
      .filter(col("value").isNotNull)
    val cands = candidates(df, value, k)
    val counts = vals.join(broadcast(cands), Seq("value"))
      .groupBy(col("value")).agg(count(lit(1)).as("n"))
    val total = vals.agg(count(lit(1)).as("n_total"))
    counts.join(broadcast(total))
      .filter(col("n") > lit(phi) * col("n_total"))
      .select(col("value"), col("n"),
        round(col("n").cast("double") / col("n_total"), 6).as("share"))
      .orderBy(col("value"))
  }
}
