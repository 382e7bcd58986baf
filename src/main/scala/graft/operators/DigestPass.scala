package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}

/** Single-stage corpus→digest pass for iterative model fits (round-14
  * optimization). An IRLS/Newton iteration needs one driver-sized moment
  * digest per step; expressing that digest as a SQL aggregation costs a
  * partial-agg stage + an exchange + a final stage PER ITERATION — and
  * under AQE each of those materializes as its own re-planned job
  * (measured on the bench box: ~0.25 s per iteration for a 5-double
  * digest over 600k localCheckpointed rows, vs ~0.03 s for the
  * single-stage fold below; guide §1.2 "the distributed algorithm" +
  * §2.4 "remove shuffles outright"). The fold ships the SAME per-row
  * arithmetic to every partition, collects one fixed-width
  * Array[Double] per partition (driver-sized by construction — the
  * documented acceptable-collect class), and merges partials ON THE
  * DRIVER IN PARTITION-INDEX ORDER, which is deterministic across runs
  * — strictly more deterministic than the shuffle-fetch-order merge of
  * the SQL final aggregation it replaces.
  *
  * Scale posture (round-15, the MLlib treeAggregate shape made real
  * code instead of a comment): above [[TreePartitionThreshold]]
  * partitions the merge runs through ONE intermediate tree level —
  * ~√P consecutive-index groups each merged where the partials live,
  * only ~√P digests collected — so a 100k-partition corpus sends the
  * driver hundreds of digests, not 100k. The tree path merges each
  * group in ascending partition-index order and the groups in ascending
  * order, so it is deterministic run-over-run; its float parenthesizing
  * differs from the flat path's only at group boundaries (identical on
  * integer-valued digests — DigestPassSpec pins flat ≡ tree there, and
  * determinism on fractional ones).
  */
private[graft] object DigestPass {

  /** Partition count above which [[fold]] adds the tree merge level and
    * [[cachedDoubles]] stores serialized (the MLlib GradientDescent
    * posture — at that scale the deserialized cache's object overhead
    * dominates). `var` so DigestPassSpec can force both paths on the
    * fixture; production fixture fits run far below it.
    */
  @volatile var TreePartitionThreshold: Int = 1 << 10

  /** Fold `rows` into a `width`-double digest: `seqOp(acc, row)` per row,
    * partials merged by element-wise sum in partition-index order
    * (through one tree level above [[TreePartitionThreshold]]).
    */
  def fold[T](rows: RDD[T], width: Int)(seqOp: (Array[Double], T) => Unit)
      : Array[Double] = {
    val sc = rows.sparkContext
    val nParts = rows.getNumPartitions
    def mergeInto(out: Array[Double], a: Array[Double]): Unit = {
      var i = 0
      while (i < width) { out(i) += a(i); i += 1 }
    }
    if (nParts <= TreePartitionThreshold) {
      val partials = sc.runJob(rows, (it: Iterator[T]) => {
        val acc = new Array[Double](width)
        while (it.hasNext) seqOp(acc, it.next())
        acc
      })
      val out = new Array[Double](width)
      partials.foreach(mergeInto(out, _))
      out
    } else {
      // tree level: one digest per partition, shuffled into ~√P
      // consecutive-index groups, merged in ascending index order within
      // each group and across groups — deterministic, ~√P digests to the
      // driver instead of P
      val groupSize = math.max(1, math.ceil(math.sqrt(nParts.toDouble)).toInt)
      val merged = rows
        .mapPartitionsWithIndex { (i, it) =>
          val acc = new Array[Double](width)
          while (it.hasNext) seqOp(acc, it.next())
          Iterator((i / groupSize, (i, acc)))
        }
        .groupByKey(math.max(1, nParts / groupSize))
        .map { case (g, ias) =>
          val out = new Array[Double](width)
          ias.toSeq.sortBy(_._1).foreach { case (_, a) =>
            var i = 0
            while (i < width) { out(i) += a(i); i += 1 }
          }
          (g, out)
        }
        .collect()
      val out = new Array[Double](width)
      merged.sortBy(_._1).foreach { case (_, a) => mergeInto(out, a) }
      out
    }
  }

  /** A reusable Row RDD of a (localCheckpointed) frame — computed once so
    * the per-iteration jobs skip re-deriving the deserializer plan.
    */
  def rowsOf(df: DataFrame): RDD[Row] = df.rdd

  /** The iteration-loop input as a PERSISTED primitive-array RDD: every
    * numeric/array column of `df` flattened into one Array[Double] per
    * row, materialized once. Each fold over `rowsOf` re-paid the
    * InternalRow→Row deserialization of the whole frame per iteration
    * (40+ conversions of the same rows in an IRLS fit); folding over
    * cached primitives pays it once. Callers unpersist when the loop
    * ends. Memory: 8·(total doubles) — the model-fit frames here are a
    * few doubles per row, MBs total, cached deserialized (primitive
    * arrays re-read with zero per-iteration cost); a corpus wide enough
    * to cross [[TreePartitionThreshold]] partitions stores SERIALIZED
    * instead, exactly like MLlib's GradientDescent input.
    */
  def cachedDoubles(df: DataFrame): RDD[Array[Double]] = {
    val flat = df.rdd.map { row =>
      val b = scala.collection.mutable.ArrayBuilder.make[Double]
      var i = 0
      while (i < row.length) {
        row.get(i) match {
          case d: Double => b += d
          case l: Long => b += l.toDouble
          case n: Int => b += n.toDouble
          case s: scala.collection.Seq[_] =>
            s.foreach(v => b += v.asInstanceOf[Double])
          case other => throw new IllegalArgumentException(
            s"cachedDoubles: non-numeric column value $other")
        }
        i += 1
      }
      b.result()
    }
    val level =
      if (flat.getNumPartitions > TreePartitionThreshold)
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
      else org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    flat.persist(level)
    flat.count()
    flat
  }
}
