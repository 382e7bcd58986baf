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
  * the SQL final aggregation it replaces. At 100 TB the shape is
  * MLlib's own treeAggregate posture (one pass per iteration, digest
  * bytes per partition), minus the tree level that only matters past
  * ~10k partitions.
  *
  * Scale note: partials are width-8·W bytes each; with P partitions the
  * driver holds P·W doubles transiently. Every caller's W is O(d²) for
  * d ≤ 16, so even a 100k-partition corpus stays a few hundred MB —
  * and a corpus that large should raise the tree depth, not abandon
  * the digest (see MLlib GradientDescent.treeAggregate).
  */
private[graft] object DigestPass {

  /** Fold `rows` into a `width`-double digest: `seqOp(acc, row)` per row,
    * partials merged by element-wise sum in partition-index order.
    */
  def fold[T](rows: RDD[T], width: Int)(seqOp: (Array[Double], T) => Unit)
      : Array[Double] = {
    val sc = rows.sparkContext
    val partials = sc.runJob(rows, (it: Iterator[T]) => {
      val acc = new Array[Double](width)
      while (it.hasNext) seqOp(acc, it.next())
      acc
    })
    val out = new Array[Double](width)
    partials.foreach { a =>
      var i = 0
      while (i < width) { out(i) += a(i); i += 1 }
    }
    out
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
    * few doubles per row, MBs total; a 100 TB fit uses
    * MEMORY_AND_DISK_SER exactly like MLlib's GradientDescent input.
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
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    flat.count()
    flat
  }
}
