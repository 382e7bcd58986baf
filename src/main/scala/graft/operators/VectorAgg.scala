package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.{Column, Encoder, Encoders}

/** Typed UDAF surface: a custom `Aggregator` computing the per-group mean
  * vector in ONE pass over whole vectors — the alternative formulation to
  * the posexplode+avg centroid (VectorQueries `centroid_by_label`), which
  * flattens to (label, pos) digests first.
  *
  * Scale tradeoff (100 TB): the Aggregator's partial state is one
  * (dims-sized sums array, count) buffer per group per partition — the
  * shuffle carries ONE row per (group, partition) instead of `dims` rows,
  * at the cost of an opaque (non-codegen) update loop. Both are correct;
  * the posexplode form keeps whole-stage codegen, this form minimizes
  * shuffle rows. `ObjectHashAggregateExec` executes it without the
  * sort-based fallback of old-style UDAFs.
  *
  * The reference has no aggregation surface at all (SURVEY §2B); this
  * completes the UDAF row of the checklist with a typed
  * `Aggregator[IN, BUF, OUT]` registered for both Column and SQL use.
  */
object VectorAgg {

  /** Mutable partial state: element-wise sums + row count. `sums` is empty
    * until the first row fixes the dimensionality.
    */
  case class MeanBuf(var sums: Array[Double], var n: Long)

  class VectorMean extends Aggregator[Seq[Float], MeanBuf, Seq[Double]] {
    override def zero: MeanBuf = MeanBuf(Array.emptyDoubleArray, 0L)

    override def reduce(b: MeanBuf, a: Seq[Float]): MeanBuf = {
      if (a == null) return b
      if (b.sums.isEmpty) b.sums = new Array[Double](a.length)
      require(a.length == b.sums.length,
        s"vector dimension mismatch: ${a.length} vs ${b.sums.length}")
      var i = 0
      while (i < b.sums.length) { b.sums(i) += a(i); i += 1 }
      b.n += 1
      b
    }

    override def merge(x: MeanBuf, y: MeanBuf): MeanBuf = {
      if (y.sums.isEmpty) return x
      if (x.sums.isEmpty) return y
      require(x.sums.length == y.sums.length,
        s"vector dimension mismatch: ${x.sums.length} vs ${y.sums.length}")
      var i = 0
      while (i < x.sums.length) { x.sums(i) += y.sums(i); i += 1 }
      x.n += y.n
      x
    }

    override def finish(b: MeanBuf): Seq[Double] =
      if (b.n == 0L) Seq.empty
      else b.sums.map(_ / b.n).toSeq

    override def bufferEncoder: Encoder[MeanBuf] = Encoders.product[MeanBuf]
    override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  }

  /** Column-API handle; also SQL-callable after
    * `spark.udf.register("vector_mean", VectorAgg.vectorMean)`.
    */
  lazy val vectorMean = udaf(new VectorMean)

  def vectorMeanCol(c: Column): Column = vectorMean(c)
}
