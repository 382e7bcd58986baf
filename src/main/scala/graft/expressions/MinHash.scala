package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared constants of the MinHash family — the single source of truth for
  * the affine permutation table, referenced by both the native kernels here
  * and the HOF oracle formulations in graft.operators.Dedup (and baked
  * identically into the DuckDB oracle SQL in PipelineQueries).
  */
object MinHashConstants {
  val P: Long = 1000000007L
  val NumHashes = 8
  val BandRows = 2 // 4 bands x 2 rows

  val hashA: Array[Long] =
    (0 until NumHashes).map(j => ((2L * j + 1) * 12582917L) % P).toArray
  val hashB: Array[Long] =
    (0 until NumHashes).map(j => ((j + 1L) * 4256249L) % P).toArray
}

private[expressions] trait LongArrayKernel extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint> input, got ${other.catalogString}")
  }
}

/** Native single-pass word-3-shingle kernel: distinct shingle hashes (first-
  * occurrence order) from a token-hash array — bit-identical to the HOF
  * formulation `array_distinct(transform(sequence(...), ...))` in
  * graft.operators.Dedup.shingleHashesHof, which remains the oracle
  * formulation (DedupSpec asserts per-row equality). One array walk with a
  * hash set instead of 4 interpreted HOF passes + intermediate arrays.
  */
case class ShingleHashes(child: Expression) extends LongArrayKernel {

  override def nullSafeEval(v: Any): Any =
    ShingleHashes.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ShingleHashes.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  import MinHashConstants.P

  def compute(hs: ArrayData): ArrayData = {
    val n = hs.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[java.lang.Long](math.max(16, n))
    var i = 2
    while (i < n) {
      val s = ((hs.getLong(i - 2) * 131L + hs.getLong(i - 1)) % P * 131L +
        hs.getLong(i)) % P
      seen.add(java.lang.Long.valueOf(s))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}

/** Native MinHash signature from a shingle-hash array: NumHashes mins over
  * affine-permuted shingles, empty input → sentinel P per slot. Bit-identical
  * to the HOF formulation graft.operators.Dedup.minhashesHof (spec-asserted);
  * one walk with the 8 accumulators in registers instead of NumHashes
  * interpreted transform+array_min passes.
  */
case class MinHashFromShingles(child: Expression) extends LongArrayKernel {

  override def nullSafeEval(v: Any): Any =
    MinHashFromShingles.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.MinHashFromShingles.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashFromShingles {
  import MinHashConstants._

  def compute(shs: ArrayData): ArrayData = {
    val mins = Array.fill(NumHashes)(P)
    val n = shs.numElements()
    var i = 0
    while (i < n) {
      val h = shs.getLong(i)
      var j = 0
      while (j < NumHashes) {
        val v = (hashA(j) * h + hashB(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(java.lang.Long.valueOf(_): AnyRef))
  }
}

/** Fully-fused shingle+minhash kernel: token-hash array → 8-slot MinHash
  * signature in ONE loop — the rolling 3-window shingle hash feeds the 8 min
  * accumulators directly, with no intermediate shingle array and no distinct
  * set (min over a multiset equals min over its distinct set, so skipping
  * dedup is exact). Bit-identical to
  * `minhashesHof(shingleHashesHof(hs))` — DedupSpec asserts it per row.
  *
  * This is the signature-generation hot path of corpus dedup: per-row,
  * shuffle-free, allocation-free until the 8-element result.
  */
case class MinHashSignature(child: Expression) extends LongArrayKernel {

  override def nullSafeEval(v: Any): Any =
    MinHashSignature.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.MinHashSignature.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  import MinHashConstants._

  def compute(hs: ArrayData): ArrayData = {
    val mins = Array.fill(NumHashes)(P)
    val n = hs.numElements()
    var i = 2
    while (i < n) {
      val s = ((hs.getLong(i - 2) * 131L + hs.getLong(i - 1)) % P * 131L +
        hs.getLong(i)) % P
      var j = 0
      while (j < NumHashes) {
        val v = (hashA(j) * s + hashB(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(java.lang.Long.valueOf(_): AnyRef))
  }
}
