package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fully-fused native embedding kernel: lower → tokenize → rolling hash →
  * signed bucket accumulate → L2 normalize, in ONE character scan with a
  * `dim`-element double accumulator. Replaces the staged HOF chain
  * (`l2Normalize(aggregate(tokenHashes(text), …))`) in the hot path; the
  * HOF chain remains the oracle formulation the DuckDB SQL mirrors.
  *
  * Bit-identical to the HOF chain (HashEmbedSpec asserts per-row equality
  * over the fixture corpus):
  *  - bucket sums are ±1.0 increments on doubles — exact integer
  *    arithmetic below 2^53, so accumulation order cannot matter;
  *  - the norm is the same index-order sum of squares and the same
  *    `<= 1e-12` pass-through as VectorOps.l2Normalize;
  *  - tokenization is TokenHashes' scan (itself spec-equal to the
  *    `split/filter/slice` HOFs).
  *
  * Scale: embedding is the hot per-row kernel of the corpus pipeline — a
  * 100 TB run embeds every document. One scan, no per-token array
  * allocation, no boxing inside the loop, and the call participates in
  * whole-stage codegen (`defineCodeGen` static call), so the projection
  * stays in the generated loop.
  *
  * Hash-embedder semantics follow the reference's deterministic stand-in
  * documented in SURVEY §7.0 (the ONNX model itself is out of
  * public-knowledge scope; cf. E5MultilingualEmbeddings.cs:121-160).
  */
case class HashEmbed(child: Expression, dim: Int = 64,
                     normalize: Boolean = true) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"hash_embed expects a string input, got ${child.dataType.catalogString}")
    else if (dim <= 0)
      TypeCheckResult.TypeCheckFailure(s"hash_embed dim must be positive, got $dim")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(v: Any): Any =
    HashEmbed.compute(v.asInstanceOf[UTF8String], dim, normalize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.HashEmbed.compute($c, $dim, $normalize)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashEmbed {

  def compute(s: UTF8String, dim: Int, normalize: Boolean): ArrayData = {
    val str = s.toLowerCase.toString // same Unicode mapping as SQL lower()
    val acc = new Array[Double](dim)
    val twoDim = 2L * dim
    var h = 0L
    var inTok = false
    var nTok = 0
    var i = 0
    val n = str.length
    while (i < n && nTok < TokenHashes.MaxTokens) {
      val c = str.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        h = (h * 31L + c.toLong) % TokenHashes.Mod
        inTok = true
      } else if (inTok) {
        bucket(acc, h, dim, twoDim); nTok += 1; h = 0L; inTok = false
      }
      i += 1
    }
    if (inTok && nTok < TokenHashes.MaxTokens) bucket(acc, h, dim, twoDim)
    if (normalize) {
      var sq = 0.0
      var j = 0
      while (j < dim) { sq += acc(j) * acc(j); j += 1 }
      val norm = math.sqrt(sq)
      if (norm > 1e-12) { // same pass-through guard as VectorOps.l2Normalize
        j = 0
        while (j < dim) { acc(j) /= norm; j += 1 }
      }
    }
    new GenericArrayData(acc)
  }

  private def bucket(acc: Array[Double], h: Long, dim: Int, twoDim: Long): Unit = {
    val sign = if (h % twoDim < dim) 1.0 else -1.0
    acc((h % dim).toInt) += sign
  }
}
