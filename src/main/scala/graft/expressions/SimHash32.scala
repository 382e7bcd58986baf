package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native 32-bit SimHash (Charikar 2002) over a token-hash array: one pass
  * with a 32-slot signed accumulator — bit k of the fingerprint is set iff
  * tokens whose derived bit k ((h·(2k+1)) mod P mod 2) is 1 outweigh those
  * with 0.
  *
  * Replaces the interpreted HOF chain (`aggregate` of a 32-slot
  * `transform` — O(tokens × 32) lambda evaluations per document, the
  * CodegenFallback cost class PERF.md's HOF lesson documents) with a
  * codegen-stage scalar call. Arithmetic is IDENTICAL to the HOF
  * formulation (`Dedup.simhash32Hof`) and to the DuckDB oracle: all
  * integer ops, products bounded by P·63 « 2⁶³.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash32 expects array<bigint>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    SimHash32.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SimHash32.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash32 {

  private val P = graft.functions.TextOps.HashMod

  def compute(hs: ArrayData): Long = {
    val n = hs.numElements()
    val w = new Array[Long](32)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var k = 0
      while (k < 32) {
        if (h * (2L * k + 1L) % P % 2L == 1L) w(k) += 1L else w(k) -= 1L
        k += 1
      }
      i += 1
    }
    var out = 0L
    var k = 0
    while (k < 32) {
      if (w(k) > 0L) out |= 1L << k
      k += 1
    }
    out
  }
}
