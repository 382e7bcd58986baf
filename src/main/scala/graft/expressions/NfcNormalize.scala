package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression.
  *
  * Text dedup and fingerprinting are only sound over a canonical byte
  * representation: "é" arrives both composed (U+00E9) and decomposed
  * (e + U+0301) in any web corpus, and every hash-based operator upstream
  * (MinHash, SimHash, winnowing, exact-dedup fingerprints) would treat the
  * two as different documents. NFC-normalizing first is therefore the
  * step-zero of the cleaning pipeline. Spark has no built-in for it; a
  * Scala UDF would box every row — this is the native `Expression` with a
  * static-call `doGenCode`, so it rides inside whole-stage codegen like
  * `lower()` does.
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
  * true for almost every row of a mostly-ASCII corpus; only rows that
  * actually contain decomposable sequences pay for the rewrite.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
