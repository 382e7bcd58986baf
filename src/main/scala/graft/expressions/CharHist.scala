package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document character histogram over the [a-z0-9] alphabet:
  * lower → keep [a-z0-9] → count per character, one scan, emitted as a
  * 36-slot count array (index 0–25 = 'a'–'z', 26–35 = '0'–'9'; see
  * [[CharHist.Alphabet]]).
  *
  * Replaces the per-character row explosion in `charlm_bits`
  * (`explode(transform(sequence(1, length(cs)), …))` — one row PER
  * CHARACTER, ~5M rows at sf0.1) with one kernel call per document plus a
  * ≤36-row posexplode. The downstream (doc, char, n) digest stream is
  * unchanged, so the corpus char-LM model and bits-per-char scores are
  * bit-identical to the staged chain (CharHistSpec asserts per-row
  * equality; the explode chain remains the DuckDB oracle formulation).
  *
  * Scale: the histogram is the map-side combine done inside the row — the
  * shuffle already only carried alphabet-bounded digests, this removes the
  * local row-materialization cost too. Participates in whole-stage codegen
  * (static call via defineCodeGen).
  */
case class CharHist(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_hist expects a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    CharHist.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.CharHist.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharHist {

  /** Slot order of the emitted histogram. */
  val Alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"

  def compute(s: UTF8String): ArrayData = {
    // same Unicode mapping as SQL lower() (cf. TokenHashes.compute)
    val str = s.toLowerCase.toString
    val counts = new Array[Long](36)
    var i = 0
    val n = str.length
    while (i < n) {
      val c = str.charAt(i)
      if (c >= 'a' && c <= 'z') counts(c - 'a') += 1L
      else if (c >= '0' && c <= '9') counts(26 + (c - '0')) += 1L
      i += 1
    }
    new GenericArrayData(counts)
  }
}
