package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass tokenize+hash kernel: lower → [a-z0-9]+ runs →
  * first 512 tokens → polynomial rolling hash (acc*31 + char, mod 1e9+7)
  * per token, as one character scan.
  *
  * Bit-identical to the HOF chain it replaces
  * (`slice(filter(split(lower(text), "[^a-z0-9]+"), …), 1, 512)` +
  * per-token `aggregate` fold — asserted per-row on the fixture corpus in
  * TokenHashesSpec): the input is lowercased with the same Unicode mapping
  * SQL `lower` uses, and every non-[a-z0-9] code unit is a separator
  * exactly like the regex. One scan, no intermediate token/char arrays —
  * replaces 4 interpreted HOF walks feeding every text operator
  * (fingerprint, embedder, MinHash, SimHash).
  */
case class TokenHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_hashes expects a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    TokenHashes.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TokenHashes.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenHashes {
  val MaxTokens = 512
  val Mod = 1000000007L

  def compute(s: UTF8String): ArrayData = {
    // same lowercase mapping as SQL lower() (UTF8String.toLowerCase
    // delegates to ROOT-locale lowercasing off the ASCII fast path)
    val str = s.toLowerCase.toString
    val out = new java.util.ArrayList[Any](64)
    var h = 0L
    var inTok = false
    var i = 0
    val n = str.length
    while (i < n && out.size < MaxTokens) {
      val c = str.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        h = (h * 31L + c.toLong) % Mod
        inTok = true
      } else if (inTok) {
        out.add(java.lang.Long.valueOf(h)); h = 0L; inTok = false
      }
      i += 1
    }
    if (inTok && out.size < MaxTokens) out.add(java.lang.Long.valueOf(h))
    new GenericArrayData(out.toArray)
  }
}
