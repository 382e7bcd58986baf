package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic posting-bucket of a term — a splitmix64 fold over the
  * term's UTF-8 bytes, mod the bucket count — as a native codegen
  * expression.
  *
  * This sits on the inverted index's corpus-wide WRITE path (every
  * (term, doc_id) posting computes its bucket once), where a Scala UDF
  * would box every row AND fence off whole-stage codegen for the whole
  * postings build stage. As a native `Expression` with a static-call
  * `doGenCode` it rides inside the generated loop like `hash()` does.
  *
  * ONE definition: [[TermBucket.bucket]] is the only implementation of
  * the fold — the driver-side lookup call (`InvertedIndex.termBucket`)
  * delegates here, so write-time layout and query-time probe can never
  * desynchronize (the parity-critical-formula rule). splitmix64 is
  * public-domain arithmetic (Steele et al. 2014, as in
  * `java.util.SplittableRandom`).
  */
case class TermBucket(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"term_bucket expects a string input, got ${child.dataType.catalogString}")
    // n = 0 would divide by zero INSIDE generated code at execution time
    // and a negative n yields negative buckets — fail at analysis instead
    else if (n <= 0) TypeCheckResult.TypeCheckFailure(
      s"term_bucket bucket count must be positive, got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(v: Any): Any =
    TermBucket.bucket(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TermBucket.bucket($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TermBucket {

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** The one fold both faces share. `getBytes` on UTF8String avoids a
    * String round-trip when the backing array is exact.
    */
  def bucket(term: UTF8String, n: Int): Int = {
    var h = 0L
    val bytes = term.getBytes
    var i = 0
    while (i < bytes.length) {
      h = mix(h ^ (bytes(i) & 0xffL))
      i += 1
    }
    ((h >>> 1) % n).toInt
  }

  /** Driver-side face for query-time probes. */
  def bucket(term: String, n: Int): Int =
    bucket(UTF8String.fromString(term), n)
}
