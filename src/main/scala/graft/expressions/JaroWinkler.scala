package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native codegen expression.
  *
  * The standard kernel for fuzzy record linkage / entity resolution
  * (Winkler 1990, census name matching): Jaro similarity — matches within
  * a ⌊max(|a|,|b|)/2⌋−1 window, integer half-transpositions — plus the
  * Winkler common-prefix boost (scale 0.1, prefix capped at 4, applied
  * only when jaro > 0.7). Spark ships `levenshtein` but nothing in the
  * Jaro family, and an edit-distance threshold is the wrong tool for
  * name-style short strings where transpositions dominate. A Scala UDF
  * would box every candidate pair of a linkage join — this is a native
  * `BinaryExpression` with a static-call `doGenCode`, so the kernel runs
  * inside whole-stage codegen on the hot candidate-verification path.
  *
  * Semantics pinned to DuckDB's `jaro_winkler_similarity` (the oracle):
  * either side empty → 0.0, transposition count integer-halved, boost
  * strictly-greater-than 0.7. JaroWinklerSpec locks the constants against
  * probed oracle values.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects (string, string), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static kernel target for both interpreted eval and codegen. Operates
    * on Java chars (the corpus is ASCII; UTF-16 code units match DuckDB's
    * per-character walk for BMP text).
    */
  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    // match window: chars count as matching when equal and within
    // ⌊max/2⌋−1 positions of each other (floored at 0 for 1-char strings)
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // walk the matched chars of both sides in order; each positional
    // mismatch is a half-transposition, integer-halved (DuckDB parity)
    var halfT = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) halfT += 1
        k += 1
      }
      i += 1
    }
    val t = halfT / 2
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    // Winkler boost: common prefix (≤4) rewards only already-close pairs
    if (jaro > 0.7) {
      var p = 0
      val pMax = math.min(4, math.min(la, lb))
      while (p < pMax && a.charAt(p) == b.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }
}
