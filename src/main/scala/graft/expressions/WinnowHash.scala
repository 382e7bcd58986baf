package graft.expressions

import java.util.{TreeSet => JTreeSet}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003):
  * lower → keep [a-z0-9] → character k-gram rolling poly-hashes → minimum
  * hash VALUE in each window of `w` consecutive k-grams → distinct, sorted
  * ascending. One scan per document, O(n·w) worst case with w=4.
  *
  * Keeping distinct hash *values* (rather than winnowing's selected
  * positions) makes the fingerprint set independent of the
  * rightmost-vs-leftmost tie rule, so a SQL window-min formulation (the
  * DuckDB oracle in `winnow_dedup`) reproduces it exactly.
  *
  * Scale: this is the substring-level dedup family (exact-fp / MinHash /
  * SimHash / embedding-cosine cover whole-doc and token-set similarity;
  * winnowing catches shared PASSAGES — boilerplate, quotations, licence
  * headers). Docs sharing any fingerprint meet in an equi-join on the
  * fingerprint value — banded like LSH, never all-pairs.
  */
case class WinnowHash(child: Expression, k: Int = WinnowHash.DefaultK,
    w: Int = WinnowHash.DefaultW) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"winnow_hash expects a string input, got ${child.dataType.catalogString}")
    else if (k < 1 || w < 1) TypeCheckResult.TypeCheckFailure(
      s"winnow_hash needs k >= 1 and w >= 1, got k=$k w=$w")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(v: Any): Any =
    WinnowHash.compute(v.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.WinnowHash.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowHash {

  val DefaultK = 8 // character n-gram width
  val DefaultW = 4 // winnowing window (guarantee: any match ≥ k+w-1 chars is caught)

  private val Mod = 1000000007L

  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    // same normalization as CharHist / the charlm oracle: SQL lower(),
    // keep [a-z0-9] only (all ASCII, so char code == ascii())
    val str = s.toLowerCase.toString
    val n0 = str.length
    val cleaned = new Array[Char](n0)
    var n = 0
    var i = 0
    while (i < n0) {
      val c = str.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) { cleaned(n) = c; n += 1 }
      i += 1
    }
    val g = n - k + 1 // number of k-grams
    if (g < w) return new GenericArrayData(Array.emptyLongArray)
    // k-gram poly-hashes: h_i = fold(acc * 31 + code) % Mod over chars i..i+k-1
    val hashes = new Array[Long](g)
    i = 0
    while (i < g) {
      var acc = 0L
      var j = 0
      while (j < k) {
        acc = (acc * 31 + cleaned(i + j)) % Mod
        j += 1
      }
      hashes(i) = acc
      i += 1
    }
    // window minima, distinct values, ascending
    val out = new JTreeSet[java.lang.Long]()
    i = 0
    val lastWin = g - w
    while (i <= lastWin) {
      var m = hashes(i)
      var j = 1
      while (j < w) {
        if (hashes(i + j) < m) m = hashes(i + j)
        j += 1
      }
      out.add(m)
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }
}
