package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass text-statistics kernel (round-14 optimization) —
  * the quality/langid feature family fused into ONE character scan.
  *
  * The LogReg/LangId feature expressions and the quality_scores columns
  * each re-derived the token stream independently (`tokens(text)` is an
  * interpreted HOF chain with no subexpression reuse — the PERF.md
  * round-2 lesson) plus two full-text regexp_replace passes for the
  * digit/alpha ratios; scoring one document evaluated ~10 separate
  * text walks. This kernel computes every underlying COUNT in one scan:
  *
  *   n_chars      = length(text)                  (codepoints, original)
  *   n_digit      = length(regexp_replace(text, "[^0-9]", ""))
  *   n_alpha      = length(regexp_replace(text, "[^A-Za-z]", ""))
  *   n_tokens     = size(tokens(text))            (uncapped)
  *   sum_tok_len  = Σ length(token)               (exact integer)
  *   n_stop       = size(filter(tokens, in stopwords))
  *   n_distinct   = size(array_distinct(tokens))
  *   track[i]     = size(filter(tokens, = track(i)))
  *
  * Tokenization is byte-identical to `filter(split(lower(text),
  * "[^a-z0-9]+"), t => t =!= "")` — the same lowercase mapping and
  * ASCII-run scan [[TokenHashes]] already pins against the HOF chain.
  * Every emitted field is an exact integer, so feature columns derived
  * from this struct (ratios, means) reproduce the previous expressions
  * bit-for-bit (TextStatsSpec asserts per-row equality on the fixture
  * corpus plus adversarial unicode/empty/digit-only rows).
  *
  * Participates in whole-stage codegen via a reference-object call; the
  * HOF chains remain the DuckDB oracle formulation.
  */
case class TextStats(child: Expression, stopwords: Seq[String],
    track: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = TextStats.Schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_stats expects a string input, got ${child.dataType.catalogString}")

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }

  @transient private lazy val trackIdx: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    track.zipWithIndex.foreach { case (t, i) => m.put(t, i) }
    m
  }

  def compute(v: UTF8String): InternalRow = {
    // ASCII class counts over the ORIGINAL text (regex [^0-9]/[^A-Za-z]
    // are ASCII-only, and ASCII code units never occur inside surrogate
    // pairs, so a char scan matches the regex count exactly)
    val orig = v.toString
    var nDigit = 0
    var nAlpha = 0
    var i = 0
    val on = orig.length
    while (i < on) {
      val c = orig.charAt(i)
      if (c >= '0' && c <= '9') nDigit += 1
      else if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) nAlpha += 1
      i += 1
    }
    // token scan over the lowered text — same mapping as SQL lower()
    val lowered = v.toLowerCase.toString
    var nTokens = 0
    var sumTokLen = 0L
    var nStop = 0
    val distinct = new java.util.HashSet[String]()
    val trackCounts = new Array[Int](track.length)
    var start = -1
    i = 0
    val ln = lowered.length
    while (i <= ln) {
      val isTok = i < ln && {
        val c = lowered.charAt(i)
        (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      }
      if (isTok) { if (start < 0) start = i }
      else if (start >= 0) {
        val tok = lowered.substring(start, i)
        nTokens += 1
        sumTokLen += (i - start)
        if (stopSet.contains(tok)) nStop += 1
        distinct.add(tok)
        if (!trackIdx.isEmpty) {
          val ti = trackIdx.get(tok)
          if (ti != null) trackCounts(ti) += 1
        }
        start = -1
      }
      i += 1
    }
    InternalRow(v.numChars(), nDigit, nAlpha, nTokens, sumTokLen, nStop,
      distinct.size(), new GenericArrayData(trackCounts))
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textStats", this, classOf[TextStats].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_digit", IntegerType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sum_tok_len", LongType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("track", ArrayType(IntegerType, containsNull = false),
      nullable = false)))
}
