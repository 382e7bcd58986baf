package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native UDTF (Catalyst `Generator`): document → fixed-size token chunks,
  * one output row per chunk — the generator formulation of the
  * `transform+posexplode` chunking pipeline (`chunk_explode`), completing
  * the UDF/UDAF/UDTF surface (SURVEY §2B) with a real table function.
  *
  * SQL-callable after `GraftFunctions.register`:
  * `SELECT doc_id, c.* FROM docs LATERAL VIEW chunk_gen(text, 32) c
  *  AS chunk_idx, chunk_text, n_tokens`.
  *
  * Tokenization = TokenHashes' scan (lower → [a-z0-9]+ runs → 512 cap) so
  * the three text kernels agree on what a token is; chunk_text re-joins
  * the original (lowercased) token runs with single spaces, exactly like
  * `concat_ws(" ", slice(toks, …))` in the HOF pipeline.
  *
  * Scale: generators stream — one input row expands lazily into its chunk
  * rows inside GenerateExec with no intermediate array materialization per
  * document (the HOF form builds the full chunk array per row first).
  * Tokenless documents generate zero rows (matching the HOF pipeline's
  * `size(toks) > 0` filter).
  */
case class ChunkGen(child: Expression, chunkSize: Int = 32)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("chunk_text", StringType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"chunk_gen expects a string input, got ${child.dataType.catalogString}")
    else if (chunkSize <= 0)
      TypeCheckResult.TypeCheckFailure(s"chunk_gen size must be positive, got $chunkSize")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val toks = ChunkGen.tokens(v.asInstanceOf[UTF8String])
    if (toks.isEmpty) return Nil
    toks.grouped(chunkSize).zipWithIndex.map { case (chunk, idx) =>
      InternalRow(idx, UTF8String.fromString(chunk.mkString(" ")), chunk.length)
    }.toSeq
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ChunkGen {

  /** The truncated token stream as strings — same scan as
    * TokenHashes.compute, yielding the tokens instead of their hashes.
    */
  private[expressions] def tokens(s: UTF8String): IndexedSeq[String] = {
    val str = s.toLowerCase.toString
    val out = IndexedSeq.newBuilder[String]
    val cur = new java.lang.StringBuilder
    var n = 0
    var i = 0
    val len = str.length
    while (i < len && n < TokenHashes.MaxTokens) {
      val c = str.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) cur.append(c)
      else if (cur.length > 0) { out += cur.toString; cur.setLength(0); n += 1 }
      i += 1
    }
    if (cur.length > 0 && n < TokenHashes.MaxTokens) out += cur.toString
    out.result()
  }
}
