package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Registration + Column-API surface for graft's native Catalyst
  * expressions. Registration is per-session and idempotent; after
  * `register(spark)` the functions are callable from SQL
  * (`SELECT cosine_sim(a, b)`) and via the helpers here.
  */
object GraftFunctions {

  val CosineSimName = "cosine_sim"
  val HashEmbedName = "hash_embed"
  val ChunkGenName = "chunk_gen"
  val CharHistName = "char_hist"
  val WinnowHashName = "winnow_hash"
  val NfcNormalizeName = "nfc_normalize"
  val JaroWinklerName = "jaro_winkler"
  val TermBucketName = "term_bucket"

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      TermBucketName, {
        case Seq(term,
            lit: org.apache.spark.sql.catalyst.expressions.Literal)
            if lit.value != null && (lit.dataType match {
              case _: org.apache.spark.sql.types.ByteType |
                   _: org.apache.spark.sql.types.ShortType |
                   _: org.apache.spark.sql.types.IntegerType |
                   _: org.apache.spark.sql.types.LongType => true
              case _ => false
            }) =>
          TermBucket(term, lit.value.asInstanceOf[Number].intValue())
        case other => throw new IllegalArgumentException(
          s"term_bucket takes (term, n-literal), got ${other.map(_.sql)}")
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NfcNormalizeName, exprs => NfcNormalize(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      JaroWinklerName, exprs => JaroWinkler(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      CosineSimName, exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      HashEmbedName, exprs => HashEmbed(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      CharHistName, exprs => CharHist(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      WinnowHashName, exprs => WinnowHash(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ChunkGenName, {
        case Seq(text) => ChunkGen(text)
        case Seq(text, size) =>
          // require a compile-time constant; eval() on an arbitrary
          // unresolved expression would throw an opaque NPE at analysis
          size match {
            case lit: org.apache.spark.sql.catalyst.expressions.Literal
                if lit.value != null && (lit.dataType match {
                  case _: org.apache.spark.sql.types.ByteType |
                       _: org.apache.spark.sql.types.ShortType |
                       _: org.apache.spark.sql.types.IntegerType |
                       _: org.apache.spark.sql.types.LongType => true
                  case _ => false
                }) =>
              ChunkGen(text, lit.value.asInstanceOf[Number].intValue())
            case other => throw new IllegalArgumentException(
              s"chunk_gen size must be an integer literal, got ${other.sql}")
          }
        case other => throw new IllegalArgumentException(
          s"chunk_gen takes (text[, size]), got ${other.length} args")
      }, "built-in")
  }

  /** Fused single-pass cosine similarity (see CosineSimilarity). The
    * session must have called `register` first.
    */
  def cosineSim(a: Column, b: Column): Column = call_function(CosineSimName, a, b)

  /** Fused [a-z0-9] character histogram (see CharHist). The session must
    * have called `register` first.
    */
  def charHist(text: Column): Column = call_function(CharHistName, text)

  /** Winnowing k-gram fingerprints (see WinnowHash). The session must
    * have called `register` first.
    */
  def winnowHash(text: Column): Column = call_function(WinnowHashName, text)

  /** Jaro-Winkler fuzzy-match similarity (see JaroWinkler). The session
    * must have called `register` first.
    */
  def jaroWinkler(a: Column, b: Column): Column =
    call_function(JaroWinklerName, a, b)

  /** Posting-bucket of a term (see TermBucket). The session must have
    * called `register` first.
    */
  def termBucket(term: Column, n: Int): Column =
    call_function(TermBucketName, term, org.apache.spark.sql.functions.lit(n))
}
