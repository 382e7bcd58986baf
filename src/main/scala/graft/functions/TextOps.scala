package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic text pipeline: tokenizer + feature-hashing embedder.
  *
  * Replaces the reference's ONNX multilingual-e5-small embedder
  * (DotNetVectorSearch.Core/Embeddings/E5MultilingualEmbeddings.cs) with a
  * model-free, reproducible feature-hashing embedder that preserves the
  * operator CONTRACT — text → fixed-dim L2-normalized float vector,
  * "query: "/"passage: " prefix-sensitive, 512-token truncation
  * (E5MultilingualEmbeddings.cs:10,113-118 truncation; Prepare/Program.cs:56
  * and WebAPI/Services/VectorSearchService.cs:103-104,183 prefixes) — while
  * being pure Catalyst HOF expressions, hence codegen'd, shuffle-free, and
  * bit-reproducible in DuckDB SQL for the oracle (SURVEY.md §7.0).
  *
  * Pipeline: lower → split on [^a-z0-9]+ → drop empties → first 512 tokens
  * → polynomial rolling hash per token (acc*31 + codepoint mod 1e9+7) →
  * bucket = h mod dim, sign = +1 if h mod 2*dim < dim else -1 → signed
  * bucket counts → L2 normalize (pass-through below 1e-12).
  *
  * Everything stays inside per-row expression evaluation: embedding N docs
  * is a single narrow projection over the scan — no shuffle, no UDF, no
  * driver loop — so it scales linearly with input splits at 100 TB.
  */
object TextOps {

  val DefaultDim = 64
  val MaxTokens  = 512
  val HashMod    = 1000000007L

  /** E5-style asymmetric prefixes (must alter the embedding, as in the
    * reference where the prefix feeds the model).
    */
  def queryText(c: Column): Column   = concat(lit("query: "), c)
  def passageText(c: Column): Column = concat(lit("passage: "), c)

  /** Lowercased alphanumeric word tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** First `MaxTokens` tokens (reference truncation at 512). */
  def tokensTruncated(text: Column): Column =
    slice(tokens(text), 1, MaxTokens)

  /** Whitespace-ish token count over the full text (no truncation). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Polynomial rolling hash of one token: left fold of
    * (acc*31 + unicode_codepoint) mod 1e9+7 over its characters.
    * Portable: identical arithmetic is expressible in DuckDB
    * (list_reduce + ascii), unlike murmur/xxhash built-ins.
    */
  def tokenHash(tok: Column): Column =
    aggregate(
      transform(split(tok, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, c) => (acc * 31L + c) % HashMod)

  /** Array of per-token hashes for the truncated token stream — native
    * single-pass expression (graft.expressions.TokenHashes); bit-identical
    * to [[tokenHashesHof]], which remains as the reference formulation the
    * DuckDB oracle mirrors.
    */
  def tokenHashes(text: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.TokenHashes(
        org.apache.spark.sql.graft.Bridge.expression(text)))

  /** HOF formulation of [[tokenHashes]] (tokenize → per-token fold). */
  def tokenHashesHof(text: Column): Column =
    transform(tokensTruncated(text), tokenHash(_))

  /** Feature-hashing embedding: dim signed-sum buckets, L2-normalized,
    * DOUBLE elements. Zero token streams produce the zero vector
    * (normalize pass-through, reference E5MultilingualEmbeddings.cs:177-184).
    */
  def hashEmbed(text: Column, dim: Int = DefaultDim): Column =
    VectorOps.l2Normalize(hashEmbedRaw(text, dim))

  /** Fully-fused native formulation of [[hashEmbed]]
    * (graft.expressions.HashEmbed): one character scan, whole-stage
    * codegen, bit-identical (HashEmbedSpec). Use in hot paths; the HOF
    * chain remains the oracle formulation.
    */
  def hashEmbedFused(text: Column, dim: Int = DefaultDim): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.HashEmbed(
        org.apache.spark.sql.graft.Bridge.expression(text), dim))

  /** Un-normalized signed bucket counts. Implemented as ONE fold over the
    * token-hash array with a dim-element array accumulator — the obvious
    * alternative (dim independent filtered aggregates) duplicates the
    * tokenize+hash subtree dim times in the expression tree, which explodes
    * Janino codegen time and re-tokenizes per bucket at runtime.
    */
  def hashEmbedRaw(text: Column, dim: Int = DefaultDim): Column =
    aggregate(
      tokenHashes(text),
      array_repeat(lit(0.0), dim),
      (acc, h) => {
        val sign = when(h % (2 * dim) < dim, lit(1.0)).otherwise(lit(-1.0))
        transform(acc, (v, i) => when(i.cast("long") === h % dim, v + sign).otherwise(v))
      })

  // ---------------------------------------------------------------------
  // Text analysis (LLM-data-pipeline operators, north star)
  // ---------------------------------------------------------------------

  /** Character length, word count, average word length, digit ratio,
    * uppercase ratio — the building blocks of a quality score. All pure
    * string expressions (portable to the oracle).
    */
  def charLen(text: Column): Column = length(text)

  def digitRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "[^0-9]", "")).cast("double") / length(text))

  def alphaRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") / length(text))

  def whitespaceRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "[^ \\t]", "")).cast("double") / length(text))

  /** Mean token length in characters (0 for empty token stream). */
  def meanTokenLen(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0))
      .otherwise(
        aggregate(t, lit(0.0), (acc, x) => acc + length(x).cast("double")) /
          size(t).cast("double"))
  }

  /** Stopword ratio against a small fixed English stopword list —
    * heuristic quality signal (fraction of tokens that are stopwords).
    */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
        "for", "on", "with", "as", "at", "by", "be", "this", "that")

  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    val stops = array(Stopwords.map(lit): _*)
    when(size(t) === 0, lit(0.0))
      .otherwise(size(filter(t, x => array_contains(stops, x))).cast("double") /
        size(t).cast("double"))
  }

  // ---------------------------------------------------------------------
  // Fused text-statistics kernel (round-14 optimization)
  // ---------------------------------------------------------------------

  /** One-scan struct of every count the quality/langid features derive
    * from (graft.expressions.TextStats): n_chars, n_digit, n_alpha,
    * n_tokens, sum_tok_len, n_stop, n_distinct, track[] — bit-identical
    * to the HOF formulas above (TextStatsSpec). Hot scoring paths compute
    * this ONCE per row and read fields; the HOF chains remain the oracle
    * formulation.
    */
  def textStats(text: Column, track: Seq[String] = Nil): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.TextStats(
        org.apache.spark.sql.graft.Bridge.expression(text), Stopwords, track))

  /** [[tokenCount]] off a [[textStats]] struct. */
  def tokenCountS(st: Column): Column = st.getField("n_tokens")

  /** [[meanTokenLen]] off a [[textStats]] struct — same 0-guard and the
    * same exact-integer-in-double division as the HOF formula.
    */
  def meanTokenLenS(st: Column): Column =
    when(st.getField("n_tokens") === 0, lit(0.0))
      .otherwise(st.getField("sum_tok_len").cast("double") /
        st.getField("n_tokens").cast("double"))

  /** [[digitRatio]] off a [[textStats]] struct. */
  def digitRatioS(st: Column): Column =
    when(st.getField("n_chars") === 0, lit(0.0))
      .otherwise(st.getField("n_digit").cast("double") / st.getField("n_chars"))

  /** [[alphaRatio]] off a [[textStats]] struct. */
  def alphaRatioS(st: Column): Column =
    when(st.getField("n_chars") === 0, lit(0.0))
      .otherwise(st.getField("n_alpha").cast("double") / st.getField("n_chars"))

  /** [[stopwordRatio]] off a [[textStats]] struct. */
  def stopwordRatioS(st: Column): Column =
    when(st.getField("n_tokens") === 0, lit(0.0))
      .otherwise(st.getField("n_stop").cast("double") /
        st.getField("n_tokens").cast("double"))

  /** [[qualityScore]] off a [[textStats]] struct — same weights/rounding. */
  def qualityScoreS(st: Column): Column = {
    val lenScore = least(st.getField("n_chars").cast("double") / lit(500.0), lit(1.0))
    val digitPenalty = lit(1.0) - least(digitRatioS(st) * 5.0, lit(1.0))
    val stopScore = least(stopwordRatioS(st) * 4.0, lit(1.0))
    round((lenScore + digitPenalty + stopScore) / 3.0, 6)
  }

  /** Composite quality score in [0,1]: rewards mid-length docs with low
    * digit ratio and a sane stopword presence. Deterministic and
    * oracle-expressible; the exact weights are this engine's contract.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val digitPenalty = lit(1.0) - least(digitRatio(text) * 5.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    round((lenScore + digitPenalty + stopScore) / 3.0, 6)
  }

  /** Rolling-hash document fingerprint over the truncated token stream:
    * fold (acc*131 + tokenHash) mod 1e9+7. Equal fingerprint ⇒ equal
    * token stream (mod collisions) — the exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    aggregate(tokenHashes(text), lit(0L), (acc, h) => (acc * 131L + h) % HashMod)

  /** Unicode NFC canonicalization — native codegen expression
    * (graft.expressions.NfcNormalize). Step-zero of text cleaning: every
    * hash-based dedup upstream assumes one canonical byte form per string.
    */
  def nfcNormalize(text: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.NfcNormalize(
        org.apache.spark.sql.graft.Bridge.expression(text)))

  /** Character n-grams (shingles) of the normalized token-joined text. */
  def charShingles(text: Column, n: Int): Column = {
    val norm = concat_ws(" ", tokens(text))
    when(length(norm) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), length(norm) - (n - 1)),
        i => norm.substr(i, lit(n))))
  }

  /** Language-ID heuristic: score text against per-language marker-word
    * lists; emit the argmax language, 'und' when nothing matches.
    * N-gram/marker heuristics are the classic cheap langid at corpus scale.
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "is", "of", "to", "a", "in", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "den", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"),
    "es" -> Seq("el", "la", "los", "las", "es", "un", "una", "que", "por", "con"))

  def langScore(text: Column, lang: String): Column = {
    val t = tokens(text)
    val markers = array(LangMarkers(lang).map(lit): _*)
    size(filter(t, x => array_contains(markers, x)))
  }
}
