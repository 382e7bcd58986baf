package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Near-duplicate detection kernels: MinHash signatures (word-3-shingles),
  * LSH banding, and SimHash — all as pure HOF expressions with portable
  * arithmetic (poly-hash mod 1e9+7), so every stage is reproducible in the
  * DuckDB oracle.
  *
  * Scale shape: signatures/fingerprints are per-row projections (map-only);
  * candidate generation is an equi-join on (band, band_value) — documents
  * never cross the wire, only (doc_id, band) digests; the final verify
  * (exact Jaccard) touches only candidate pairs. This is the standard
  * 100 TB dedup layout (shingle → minhash → band → bucket join → verify).
  * The reference has no dedup surface; this is north-star scope
  * (repo:BASELINE.json) — the exact N² variants in TextQueries serve as
  * correctness oracles for these banded paths.
  *
  * API note: each stage takes the PREVIOUS stage's column, not the raw
  * text. Callers must materialize stages as separate projection columns
  * (`withColumn`) — inlining `minhashes(shingles(hashes(text)))` as one
  * expression duplicates the tokenize+hash subtree per array element and
  * per hash function, which is an exponential re-evaluation blowup
  * (observed: Verify wedged >10 min on 1000 docs).
  */
object Dedup {

  import graft.expressions.{MinHashConstants => MH}

  val P: Long = TextOps.HashMod
  val NumHashes: Int = MH.NumHashes
  val BandRows: Int = MH.BandRows

  /** Affine minhash permutation constants — single source of truth in
    * MinHashConstants, baked identically into the oracle SQL (see
    * PipelineQueries oracles).
    */
  val hashA: Seq[Long] = MH.hashA.toSeq
  val hashB: Seq[Long] = MH.hashB.toSeq

  private def native(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.graft.Bridge.column(e)
  private def expr(c: Column) = org.apache.spark.sql.graft.Bridge.expression(c)

  /** Distinct word-3-shingle hashes from a token-hash array column `hs`
    * (TextOps.tokenHashes): shingle(i) = ((h_i*131 + h_{i+1}) mod P * 131
    * + h_{i+2}) mod P. Fewer than 3 tokens → empty set. Native single-pass
    * kernel; bit-identical to [[shingleHashesHof]] (DedupSpec).
    */
  def shingleHashes(hs: Column): Column =
    native(graft.expressions.ShingleHashes(expr(hs)))

  /** HOF oracle formulation of [[shingleHashes]]. */
  def shingleHashesHof(hs: Column): Column =
    array_distinct(
      when(size(hs) < 3, array().cast("array<bigint>"))
        .otherwise(transform(sequence(lit(1), size(hs) - 2), i =>
          (((element_at(hs, i) * 131L + element_at(hs, i + 1)) % P) * 131L +
            element_at(hs, i + 2)) % P)))

  /** MinHash signature from a shingle-hash array column: NumHashes mins
    * over affine-permuted shingle hashes. Empty shingle set → sentinel P
    * per slot (so empty docs only match empty docs). Native single-pass
    * kernel; bit-identical to [[minhashesHof]] (DedupSpec).
    */
  def minhashes(sh: Column): Column =
    native(graft.expressions.MinHashFromShingles(expr(sh)))

  /** HOF oracle formulation of [[minhashes]]. */
  def minhashesHof(sh: Column): Column = {
    val a = typedlit(hashA)
    val b = typedlit(hashB)
    transform(sequence(lit(0), lit(NumHashes - 1)), j =>
      coalesce(
        array_min(transform(sh, h =>
          (element_at(a, j + 1) * h + element_at(b, j + 1)) % P)),
        lit(P)))
  }

  /** Fully-fused token-hashes → MinHash-signature kernel (one loop, no
    * intermediate shingle array): the signature-generation hot path. Exactly
    * `minhashes(shingleHashes(hs))` — min over the shingle multiset equals
    * min over its distinct set.
    */
  def minhashSignature(hs: Column): Column =
    native(graft.expressions.MinHashSignature(expr(hs)))

  /** LSH band values from a minhash-signature column: signature folded into
    * NumHashes/BandRows bands; band_value = fold of the band's rows with
    * multiplier 131 mod P. Docs sharing ANY (band, band_value) are
    * candidate near-dup pairs.
    */
  def bandValues(mh: Column): Column =
    transform(sequence(lit(0), lit(NumHashes / BandRows - 1)), bnd =>
      aggregate(slice(mh, bnd * BandRows + 1, lit(BandRows)), lit(0L),
        (acc, h) => (acc * 131L + h) % P))

  /** 32-bit SimHash from a token-hash array column: bit k set iff the
    * signed count of tokens whose derived bit k is 1 outweighs those with
    * 0. Derived bit k of hash h = ((h * (2k+1)) mod P) mod 2. Native
    * single-pass kernel (graft.expressions.SimHash32) — bit-identical to
    * [[simhash32Hof]], which remains as the reference formulation the
    * DuckDB oracle mirrors (the HOF chain is O(tokens × 32) interpreted
    * lambda evaluations; the kernel is one codegen-stage scalar call).
    */
  def simhash32(hs: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.SimHash32(
        org.apache.spark.sql.graft.Bridge.expression(hs)))

  /** HOF formulation of [[simhash32]] — the oracle-shaped reference. */
  def simhash32Hof(hs: Column): Column = {
    val weights = aggregate(hs, array_repeat(lit(0L), 32), (acc, h) =>
      transform(acc, (w, i) =>
        w + when((h * (i.cast("long") * 2L + 1L)) % P % 2L === 1L, 1L).otherwise(-1L)))
    val powers = typedlit((0 until 32).map(1L << _))
    aggregate(
      zip_with(weights, powers, (w, p) => when(w > 0L, p).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }
}
