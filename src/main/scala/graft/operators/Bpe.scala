package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer training (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") — the
  * vocabulary-induction step a training-data pipeline runs before
  * tokenizing a corpus.
  *
  * Scale shape (100 TB of text):
  *  - the corpus collapses to a WORD-FREQUENCY DIGEST first (one
  *    distributed agg); every merge round after that runs over the digest
  *    — vocab-sized (millions of rows), never corpus-sized;
  *  - each round is one distributed pair-count aggregation plus a
  *    SINGLE-ROW argmax collect (the chosen merge is index metadata, like
  *    IVF centroids) and a map-only merge application;
  *  - the evolving symbol state is `localCheckpoint`ed per round —
  *    iterative lineage truncation, same discipline as
  *    [[Components]]/[[PageRank]].
  *
  * Merge application uses the spaced-symbol-string form with DOUBLE-space
  * separators and single sentinel spaces (`" b  o  o  k "`): one
  * replace-all of `" a  b "` → `" ab "` is then EXACTLY canonical greedy
  * left-to-right merging. The double separator is load-bearing: each match
  * consumes one space from each neighboring separator, so adjacent matches
  * in a run (`a a a a`) never share a delimiter character and replace-all's
  * leftmost-non-overlapping scan coincides with greedy BPE — a
  * single-space form under-merges runs (`" a a a a "` → `" aa a a "`,
  * wrongly skipping the second pair). Doing it with `replace` keeps the
  * whole round codegen'd AND makes the round replayable verbatim in the
  * DuckDB oracle.
  */
object Bpe {

  /** `"book"` → `" b  o  o  k "` — double spaces between symbols, single
    * sentinels at the ends, so a merged-pair search `" a  b "` can neither
    * straddle a symbol boundary nor steal the next match's delimiter.
    */
  def spaced(word: Column): Column =
    concat(lit(" "),
      concat_ws("  ", transform(sequence(lit(1), length(word)),
        i => word.substr(i, lit(1)))),
      lit(" "))

  /** (word, freq) digest → initial symbol state (word, freq, s). */
  def initState(words: DataFrame): DataFrame =
    words.select(col("word"), col("freq"), spaced(col("word")).as("s"))

  /** Adjacent-pair counts over the current symbol state, weighted by word
    * frequency. One distributed aggregation; single-symbol words simply
    * contribute no pairs.
    */
  def pairCounts(state: DataFrame): DataFrame = {
    val toks = split(trim(col("s")), "  ")
    state
      .select(col("freq"), toks.as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("freq"), explode(
        transform(sequence(lit(1), size(col("tk")) - 1),
          i => concat(element_at(col("tk"), i), lit(" "),
            element_at(col("tk"), i + 1)))).as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** One replace-all application of the merge `pair` (given as `"a b"`)
    * on the double-spaced form — exactly canonical greedy (see above).
    */
  def applyMerge(s: Column, pair: String): Column = {
    val Array(a, b) = pair.split(" ", 2)
    replace(s, lit(s" $a  $b "), lit(s" $a$b "))
  }

  /** Train `k` merges over a (word, freq) digest; returns the merge table
    * (merge_rank, pair, cnt) — the artifact a tokenizer ships.
    */
  def train(words: DataFrame, k: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    var state = initState(words).localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      // deterministic argmax: count desc, then pair text — one row back
      val top = pairCounts(state)
        .orderBy(col("cnt").desc, col("pair").asc).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        merges += ((r, pair, top(0).getLong(1)))
        state = state
          .withColumn("s", applyMerge(col("s"), pair))
          .localCheckpoint()
      }
      r += 1
    }
    merges.result().toDF("merge_rank", "pair", "cnt")
  }
}
