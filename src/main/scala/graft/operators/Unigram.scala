package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer training (Kudo 2018, "Subword
  * Regularization", arXiv:1804.10959 — the SentencePiece `unigram` model),
  * complementing the merge-based [[Bpe]] trainer: BPE grows a vocabulary
  * bottom-up by frequency; unigram starts from an over-complete substring
  * seed and fits piece probabilities by EM, segmenting each word with
  * Viterbi under the current model and re-estimating from the usage
  * counts, then prunes to the target size.
  *
  * Scale shape (100 TB of text): identical discipline to [[Bpe]] — the
  * corpus collapses ONCE to a word-frequency digest; every EM round is one
  * distributed flatMap (Viterbi per distinct word under the BROADCAST
  * vocab — the model is tokenizer-artifact-sized, KBs) plus one vocab-
  * sized count aggregation. Nothing corpus-sized ever moves after the
  * digest.
  *
  * Determinism / oracle parity: EM involves log-probabilities, and
  * `Math.log` is not guaranteed bit-identical across engines — so every
  * logp is rounded to 9 decimals AT THE MODEL BOUNDARY and the trained
  * (piece, logp) table is DUMPED to parquet as the tokenizer artifact.
  * The tokenize query's oracle replays Viterbi over the DUMPED values
  * (same replay discipline as the trained-IVF family), so both engines
  * run pure double arithmetic over identical inputs with the identical
  * DP recurrence — no transcendental function ever computed twice.
  * Viterbi ties prefer the longest piece (smallest split point), though
  * ties cannot affect the emitted best-path SCORE.
  */
object Unigram {

  val MaxPieceLen = 4
  val MaxWordLen = 16
  val SeedSize = 400
  val VocabTarget = 200
  val EmIters = 2

  private def round9(x: Double): Double = math.rint(x * 1e9) / 1e9

  /** Seed candidates: every substring of length 1..MaxPieceLen of every
    * digest word, weighted by word frequency — one distributed explode +
    * aggregation (the over-complete initial vocabulary the EM prunes).
    */
  def seedCounts(words: DataFrame): DataFrame = {
    val w = col("word")
    val pieces = flatten(transform(sequence(lit(1), length(w)), i =>
      transform(sequence(lit(1), least(lit(MaxPieceLen), length(w) - i + 1)),
        l => w.substr(i, l))))
    words.select(col("freq"), explode(pieces).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
  }

  /** Viterbi best segmentation of `word` under `logp`. Returns the piece
    * path; `viterbiScore` is its summed log-probability. DP over end
    * positions; candidates scanned with ascending start (longest piece
    * first) and replaced only on strictly better score, so ties keep the
    * longest piece.
    */
  def viterbiPieces(word: String, logp: collection.Map[String, Double]): Seq[String] = {
    val n = word.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - MaxPieceLen)
      while (i < j) {
        logp.get(word.substring(i, j)) match {
          case Some(lp) if best(i) + lp > best(j) =>
            best(j) = best(i) + lp; back(j) = i
          case _ =>
        }
        i += 1
      }
      j += 1
    }
    if (back(n) < 0) return Seq(word) // uncovered (never happens on corpus chars)
    var out = List.empty[String]
    var p = n
    while (p > 0) { out = word.substring(back(p), p) :: out; p = back(p) }
    out
  }

  def viterbiScore(word: String, logp: collection.Map[String, Double]): Double = {
    val n = word.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    best(0) = 0.0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - MaxPieceLen)
      while (i < j) {
        logp.get(word.substring(i, j)) foreach { lp =>
          if (best(i) + lp > best(j)) best(j) = best(i) + lp
        }
        i += 1
      }
      j += 1
    }
    best(n)
  }

  private def normalize(counts: Seq[(String, Long)]): Map[String, Double] = {
    val total = counts.map(_._2).sum.toDouble
    counts.map { case (p, c) => p -> round9(math.log(c) - math.log(total)) }.toMap
  }

  /** EM fit over the word digest: seed → (Viterbi E-step, re-estimate
    * M-step) × EmIters → prune to VocabTarget (single chars always kept —
    * coverage guarantee). Returns the (piece, logp) model, logp rounded
    * to 9 decimals (the dumped-artifact convention above).
    */
  def train(words: DataFrame): Seq[(String, Double)] = {
    val spark = words.sparkSession
    import spark.implicits._
    // ONE substring-seed aggregation feeds both consumers (top-SeedSize
    // and the single-char floor) — recomputing it doubled the seed stage
    val digest = seedCounts(words).persist()
    val seed = digest
      .orderBy(col("cnt").desc, col("piece").asc).limit(SeedSize)
      .as[(String, Long)].collect().toSeq
    val chars = digest.filter(length(col("piece")) === 1)
      .as[(String, Long)].collect().toSeq
    digest.unpersist()
    var vocab = normalize((seed ++ chars.filterNot(c => seed.exists(_._1 == c._1))))
    for (_ <- 1 to EmIters) {
      val bc = spark.sparkContext.broadcast(vocab)
      val segment = udf((word: String) => viterbiPieces(word, bc.value))
      val counts = words
        .select(col("freq"), explode(segment(col("word"))).as("piece"))
        .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
        .as[(String, Long)].collect().toSeq
      bc.destroy()
      // used pieces re-estimated; unused multi-char pieces drop out;
      // single chars keep a +1 floor so every word stays segmentable
      val floored = counts ++
        chars.map(_._1).filterNot(c => counts.exists(_._1 == c)).map(_ -> 0L)
      vocab = normalize(floored.map { case (p, c) =>
        (p, if (p.length == 1) c + 1 else c)
      }.filter(_._2 > 0))
    }
    // prune: heaviest VocabTarget by usage mass (probability order), ties
    // by piece; single chars always retained
    val ranked = vocab.toSeq.sortBy { case (p, lp) => (-lp, p) }
    val kept = (ranked.take(VocabTarget) ++ ranked.filter(_._1.length == 1))
      .distinct
    kept.sortBy(_._1)
  }

  // --- dumped tokenizer artifact (memoized once per JVM per sf dir) ------

  def vocabPath(sfDir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-univocab-" + Ann.pathToken(sfDir)

  private val memo = new ConcurrentHashMap[String, String]()

  /** Train on the sf dir's document word digest and dump (piece, logp) to
    * parquet — the artifact the tokenize query and its DuckDB replay both
    * read.
    */
  def vocabLayout(spark: SparkSession, sfDir: String,
                  words: SparkSession => DataFrame): String =
    memo.computeIfAbsent(sfDir, { _ =>
      val path = vocabPath(sfDir)
      import spark.implicits._
      train(words(spark)).toDF("piece", "logp")
        .repartition(1).write.mode("overwrite").parquet(path)
      path
    })

  /** Viterbi scores of the `topN` most frequent digest words (length ≤
    * MaxWordLen) under the dumped model: (word, freq, score). The scale
    * path: broadcast model, one map stage over the digest.
    */
  def tokenizeScores(words: DataFrame, vocabDf: DataFrame, topN: Int = 20): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val vocab = vocabDf.as[(String, Double)].collect().toMap
    val bc = spark.sparkContext.broadcast(vocab)
    val score = udf((word: String) => viterbiScore(word, bc.value))
    words.filter(length(col("word")) <= MaxWordLen)
      .orderBy(col("freq").desc, col("word").asc).limit(topN)
      .select(col("word"), col("freq"), round(score(col("word")), 6).as("score"))
      .orderBy(col("word"))
  }

  private[graft] def resetMemos(): Unit = memo.clear()
}
