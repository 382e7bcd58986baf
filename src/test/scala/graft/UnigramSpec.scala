package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Unigram

/** Unigram-LM tokenizer invariants (the oracle hash-match on
  * unigram_seed/unigram_tokenize is the cross-engine gate; these pin the
  * algorithmic semantics).
  */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def words = graft.queries.TextQueries.wordFreqs(spark, sf)

  test("Viterbi picks the higher-probability segmentation and covers the word") {
    val vocab = Map("ab" -> -0.5, "a" -> -2.0, "b" -> -2.0, "c" -> -2.0)
    assert(Unigram.viterbiPieces("abc", vocab) === Seq("ab", "c"))
    assert(Unigram.viterbiPieces("cab", vocab) === Seq("c", "ab"))
    // score equals the sum along the returned path
    assert(math.abs(Unigram.viterbiScore("abc", vocab) - (-0.5 - 2.0)) < 1e-12)
    // single chars only → falls back to char path
    assert(Unigram.viterbiPieces("cc", vocab) === Seq("c", "c"))
  }

  test("trained model: probabilities normalized-ish, chars covered, every word segmentable") {
    val model = Unigram.train(words).toMap
    assert(model.nonEmpty)
    assert(model.values.forall(_ < 0.0), "logp must be negative")
    val chars = words.select(explode(split(col("word"), "")).as("c"))
      .filter(col("c") =!= "").distinct().collect().map(_.getString(0)).toSet
    chars.foreach(c => assert(model.contains(c), s"char '$c' missing — coverage broken"))
    val ws = words.select("word").collect().map(_.getString(0))
    ws.foreach { w =>
      assert(!Unigram.viterbiScore(w, model).isNegInfinity, s"'$w' unsegmentable")
    }
  }

  test("multi-char pieces the EM kept actually beat their char spell-out somewhere") {
    val model = Unigram.train(words).toMap
    val multi = model.keys.filter(_.length >= 2)
    assert(multi.nonEmpty, "EM pruned every multi-char piece — vacuous model")
    // at least one trained multi-char piece is USED by Viterbi on the corpus
    val used = words.select("word").collect().map(_.getString(0))
      .flatMap(w => Unigram.viterbiPieces(w, model))
      .toSet
    assert(used.exists(_.length >= 2),
      "no multi-char piece ever chosen — model equivalent to char LM")
  }
}
