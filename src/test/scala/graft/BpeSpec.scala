package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** Distributed BPE against an in-memory canonical greedy implementation:
  * the replace-to-fixpoint merge application must equal greedy
  * left-to-right pair merging — including on runs of self-pairs, the one
  * case where a single replace-all pass diverges.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Canonical greedy BPE (Sennrich et al. 2016, Algorithm 1): count pairs
    * over the word digest, merge the argmax left-to-right non-overlapping,
    * repeat.
    */
  private def refTrain(words: Map[String, Long], k: Int): Seq[(Int, String, Long)] = {
    var state: Map[String, Vector[String]] = words.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val out = Seq.newBuilder[(Int, String, Long)]
    for (r <- 1 to k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- state; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + words(w)
      if (counts.nonEmpty) {
        val ((a, b), cnt) = counts.toSeq
          .sortBy { case ((x, y), c) => (-c, x + " " + y) }.head
        out += ((r, a + " " + b, cnt))
        state = state.map { case (w, syms) =>
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              merged += a + b; i += 2
            } else { merged += syms(i); i += 1 }
          }
          w -> merged.result()
        }
      }
    }
    out.result()
  }

  private def toDf(words: Map[String, Long]) = {
    import spark.implicits._
    words.toSeq.toDF("word", "freq")
  }

  test("classic Sennrich toy corpus trains the known merge sequence") {
    import spark.implicits._
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val got = Bpe.train(toDf(words), 6)
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got === refTrain(words, 6))
    // the famous first merges: (e,s) over newest+widest, then (es,t)
    assert(got.head._2 === "e s" && got.head._3 === 9L)
    assert(got(1)._2 === "es t" && got(1)._3 === 9L)
  }

  test("self-pair runs: fixpoint replace equals greedy left-to-right") {
    import spark.implicits._
    // runs of identical symbols are where one replace-all pass under-merges
    // (" a a a a " -> " aa a a "); the fixpoint must converge to greedy
    val words = Map("aaaa" -> 3L, "aaaaaaa" -> 2L, "baaab" -> 4L)
    val got = Bpe.train(toDf(words), 4)
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got === refTrain(words, 4))
    // round 1 merges (a,a): greedy counts 3*3 + 2*6 + 4*2 = 29
    assert(got.head._2 === "a a" && got.head._3 === 29L)
  }

  test("corpus run matches the canonical reference at sf0.001") {
    import spark.implicits._
    val wf = graft.queries.TextQueries.wordFreqs(spark, "/root/testdata/sf0.001")
    val words = wf.as[(String, Long)].collect().toMap
    val got = Bpe.train(wf, 8).as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got === refTrain(words, 8))
    assert(got.size === 8)
  }

  test("pair counts ignore single-symbol words and weight by frequency") {
    import spark.implicits._
    val st = Bpe.initState(toDf(Map("a" -> 100L, "ab" -> 3L)))
    val pc = Bpe.pairCounts(st).as[(String, Long)].collect().toMap
    assert(pc === Map("a b" -> 3L))
  }
}
