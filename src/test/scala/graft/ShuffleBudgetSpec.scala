package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Makes the "only digests shuffle, never text" scale claims MEASURABLE:
  * run each pipeline and assert its total shuffle-write bytes against the
  * corpus' raw text volume. A regression that starts shuffling document
  * text (a missed map-side combine, a digest join turned row join) blows
  * the budget immediately — this is the metric form of the PERF.md plan
  * audits.
  */
class ShuffleBudgetSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  /** Total shuffle bytes written by `body`'s jobs ONLY: the body runs
    * under a unique job group (inherited by any localCheckpoint staging
    * jobs it launches, via the thread-local properties) and the listener
    * counts tasks of exactly that group's stages — immune to other test
    * suites running concurrently in this JVM.
    */
  private def shuffleBytes(body: => Unit): Long = {
    val tag = s"shuffle-budget-${java.util.UUID.randomUUID()}"
    val bytes = new AtomicLong(0)
    val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val listener = new SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (j.properties != null &&
            tag == j.properties.getProperty("spark.jobGroup.id")) {
          j.stageIds.foreach(stages.add(_))
        }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (stages.contains(t.stageId) && t.taskMetrics != null) {
          bytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup(tag, tag, interruptOnCancel = false)
      body
      // the listener bus is async; wait for the counter to go quiet
      var last = -1L
      var spins = 0
      while (bytes.get() != last && spins < 20) {
        last = bytes.get(); spins += 1; Thread.sleep(250)
      }
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(listener)
    }
    bytes.get()
  }

  private lazy val corpusTextBytes: Long =
    Tables.documents(spark, sf)
      .agg(sum(length(col("text")))).head().getLong(0)

  for ((name, budgetFraction) <- Seq(
      // exact dedup runs over the DOUBLED corpus (2× text input) and
      // still shuffles only (fp, keeper, n) digests + the output sort
      "dedup_exact" -> 1.0,
      // LSH shuffles signatures/bands over the doubled corpus
      "minhash_lsh_dedup" -> 1.5,
      // char-LM shuffles alphabet-bounded (doc, char, n) digests
      "charlm_bits" -> 1.0,
      // bigram digests are (doc, prev, cur, n) STRING pairs crossing two
      // aggregations + a join — a bounded small multiple of the text,
      // never text × passes
      "bigram_lm_bits" -> 6.0,
      // prefix-filtered exact set-similarity: bigram-shingle digests
      // cross distinct + freq-join + per-doc collect + prefix-candidate
      // join, and verification re-joins the full shingle-set arrays once
      // per side — a bounded small multiple of text, never text × pairs
      "setsim_join" -> 9.0,
      // DSIR scoring shuffles the same bigram digest family: raw +
      // target vocab counts and the per-doc (prev, cur, n) reduce; the
      // scored model itself moves by broadcast, not shuffle
      "dsir_select" -> 6.0,
      // Kneser-Ney adds two more VOCAB-bounded digests (continuation
      // counts, type total) on top of the MLE family — still a bounded
      // small multiple of text, never text × model passes
      "kneser_ney_bits" -> 7.0)) {
    test(s"$name shuffle volume stays within ${budgetFraction}× of corpus text bytes") {
      StageCache.evict(spark) // charge the staged build to this query
      val b = shuffleBytes {
        SparkEntry.queries(name)(spark, sf).collect()
      }
      info(f"$name shuffled ${b / 1024.0}%.1f KiB vs corpus text ${corpusTextBytes / 1024.0}%.1f KiB")
      assert(b <= (corpusTextBytes * budgetFraction).toLong + 64 * 1024,
        s"$name shuffled $b bytes — budget is ${budgetFraction}× corpus text ($corpusTextBytes)")
    }
  }

  test("bitext_margin shuffles pair digests, never vectors (the registry's largest exchange, pinned)") {
    // round-11 verdict's plan audit: bitext margin mining needs
    // both-direction k-NN denominators, so its exchange is the largest in
    // the registry — acceptable BECAUSE it carries (id_a, id_b, sim)
    // digests over the staged cross-score table, never the 64-d float
    // vectors (the panel side broadcasts). This pin makes that claim a
    // metric: the budget is a small multiple of the raw pair-digest
    // volume; a regression that lets the vectors into the exchange
    // (~21× a digest row at this dim) blows it immediately.
    val emb = Tables.embeddings(spark, sf)
    val nA = emb.filter(col("vec_id") % 2 === 0).count()
    val nB = emb.filter(col("vec_id") % 2 === 1).count()
    val pairDigestBytes = nA * nB * 24 // (long, long, double) per cross pair
    val b = shuffleBytes {
      SparkEntry.queries("bitext_margin")(spark, sf).collect()
    }
    info(f"bitext_margin shuffled ${b / 1024.0}%.1f KiB vs pair digests ${pairDigestBytes / 1024.0}%.1f KiB")
    // two window rankings + two joins + the output sort over the pair
    // table — a bounded small multiple of the digest volume (LZ4'd)
    assert(b <= pairDigestBytes * 6 + 64 * 1024,
      s"bitext_margin shuffled $b bytes — budget is 6× pair digests ($pairDigestBytes)")
  }

  test("a text-shuffling formulation DOES blow the same budget (the lint can fail)") {
    // the anti-pattern: a keeper WINDOW over the fingerprint instead of an
    // aggregate — windows have no partial/map-side combine, so the
    // exchange must carry the FULL rows (text included). Note a groupBy
    // formulation would NOT show this: Catalyst's partial aggregation
    // collapses rows to digests before the exchange even if you
    // repartition by hand — which is exactly why the registry queries
    // aggregate instead of windowing wherever a combiner exists.
    // (an aggregating tail would let Catalyst PRUNE text below the
    // exchange — so the kept text itself is the output, as in a real
    // "materialize the clean corpus" job)
    val naive = shuffleBytes {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
      Tables.documents(spark, sf)
        .withColumn("fp", graft.functions.TextOps.fingerprint(col("text")))
        .withColumn("keeper", min(col("doc_id")).over(w))
        .filter(col("keeper") === col("doc_id"))
        .select(col("doc_id"), col("text"))
        .collect()
    }
    // the SAME keeper computation as pure digest aggregation: the
    // exchange carries (fp, keeper) pairs only
    val digest = shuffleBytes {
      Tables.documents(spark, sf)
        .withColumn("fp", graft.functions.TextOps.fingerprint(col("text")))
        .groupBy(col("fp")).agg(min(col("doc_id")).as("keeper"))
        .collect()
    }
    info(f"naive text shuffle ${naive / 1024.0}%.1f KiB vs digest shuffle ${digest / 1024.0}%.1f KiB")
    // shuffle bytes are LZ4-compressed — text still dominates: ≥ 1/3 of
    // raw text volume, and an order of magnitude over the digest exchange
    assert(naive > corpusTextBytes / 3,
      s"expected the naive formulation to shuffle the text ($naive vs $corpusTextBytes)")
    assert(naive > digest * 10, s"naive $naive not meaningfully above digest $digest")
  }
}
