package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextOps
import graft.operators.{LangId, LogReg}

/** Round-14 optimization pin: every feature column derived from the fused
  * [[TextOps.textStats]] kernel must be BIT-IDENTICAL to the HOF formula
  * it replaced, on the whole fixture corpus and on adversarial edges —
  * the TokenHashes/HashEmbed discipline applied to the quality/langid
  * feature family.
  */
class TextStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val edgeCases = Seq(
    "", "   ", "!!!", "one", "ONE Two tHree", "a-b_c.d,e",
    "trailing sep!", "!leading", "num8er5 m1xed", "éàü unicode ÉDGE",
    "The the THE and of b4 42 42 42", "0123456789", "ABC abc",
    "the a an and or of to in is it for on with as at by be this that",
    (1 to 600).map(i => s"tok$i").mkString(" "))

  private def bothFrames: Seq[org.apache.spark.sql.DataFrame] = Seq(
    Tables.documents(spark, "/root/testdata/sf0.001").select(col("text").as("t")),
    edgeCases.toDF("t"))

  private def assertEqual(cols: (String, Column, Column)*): Unit =
    bothFrames.foreach { df =>
      val sel = df.withColumn("__st", TextOps.textStats(col("t"), LangId.FeatTokens))
      cols.foreach { case (name, fast, hof) =>
        val rows = sel.select(col("t"), fast.as("fast"), hof.as("hof")).collect()
        rows.foreach { r =>
          assert(r.get(1) === r.get(2),
            s"$name diverged on <${Option(r.getString(0)).map(_.take(60))}>")
        }
      }
    }

  test("scalar stats fields equal the HOF/regex formulas") {
    assertEqual(
      ("c_len", col("__st").getField("n_chars"), length(col("t"))),
      ("n_tokens", TextOps.tokenCountS(col("__st")), TextOps.tokenCount(col("t"))),
      ("mean_tok_len", TextOps.meanTokenLenS(col("__st")), TextOps.meanTokenLen(col("t"))),
      ("digit_ratio", TextOps.digitRatioS(col("__st")), TextOps.digitRatio(col("t"))),
      ("alpha_ratio", TextOps.alphaRatioS(col("__st")), TextOps.alphaRatio(col("t"))),
      ("stopword_ratio", TextOps.stopwordRatioS(col("__st")), TextOps.stopwordRatio(col("t"))),
      ("quality", TextOps.qualityScoreS(col("__st")), TextOps.qualityScore(col("t"))),
      ("label", LogReg.labelFromStats(col("__st")), LogReg.label(col("t"))))
  }

  test("logreg/langid feature vectors equal the per-column formulas") {
    assertEqual(
      ("logreg_x",
        array(LogReg.featuresFromStats(col("__st")): _*),
        array(LogReg.features(col("t")): _*)),
      ("langid_x",
        array(LangId.featuresFromStats(col("__st")): _*),
        array(LangId.features(col("t")): _*)))
  }

  test("tracked marker counts equal the filter+array_contains walks") {
    val track = Seq("en", "de", "fr", "es").flatMap(TextOps.LangMarkers(_)).distinct
    val idx = track.zipWithIndex.toMap
    def fastScore(l: String): Column =
      TextOps.LangMarkers(l).map(m =>
        element_at(col("__stm").getField("track"), idx(m) + 1))
        .reduceLeft(_ + _)
    bothFrames.foreach { df =>
      val sel = df.withColumn("__stm", TextOps.textStats(col("t"), track))
      Seq("en", "de", "fr", "es").foreach { l =>
        val rows = sel.select(col("t"), fastScore(l).as("fast"),
          TextOps.langScore(col("t"), l).as("hof")).collect()
        rows.foreach { r =>
          assert(r.get(1) === r.get(2),
            s"langScore($l) diverged on <${Option(r.getString(0)).map(_.take(60))}>")
        }
      }
    }
  }

  test("null text propagates null like the HOF chain") {
    val df = Seq[Option[String]](None, Some("x")).toDF("t")
      .withColumn("__st", TextOps.textStats(col("t")))
    val rows = df.select(TextOps.tokenCountS(col("__st")).as("fast"),
      TextOps.tokenCount(col("t")).as("hof")).collect()
    rows.foreach(r => assert(r.isNullAt(0) === r.isNullAt(1)))
  }
}
