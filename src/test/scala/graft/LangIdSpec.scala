package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LangId

/** Multiclass lang-id classifier (operators/LangId): the correctness gate
  * replays scoring in DuckDB (langid_model/eval/accuracy); this spec pins
  * what the replay can't see — the one-vs-rest fit learned something
  * (accuracy beats the majority class), the model artifact is sane
  * (pinned classes, one finite weight per (class, j)), and the map-only
  * argmax agrees with a row-by-row reference argmax.
  */
class LangIdSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("model artifact: pinned classes × features, every weight finite") {
    LangId.model(spark, sf)
    val rows = spark.read.parquet(LangId.modelPath(sf)).collect()
    assert(rows.length === LangId.Classes.length * LangId.Dim)
    assert(rows.map(_.getString(0)).distinct.sorted.toSeq === LangId.Classes)
    rows.foreach { r =>
      assert(java.lang.Double.isFinite(r.getDouble(3)),
        s"non-finite weight at ${r.getString(0)}/${r.getInt(1)}")
    }
    // the OvR intercepts differ across classes — a degenerate fit that
    // never moved off w=0 would be all-zero
    val byClass = rows.filter(_.getInt(1) == 0).map(_.getDouble(3))
    assert(byClass.exists(_ != 0.0), "all intercepts zero: the fit never stepped")
  }

  test("held-in accuracy beats the majority class") {
    val m = LangId.model(spark, sf)
    val docs = Tables.documents(spark, sf)
    val acc = docs
      .select((col("lang") === LangId.predict(col("text"), m))
        .cast("double").as("hit"))
      .agg(avg(col("hit"))).head().getDouble(0)
    val majority = docs.groupBy(col("lang")).count()
      .agg(max(col("count")).cast("double") / sum(col("count")))
      .head().getDouble(0)
    info(f"held-in accuracy $acc%.4f vs majority $majority%.4f")
    assert(acc > majority,
      f"model no better than always-predict-majority: $acc%.4f <= $majority%.4f")
  }

  test("map-only argmax ≡ reference per-row argmax (earliest-class ties)") {
    val m = LangId.model(spark, sf)
    val docs = Tables.documents(spark, sf).limit(100)
    val zCols = LangId.scores(col("text"), m).map { case (k, z) => z.as(s"z_$k") }
    val got = docs.select((Seq(col("doc_id"),
        LangId.predict(col("text"), m).as("pred")) ++ zCols): _*)
      .collect()
    got.foreach { r =>
      val zs = LangId.Classes.zipWithIndex.map { case (k, i) =>
        (k, r.getDouble(2 + i))
      }
      val best = zs.maxBy(_._2)._2
      val want = zs.filter(_._2 == best).map(_._1).min // earliest class wins ties
      assert(r.getString(1) === want,
        s"doc ${r.getLong(0)}: pred ${r.getString(1)} != reference $want (zs=$zs)")
    }
    // the materialized-feature serving path (LangId.scored — what the
    // eval queries run) agrees doc-for-doc with the raw-text predict
    val scoredMap = LangId.scored(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    got.foreach { r =>
      assert(scoredMap(r.getLong(0)) === r.getString(1),
        s"scored() diverges from predict() on doc ${r.getLong(0)}")
    }
  }
}
