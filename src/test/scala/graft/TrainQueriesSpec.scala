package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic invariants of the training-data assembly operators
  * (data_split / stratified_sample / pack_sequences); row-level parity
  * vs DuckDB is tools/check.py's job.
  */
class TrainQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  lazy val docs = Tables.documents(spark, sf)
  lazy val nDocs = docs.count()

  test("data_split covers every doc exactly once with a valid split") {
    val rows = SparkEntry.queries("data_split")(spark, sf).collect()
    assert(rows.length === nDocs)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length === nDocs)
    val splits = rows.map(_.getAs[String]("split")).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    assert(rows.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= 0 && b < 100
    })
    // hash split should be roughly 80/10/10; loose bounds for a small corpus
    val train = rows.count(_.getAs[String]("split") == "train").toDouble / rows.length
    assert(train > 0.6 && train < 0.95, s"train fraction $train")
  }

  test("html_extract roundtrips the original text through markup exactly") {
    val out = SparkEntry.queries("html_extract")(spark, sf).collect()
    val orig = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length === nDocs)
    // extraction is the exact inverse of the synthesis: main content
    // survives verbatim (plus the injected entity span, decoded), every
    // piece of boilerplate — title, style, script, nav, footer — is gone
    out.foreach { r =>
      assert(r.getString(1) === orig(r.getLong(0)) + " A & B <tag>",
        s"doc ${r.getLong(0)} did not roundtrip")
    }
  }

  test("leakage_safe_split: no near-dup pair spans splits; the naive per-doc split WOULD leak") {
    val split = SparkEntry.queries("leakage_safe_split")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("rep"), r.getAs[String]("split"))).toMap
    val pairs = queries.PipelineQueries.lshVerifiedPairs(spark, sf)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must contain verified near-dup pairs")
    // by construction: both sides of every verified pair share a
    // component rep, hence a split — near-dups cannot leak train→test
    pairs.foreach { case (a, b) =>
      assert(split(a)._1 === split(b)._1, s"pair ($a,$b) in different components")
      assert(split(a)._2 === split(b)._2, s"pair ($a,$b) LEAKED across splits")
    }
    // and the guard is not vacuous: the naive per-doc hash split puts at
    // least one verified pair on different sides on this corpus — the
    // exact eval-inflation bug this operator exists to prevent
    def naiveSplit(id: Long): String = {
      val b = ((id * 2654435761L) % 4294967296L) / 65536 % 100
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    assert(pairs.exists { case (a, b) => naiveSplit(a) != naiveSplit(b) },
      "fixture too small to demonstrate the naive-split leak")
    // every doc of the (doubled) dedup corpus is covered exactly once
    assert(split.keySet.size === split.size)
  }

  test("data_split is a pure function of doc_id (stable across reruns)") {
    val a = SparkEntry.queries("data_split")(spark, sf).collect().map(_.toSeq)
    val b = SparkEntry.queries("data_split")(spark, sf).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("stratified_sample takes exactly ceil(n/5) per language") {
    val perLang = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("n")).toMap
    val sampled = SparkEntry.queries("stratified_sample")(spark, sf).collect()
    val got = sampled.groupBy(_.getAs[String]("lang")).view.mapValues(_.length).toMap
    for ((lang, n) <- perLang)
      assert(got.getOrElse(lang, 0) === ((n + 4) / 5).toInt,
        s"lang=$lang n=$n got=${got.get(lang)}")
    // sampled ids are real corpus ids
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sampled.forall(r => ids(r.getAs[Long]("doc_id"))))
  }

  test("pack_sequences conserves docs and tokens, seq_ids contiguous per shard") {
    val packed = SparkEntry.queries("pack_sequences")(spark, sf).collect()
    assert(packed.map(_.getAs[Long]("n_docs")).sum === nDocs)
    val totalToks = docs
      .agg(sum(graft.functions.TextOps.tokenCount(col("text")).cast("long")))
      .head().getLong(0)
    assert(packed.map(_.getAs[Long]("seq_tokens")).sum === totalToks)
    // per shard: seq_ids start at 0 and are strictly increasing with
    // non-overlapping [first_doc, last_doc] ranges
    packed.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      val seqs = rows.map(_.getAs[Long]("seq_id")).sorted
      assert(seqs.head === 0L)
      assert(seqs.distinct.length === seqs.length)
      val ranges = rows.sortBy(_.getAs[Long]("seq_id"))
        .map(r => (r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc")))
      assert(ranges.forall { case (a, b) => a <= b })
      assert(ranges.sliding(2).forall {
        case Array((_, b1), (a2, _)) => b1 < a2
        case _ => true
      })
    }
  }
}
