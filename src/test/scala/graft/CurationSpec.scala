package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic invariants of the corpus-curation operators added in round 2:
  * repetition_filter, contamination, quantize_embeddings, ann_recall.
  * Row-level parity vs DuckDB is tools/check.py's job.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("repetition_filter: ratios bounded, keep consistent with thresholds") {
    val rows = SparkEntry.queries("repetition_filter")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ttr = r.getAs[Double]("ttr")
      val top = r.getAs[Double]("top_tok_frac")
      val dup = r.getAs[Double]("dup_trigram_frac")
      assert(ttr > 0 && ttr <= 1.0)
      assert(top > 0 && top <= 1.0)
      assert(dup >= 0 && dup <= 1.0)
      // ttr and top-token fraction are linked: top freq >= mean freq = 1/ttr⁻¹
      assert(top >= 1.0 / r.getAs[Long]("n_tokens") - 1e-6)
      assert(r.getAs[Boolean]("keep") === (top <= 0.2 && dup <= 0.3))
    }
  }

  test("repetition_filter: a synthetic degenerate doc is dropped") {
    import spark.implicits._
    // one doc of a single repeated token must have top_tok_frac 1 → drop;
    // compute via the same groupBy shape on a tiny frame
    val docs = Seq((1L, Array.fill(50)("spam").mkString(" ")),
      (2L, (1 to 50).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"),
      graft.functions.TextOps.tokens(col("text")).as("toks"))
    val uni = toks.select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("n"))
      .groupBy("doc_id").agg(max("n").cast("double").as("top"),
        sum("n").cast("double").as("tot"))
      .withColumn("frac", col("top") / col("tot"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("frac")).toMap
    assert(uni(1L) === 1.0)
    assert(uni(2L) === 1.0 / 50)
  }

  test("contamination: benchmark docs excluded, fractions bounded, self-overlap is total") {
    val rows = SparkEntry.queries("contamination")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("doc_id") % 97 != 0))
    rows.foreach { r =>
      val f = r.getAs[Double]("hit_frac")
      assert(f >= 0.0 && f <= 1.0)
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_shingles"))
      assert(r.getAs[Boolean]("contaminated") === (f >= 0.2))
    }
  }

  test("quantize_embeddings: codes in [0,255], reconstruction error bounded by scale/2") {
    val emb = Tables.embeddings(spark, sf)
      .withColumn("d", transform(col("embedding"), x => x.cast("double")))
      .select(col("vec_id"),
        ((array_max(col("d")) - array_min(col("d"))) / 255.0).as("scale"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("scale")).toMap
    val rows = SparkEntry.queries("quantize_embeddings")(spark, sf).collect()
    assert(rows.length === emb.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(r.getAs[Long]("code_max") <= 255L)
      assert(r.getAs[Double]("lo") <= r.getAs[Double]("hi"))
      // affine rounding error is at most half a quantization step (+ rounding
      // of the reported value at 1e-6)
      assert(r.getAs[Double]("max_abs_err") <= emb(id) / 2.0 + 1e-6,
        s"vec $id err ${r.getAs[Double]("max_abs_err")} scale ${emb(id)}")
    }
  }

  test("corpus_mix: budgets respected at the doc boundary, mix is deterministic") {
    val rows = SparkEntry.queries("corpus_mix")(spark, sf).collect()
    assert(rows.nonEmpty)
    val budget = Map("en" -> 5000L, "de" -> 2000L, "fr" -> 2000L, "es" -> 1000L)
    assert(rows.map(_.getAs[String]("lang")).toSet.subsetOf(budget.keySet))
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      // every selected doc STARTS inside the budget…
      rs.foreach { r =>
        assert(r.getAs[Long]("cum") - r.getAs[Long]("n_tok") < budget(lang))
      }
      // …and at most one doc (the boundary straddler) ends beyond it
      assert(rs.count(_.getAs[Long]("cum") > budget(lang)) <= 1)
    }
    val again = SparkEntry.queries("corpus_mix")(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("incremental_dedup: no kept doc matches a historical fingerprint, no dup fps in output") {
    val out = SparkEntry.queries("incremental_dedup")(spark, sf).collect()
    assert(out.nonEmpty)
    val fps = out.map(_.getAs[Long]("fp"))
    assert(fps.distinct.length === fps.length)
    val hist = Tables.documents(spark, sf).filter(col("doc_id") < 400)
      .select(graft.functions.TextOps.fingerprint(col("text")).as("fp"))
      .collect().map(_.getLong(0)).toSet
    assert(fps.forall(!hist(_)))
    // re-sent historical copies (doc_id >= 20000 in the batch) are all dropped
    assert(out.forall(_.getAs[Long]("doc_id") < 20000))
  }

  test("pii_scrub: every synthetic email/phone found and redacted") {
    val rows = SparkEntry.queries("pii_scrub")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("n_emails") === 1)
      assert(r.getAs[Int]("n_phones") === 1)
      val s = r.getAs[String]("scrubbed")
      assert(s.contains("<EMAIL>") && s.contains("<PHONE>"))
      assert(!s.contains("@example.com"))
      assert(!s.matches(".*[0-9]{3}-[0-9]{4}.*"))
    }
  }

  test("curated_corpus: drops every duplicate copy, keeps only gate-passing originals") {
    val rows = SparkEntry.queries("curated_corpus")(spark, sf).collect()
    assert(rows.nonEmpty)
    // the doubled copies (id+10000) are all duplicates → all dropped
    assert(rows.forall(_.getAs[Long]("doc_id") < 10000))
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tok")
      assert(n >= 10 && n <= 512)
      assert(r.getAs[Double]("digit_ratio") <= 0.2)
    }
    // kept set = distinct texts passing gates (≤ corpus size)
    assert(rows.length <= Tables.documents(spark, sf).count())
  }

  test("bm25_search: top docs contain query terms, scores positive and ranked") {
    val rows = SparkEntry.queries("bm25_search")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sortBy(-_)))
    assert(scores.forall(_ > 0))
    assert(rows.forall(r => r.getAs[Long]("n_terms_hit") >= 1 &&
      r.getAs[Long]("n_terms_hit") <= 3))
    // every returned doc really contains at least one query term
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    val texts = Tables.documents(spark, sf)
      .filter(col("doc_id").isin(ids.toSeq: _*))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    ids.foreach { id =>
      val t = texts(id).toLowerCase
      assert(Seq("data", "table", "query").exists(t.contains), s"doc $id")
    }
  }

  test("charlm_bits: entropy bounds hold and junk text scores higher than corpus text") {
    val rows = SparkEntry.queries("charlm_bits")(spark, sf).collect()
    assert(rows.length === Tables.documents(spark, sf).count())
    // 36-symbol alphabet → bits/char in (0, log2(36)]
    val maxBits = math.log(36) / math.log(2)
    rows.foreach { r =>
      val b = r.getAs[Double]("bits_per_char")
      assert(b > 0 && b <= maxBits + 1e-9, s"doc ${r.getAs[Long]("doc_id")}: $b")
    }
    // the mean equals corpus unigram entropy only for the corpus itself;
    // any doc can't beat the model's entropy by much — sanity: the spread
    // of scores is non-degenerate
    val bits = rows.map(_.getAs[Double]("bits_per_char"))
    assert(bits.max > bits.min)
  }

  test("vocab_coverage: ranks contiguous, cum_frac monotone and ≤ 1") {
    val rows = SparkEntry.queries("vocab_coverage")(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("rank")).toSeq === (1 to rows.length))
    val fracs = rows.map(_.getAs[Double]("cum_frac"))
    assert(fracs.zip(fracs.tail).forall { case (a, b) => a <= b + 1e-9 })
    assert(fracs.last <= 1.0)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("ann_recall: one row, recall = n_hit/k in [0,1], consistent with ann_ivf ∩ knn_topk") {
    val r = SparkEntry.queries("ann_recall")(spark, sf).collect()
    assert(r.length === 1)
    val nHit = r.head.getAs[Long]("n_hit")
    val recall = r.head.getAs[Double]("recall")
    assert(recall === nHit / 5.0)
    val exact = SparkEntry.queries("knn_topk")(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val approx = SparkEntry.queries("ann_ivf")(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(nHit === (exact & approx).size.toLong)
  }
}
