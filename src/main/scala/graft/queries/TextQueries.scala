package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.expressions.{CharHist, GraftFunctions}
import graft.functions.{TextOps, VectorOps}
import graft.operators.Knn

/** LLM-training-data pipeline operators over the documents/embeddings
  * corpora: deduplication, similarity, language ID, quality scoring,
  * token statistics.
  *
  * Scale design notes (100 TB):
  *  - Exact dedup = hash-groupBy on a 64-bit-ish fingerprint — the only
  *    shuffle is the tiny (fp, keeper, n) digest, never the documents.
  *  - Near-dup joins are blocked (label / LSH band) equi-joins, NEVER a
  *    bare N² cross join; the exact variants here are the correctness
  *    oracles for the banded versions at scale.
  *  - All per-doc features are single-pass HOF projections: embedding a
  *    petabyte corpus is a map-only job.
  */
object TextQueries {

  /** The corpus unioned with an id-shifted copy of itself — gives the
    * dedup operators real duplicates to find (the fixture corpus has 500
    * distinct texts).
    */
  private def doubledDocs(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir).select(col("doc_id"), col("text"))
    d.union(d.select((col("doc_id") + 10000).as("doc_id"), col("text")))
  }

  private val doubledDocsSql =
    "SELECT doc_id, text FROM documents UNION ALL SELECT doc_id + 10000, text FROM documents"

  /** The staged winnowing-fingerprint stream (doc_id, fp) — see
    * `winnow_dedup`. Named for the bench harness's `stage:winnow-fps`
    * pre-build (graft.Stages).
    */
  private[graft] def stagedWinnowFps(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    graft.StageCache.getOrStage(s, s"winnow-fps:$dir") {
      spread(doubledDocs(s, dir).filter(col("doc_id") % 10000 < 100))
        .select(col("doc_id"), explode(GraftFunctions.winnowHash(col("text"))).as("fp"))
    }
  }

  /** The staged per-doc token arrays (doc_id, toks) — see
    * `repetition_filter`. `stage:doc-toks` in the bench harness.
    */
  private[graft] def stagedDocToks(s: SparkSession, dir: String): DataFrame =
    graft.StageCache.getOrStage(s, s"doc-toks:$dir") {
      spread(documents(s, dir))
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
    }

  /** The staged (doc_id, ch, n) character-histogram digests — see
    * `charlm_bits`. `stage:char-hist` in the bench harness.
    */
  private[graft] def stagedCharHist(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    graft.StageCache.getOrStage(s, s"char-hist:$dir") {
      spread(documents(s, dir))
        .select(col("doc_id"), GraftFunctions.charHist(col("text")).as("hist"))
        .select(col("doc_id"), posexplode(col("hist")))
        .filter(col("col") > 0)
        .select(col("doc_id"),
          expr(s"substr('${CharHist.Alphabet}', pos + 1, 1)").as("ch"),
          col("col").as("n"))
    }
  }

  /** The staged (doc_id, idx, sent, sfp) sentence-fingerprint stream over
    * the boilerplate-injected corpus — see `sentence_dedup`.
    * `stage:sentence-fps` in the bench harness.
    */
  private[graft] def stagedSentenceFps(s: SparkSession, dir: String): DataFrame =
    graft.StageCache.getOrStage(s, s"sentence-fps:$dir") {
      val injected = documents(s, dir).select(col("doc_id"),
        concat(lit("This document is provided as is. "), col("text")).as("text"))
      spread(injected)
        .select(col("doc_id"), posexplode(split(col("text"), "\\.\\s+")))
        .select(col("doc_id"), col("pos").as("idx"), col("col").as("sent"))
        .filter(length(trim(col("sent"))) > 0)
        .withColumn("sfp", TextOps.fingerprint(col("sent")))
    }

  /** The staged (doc_id, prev, cur) bigram digest stream — see
    * `bigram_lm_bits`. `stage:bigrams` in the bench harness.
    */
  private[graft] def stagedBigrams(s: SparkSession, dir: String): DataFrame =
    graft.StageCache.getOrStage(s, s"bigrams:$dir") {
      spread(documents(s, dir))
        .withColumn("toks", TextOps.tokens(col("text")))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(col("toks")) - 1),
          i => struct(element_at(col("toks"), i).as("prev"),
            element_at(col("toks"), i + 1).as("cur")))).as("bg"))
        .select(col("doc_id"), col("bg.prev").as("prev"), col("bg.cur").as("cur"))
    }

  /** Interpolated Kneser-Ney bigram model (prev, cur, p) off the staged
    * bigram digest — the ONE definition of the reference LM shared by
    * `kneser_ney_bits` and `domain_reweight` (and mirrored once in SQL by
    * [[duckKnModelCtes]]); the discount/continuation arithmetic must not
    * fork across its consumers or their oracles desynchronize.
    */
  private[graft] def knModel(s: SparkSession, dir: String): DataFrame = {
    val bgc = stagedBigrams(s, dir)
      .groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("n_bg"))
    val pv = bgc.groupBy(col("prev"))
      .agg(sum(col("n_bg")).as("n_prev"), count(lit(1)).as("t_prev"))
    val cc = bgc.groupBy(col("cur")).agg(count(lit(1)).as("t_cur"))
    val tot = bgc.agg(count(lit(1)).as("t_all"))
    bgc.join(pv, Seq("prev")).join(cc, Seq("cur"))
      .crossJoin(broadcast(tot))
      .select(col("prev"), col("cur"),
        ((col("n_bg") - lit(0.75)) / col("n_prev") +
          lit(0.75) * col("t_prev") / col("n_prev") *
            (col("t_cur").cast("double") / col("t_all"))).as("p"))
  }

  /** DuckDB twin of [[knModel]]: CTE chain ending in `model(prev, cur, p)`
    * over the flattened bigram stream CTE `flat(doc_id, prev, cur)`.
    */
  private[graft] def duckKnModelCtes: String =
    s"""t AS (
       |  SELECT doc_id, ${duckToks("text")} AS toks FROM documents),
       |t2 AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 2),
       |bi AS (
       |  SELECT doc_id, toks,
       |    unnest(generate_series(1, len(toks) - 1)) AS i
       |  FROM t2),
       |flat AS (SELECT doc_id, toks[i] AS prev, toks[i+1] AS cur FROM bi),
       |bgc AS (SELECT prev, cur, count(*) AS n_bg FROM flat GROUP BY 1, 2),
       |pv AS (SELECT prev, sum(n_bg)::BIGINT AS n_prev,
       |         count(*)::BIGINT AS t_prev FROM bgc GROUP BY 1),
       |cc AS (SELECT cur, count(*)::BIGINT AS t_cur FROM bgc GROUP BY 1),
       |tot AS (SELECT count(*)::BIGINT AS t_all FROM bgc),
       |model AS (
       |  SELECT b.prev, b.cur,
       |    (b.n_bg - 0.75) / p.n_prev
       |      + 0.75 * p.t_prev / p.n_prev * (c.t_cur::DOUBLE / t.t_all) AS p
       |  FROM bgc b JOIN pv p USING (prev) JOIN cc c USING (cur)
       |  CROSS JOIN tot t)""".stripMargin

  /** Window width for exact substring-span dedup. Lee et al. 2021 use 50
    * BPE tokens; 8 word tokens keeps the fixture's injected 13-token
    * license line long enough to contain fully-shared windows.
    */
  private[graft] val SpanW = 8

  /** The license line injected into every 7th fixture doc so cross-doc
    * duplicated SPANS provably exist (the sentence_dedup pattern).
    * 13 alnum tokens ⇒ 6 windows of 8 land fully inside it.
    */
  private[graft] val SpanBoiler =
    "redistribution of this corpus is permitted under the license agreement version two only"

  /** EXACT SUBSTRING-SPAN dedup (Lee et al. 2021, "Deduplicating Training
    * Data Makes Language Models Better" — the complement of MinHash
    * whole-doc similarity: exact duplicated token SPANS, found by
    * fingerprinting every `w`-token window). A window whose fingerprint
    * appears in ≥2 DISTINCT docs is duplicated; per doc we report window
    * totals plus the number of token POSITIONS covered by the union of
    * its (overlapping) duplicated windows — the "fraction of this doc
    * that is copied text" signal a curation pipeline thresholds on.
    *
    * Distributed shape: token hashes are computed once per doc in a
    * map-only projection; the windows are a per-row explode of those
    * hashes, so only (doc_id, i, wfp) DIGESTS ever shuffle — for the
    * cross-doc frequency count, the dup-window count, and the coverage
    * count — and the text itself moves zero times. At 100 TB the
    * frequency table is itself huge but stays a hash-partitioned
    * fingerprint digest (the same posture as minhash_lsh_dedup's bands);
    * removal (not measured here) would be a map-side span-mask join back
    * on doc_id.
    *
    * The rolling window hash folds the portable per-token hashes with the
    * same (acc*131 + h) mod p scheme as [[TextOps.fingerprint]], so the
    * DuckDB oracle replays it with list_reduce over list_slice.
    */
  /** (doc_id, n_tokens) base + exploded (doc_id, i, wfp) window digests —
    * the shared front half of the batch and incremental span-dedup faces.
    */
  private def spanParts(docs: DataFrame, w: Int): (DataFrame, DataFrame) = {
    val base = docs
      .select(col("doc_id"),
        transform(TextOps.tokens(col("text")), t => TextOps.tokenHash(t)).as("hs"))
      .select(col("doc_id"), size(col("hs")).cast("long").as("n_tokens"), col("hs"))
    val wins = base.filter(col("n_tokens") >= w)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), (col("n_tokens") - (w - 1)).cast("int")),
          i => struct(i.as("i"),
            aggregate(slice(col("hs"), i, lit(w)), lit(0L),
              (acc, h) => (acc * 131L + h) % TextOps.HashMod).as("wfp")))).as("win"))
      .select(col("doc_id"), col("win.i").as("i"), col("win.wfp").as("wfp"))
    (base.select(col("doc_id"), col("n_tokens")), wins)
  }

  /** Shared back half: per-doc window totals + overlap-union coverage of
    * the given duplicated windows. One aggregation pass over the dup
    * rows serves BOTH outputs (countDistinct(i) = dup windows,
    * countDistinct(p) = covered positions after the overlap explode);
    * n_windows is pure arithmetic off n_tokens — recomputing the window
    * subtree per output branch is what made the first cut of this query
    * the bench's third most expensive item.
    */
  private def spanReport(base: DataFrame, dup: DataFrame,
                         w: Int): DataFrame = {
    val dupAgg = dup
      .select(col("doc_id"), col("i"),
        explode(sequence(col("i"), col("i") + (w - 1))).as("p"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("i")).as("n_dup_windows"),
        countDistinct(col("p")).as("dup_tokens"))
    base
      .join(dupAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        greatest(col("n_tokens") - (w - 1), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
      .withColumn("dup_frac",
        round(col("dup_tokens").cast("double") / col("n_tokens"), 6))
      .orderBy(col("doc_id"))
  }

  private[graft] def spanDedup(docs: DataFrame, w: Int): DataFrame = {
    val (base, wins0) = spanParts(docs, w)
    // the window digests feed TWO consumers (the frequency count and the
    // dup join) — staged once; unstaged, the whole O(tokens·w) rolling-
    // fingerprint HOF chain evaluated twice per run (round-15: this was
    // the bench's 9th most expensive item). Digest-width rows only.
    val wins = wins0.localCheckpoint()
    val freq = wins.groupBy(col("wfp"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    val dup = wins.join(freq, Seq("wfp")).filter(col("n_docs") >= 2)
    spanReport(base, dup, w)
  }

  /** Incremental substring-span dedup — the daily-ingest face: arriving
    * docs are measured against the HISTORICAL window-fingerprint index
    * only (cross-incoming duplication is the batch job's business; the
    * incremental question is "how much of this new doc is already in the
    * corpus"). The history side reduces to a distinct-fp digest — at
    * scale a persisted bucketed index table appended per ingest, exactly
    * like the exact-dedup fingerprint index — and incoming windows meet
    * it in a semi-join on the fingerprint; neither side's text moves.
    */
  private[graft] def spanDupAgainstIndex(incoming: DataFrame,
                                         history: DataFrame, w: Int): DataFrame = {
    val histFps = spanParts(history, w)._2.select(col("wfp")).distinct()
    val (base, wins) = spanParts(incoming, w)
    val dup = wins.join(histFps, Seq("wfp"), "left_semi")
    spanReport(base, dup, w)
  }

  /** The BM25 (doc, term, tf) digest table — the inverted-index build
    * step. It feeds FOUR consumers inside one search (scorer, dl, stats,
    * df) AND every subsequent search / streaming-scorer snapshot over the
    * same corpus, so it is staged once per (session, dir) via StageCache
    * exactly like the LSH pairs stage (at scale: a persisted index table).
    * Round 2 rebuilt it per invocation (8.9 s/query).
    */
  private[graft] def bm25Tf(s: SparkSession, dir: String): DataFrame =
    graft.StageCache.getOrStage(s, s"bm25-tf:$dir") {
      spread(documents(s, dir))
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    }

  /** Okapi BM25 (k1=1.2, b=0.75, +1-smoothed IDF) document scores for a
    * fixed query-term set: (doc_id, score, n_terms_hit), unordered. Pass 1
    * aggregates corpus stats (N, avgdl, per-term df — vocabulary-bounded
    * digests) from the staged tf table; pass 2 scores per-doc term counts
    * against the broadcast stats. Shared by `bm25_search` (rank + limit),
    * `hybrid_rrf` (rank + fuse), and the streaming scorer's frozen
    * snapshot. Constants are written as the same double literals the
    * oracle SQL uses (a Scala-folded k1+1 can differ from the 2.2 literal
    * in the last ulp).
    */
  private def bm25Scores(s: SparkSession, dir: String, qTerms: Seq[String]): DataFrame = {
    val tf = bm25Tf(s, dir)
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val df = tf.filter(col("tok").isin(qTerms: _*))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf.filter(col("tok").isin(qTerms: _*))
      .join(dl, "doc_id")
      .join(broadcast(df), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("contrib",
        col("idf") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("contrib")), 6).as("score"),
        count(lit(1)).as("n_terms_hit"))
  }

  /** DuckDB expressions mirroring TextOps exactly. */
  def duckToks(textExpr: String): String =
    s"list_filter(string_split_regex(lower($textExpr), '[^a-z0-9]+'), t -> t <> '')"

  private def duckTokHash(tokExpr: String): String =
    s"""list_reduce(list_prepend(0::BIGINT,
       |  list_transform(generate_series(1, length($tokExpr)), i -> ascii($tokExpr[i])::BIGINT)),
       |  (acc, c) -> (acc * 31 + c) % 1000000007)""".stripMargin

  private[queries] def duckFingerprint(textExpr: String): String =
    s"""list_reduce(list_prepend(0::BIGINT,
       |  list_transform(list_slice(${duckToks(textExpr)}, 1, 512),
       |    tok -> ${duckTokHash("tok")})),
       |  (acc, h) -> (acc * 131 + h) % 1000000007)""".stripMargin

  private def duckLangScore(toksExpr: String, lang: String): String = {
    val markers = TextOps.LangMarkers(lang).map(m => s"'$m'").mkString(", ")
    s"len(list_filter($toksExpr, t -> list_contains([$markers], t)))"
  }

  /** The (word, freq) corpus digest the BPE trainer runs over. */
  private[graft] def wordFreqs(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(explode(TextOps.tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** The BPE merge loop unrolled in DuckDB SQL, round by round: pair
    * counts from the double-spaced state, deterministic argmax (count
    * desc, pair asc), one replace-all application — the literal same
    * algorithm [[graft.operators.Bpe]] runs (the double-space separator
    * makes replace-all exactly canonical greedy; see Bpe's scaladoc), so
    * the merge table must match bit-for-bit (BpeSpec additionally
    * validates the loop against an independent canonical-greedy
    * implementation).
    */
  private def duckBpeCtes(k: Int): String = {
    // pair is stored "a b"; the spaced-form search key is " a  b "
    val rep = "replace(s, ' ' || replace(pair, ' ', '  ') || ' ', " +
      "' ' || replace(pair, ' ', '') || ' ')"
    val head =
      s"""WITH w AS (
         |  SELECT t AS word, count(*)::BIGINT AS freq
         |  FROM documents, unnest(${duckToks("text")}) AS u(t) GROUP BY t),
         |s0 AS (SELECT freq, ' ' || array_to_string(
         |  list_transform(generate_series(1, length(word)), i -> substring(word, i, 1)),
         |  '  ') || ' ' AS s FROM w)""".stripMargin
    val rounds = (1 to k).map { r =>
      s""",
         |p$r AS (
         |  SELECT pair, sum(freq)::BIGINT AS cnt FROM (
         |    SELECT freq, unnest(list_transform(generate_series(1, len(tk)-1),
         |      i -> tk[i] || ' ' || tk[i+1])) AS pair
         |    FROM (SELECT freq, string_split(trim(s), '  ') AS tk FROM s${r - 1}))
         |  GROUP BY pair),
         |b$r AS (SELECT pair, cnt FROM p$r ORDER BY cnt DESC, pair LIMIT 1),
         |s$r AS (SELECT freq, $rep AS s FROM s${r - 1}, b$r)""".stripMargin
    }.mkString
    head + rounds
  }

  private def duckBpeMerges(k: Int): String = {
    val union = (1 to k)
      .map(r => s"SELECT $r::INTEGER AS merge_rank, pair, cnt FROM b$r")
      .mkString(" UNION ALL ")
    s"${duckBpeCtes(k)}\nSELECT * FROM ($union) ORDER BY merge_rank"
  }

  private def duckBpeTokenize(k: Int): String =
    s"""${duckBpeCtes(k)}
       |SELECT token, sum(freq)::BIGINT AS cnt FROM (
       |  SELECT freq, unnest(string_split(trim(s), '  ')) AS token FROM s$k)
       |GROUP BY token ORDER BY cnt DESC, token LIMIT 20""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Flesch reading-ease — the readability axis of the quality family
    // (length/punct/stopword ratios say "is it text"; Flesch says "for
    // whom"): 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words),
    // with syllables ≈ vowel-group count (the standard heuristic) and
    // sentences = terminal-punctuation runs, floor 1. Map-only regex
    // arithmetic, replayed exactly in SQL.
    "readability" -> ((s, dir) => {
      val words = TextOps.tokenCount(col("text")).cast("double")
      val sents = greatest(lit(1),
        size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))).cast("double")
      val sylls = size(regexp_extract_all(lower(col("text")),
        lit("[aeiouy]+"), lit(0))).cast("double")
      documents(s, dir)
        .select(col("doc_id"), words.as("n_words"), sents.as("n_sents"),
          sylls.as("n_sylls"))
        .filter(col("n_words") > 0)
        .withColumn("flesch", round(lit(206.835)
          - lit(1.015) * col("n_words") / col("n_sents")
          - lit(84.6) * col("n_sylls") / col("n_words"), 4))
        .orderBy(col("doc_id"))
    }),

    // Rank normalization (empirical-CDF feature transform): map each
    // value to its percent_rank WITHIN its language group — the
    // monotone-invariant feature encoding robust to any heavy tail. The
    // window partitions by group, never globally; skew is bounded by the
    // largest single group, and at web scale the groups (lang, domain,
    // shard) are exactly the partition keys already present.
    "rank_normalize" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang")).orderBy(col("n_chars"))
      documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("pct_rank", round(percent_rank().over(w), 6))
        .orderBy(col("doc_id"))
    }),

    // TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
    // the token co-occurrence graph (undirected edge iff two distinct
    // tokens appear within 2 positions) — the unsupervised keyword scorer
    // TF can't match because it rewards CONNECTEDNESS, not raw count.
    // Pure composition: the position-window self-join is per-doc-bounded
    // (≤2 edges per token — linear, never quadratic), then the existing
    // distributed PageRank runs unchanged over word nodes; the oracle
    // unrolls the same 3 damped iterations over the same edges.
    "textrank_keywords" -> ((s, dir) => {
      val toks = documents(s, dir).filter(col("doc_id") < 50)
        .select(col("doc_id"),
          posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "tok")))
      val a = toks.select(col("doc_id"), col("pos").as("pa"), col("tok").as("ta"))
      val b = toks.select(col("doc_id"), col("pos").as("pb"), col("tok").as("tb"))
      val pairs = a.join(b, Seq("doc_id"))
        .filter(col("pb") > col("pa") && col("pb") - col("pa") <= 2 &&
          col("ta") =!= col("tb"))
        .select(least(col("ta"), col("tb")).as("id_a"),
          greatest(col("ta"), col("tb")).as("id_b"))
        .distinct()
      val nodes = toks.select(col("tok").as("id")).distinct()
      graft.operators.PageRank.run(pairs, nodes, iters = 3)
        .orderBy(round(col("pr"), 6).desc, col("id").asc).limit(10)
        .select(col("id").as("word"), round(col("pr"), 6).as("pr"))
    }),

    // k-anonymity audit — the release gate beside pseudonymization and PII
    // scrubbing: rows whose quasi-identifier combination (lang, source,
    // length bucket) is shared by fewer than k=5 records are re-
    // identifiable by linkage even with every direct identifier removed
    // (Sweeney 2002). One group-size digest aggregate; the summary row a
    // privacy review signs off on rides beside the per-group detail.
    "k_anonymity" -> ((s, dir) => {
      val groups = documents(s, dir)
        .select(col("lang"), col("source"),
          (col("n_chars") / 100).cast("long").as("len_bucket"))
        .groupBy(col("lang"), col("source"), col("len_bucket"))
        .agg(count(lit(1)).as("n"))
      groups
        .withColumn("at_risk", col("n") < 5)
        .orderBy(col("lang"), col("source"), col("len_bucket"))
    }),

    // Differentially-private release counts (Dwork 2006, Laplace
    // mechanism, ε = 1): per-language counts plus Laplace(1/ε) noise —
    // sensitivity 1 for a count. The noise draw is DETERMINISTIC (inverse-
    // CDF over a group-keyed hash), which is exactly how DP releases are
    // made reproducible for audit: the seed is the secret, not the
    // mechanism. noisy = n + sign·ln(1−2|u−½|)/ε replayed exactly in SQL.
    "dp_counts" -> ((s, dir) => {
      val counts = documents(s, dir).groupBy(col("lang"))
        .agg(count(lit(1)).as("n"))
      val u = graft.functions.Digests.digest60(col("lang")).cast("double") /
        lit(1152921504606846976.0)
      counts
        .withColumn("u", round(u, 9)) // quantize the draw at the boundary
        .withColumn("noise",
          when(col("u") < 0.5, log(lit(2.0) * col("u")))
            .otherwise(-log(lit(2.0) * (lit(1.0) - col("u")))))
        .select(col("lang"), col("n"),
          round(col("n") + col("noise"), 4).as("noisy_n"))
        .orderBy(col("lang"))
    }),

    // Exact deduplication: rolling-hash fingerprint → hash groupBy →
    // keeper = min id. Over the doubled corpus every text appears twice.
    "dedup_exact" -> ((s, dir) => {
      spread(doubledDocs(s, dir))
        .withColumn("fp", TextOps.fingerprint(col("text")))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n"))
        .orderBy(col("keeper"))
    }),

    // Keep-first dedup subtract: ids surviving exact dedup (left-semi of
    // the corpus against its keeper set — the materialized clean corpus).
    "dedup_keep_first" -> ((s, dir) => {
      val fp = spread(doubledDocs(s, dir))
        .withColumn("fp", TextOps.fingerprint(col("text")))
      val keepers = fp.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      fp.join(keepers, Seq("doc_id"), "left_semi")
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // N-gram (token-set) Jaccard similarity, all pairs in a 20-doc block.
    "ngram_jaccard" -> ((s, dir) => {
      val t = documents(s, dir).filter(col("doc_id") < 20)
        .select(col("doc_id"), array_distinct(TextOps.tokens(col("text"))).as("toks"))
      val a = t.select(col("doc_id").as("id_a"), col("toks").as("toks_a"))
      val b = t.select(col("doc_id").as("id_b"), col("toks").as("toks_b"))
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("jacc", round(
          when(size(array_union(col("toks_a"), col("toks_b"))) === 0, 0.0)
            .otherwise(size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
              size(array_union(col("toks_a"), col("toks_b"))).cast("double")), 6))
        .select(col("id_a"), col("id_b"), col("jacc"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Edit-distance fuzzy matching: Levenshtein distance + normalized
    // similarity over a blocked pair set (first-token block — the
    // candidate-blocking shape; exact O(len²) DP only within blocks, never
    // all-pairs). The fourth dedup family: exact-fp, MinHash-Jaccard,
    // embedding-cosine, and now character-level edit distance.
    "edit_distance_pairs" -> ((s, dir) => {
      val t = documents(s, dir).filter(col("doc_id") < 40)
        .select(col("doc_id"), substring(col("text"), 1, 80).as("prefix"))
      val a = t.select(col("doc_id").as("id_a"), col("prefix").as("pre_a"))
      val b = t.select(col("doc_id").as("id_b"), col("prefix").as("pre_b"))
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("dist", levenshtein(col("pre_a"), col("pre_b")).cast("long"))
        .withColumn("sim", round(lit(1.0) - col("dist").cast("double") /
          greatest(length(col("pre_a")), length(col("pre_b"))), 6))
        .filter(col("sim") >= 0.3)
        .select(col("id_a"), col("id_b"), col("dist"), col("sim"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Winnowing (SIGMOD 2003) substring-level dedup — the 5th dedup
    // family: exact-fp / MinHash / SimHash / embedding-cosine compare
    // whole documents; winnowing catches shared PASSAGES (boilerplate,
    // licence headers, quotations). Per doc: one native-kernel scan emits
    // the distinct k-gram window-min hashes; docs sharing a fingerprint
    // meet in an EQUI-JOIN on the hash value (banded like LSH, never
    // all-pairs), and the pair's resemblance is the Jaccard of the two
    // fingerprint sets. Over the doubled corpus the exact copies surface
    // at resemblance 1.0. At 100 TB only (doc_id, fp) digests shuffle.
    "winnow_dedup" -> ((s, dir) => {
      GraftFunctions.register(s)
      // feeds sizes + both join sides AND repeat invocations: stage once
      // per (session, dir) — same policy as bm25-tf
      val fps = stagedWinnowFps(s, dir)
      val sizes = fps.groupBy(col("doc_id")).agg(count(lit(1)).as("n_fp"))
      val pairs = fps.select(col("doc_id").as("id_a"), col("fp"))
        .join(fps.select(col("doc_id").as("id_b"), col("fp")), Seq("fp"))
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_shared"))
      pairs
        .join(sizes.select(col("doc_id").as("id_a"), col("n_fp").as("fp_a")), Seq("id_a"))
        .join(sizes.select(col("doc_id").as("id_b"), col("n_fp").as("fp_b")), Seq("id_b"))
        .withColumn("resemblance", round(col("n_shared").cast("double") /
          (col("fp_a") + col("fp_b") - col("n_shared")), 6))
        .filter(col("resemblance") >= 0.5)
        .select(col("id_a"), col("id_b"), col("n_shared"), col("resemblance"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Embedding-cosine near-duplicate pairs, label-blocked (the blocked
    // equi-join shape that scales; exact within each block).
    "embedding_neardup" -> ((s, dir) => {
      Knn.similaritySelfJoin(embeddings(s, dir), "vec_id", "embedding",
          threshold = 0.25, blockCol = Some("label"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Language ID: marker-word scores, deterministic argmax chain.
    // Round-14: ONE fused text-stats scan per row tracks every marker
    // token; each language's score is the integer sum of its markers'
    // counts — value-identical to the per-language filter+array_contains
    // walks it replaces (markers within a language are distinct, so the
    // "tokens matching any marker" count equals the per-marker-count sum;
    // TextStatsSpec pins it).
    "lang_id" -> ((s, dir) => {
      val track = Seq("en", "de", "fr", "es")
        .flatMap(TextOps.LangMarkers(_)).distinct
      val idx = track.zipWithIndex.toMap
      val d = documents(s, dir)
        .select(col("doc_id"), col("lang"),
          TextOps.textStats(col("text"), track).as("__st"))
      def score(l: String): Column =
        TextOps.LangMarkers(l).map(m =>
          element_at(col("__st").getField("track"), idx(m) + 1))
          .reduceLeft(_ + _)
      val (en, de, fr, es) = (score("en"), score("de"), score("fr"), score("es"))
      d.select(
        col("doc_id"), col("lang"),
        en.as("en_score"), de.as("de_score"), fr.as("fr_score"), es.as("es_score"),
        when(en > 0 && en >= de && en >= fr && en >= es, "en")
          .when(de > 0 && de >= fr && de >= es, "de")
          .when(fr > 0 && fr >= es, "fr")
          .when(es > 0, "es")
          .otherwise("und").as("lang_pred"))
        .orderBy(col("doc_id"))
    }),

    // Per-document quality features + composite score.
    "quality_scores" -> ((s, dir) => {
      // round-14: ONE fused text-stats scan per row feeds every feature
      // column (bit-identical values — TextStatsSpec)
      documents(s, dir)
        .select(col("doc_id"), col("n_chars"),
          TextOps.textStats(col("text")).as("__st"))
        .select(
          col("doc_id"),
          col("n_chars"),
          col("__st").getField("n_chars").as("c_len"),
          TextOps.tokenCountS(col("__st")).as("n_tokens"),
          round(TextOps.meanTokenLenS(col("__st")), 6).as("mean_tok_len"),
          round(TextOps.digitRatioS(col("__st")), 6).as("digit_ratio"),
          round(TextOps.alphaRatioS(col("__st")), 6).as("alpha_ratio"),
          round(TextOps.stopwordRatioS(col("__st")), 6).as("stopword_ratio"),
          TextOps.qualityScoreS(col("__st")).as("quality"))
        .orderBy(col("doc_id"))
    }),

    // Classic corpus word-count shape: token bigram frequencies, top 20.
    "word_bigram_topk" -> ((s, dir) => {
      spread(documents(s, dir))
        .withColumn("toks", TextOps.tokens(col("text")))
        .filter(size(col("toks")) >= 2)
        .select(explode(transform(
          sequence(lit(1), size(col("toks")) - 1),
          i => concat_ws(" ", element_at(col("toks"), i), element_at(col("toks"), i + 1))))
          .as("bigram"))
        .groupBy(col("bigram"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram").asc)
        .limit(20)
    }),

    // Gopher-style repetition filter (Rae et al. 2021 §A1.1 shape): per-doc
    // type-token ratio, most-frequent-token fraction, duplicate-trigram
    // fraction, and the resulting keep/drop decision. Distributed shape:
    // explode → groupBy(doc, gram) → per-doc re-agg — only (doc_id, gram,
    // count) digests shuffle, never the text, and both aggs are partial
    // (map-side combine) so a 100 TB corpus shuffles a vocabulary-bounded
    // digest stream. Per-row HOF mode-finding would be O(len²) per doc;
    // the groupBy is both faster and the idiomatic Spark formulation.
    "repetition_filter" -> ((s, dir) => {
      // tokenize feeds both the unigram and trigram branches AND repeat
      // invocations — staged once per (session, dir) (persist(DISK_ONLY)
      // at real scale) instead of re-tokenizing
      val toks = stagedDocToks(s, dir)
      val uni = toks
        .select(col("doc_id"), explode(col("toks")).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("n"))
        .groupBy(col("doc_id"))
        .agg(sum(col("n")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          max(col("n")).as("top_tok_n"))
      val tri = toks
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(col("toks")) - 2),
          i => concat_ws(" ", element_at(col("toks"), i),
            element_at(col("toks"), i + 1), element_at(col("toks"), i + 2))))
          .as("tri"))
        .groupBy(col("doc_id"), col("tri")).agg(count(lit(1)).as("n"))
        .groupBy(col("doc_id"))
        .agg(sum(col("n")).as("n_tri"),
          sum(when(col("n") > 1, col("n")).otherwise(lit(0))).as("dup_tri"))
      val ttr = round(col("n_types").cast("double") / col("n_tokens"), 6)
      val topFrac = round(col("top_tok_n").cast("double") / col("n_tokens"), 6)
      val dupTriFrac = round(coalesce(col("dup_tri").cast("double") /
        col("n_tri"), lit(0.0)), 6)
      uni.join(tri, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"), ttr.as("ttr"),
          topFrac.as("top_tok_frac"), dupTriFrac.as("dup_trigram_frac"),
          (topFrac <= 0.2 && dupTriFrac <= 0.3).as("keep"))
        .orderBy(col("doc_id"))
    }),

    // The end-to-end curation decision: one pass over the (doubled, so
    // duplicates exist) corpus composing the gates a release pipeline
    // applies — exact-dedup keeper, token-length bounds, digit-ratio cap —
    // emitting the KEPT corpus with its signals. Composition stays one
    // shuffle (the fingerprint keeper window); every other gate is a
    // map-side projection on the same scan.
    "curated_corpus" -> ((s, dir) => {
      val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
      val d = documents(s, dir).select(col("doc_id"), col("lang"), col("text"))
      spread(d.union(d.select((col("doc_id") + 10000).as("doc_id"),
          col("lang"), col("text"))))
        .withColumn("fp", TextOps.fingerprint(col("text")))
        .withColumn("n_tok", TextOps.tokenCount(col("text")).cast("long"))
        .withColumn("digit_ratio", round(TextOps.digitRatio(col("text")), 6))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("n_tok").between(10, 512) &&
          col("digit_ratio") <= 0.2)
        .select(col("doc_id"), col("lang"), col("n_tok"), col("digit_ratio"))
        .orderBy(col("doc_id"))
    }),

    // BM25 keyword search: the lexical-retrieval twin of knn_topk — rank
    // documents for a term query by Okapi BM25 (k1=1.2, b=0.75, the
    // +1-smoothed IDF). Same two-pass broadcast-model shape as charlm:
    // pass 1 aggregates corpus stats (N, avgdl, per-term df — all
    // vocabulary-bounded digests), pass 2 scores per-doc term counts
    // against the broadcast stats and takes the top-k heap. At 100 TB the
    // inverted-index analog is exactly this: df/avgdl are index metadata,
    // scoring is a map-side join on (doc, term) digests.
    "bm25_search" -> ((s, dir) =>
      bm25Scores(s, dir, Seq("data", "table", "query"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(10)),

    // Sparse TF-IDF retrieval SERVED FROM THE INDEX: only the query
    // terms' buckets are read (partition-pruned), df comes from the
    // posting lists and N from the index's own meta table — the corpus
    // is never touched at serve time (the bm25_search family reads a
    // staged digest; this serves from the persisted index layout). The
    // oracle recomputes from documents directly.
    // panel = InvertedIndex.DemoTerms, the ONE definition the delete demo
    // shares so its tombstoned victim is exactly this query's top-1
    "sparse_search" -> ((s, dir) =>
      graft.operators.InvertedIndex.sparseSearch(s, dir,
        graft.operators.InvertedIndex.DemoTerms)),

    // The same sparse serve through an UNCOMPACTED delete (the takedown/
    // dedup-purge verb — every index family now has append + delete +
    // compact): the panel's exact top-1 doc is tombstoned on a demo clone
    // and the read face subtracts the sidecar BEFORE its df aggregate, so
    // df, N (meta decremented), and the re-ranked scores are all exact.
    // The victim is chosen BY the search itself, so the oracle re-derives
    // it from `documents` with its own top-1 subquery — the whole
    // merge-on-read state replays with no sidecar dump.
    "sparse_search_deleted" -> ((s, dir) => {
      val demo = graft.operators.InvertedIndex.maintDemoLayout(s, dir)
      graft.operators.InvertedIndex.sparseSearchIn(s, demo,
        graft.operators.InvertedIndex.DemoTerms)
    }),

    // Per-bucket postings operability stats + the compact-vs-serve
    // DECISION (the ann_maintenance_plan twin for the text index) over
    // the delete-demo's merge-on-read state. The file count is PHYSICAL
    // layout state and still oracle-checked: DuckDB reads the same
    // artifact with filename=true and counts the same distinct files.
    "postings_stats" -> ((s, dir) => {
      val demo = graft.operators.InvertedIndex.maintDemoLayout(s, dir)
      graft.operators.InvertedIndex.postingsStats(s, demo)
    }),

    // BOOLEAN retrieval — the third index query class beside ranked
    // (sparse_search) and positional (phrase_search): AND = successive
    // left-semi joins of posting doc-sets, NOT = one anti join. Set
    // algebra over digests; the corpus and even the text column never
    // participate.
    "bool_search" -> ((s, dir) => {
      def posts(t: String) = graft.operators.InvertedIndex.lookup(s, dir, t)
        .select(col("doc_id"))
      posts("data")
        .join(posts("table"), Seq("doc_id"), "left_semi")
        .join(posts("join"), Seq("doc_id"), "left_anti")
        .orderBy(col("doc_id"))
    }),

    // KWIC snippet extraction — the search-serving feature positions pay
    // for twice: the index answers WHERE the hit is (first occurrence per
    // doc, no text scan), and only then does one targeted join fetch the
    // matching docs' text to slice the ±3-token window around it. The
    // corpus-wide tokenize happens on the MATCHING docs only at serve
    // time in a real deployment; here the window arithmetic (1-based,
    // edge-clamped) is replayed exactly by the oracle.
    "snippet_extract" -> ((s, dir) => {
      val dirL = graft.operators.InvertedIndex.layout(s, dir)
      val b = graft.operators.InvertedIndex.termBucket("column")
      val posts = s.read.parquet(dirL)
        .filter(col("bucket") === b && col("term") === "column")
        .select(col("doc_id"),
          (element_at(col("positions"), 1) + 1).as("p1"))
      val toks = documents(s, dir).select(col("doc_id"),
        filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= "").as("l"))
      posts.join(toks, "doc_id")
        .select(col("doc_id"), col("p1").cast("int").as("pos"),
          array_join(slice(col("l"),
            greatest(col("p1") - 3, lit(1)),
            col("p1") + lit(3) - greatest(col("p1") - 3, lit(1)) + lit(1)),
            " ").as("snippet"))
        .orderBy(col("doc_id"))
    }),

    // PHRASE search — "these words, adjacent, in order" from the
    // positional postings: per-term position lists join on doc_id and
    // the phrase's start positions survive an intersection fold. The
    // bag-of-words rankers provably cannot answer this; the positions
    // payload is why real postings formats carry positions at all.
    "phrase_search" -> ((s, dir) =>
      graft.operators.InvertedIndex.phraseSearch(s, dir, Seq("window", "join"))),

    // Bulk sparse serving — Q queries in ONE job over the postings
    // layout: union of probed buckets scanned once, broadcast query
    // table routes each posting row to the queries that asked for its
    // term, per-qid ranking via the partial/final TopKPerKey heap pair
    // (bounded exchange however common a term is).
    "sparse_search_batch" -> ((s, dir) =>
      graft.operators.InvertedIndex.sparseSearchBatch(s, dir, Seq(
        1L -> Seq("data", "table"),
        2L -> Seq("query", "join"),
        3L -> Seq("scan")))),

    // Inverted-index term lookup — "which docs contain X, how often"
    // served from the bucket-partitioned postings layout: the term's
    // bucket is a driver-computed literal, so the scan partition-prunes
    // to ONE directory (spec-pinned) and reads postings digests, never
    // the corpus. The oracle recomputes postings straight from
    // `documents` — the layout is an access path, not semantics.
    "term_lookup" -> ((s, dir) =>
      graft.operators.InvertedIndex.lookup(s, dir, "column")
        .orderBy(col("doc_id"))),

    // Hybrid retrieval: the BM25 lexical ranking and the embedding-cosine
    // semantic ranking over the SAME corpus, fused with reciprocal-rank
    // fusion (Cormack et al. 2009: score = Σ 1/(60 + rank)). This is the
    // production retrieval stack in one plan — sparse and dense retrievers
    // each produce an independent top-k (each a TakeOrdered at scale, never
    // a global sort of the corpus), and the fusion is a FULL OUTER join of
    // two k-row lists, i.e. driver-trivial regardless of corpus size. Ranks
    // are taken over round-6 scores so the orderings (and therefore the
    // fused scores) are engine-portable.
    // Filtered hybrid retrieval — the enterprise-search request shape:
    // BM25 + semantic + RRF fusion UNDER a metadata predicate
    // (lang = 'en'). Pre-filter semantics on BOTH retrievers: the
    // predicate lands BEFORE each top-k, so all kList slots per
    // retriever go to predicate-passing docs and the RRF ranks are
    // computed within the allowed set (post-filtering fused results
    // would starve exactly like the ANN case AnnPqSpec demonstrates).
    // BM25 stats (df, avgdl, N) stay CORPUS-wide — the convention of
    // real engines, where the filter restricts candidates, not the
    // index statistics; the oracle replays the same choice.
    "hybrid_rrf_filtered" -> ((s, dir) => {
      graft.expressions.GraftFunctions.register(s)
      val kList = 20
      val allowed = documents(s, dir).filter(col("lang") === "en")
        .select(col("doc_id"))
      val lex = bm25Scores(s, dir, Seq("data", "table", "query"))
        .join(allowed, Seq("doc_id"), "left_semi")
        .orderBy(col("score").desc, col("doc_id").asc).limit(kList)
        .withColumn("lex_rnk", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id").asc)))
        .select(col("doc_id"), col("lex_rnk"))
      val q = s.range(1).select(graft.functions.VectorOps.l2Normalize(
        TextOps.hashEmbedRaw(lit("query: data table query"))).as("q_emb"))
      val sem = spread(documents(s, dir)).filter(col("lang") === "en")
        .withColumn("emb", TextOps.hashEmbedFused(TextOps.passageText(col("text"))))
        .crossJoin(broadcast(q))
        .withColumn("sim", round(
          graft.expressions.GraftFunctions.cosineSim(col("emb"), col("q_emb")), 6))
        .orderBy(col("sim").desc, col("doc_id").asc).limit(kList)
        .withColumn("sem_rnk", row_number().over(
          Window.orderBy(col("sim").desc, col("doc_id").asc)))
        .select(col("doc_id"), col("sem_rnk"))
      lex.join(sem, Seq("doc_id"), "full_outer")
        .select(col("doc_id"), col("lex_rnk"), col("sem_rnk"),
          round(
            coalesce(lit(1.0) / (lit(60) + col("lex_rnk")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(60) + col("sem_rnk")), lit(0.0)), 6).as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id").asc)
        .limit(10)
    }),

    "hybrid_rrf" -> ((s, dir) => {
      graft.expressions.GraftFunctions.register(s)
      val kList = 20
      // Each retriever's top-k is orderBy+limit — TakeOrderedAndProject
      // (per-partition heaps, O(k) rows to the driver), NOT a global rank
      // window that would single-partition-sort the scored corpus. The
      // rank window then labels only the k survivors.
      val lex = bm25Scores(s, dir, Seq("data", "table", "query"))
        .orderBy(col("score").desc, col("doc_id").asc).limit(kList)
        .withColumn("lex_rnk", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id").asc)))
        .select(col("doc_id"), col("lex_rnk"))
      val q = s.range(1).select(graft.functions.VectorOps.l2Normalize(
        TextOps.hashEmbedRaw(lit("query: data table query"))).as("q_emb"))
      val sem = spread(documents(s, dir))
        .withColumn("emb", TextOps.hashEmbedFused(TextOps.passageText(col("text"))))
        .crossJoin(broadcast(q))
        .withColumn("sim", round(
          graft.expressions.GraftFunctions.cosineSim(col("emb"), col("q_emb")), 6))
        .orderBy(col("sim").desc, col("doc_id").asc).limit(kList)
        .withColumn("sem_rnk", row_number().over(
          Window.orderBy(col("sim").desc, col("doc_id").asc)))
        .select(col("doc_id"), col("sem_rnk"))
      lex.join(sem, Seq("doc_id"), "full_outer")
        .select(col("doc_id"), col("lex_rnk"), col("sem_rnk"),
          round(
            coalesce(lit(1.0) / (lit(60) + col("lex_rnk")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(60) + col("sem_rnk")), lit(0.0)), 6).as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id").asc)
        .limit(10)
    }),

    // Frequent-items sketch (Spark 4 approx_top_k over the DataSketches
    // ItemsSketch): per-half sketch STATES built independently, combined
    // with approx_top_k_combine, then estimated — the mergeable
    // heavy-hitters pattern (ship per-executor/per-day sketch state, never
    // re-scan; the same shippable-state story as hll_sketch_ops). With
    // maxItemsTracked far above the corpus vocabulary the sketch tracks
    // every item exactly, so the estimate is fully oracled against the
    // exact GROUP BY counts; the estimate is over-fetched (30) and
    // re-ranked (n DESC, item ASC) so boundary ties cut identically on
    // both engines.
    "approx_topk_ops" -> ((s, dir) => {
      val states = spread(documents(s, dir))
        .select((col("doc_id") % 2).as("half"),
          explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy(col("half"))
        .agg(expr("approx_top_k_accumulate(tok, 100000)").as("st"))
      states
        .agg(expr("approx_top_k_estimate(approx_top_k_combine(st, 100000), 30)").as("top"))
        .select(explode(col("top")).as("e"))
        .select(col("e.item").as("item"), col("e.count").as("n"))
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("n").desc, col("item").asc)))
        .filter(col("rnk") <= 10)
        .orderBy(col("rnk"))
    }),

    // Char-LM quality score: train a corpus-level character unigram model
    // (pass 1: one full-corpus aggregate — alphabet-bounded digests, heavy
    // map-side combine), then score every document by bits-per-char under
    // it (pass 2: per-doc char counts joined to the BROADCAST model).
    // The two-pass broadcast-model shape is how every corpus-level
    // statistic (IDF, LM, quantile cuts) scores rows at 100 TB. High
    // bits-per-char ≈ atypical character distribution (mojibake, binary
    // junk) — the KenLM-style perplexity filter, reduced to unigrams.
    // ln(p)/ln(2) is written identically on both engines.
    "charlm_bits" -> ((s, dir) => {
      GraftFunctions.register(s)
      // Fused native char-histogram kernel: one scan per document emits the
      // 36-slot [a-z0-9] count array — no per-character row explosion (the
      // round-2 formulation materialized one row PER CHARACTER, ~5M rows at
      // sf0.1, before the partial agg collapsed them right back to these
      // digests). posexplode of the histogram yields the identical
      // (doc, char, n) digest stream; CharHistSpec asserts per-row equality
      // with the explode chain, which remains the DuckDB oracle formulation.
      // feeds model + scorer AND repeat invocations: one histogram scan
      // per (session, dir)
      val docCounts = stagedCharHist(s, dir)
      val model = docCounts.groupBy(col("ch")).agg(sum(col("n")).as("cn"))
        .withColumn("total", sum(col("cn")).over(Window.partitionBy()))
        .select(col("ch"), (col("cn").cast("double") / col("total")).as("p"))
      docCounts.join(broadcast(model), "ch")
        .groupBy(col("doc_id"))
        .agg(sum(col("n")).as("n_chars_scored"),
          round(-sum(col("n") * log(col("p")) / log(lit(2.0))) / sum(col("n")), 6)
            .as("bits_per_char"))
        .orderBy(col("doc_id"))
    }),

    // Per-GROUP heavy hitters: approx_top_k as a grouped aggregate — one
    // frequent-items sketch per language, merged partial→final like any
    // hash aggregate (per-group sketch state is what shuffles). Estimate
    // over-fetched (20/group) and re-ranked (n DESC, item ASC) so
    // boundary ties cut identically on both engines; exact because
    // maxItemsTracked > per-group vocabulary.
    "approx_topk_grouped" -> ((s, dir) => {
      spread(documents(s, dir))
        .select(col("lang"), explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy(col("lang"))
        .agg(expr("approx_top_k(tok, 20, 100000)").as("top"))
        .select(col("lang"), explode(col("top")).as("e"))
        .select(col("lang"), col("e.item").as("item"), col("e.count").as("n"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("lang")).orderBy(col("n").desc, col("item").asc)))
        .filter(col("rnk") <= 3)
        .orderBy(col("lang"), col("rnk"))
    }),

    // SENTENCE-level dedup (the RefinedWeb/C4 boilerplate-removal pass):
    // docs are split into sentences, each sentence fingerprinted, and
    // sentences appearing in ≥3 DISTINCT documents (cookie banners,
    // licence lines — here a deterministically injected boilerplate
    // sentence so the fixture has guaranteed hits) are dropped; the
    // surviving sentences are reassembled IN ORDER into the cleaned
    // document. Distributed shape: only (doc, idx, sentence-fp) digests
    // shuffle for the frequency count; reassembly is one groupBy(doc)
    // with an order-preserving struct sort — text moves once.
    "sentence_dedup" -> ((s, dir) => {
      // feeds the frequency count AND the scorer AND repeat invocations:
      // staged once per (session, dir)
      val sents = stagedSentenceFps(s, dir)
      val freq = sents.groupBy(col("sfp"))
        .agg(countDistinct(col("doc_id")).as("n_docs"))
      sents.join(freq, Seq("sfp"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sents"),
          sum(when(col("n_docs") < 3, 1L).otherwise(0L)).as("n_kept"),
          array_join(transform(
            array_sort(collect_list(when(col("n_docs") < 3,
              struct(col("idx"), col("sent"))))),
            x => x.getField("sent")), ". ").as("cleaned"))
        .orderBy(col("doc_id"))
    }),

    // Exact substring-span dedup (Lee et al. 2021) — see [[spanDedup]].
    // Fixture: every 7th doc gets the deterministic license line
    // prepended, so the corpus provably contains cross-doc duplicated
    // 8-token windows with PARTIAL per-doc coverage (the interesting
    // case — whole-doc dup is dedup_exact's job).
    "substring_dedup" -> ((s, dir) => {
      val injected = documents(s, dir).select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(lit(SpanBoiler + " "), col("text")))
          .otherwise(col("text")).as("text"))
      spanDedup(spread(injected), SpanW)
    }),

    // EXACT set-similarity self-join via prefix filtering (AllPairs /
    // PPJoin, Chaudhuri 2006; Xiao 2008) — the exactness-guaranteed
    // sibling of `minhash_lsh_dedup`: the IDENTICAL similarity definition
    // (hashed word-3-shingle sets over the doubled corpus, Jaccard >=
    // 0.5 — the STAGED table both pipelines and `lsh_recall_audit` share)
    // but with zero false negatives BY CONSTRUCTION instead of with LSH
    // probability, so its output is the exact superset the LSH run is
    // audited against. The prefix-filter theorem does the pruning: under
    // any global total order over shingles, J(a,b) >= t implies the pair
    // shares a shingle within each side's first n-ceil(t*n)+1 shingles
    // (order rarest-first, df asc); the PPJoin LENGTH filter (J >= t
    // forces min(n) >= t*max(n)) and POSITIONAL filter (a match at ranks
    // (rk_a, rk_b) caps the overlap at 1 + min(na-rk_a, nb-rk_b); the
    // FIRST shared shingle of a qualifying pair always passes, so
    // row-level filtering is lossless) stack on top. Shingle WIDTH is
    // the pruning lever on this dense synthetic lexicon (~31 words):
    // bigram shingles span ~930 values and prefixes prune weakly
    // (measured 5.5M candidates / 120 s at sf0.1); the 3-shingle space
    // prunes as designed (~0.5M candidates), and hashing shingles to
    // 8-byte digests (the portable tokenHash fold the whole dedup family
    // uses, replayed exactly by the oracle) keeps every shuffle
    // digest-width — ShuffleBudgetSpec meters it. Verification is exact
    // array-intersect on candidate pairs only, O(candidates).
    "setsim_join" -> ((s, dir) => {
      val t = 0.5
      val base = graft.queries.PipelineQueries.stagedLshShingles(s, dir)
        .select(col("doc_id"), col("shs"),
          size(col("shs")).cast("long").as("n"))
      val e = base.select(col("doc_id"), col("n"),
        explode(col("shs")).as("sh"))
      val freq = e.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      // the prefix table feeds BOTH sides of the candidate self-join;
      // without the checkpoint the whole explode → df-join → window chain
      // (including a second full df aggregation) planned and ran TWICE —
      // the r15 plan dump shows the duplicated subtree (guide §2.4: two
      // operations keyed the same way share one materialization)
      val pref = e.join(freq, Seq("sh"))
        // explicit doc-keyed partition count: the exploded rows are
        // digest-width, so AQE coalesces the window exchange to 1-2
        // tasks and the per-doc rarest-first sort serializes (§2.5)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))))
        .filter(col("rk") <= col("n") - ceil(col("n") * lit(t)) + 1)
        .select(col("doc_id"), col("sh"), col("n"), col("rk"))
        .localCheckpoint()
      val cands = pref
        .select(col("doc_id").as("id_a"), col("sh"), col("n").as("na"),
          col("rk").as("rk_a"))
        .join(pref.select(col("doc_id").as("id_b"), col("sh"),
          col("n").as("nb"), col("rk").as("rk_b")), Seq("sh"))
        .filter(col("id_a") < col("id_b") &&
          col("na") >= lit(t) * col("nb") && col("nb") >= lit(t) * col("na") &&
          lit(1) + least(col("na") - col("rk_a"), col("nb") - col("rk_b")) >=
            ceil((col("na") + col("nb")) * lit(t / (1 + t))))
        // pair-level distinct BEFORE verification: a pair sharing several
        // prefix shingles would otherwise re-verify once per shared one
        .select(col("id_a"), col("id_b")).distinct()
        // pin the verification parallelism (guide §2.5): candidate pairs
        // are 16 bytes/row, so AQE's byte-based coalescing collapsed the
        // distinct output to one partition and the whole exact-intersect
        // pass (the query's dominant CPU, ~0.5M pairs at sf0.1) ran
        // single-task; the explicit pair-keyed count spreads it evenly at
        // any scale
        .repartition(s.sparkContext.defaultParallelism,
          col("id_a"), col("id_b"))
      val verified = cands
        .join(base.select(col("doc_id").as("id_a"), col("shs").as("sa"),
          col("n").as("na")), Seq("id_a"))
        .join(base.select(col("doc_id").as("id_b"), col("shs").as("sb"),
          col("n").as("nb")), Seq("id_b"))
        .withColumn("ix", size(array_intersect(col("sa"), col("sb"))))
        .withColumn("jac",
          round(col("ix") / (col("na") + col("nb") - col("ix")), 6))
        .filter(col("jac") >= t)
        .select(col("id_a"), col("id_b"), col("jac"))
        // pin the verified pairs BEFORE the oracle-parity total sort:
        // rangepartitioning's key-sampling pass otherwise re-executes the
        // whole exact-intersect child a second time (measured: the sort
        // doubled the query's dominant CPU at sf0.1)
        .localCheckpoint()
      verified.orderBy(col("id_a"), col("id_b"))
    }),

    // Late-interaction reranking (ColBERT MaxSim — Khattab & Zaharia
    // 2020): score(q, d) = Σ_{qtok} max_{dtok} cos(E(qtok), E(dtok)) —
    // token-level matching that survives typos and morphology where
    // pooled single-vector retrieval blurs them ("tabel"/"querys" still
    // land near "table"/"query"). Token embeddings here are the
    // deterministic char-histogram vectors (the documented O7 embedder
    // stand-in; a real checkpoint plugs in via the BatchedInference
    // path — MaxSim semantics are unchanged). Scale shape: the kernel
    // runs once per (VOCABULARY token × query token) — vocab-sized, not
    // corpus-sized — then docs pick up their tokens' scores through a
    // broadcast join and reduce with ONE max-per-query-column agg.
    // MaxSim is multiplicity-blind, so distinct (doc, tok) pairs
    // suffice; ranking compares the ROUNDED score (doc_id tiebreak) so
    // an ULP can't reorder the cut.
    "colbert_rerank" -> ((s, dir) => {
      GraftFunctions.register(s)
      val qToks = Seq("data", "tabel", "querys")
      val toks = stagedDocToks(s, dir)
        .select(col("doc_id"), explode(col("toks")).as("tok")).distinct()
      val vocab = toks.select(col("tok")).distinct()
        .withColumn("h", GraftFunctions.charHist(col("tok")))
      val scored = qToks.zipWithIndex.foldLeft(vocab) { case (df, (q, i)) =>
        df.withColumn(s"s$i",
          VectorOps.cosine(VectorOps.toDoubleArray(col("h")),
            VectorOps.toDoubleArray(GraftFunctions.charHist(lit(q)))))
      }.drop("h")
      toks.join(broadcast(scored), Seq("tok"))
        .groupBy(col("doc_id"))
        .agg(max(col("s0")).as("m0"), max(col("s1")).as("m1"),
          max(col("s2")).as("m2"))
        .select(col("doc_id"),
          round(col("m0") + col("m1") + col("m2"), 6).as("maxsim"))
        .orderBy(col("maxsim").desc, col("doc_id"))
        .limit(10)
    }),

    // Per-group heavy hitters — "top terms per language", the stopword/
    // boilerplate discovery cut: per-group MG sketches (typed Aggregator
    // UDAF) nominate, an exact recount against each language's own token
    // total decides. φ=0.038 ≥ 1/k=1/32 keeps the sketch guarantee.
    "heavy_hitters_by_group" -> ((s, dir) => {
      val toks = documents(s, dir)
        .select(col("lang"), explode(TextOps.tokens(col("text"))).as("tok"))
      graft.operators.HeavyHitters.heavyHittersByGroup(
        toks, col("lang"), col("tok"), k = 32, phi = 0.038)
    }),

    // Corpus snapshot diff — the data-ops release gate: what changed
    // between yesterday's corpus and today's? Both sides reduce to
    // (doc_id, fingerprint) digests map-side, meet in ONE full-outer
    // equi-join on doc_id, and classify added / removed / changed /
    // unchanged — text never shuffles. The "new" snapshot is simulated
    // deterministically (drop %11, edit %13, clone %17 under fresh ids)
    // so the fixture provably exercises all four statuses.
    "snapshot_diff" -> ((s, dir) => {
      val old = documents(s, dir).select(col("doc_id"), col("text"))
      val newSnap = old.filter(col("doc_id") % 11 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .unionByName(old.filter(col("doc_id") % 17 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(col("text"), lit(" new")).as("text")))
      val o = old.select(col("doc_id"), TextOps.fingerprint(col("text")).as("ofp"))
      val n = newSnap.select(col("doc_id"), TextOps.fingerprint(col("text")).as("nfp"))
      o.join(n, Seq("doc_id"), "full_outer")
        .select(when(col("nfp").isNull, "removed")
          .when(col("ofp").isNull, "added")
          .when(col("ofp") =!= col("nfp"), "changed")
          .otherwise("unchanged").as("status"))
        .groupBy(col("status")).agg(count(lit(1)).as("n_docs"))
        .orderBy(col("status"))
    }),

    // OVERLAPPING chunking — the RAG-prep face of the chunk family:
    // 128-token windows every 64 tokens (stride < window, so every
    // token belongs to two chunks and no retrieval-relevant span is
    // split across a hard boundary). Map-only explode of per-doc chunk
    // start sequences; the tail chunk is partial by design.
    "chunk_overlap" -> ((s, dir) =>
      documents(s, dir)
        .select(col("doc_id"),
          size(filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= ""))
            .as("n"))
        .select(col("doc_id"), col("n"),
          explode(sequence(lit(0), col("n") - 1, lit(64))).as("start"))
        .select(col("doc_id"), (col("start") / 64).cast("long").as("chunk_id"),
          col("start"), least(lit(128), col("n") - col("start")).as("len"))
        .orderBy(col("doc_id"), col("chunk_id"))),

    // VOCABULARY drift — the text twin of the numeric PSI monitor: KL
    // divergence between two corpus snapshots' unigram distributions
    // (Laplace-smoothed over the union vocabulary, so births/deaths
    // can't ln(0)), with the top-10 surging terms by contribution — the
    // "did the crawl shift?" alarm plus its explanation in one table.
    // Both snapshots reduce to vocabulary-sized count digests; the KL
    // total is an AGGREGATE broadcast back (never a global window over
    // the vocabulary — at web scale that vocabulary is itself large).
    // Same deterministic snapshot simulation as snapshot_diff.
    "vocab_kl" -> ((s, dir) => {
      val old = documents(s, dir).select(col("doc_id"), col("text"))
      val newSnap = old.filter(col("doc_id") % 11 =!= 0)
        .select(when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
        .unionByName(old.filter(col("doc_id") % 17 === 0)
          .select(concat(col("text"), lit(" new")).as("text")))
      def counts(df: org.apache.spark.sql.DataFrame, as: String) =
        df.select(explode(filter(split(lower(col("text")), "[^a-z0-9]+"),
            t => t =!= "")).as("term"))
          .groupBy(col("term")).agg(count(lit(1)).as(as))
      val joined = counts(old, "c_old")
        .join(counts(newSnap.toDF(), "c_new"), Seq("term"), "full_outer")
        .na.fill(0L, Seq("c_old", "c_new"))
      val tot = joined.agg(count(lit(1)).as("v"),
        sum(col("c_old")).as("n_old"), sum(col("c_new")).as("n_new"))
      val contrib = joined.crossJoin(broadcast(tot))
        .withColumn("p", (col("c_new") + 1).cast("double") / (col("n_new") + col("v")))
        .withColumn("q", (col("c_old") + 1).cast("double") / (col("n_old") + col("v")))
        .withColumn("raw", col("p") * log(col("p") / col("q")))
      val kl = contrib.agg(round(sum(col("raw")), 6).as("kl"))
      contrib.crossJoin(broadcast(kl))
        .select(col("term"), col("c_old"), col("c_new"),
          round(col("raw"), 6).as("contrib"), col("kl"))
        .orderBy(col("contrib").desc, col("term"))
        .limit(10)
    }),

    // Incremental face of the span dedup: odd doc_ids arrive against the
    // even-doc_id history index. Injected docs (every 7th) alternate
    // parity, so injected boilerplate provably matches history.
    "substring_dedup_incr" -> ((s, dir) => {
      val injected = documents(s, dir).select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(lit(SpanBoiler + " "), col("text")))
          .otherwise(col("text")).as("text"))
      val all = spread(injected)
      spanDupAgainstIndex(all.filter(col("doc_id") % 2 === 1),
        all.filter(col("doc_id") % 2 === 0), SpanW)
    }),

    // Token-BIGRAM LM scoring — charlm_bits lifted from characters to
    // token transitions (the KenLM-style perplexity filter, reduced to
    // bigrams with exact MLE probabilities so the oracle is closed-form):
    // P(cur|prev) = n(prev,cur)/n(prev) over the corpus; per-doc score is
    // bits per bigram under that model. Distributed shape: the staged
    // (doc, prev, cur) digest stream feeds BOTH the model aggregation and
    // the per-doc scorer; the model join key is the bigram — a shuffle
    // join on observed-bigram digests (vocabulary-bounded, never text).
    // High bits-per-bigram ≈ improbable transitions (shuffled text, spam).
    // Top collocations by pointwise mutual information over the staged
    // bigram digest: pmi(a,b) = ln(c(ab)·N / (c(a·)·c(·b))), min support
    // 5 — the phrase-mining signal (all ratios are exact integer products
    // under 2^53, so the double math is bit-identical cross-engine).
    // Three digest aggregates + digest joins; N enters as a broadcast
    // 1-row aggregate, the pagerank pattern.
    "pmi_topk" -> ((s, dir) => {
      val bg = stagedBigrams(s, dir)
      val ab = bg.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c_ab"))
      val a = bg.groupBy(col("prev")).agg(count(lit(1)).as("c_a"))
      val b = bg.groupBy(col("cur")).agg(count(lit(1)).as("c_b"))
      val nn = bg.agg(count(lit(1)).as("n_total"))
      ab.join(a, "prev").join(b, "cur").crossJoin(broadcast(nn))
        .filter(col("c_ab") >= 5)
        .withColumn("pmi",
          round(log(col("c_ab") * col("n_total") / (col("c_a") * col("c_b"))), 6))
        .select(col("prev"), col("cur"), col("c_ab"), col("pmi"))
        .orderBy(col("pmi").desc, col("prev"), col("cur"))
        .limit(20)
    }),

    "bigram_lm_bits" -> ((s, dir) => {
      // feeds model + scorer AND repeat invocations: tokenized once per
      // (session, dir)
      val bi = stagedBigrams(s, dir)
      val bgCounts = bi.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("n_bg"))
      val prevCounts = bgCounts.groupBy(col("prev")).agg(sum(col("n_bg")).as("n_prev"))
      val model = bgCounts.join(prevCounts, Seq("prev"))
        .select(col("prev"), col("cur"),
          (col("n_bg").cast("double") / col("n_prev")).as("p"))
      bi.groupBy(col("doc_id"), col("prev"), col("cur")).agg(count(lit(1)).as("n"))
        .join(model, Seq("prev", "cur"))
        .groupBy(col("doc_id"))
        .agg(sum(col("n")).as("n_bigrams"),
          round(-sum(col("n") * log(col("p")) / log(lit(2.0))) / sum(col("n")), 6)
            .as("bits_per_bigram"))
        .orderBy(col("doc_id"))
    }),

    // KNESER-NEY smoothed bigram LM (Kneser & Ney 1995; Chen & Goodman
    // 1999 — the interpolated absolute-discount form KenLM ships and the
    // CCNet corpus filter actually runs):
    //   p(cur|prev) = (n(prev,cur) − D)/n(prev·)
    //               + D·N1+(prev·)/n(prev·) · N1+(·cur)/N1+(··)
    // with D = 0.75 (exact in binary, so both engines discount the same
    // double). Where the MLE twin (`bigram_lm_bits`) assigns observed
    // transitions their raw frequency, KN re-ranks by CONTINUATION
    // diversity — "how many contexts does this word follow?" — the
    // property that makes it the standard perplexity filter smoothing.
    // All model inputs are integers (pair counts, distinct-continuation
    // counts); the corpus covers its own docs so every scored bigram has
    // n ≥ 1 and the discounted term stays positive without a max().
    // Distributed shape, same family as the MLE twin: the staged bigram
    // digest feeds four vocabulary-bounded aggregations (pair counts;
    // per-prev totals + distinct-continuation counts in ONE pass; per-cur
    // continuation counts; the 1-row type total), the model assembles via
    // digest-keyed joins, and docs reduce through one (doc, prev, cur)
    // partial-agg + model join — text never shuffles, and every agg
    // map-side combines, so at 100 TB only vocab²-bounded digests move.
    "kneser_ney_bits" -> ((s, dir) => {
      val bi = stagedBigrams(s, dir)
      bi.groupBy(col("doc_id"), col("prev"), col("cur")).agg(count(lit(1)).as("n"))
        .join(knModel(s, dir), Seq("prev", "cur"))
        .groupBy(col("doc_id"))
        .agg(sum(col("n")).as("n_bigrams"),
          round(-sum(col("n") * log(col("p")) / log(lit(2.0))) / sum(col("n")), 6)
            .as("kn_bits_per_bigram"))
        .orderBy(col("doc_id"))
    }),

    // WORD-VECTOR nearest neighbors off the trained PPMI-SVD embedding
    // table (operators/WordVec — Levy & Goldberg 2014 factorization,
    // Halko 2011 randomized solver): for the 5 highest-frequency words,
    // the top-5 cosine neighbors. Serving shape: the probe set broadcasts
    // against the vocab-sized vector table (model-sized, never corpus),
    // ranks cut per-probe on the ROUNDED score with a word tiebreak so a
    // last-bit ULP can't reorder cross-engine. The oracle replays cosine
    // over the SAME dumped vectors — training is never re-fit.
    "word_sim" -> ((s, dir) => {
      val path = graft.operators.WordVec.model(s, dir,
        sp => stagedBigrams(sp, dir))
      val vecs = s.read.parquet(path)
      val probes = vecs.orderBy(col("n_word").desc, col("word").asc).limit(5)
        .select(col("word").as("probe"), col("vec").as("pv"))
      def dot(a: Column, b: Column): Column =
        aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
      vecs.crossJoin(broadcast(probes))
        .filter(col("word") =!= col("probe"))
        .select(col("probe"), col("word"),
          round(dot(col("pv"), col("vec")) /
            (sqrt(dot(col("pv"), col("pv"))) * sqrt(dot(col("vec"), col("vec")))),
            6).as("cos"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("probe"))
            .orderBy(col("cos").desc, col("word").asc)).cast("long"))
        .filter(col("rank") <= 5)
        .orderBy(col("probe"), col("rank"))
    }),

    // WORD ANALOGY through the trained word-vector ANN index — the
    // serving COMPOSITION (WordVec × the IVF family): probe vectors
    // q = (v(a) − v(b)) + v(c) over deterministic top-frequency word
    // triples, cell-pruned against the KMeans layout trained ON the
    // dumped vectors (WordVec.annLayout), nprobe=2, top-5 by rounded
    // cosine with a word tiebreak, the probe's own three words excluded.
    // At a real million-word vocabulary this is the difference between a
    // full model pass per probe and nprobe/cells of it. Oracled by
    // dumped-vector + dumped-index replay — training never re-runs.
    "word_analogy" -> ((s, dir) => {
      import graft.operators.{Ann, WordVec}
      graft.expressions.GraftFunctions.register(s)
      val (layout, cents) = WordVec.annLayout(s, dir, sp => stagedBigrams(sp, dir))
      val probes = wordAnalogyProbes(s, dir)
      // probe-cell selection through the ONE assignment formula — pinned,
      // or the collect below and the broadcast join would each re-run it
      val probeCells = Ann.nearestCells(probes,
        Ann.centroidsDf(s, cents), "pid", "q", n = 2).localCheckpoint()
      // LITERAL cell filter (the Ivfpq.search pattern): the ≤ 2·|triples|
      // probed cells are driver-known index metadata, and the isin makes
      // the cell-partitioned layout PLAN only those directories — the
      // broadcast join alone row-prunes after a full-table scan, which at
      // a million-word vocabulary is the whole model per probe batch
      // (round-9 verdict). WordVecSpec pins the scanned file count.
      val cellIds = probeCells.select(col("cell")).distinct()
        .collect().map(_.getInt(0)).toSeq
      s.read.parquet(layout)
        .filter(col("cell").isin(cellIds: _*))
        .join(broadcast(probeCells), Seq("cell"))
        .filter(col("word") =!= col("wa") && col("word") =!= col("wb") &&
          col("word") =!= col("wc"))
        .withColumn("cos", round(
          graft.expressions.GraftFunctions.cosineSim(col("q"), col("vec")), 6))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("pid"))
            .orderBy(col("cos").desc, col("word").asc)).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("pid"), col("wa"), col("wb"), col("wc"), col("word"),
          col("cos"), col("rank"))
        .orderBy(col("pid"), col("rank"))
    }),

    // Recall audit of the indexed analogy serve vs the exact scan over
    // the full vector table — the same honesty check every ANN face in
    // the repo carries (ann_hnsw_recall, lsh_recall_audit). Both paths
    // replay from dumps, so the recall number itself is oracled.
    "word_analogy_recall" -> ((s, dir) => {
      import graft.operators.{Ann, WordVec}
      graft.expressions.GraftFunctions.register(s)
      val (layout, cents) = WordVec.annLayout(s, dir, sp => stagedBigrams(sp, dir))
      val probes = wordAnalogyProbes(s, dir)
      val vecs = s.read.parquet(WordVec.vectorsPath(dir))
      def ranked(cand: DataFrame): DataFrame = cand
        .filter(col("word") =!= col("wa") && col("word") =!= col("wb") &&
          col("word") =!= col("wc"))
        .withColumn("cos", round(
          graft.expressions.GraftFunctions.cosineSim(col("q"), col("vec")), 6))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("pid"))
            .orderBy(col("cos").desc, col("word").asc)))
        .filter(col("rank") <= 5)
        .select(col("pid"), col("word"))
      val exact = ranked(vecs.crossJoin(broadcast(probes)))
      val probeCells = Ann.nearestCells(probes,
        Ann.centroidsDf(s, cents), "pid", "q", n = 2).localCheckpoint()
      // same literal cell pruning as word_analogy — the recall audit must
      // measure the SAME physically-pruned serve it audits
      val cellIds = probeCells.select(col("cell")).distinct()
        .collect().map(_.getInt(0)).toSeq
      val appr = ranked(s.read.parquet(layout)
        .filter(col("cell").isin(cellIds: _*))
        .join(broadcast(probeCells), Seq("cell")))
      appr.join(exact, Seq("pid", "word"), "left_semi")
        .groupBy(col("pid"))
        .agg(count(lit(1)).as("n_hit"))
        .select(col("pid"), lit(5).as("k"), col("n_hit"),
          round(col("n_hit").cast("double") / 5.0, 6).as("recall"))
        .orderBy(col("pid"))
    }),

    // Spectrum audit of the dumped word-vector table: WᵀW = Σ by
    // construction (Q orthonormal, U rotation, columns scaled σ^½), so
    // per-component energy must descend — the "did the factorization
    // actually order its components" check, replayed by the oracle from
    // the same dump. One vocab-sized posexplode + digest agg.
    "wordvec_norms" -> ((s, dir) => {
      val path = graft.operators.WordVec.model(s, dir,
        sp => stagedBigrams(sp, dir))
      s.read.parquet(path)
        .select(posexplode(col("vec")).as(Seq("j", "y")))
        .groupBy(col("j").cast("long").as("j"))
        .agg(count(lit(1)).as("n_words"),
          round(sum(col("y") * col("y")), 6).as("energy"))
        .orderBy(col("j"))
    }),

    // RM3 pseudo-relevance feedback (Lavrenko & Croft 2001; Abdul-Jaleel
    // 2004 — the standard query-expansion recipe every Indri/Anserini
    // deployment ships): run the original query through BM25, take the
    // top-10 feedback docs, estimate the relevance model P(t|R) =
    // Σ_d w_d·tf(t,d)/dl_d with w_d = the doc's normalized BM25 score,
    // and interpolate with the uniform original-query model at λ=0.5.
    // The output is the expanded query itself — the term distribution a
    // second-pass retrieval would score with. Distributed shape: the
    // feedback set is a 10-row TakeOrdered shortlist broadcast back into
    // the staged tf digest; P(t|R) is one vocabulary-bounded aggregation
    // over the feedback docs' postings — the corpus text never moves, and
    // at 100 TB the tf rows touched are the 10 feedback docs' postings
    // only. Every ratio is doubles-from-integers; round-6 at the end.
    "rm3_expand" -> ((s, dir) => {
      val q = Seq("data", "table", "query")
      val fb = bm25Scores(s, dir, q)
        .orderBy(col("score").desc, col("doc_id").asc).limit(10)
        .select(col("doc_id"), col("score"))
      val tf = bm25Tf(s, dir)
      val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      val wTot = fb.agg(sum(col("score")).as("w_tot"))
      val rel = tf.join(broadcast(fb), Seq("doc_id"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(wTot))
        .groupBy(col("tok"))
        .agg(sum(col("score") / col("w_tot") * col("tf") / col("dl"))
          .as("p_rel"))
      // FULL outer with the original query model: an original term absent
      // from every feedback doc's postings must still carry its
      // 0.5·(1/|Q|) interpolation mass (RM3 keeps the query alive even
      // when feedback drifts) — an inner-only shape would silently drop it
      import s.implicits._
      val qm = q.toDF("tok").withColumn("p_orig", lit(1.0 / 3))
      rel.join(qm, Seq("tok"), "full_outer")
        .select(col("tok").as("term"),
          round(lit(0.5) * coalesce(col("p_orig"), lit(0.0)) +
            lit(0.5) * coalesce(col("p_rel"), lit(0.0)), 6).as("p_rm3"))
        .orderBy(col("p_rm3").desc, col("term"))
        .limit(15)
    }),

    // DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
    // Optimizing Data Mixtures Speeds Up Language Model Pretraining" —
    // one exponentiated-gradient step of the Group-DRO update): per
    // SOURCE domain, measure the EXCESS LOSS between a weak proxy model
    // (unigram MLE) and a strong reference model (the Kneser-Ney bigram
    // LM `kneser_ney_bits` ships), excess = max(0, uni_bits − kn_bits) —
    // the per-domain headroom a context model can still learn — then
    // update the mixture from the token-share prior: w ∝ share·exp(η·
    // excess), η = 1, normalized. Domains whose transitions are most
    // predictable-in-context get upweighted, the DoReMi signal. Shape:
    // both models are the vocabulary-bounded digests the LM queries
    // already stage; the only new reduction is (doc → source) rollup of
    // the per-doc digest, so nothing corpus-sized moves. Bits are rounded
    // 6 BEFORE the excess/exp so both engines exponentiate the same
    // double; the exp/ratio ULP is absorbed by the final round-6.
    "domain_reweight" -> ((s, dir) => {
      val bi = stagedBigrams(s, dir)
      val model = knModel(s, dir).withColumnRenamed("p", "p_kn")
      val uni = bi.groupBy(col("cur")).agg(count(lit(1)).as("n_cur"))
      val un = bi.agg(count(lit(1)).as("n_all"))
      val src = documents(s, dir).select(col("doc_id"), col("source"))
      val dom = bi.groupBy(col("doc_id"), col("prev"), col("cur"))
        .agg(count(lit(1)).as("n"))
        .join(model, Seq("prev", "cur"))
        .join(uni, Seq("cur"))
        .crossJoin(broadcast(un))
        .join(src, Seq("doc_id"))
        .groupBy(col("source"))
        .agg(sum(col("n")).as("n_bigrams"),
          round(-sum(col("n") * log(col("n_cur").cast("double") / col("n_all")) /
            log(lit(2.0))) / sum(col("n")), 6).as("uni_bits"),
          round(-sum(col("n") * log(col("p_kn")) / log(lit(2.0))) /
            sum(col("n")), 6).as("kn_bits"))
      // normalizers as window sums over the ≤#sources digest — computing
      // them as separate aggregates would re-derive the whole LM lineage
      // once per normalizer (measured 3× the query cost)
      val wAll = Window.partitionBy()
      dom
        .withColumn("excess",
          greatest(round(col("uni_bits") - col("kn_bits"), 6), lit(0.0)))
        .withColumn("w_raw", col("n_bigrams").cast("double") /
          sum(col("n_bigrams")).over(wAll) * exp(col("excess")))
        .select(col("source"), col("n_bigrams"), col("uni_bits"),
          col("kn_bits"), col("excess"),
          round(col("w_raw") / sum(col("w_raw")).over(wAll), 6).as("weight"))
        .orderBy(col("source"))
    }),

    // DSIR data selection (Xie et al. 2023 — the importance-resampling
    // recipe behind LLaMA-class corpus curation): score every raw doc by
    // how target-like its n-gram distribution is, llr(d) = Σ_f n_f(d) ·
    // [ln p̂_t(f) − ln p̂_r(f)] with add-one smoothing over the shared
    // feature space (no −∞ on target-unseen features), then keep the
    // top-k. Target here = the curated sources src0–src4; features = the
    // staged bigram digest (DSIR hashes n-grams into a BOUNDED bucket
    // space — that bound is why the model table broadcasts at 100 TB).
    // Scale shape: two vocab-sized count digests, one 1-row totals digest
    // joined by literal key (BHJ, not BNLJ), per-doc reduce via a
    // broadcast model join, TakeOrdered top-100 on the ROUNDED score.
    "dsir_select" -> ((s, dir) => {
      val bi = stagedBigrams(s, dir)
      val target = documents(s, dir)
        .filter(col("source").isin("src0", "src1", "src2", "src3", "src4"))
        .select(col("doc_id"))
      val rawC = bi.groupBy(col("prev"), col("cur"))
        .agg(count(lit(1)).as("n_r"))
      val tgtC = bi.join(broadcast(target), Seq("doc_id"))
        .groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("n_t"))
      val model = rawC.join(tgtC, Seq("prev", "cur"), "left")
        .na.fill(0L, Seq("n_t"))
        // vocab-sized digest with TWO consumers (the totals head and the
        // broadcast scored table) — staged once; unstaged, the whole
        // two-groupBy bigram lineage derived twice per run (r15 profile:
        // ~1.1 s of the query's 2.3 s was the duplicated first pass)
        .localCheckpoint()
      // totals are a 3-long digest — driver-side like every model scalar
      // (a lit()-key join here constant-folds into a BNLJ cross)
      val t = model
        .agg(sum(col("n_r")).as("nr_tot"), sum(col("n_t")).as("nt_tot"),
          count(lit(1)).as("v")).head()
      val (nrTot, ntTot, v) = (t.getLong(0), t.getLong(1), t.getLong(2))
      val scored = model
        .select(col("prev"), col("cur"),
          (log((col("n_t") + 1).cast("double") / lit(ntTot + v)) -
            log((col("n_r") + 1).cast("double") / lit(nrTot + v)))
            .as("llr_f"))
      bi.groupBy(col("doc_id"), col("prev"), col("cur"))
        .agg(count(lit(1)).as("n"))
        .join(broadcast(scored), Seq("prev", "cur"))
        .groupBy(col("doc_id"))
        .agg(sum(col("n")).cast("long").as("n_bigrams"),
          round(sum(col("n") * col("llr_f")) / sum(col("n")), 6)
            .as("llr_per_bigram"))
        .orderBy(col("llr_per_bigram").desc, col("doc_id"))
        .limit(100)
    }),

    // PII PSEUDONYMIZATION — the other half of the privacy story beside
    // redaction (`pii_scrub`): identity columns replaced with a STABLE
    // deterministic token ('u-' + md5 prefix), so analytics and joins
    // keep working (same user → same pseudonym, grouping by pseudonym ≡
    // grouping by user) while the raw identifier never leaves the
    // boundary. Map-only rewrite; the hash-match against the oracle's
    // identical md5 arithmetic proves cross-engine token stability.
    "pii_pseudonymize" -> ((s, dir) =>
      graft.Tables.events(s, dir)
        .select(concat(lit("u-"),
          substring(md5(col("user_id").cast("string")), 1, 12)).as("user_pseudo"),
          col("value"))
        .groupBy(col("user_pseudo"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("user_pseudo"))),

    // PII scrubbing: the redaction pass every released corpus gets. The
    // fixture text is clean, so deterministic synthetic PII (an email and
    // a phone derived from doc_id) is injected first; the scrubber then
    // counts and redacts it. Map-only projection — regex state is per-row,
    // no shuffle; patterns are kept in the RE2 ∩ java.util.regex dialect
    // so Spark and the DuckDB oracle agree byte-for-byte.
    "pii_scrub" -> ((s, dir) => {
      val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val phoneRe = "[0-9]{3}-[0-9]{4}"
      val tainted = documents(s, dir).select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("text"))
      tainted.select(col("doc_id"),
        regexp_count(col("text"), lit(emailRe)).as("n_emails"),
        regexp_count(col("text"), lit(phoneRe)).as("n_phones"),
        regexp_replace(regexp_replace(col("text"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>").as("scrubbed"))
        .orderBy(col("doc_id"))
    }),

    // Vocabulary coverage: ranked token counts with cumulative corpus
    // coverage — the "how big a vocab do we need" audit. The rank window
    // is global but runs over the AGGREGATED vocabulary (bounded by
    // distinct tokens, not corpus size), after a partial+final count agg;
    // fine at any corpus scale.
    "vocab_coverage" -> ((s, dir) => {
      val counts = spread(documents(s, dir))
        .select(explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      val total = counts.agg(sum(col("n")).as("total"))
      val w = Window.orderBy(col("n").desc, col("tok").asc)
      counts.crossJoin(broadcast(total))
        .withColumn("rank", row_number().over(w))
        .withColumn("cum", sum(col("n")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("rank") <= 30)
        .select(col("rank"), col("tok"), col("n"),
          round(col("cum").cast("double") / col("total"), 6).as("cum_frac"))
        .orderBy(col("rank"))
    }),

    // Token-count statistics per language.
    // Sequence-length bucketing — the batched-inference packing planner:
    // group docs into pad-to-multiple-of-64 length buckets and report the
    // padding efficiency (real tokens / padded slots) per bucket. This is
    // the table an inference scheduler reads to size batches: padding
    // waste is pure GPU burn, and bucketing by length is the standard
    // fix. One tokenize pass + one hash agg; map-side combinable.
    "length_buckets" -> ((s, dir) => {
      documents(s, dir)
        .withColumn("n_tokens", TextOps.tokenCount(col("text")))
        .withColumn("bucket", (ceil(col("n_tokens") / 64.0) * 64).cast("long"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("real_tokens"))
        .withColumn("padded_tokens", col("bucket") * col("n_docs"))
        .withColumn("efficiency",
          round(col("real_tokens") / col("padded_tokens"), 6))
        .orderBy(col("bucket"))
    }),

    "token_counts" -> ((s, dir) => {
      documents(s, dir)
        .withColumn("n_tokens", TextOps.tokenCount(col("text")))
        .groupBy(col("lang"))
        .agg(sum(col("n_tokens")).as("total_tokens"),
          round(avg(col("n_tokens")), 6).as("avg_tokens"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("lang"))
    }),

    // BPE vocabulary induction, round 1: the corpus collapses to a
    // word-frequency digest (one distributed agg), then adjacent-symbol
    // pair counts weighted by word freq — top-20 with a total (cnt desc,
    // pair) order. This is the aggregation every merge round re-runs.
    "bpe_pair_counts" -> ((s, dir) => {
      graft.operators.Bpe.pairCounts(
        graft.operators.Bpe.initState(wordFreqs(s, dir)))
        .orderBy(col("cnt").desc, col("pair").asc).limit(20)
    }),

    // The full distributed BPE merge loop (8 merges): per round one
    // vocab-sized pair-count agg + a SINGLE-ROW argmax collect + a
    // map-only replace-to-fixpoint application (see operators/Bpe.scala).
    // Oracled by the same loop unrolled in SQL — and the loop itself is
    // cross-validated against a canonical greedy BPE in BpeSpec.
    "bpe_merges" -> ((s, dir) =>
      graft.operators.Bpe.train(wordFreqs(s, dir), k = 8)
        .orderBy(col("merge_rank"))),

    // The apply half of BPE: tokenize the corpus with the 8 trained
    // merges (collected merge table = tokenizer artifact, KBs) — chained
    // map-only replace passes over the word digest, then a subword-token
    // count. Train + apply is the full tokenizer lifecycle.
    "bpe_tokenize" -> ((s, dir) => {
      val wf = wordFreqs(s, dir)
      val merges = graft.operators.Bpe.train(wf, k = 8)
        .orderBy(col("merge_rank")).collect().map(_.getString(1))
      val applied = merges.foldLeft(graft.operators.Bpe.initState(wf)) {
        (df, p) => df.withColumn("s", graft.operators.Bpe.applyMerge(col("s"), p))
      }
      applied
        .select(col("freq"), explode(split(trim(col("s")), "  ")).as("token"))
        .groupBy(col("token")).agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("token").asc).limit(20)
    }),

    // Unicode NFC canonicalization (native codegen expression). The corpus
    // fixture is ASCII, where NFC is the identity — so the query appends a
    // deterministic decomposed suffix (e+U+0301, U+212B, A+U+030A: three
    // distinct composition classes) to make the oracle non-vacuous: the
    // hash only matches if Spark's normalizer composes them exactly as
    // DuckDB's nfc_normalize does, shrinking 6 codepoints to 3.
    "text_normalize" -> ((s, dir) => {
      val raw = concat(substring(col("text"), 1, 24), lit("é Å Å"))
      documents(s, dir)
        .select(col("doc_id"),
          length(raw).as("n_raw"),
          TextOps.nfcNormalize(raw).as("norm"))
        .withColumn("n_norm", length(col("norm")))
        .orderBy(col("doc_id"))
    }),

    // Unigram-LM tokenizer, seed stage: the over-complete substring
    // candidate table EM starts from — one distributed explode+agg over
    // the word digest (operators/Unigram.scala).
    "unigram_seed" -> ((s, dir) =>
      graft.operators.Unigram.seedCounts(wordFreqs(s, dir))
        .orderBy(col("cnt").desc, col("piece").asc).limit(30)),

    // Unigram-LM tokenize: Viterbi best-segmentation scores of the top
    // digest words under the TRAINED (EM-fitted, pruned) model. The
    // trained (piece, logp) table is dumped parquet — the oracle replays
    // the identical DP over the dumped values (logp rounded at the model
    // boundary, so no transcendental is ever computed on both engines).
    "unigram_tokenize" -> ((s, dir) => {
      val path = graft.operators.Unigram.vocabLayout(s, dir,
        sp => wordFreqs(sp, dir))
      graft.operators.Unigram.tokenizeScores(
        wordFreqs(s, dir), s.read.parquet(path))
    })
  )

  /** The unigram Viterbi DP unrolled in DuckDB SQL: b_j(word) = best
    * log-prob of segmenting the first j chars, b_j = max over piece
    * lengths 1..MaxPieceLen of b_i + logp(word[i+1..j]) — CTE b_j joins
    * the union of b_{j-4}..b_{j-1}. Scores only (ties cannot affect the
    * max), over the DUMPED model table.
    */
  private def duckUnigramTokenize(topN: Int): String = {
    val M = graft.operators.Unigram.MaxPieceLen
    val L = graft.operators.Unigram.MaxWordLen
    // every CTE is MATERIALIZED: DuckDB inlines plain CTEs per reference,
    // and a 16-deep DP chain whose every step references 4 predecessors
    // would re-expand (and re-open the scans of) the whole prefix
    // exponentially — "Too many open files" in practice
    val bCtes = (1 to L).map { j =>
      val prevs = (math.max(0, j - M) until j)
        .map(i => s"SELECT word, s, $i AS i FROM b$i")
        .mkString(" UNION ALL ")
      s"""b$j AS MATERIALIZED (
         |  SELECT w.word, max(prev.s + v.logp) AS s
         |  FROM w JOIN ($prevs) prev USING (word)
         |  JOIN v ON v.piece = substring(w.word, prev.i + 1, $j - prev.i)
         |  WHERE length(w.word) >= $j
         |  GROUP BY w.word)""".stripMargin
    }.mkString(",\n")
    val finals = (1 to L).map(j => s"SELECT word, s, $j AS l FROM b$j")
      .mkString(" UNION ALL ")
    s"""WITH v AS MATERIALIZED (SELECT piece, logp FROM read_parquet('__UNI_VOCAB__/*.parquet')),
       |wf AS MATERIALIZED (SELECT t AS word, count(*)::BIGINT AS freq
       |       FROM documents, unnest(${duckToks("text")}) AS u(t) GROUP BY t),
       |w AS MATERIALIZED (SELECT word, freq FROM wf WHERE length(word) <= $L
       |      ORDER BY freq DESC, word ASC LIMIT $topN),
       |b0 AS MATERIALIZED (SELECT word, 0.0::DOUBLE AS s FROM w),
       |$bCtes,
       |fin AS ($finals)
       |SELECT w.word, w.freq, round(f.s, 6) AS score
       |FROM w JOIN fin f ON f.word = w.word AND f.l = length(w.word)
       |ORDER BY w.word""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "textrank_keywords" -> {
      def iter(prev: String, out: String): String =
        s"""$out AS (
           |  SELECT nd.id, (0.15 / nn.n) + 0.85 * coalesce(f.inflow, 0.0) AS pr
           |  FROM nodes nd CROSS JOIN nn
           |  LEFT JOIN (
           |    SELECT e.dst AS id, sum(p.pr / d.deg) AS inflow
           |    FROM edges e
           |    JOIN deg d ON d.src = e.src
           |    JOIN $prev p ON p.id = e.src
           |    GROUP BY e.dst) f ON f.id = nd.id)""".stripMargin
      s"""WITH tl AS (
         |  SELECT doc_id, ${duckToks("text")} AS t
         |  FROM documents WHERE doc_id < 50),
         |toks AS (
         |  SELECT doc_id, unnest(t) AS tok,
         |    unnest(generate_series(0, len(t) - 1)) AS pos
         |  FROM tl),
         |pairs AS (
         |  SELECT DISTINCT least(a.tok, b.tok) AS id_a,
         |    greatest(a.tok, b.tok) AS id_b
         |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id
         |    AND b.pos > a.pos AND b.pos - a.pos <= 2 AND a.tok <> b.tok),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         |nodes AS (SELECT DISTINCT tok AS id FROM toks),
         |nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
         |pr0 AS (SELECT id, 1.0 / nn.n AS pr FROM nodes CROSS JOIN nn),
         |${iter("pr0", "pr1")},
         |${iter("pr1", "pr2")},
         |${iter("pr2", "pr3")}
         |SELECT id AS word, round(pr, 6) AS pr FROM pr3
         |ORDER BY round(pr, 6) DESC, id ASC LIMIT 10""".stripMargin
    },

    "k_anonymity" ->
      """SELECT lang, source, n_chars // 100 AS len_bucket,
        |  count(*) AS n, count(*) < 5 AS at_risk
        |FROM documents
        |GROUP BY lang, source, len_bucket
        |ORDER BY lang, source, len_bucket""".stripMargin,

    "dp_counts" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |u AS (SELECT lang, n,
        |        round(('0x' || substr(md5(lang), 1, 15))::BIGINT::DOUBLE
        |          / 1152921504606846976.0, 9) AS u
        |      FROM c)
        |SELECT lang, n,
        |  round(n + CASE WHEN u < 0.5 THEN ln(2.0 * u)
        |                 ELSE -ln(2.0 * (1.0 - u)) END, 4) AS noisy_n
        |FROM u ORDER BY lang""".stripMargin,

    "readability" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    len(${duckToks("text")})::DOUBLE AS n_words,
         |    greatest(1, len(regexp_extract_all(text, '[.!?]+')))::DOUBLE AS n_sents,
         |    len(regexp_extract_all(lower(text), '[aeiouy]+'))::DOUBLE AS n_sylls
         |  FROM documents)
         |SELECT doc_id, n_words, n_sents, n_sylls,
         |  round(206.835 - 1.015 * n_words / n_sents
         |    - 84.6 * n_sylls / n_words, 4) AS flesch
         |FROM f WHERE n_words > 0 ORDER BY doc_id""".stripMargin,

    "rank_normalize" ->
      """SELECT doc_id, lang, n_chars,
        |  round(percent_rank() OVER (PARTITION BY lang ORDER BY n_chars),
        |    6) AS pct_rank
        |FROM documents ORDER BY doc_id""".stripMargin,

    "unigram_seed" -> {
      val M = graft.operators.Unigram.MaxPieceLen
      s"""WITH wf AS (
         |  SELECT t AS word, count(*)::BIGINT AS freq
         |  FROM documents, unnest(${duckToks("text")}) AS u(t) GROUP BY t),
         |sub AS (
         |  SELECT substring(word, i, l) AS piece, sum(freq)::BIGINT AS cnt
         |  FROM wf,
         |    unnest(generate_series(1, length(word))) AS S(i),
         |    unnest(generate_series(1, $M)) AS L(l)
         |  WHERE i + l - 1 <= length(word)
         |  GROUP BY 1)
         |SELECT piece, cnt FROM sub ORDER BY cnt DESC, piece LIMIT 30""".stripMargin
    },

    "unigram_tokenize" -> duckUnigramTokenize(20),

    "bpe_pair_counts" ->
      s"""WITH w AS (
         |  SELECT t AS word, count(*)::BIGINT AS freq
         |  FROM documents, unnest(${duckToks("text")}) AS u(t) GROUP BY t)
         |SELECT substring(word, i, 1) || ' ' || substring(word, i + 1, 1) AS pair,
         |  sum(freq)::BIGINT AS cnt
         |FROM w, unnest(generate_series(1, length(word) - 1)) AS g(i)
         |GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 20""".stripMargin,

    "bpe_merges" -> duckBpeMerges(8),

    "bpe_tokenize" -> duckBpeTokenize(8),

    "text_normalize" ->
      """SELECT doc_id,
        |  length(substring(text, 1, 24) || 'é Å Å') AS n_raw,
        |  nfc_normalize(substring(text, 1, 24) || 'é Å Å') AS norm,
        |  length(nfc_normalize(substring(text, 1, 24) || 'é Å Å')) AS n_norm
        |FROM documents ORDER BY doc_id""".stripMargin,

    "dedup_exact" ->
      s"""WITH all_docs AS ($doubledDocsSql),
         |fps AS (SELECT doc_id, ${duckFingerprint("text")} AS fp FROM all_docs)
         |SELECT fp, min(doc_id) AS keeper, count(*) AS n
         |FROM fps GROUP BY fp ORDER BY keeper""".stripMargin,

    "dedup_keep_first" ->
      s"""WITH all_docs AS ($doubledDocsSql),
         |fps AS (SELECT doc_id, ${duckFingerprint("text")} AS fp FROM all_docs),
         |keepers AS (SELECT min(doc_id) AS doc_id FROM fps GROUP BY fp)
         |SELECT f.doc_id FROM fps f
         |WHERE EXISTS (SELECT 1 FROM keepers k WHERE k.doc_id = f.doc_id)
         |ORDER BY f.doc_id""".stripMargin,

    "ngram_jaccard" ->
      s"""WITH t AS (
         |  SELECT doc_id, list_distinct(${duckToks("text")}) AS toks
         |  FROM documents WHERE doc_id < 20)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  round(CASE WHEN len(list_distinct(list_concat(a.toks, b.toks))) = 0 THEN 0.0
         |    ELSE len(list_intersect(a.toks, b.toks))::DOUBLE
         |       / len(list_distinct(list_concat(a.toks, b.toks)))::DOUBLE END, 6) AS jacc
         |FROM t a JOIN t b ON a.doc_id < b.doc_id
         |ORDER BY id_a, id_b""".stripMargin,

    "edit_distance_pairs" ->
      s"""WITH t AS (
         |  SELECT doc_id, substring(text, 1, 80) AS prefix
         |  FROM documents WHERE doc_id < 40)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  levenshtein(a.prefix, b.prefix) AS dist,
         |  round(1.0 - levenshtein(a.prefix, b.prefix)::DOUBLE
         |    / greatest(length(a.prefix), length(b.prefix)), 6) AS sim
         |FROM t a JOIN t b ON a.doc_id < b.doc_id
         |WHERE round(1.0 - levenshtein(a.prefix, b.prefix)::DOUBLE
         |    / greatest(length(a.prefix), length(b.prefix)), 6) >= 0.3
         |ORDER BY id_a, id_b""".stripMargin,

    "winnow_dedup" ->
      s"""WITH src AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id < 100
         |  UNION ALL SELECT doc_id + 10000, text FROM documents WHERE doc_id < 100),
         |cleaned AS (
         |  SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS cs
         |  FROM src),
         |grams AS (
         |  SELECT doc_id, cs,
         |    unnest(generate_series(1, greatest(length(cs) - 7, 0))) AS i
         |  FROM cleaned),
         |hashed AS (
         |  SELECT doc_id, i, length(cs) - 7 AS g,
         |    list_reduce(list_prepend(0::BIGINT,
         |      list_transform(generate_series(i, i + 7), j -> ascii(substr(cs, j, 1))::BIGINT)),
         |      (acc, c) -> (acc * 31 + c) % 1000000007) AS h
         |  FROM grams),
         |wins AS (
         |  SELECT doc_id, i, g,
         |    min(h) OVER (PARTITION BY doc_id ORDER BY i
         |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
         |  FROM hashed),
         |fps AS (SELECT DISTINCT doc_id, fp FROM wins WHERE i <= g - 3),
         |sizes AS (SELECT doc_id, count(*) AS n_fp FROM fps GROUP BY doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
         |  FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT p.id_a, p.id_b, p.n_shared,
         |  round(p.n_shared::DOUBLE / (sa.n_fp + sb.n_fp - p.n_shared), 6) AS resemblance
         |FROM pairs p
         |JOIN sizes sa ON sa.doc_id = p.id_a
         |JOIN sizes sb ON sb.doc_id = p.id_b
         |WHERE round(p.n_shared::DOUBLE / (sa.n_fp + sb.n_fp - p.n_shared), 6) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,

    "embedding_neardup" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(${VectorQueries.duckCosine("a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]")}, 6) AS sim
         |FROM embeddings a JOIN embeddings b
         |  ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE round(${VectorQueries.duckCosine("a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]")}, 6) >= 0.25
         |ORDER BY id_a, id_b""".stripMargin,

    "lang_id" -> {
      val t = duckToks("text")
      val (en, de, fr, es) = (duckLangScore(t, "en"), duckLangScore(t, "de"),
        duckLangScore(t, "fr"), duckLangScore(t, "es"))
      s"""SELECT doc_id, lang,
         |  $en AS en_score, $de AS de_score, $fr AS fr_score, $es AS es_score,
         |  CASE
         |    WHEN $en > 0 AND $en >= $de AND $en >= $fr AND $en >= $es THEN 'en'
         |    WHEN $de > 0 AND $de >= $fr AND $de >= $es THEN 'de'
         |    WHEN $fr > 0 AND $fr >= $es THEN 'fr'
         |    WHEN $es > 0 THEN 'es'
         |    ELSE 'und'
         |  END AS lang_pred
         |FROM documents
         |ORDER BY doc_id""".stripMargin
    },

    "quality_scores" -> {
      val t = duckToks("text")
      val stops = TextOps.Stopwords.map(w => s"'$w'").mkString(", ")
      val stopRatio =
        s"""CASE WHEN len($t) = 0 THEN 0.0
           | ELSE len(list_filter($t, x -> list_contains([$stops], x)))::DOUBLE / len($t)::DOUBLE END""".stripMargin
      val digitRatio =
        s"""CASE WHEN length(text) = 0 THEN 0.0
           | ELSE length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE / length(text)::DOUBLE END""".stripMargin
      s"""SELECT doc_id, n_chars, length(text) AS c_len,
         |  len($t) AS n_tokens,
         |  round(CASE WHEN len($t) = 0 THEN 0.0
         |    ELSE list_sum(list_transform($t, x -> length(x)))::DOUBLE / len($t)::DOUBLE END, 6) AS mean_tok_len,
         |  round($digitRatio, 6) AS digit_ratio,
         |  round(CASE WHEN length(text) = 0 THEN 0.0
         |    ELSE length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / length(text)::DOUBLE END, 6) AS alpha_ratio,
         |  round($stopRatio, 6) AS stopword_ratio,
         |  round((least(length(text)::DOUBLE / 500.0, 1.0)
         |       + (1.0 - least($digitRatio * 5.0, 1.0))
         |       + least($stopRatio * 4.0, 1.0)) / 3.0, 6) AS quality
         |FROM documents
         |ORDER BY doc_id""".stripMargin
    },

    "pmi_topk" ->
      s"""WITH t AS (SELECT ${duckToks("text")} AS toks FROM documents),
         |bg AS (
         |  SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
         |    i -> struct_pack(prev := toks[i], cur := toks[i+1]))) AS b
         |  FROM t WHERE len(toks) >= 2),
         |bgf AS (SELECT b.prev AS prev, b.cur AS cur FROM bg),
         |ab AS (SELECT prev, cur, count(*) AS c_ab FROM bgf GROUP BY prev, cur),
         |ua AS (SELECT prev, count(*) AS c_a FROM bgf GROUP BY prev),
         |ub AS (SELECT cur, count(*) AS c_b FROM bgf GROUP BY cur),
         |nn AS (SELECT count(*) AS n_total FROM bgf)
         |SELECT ab.prev, ab.cur, ab.c_ab,
         |  round(ln(ab.c_ab * nn.n_total / (ua.c_a * ub.c_b)), 6) AS pmi
         |FROM ab JOIN ua USING (prev) JOIN ub USING (cur) CROSS JOIN nn
         |WHERE ab.c_ab >= 5
         |ORDER BY pmi DESC, prev, cur
         |LIMIT 20""".stripMargin,

    "word_bigram_topk" ->
      s"""WITH t AS (SELECT ${duckToks("text")} AS toks FROM documents),
         |b AS (
         |  SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
         |    i -> toks[i] || ' ' || toks[i+1])) AS bigram
         |  FROM t WHERE len(toks) >= 2)
         |SELECT bigram, count(*) AS n
         |FROM b GROUP BY bigram
         |ORDER BY n DESC, bigram ASC
         |LIMIT 20""".stripMargin,

    "repetition_filter" ->
      s"""WITH t AS (SELECT doc_id, ${duckToks("text")} AS toks FROM documents),
         |uni AS (
         |  SELECT doc_id, sum(n)::BIGINT AS n_tokens, count(*) AS n_types,
         |         max(n)::BIGINT AS top_tok_n
         |  FROM (SELECT doc_id, tok, count(*) AS n
         |        FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
         |        GROUP BY doc_id, tok) GROUP BY doc_id),
         |tri AS (
         |  SELECT doc_id, sum(n)::BIGINT AS n_tri,
         |         sum(CASE WHEN n > 1 THEN n ELSE 0 END)::BIGINT AS dup_tri
         |  FROM (SELECT doc_id, g, count(*) AS n
         |        FROM (SELECT doc_id,
         |                unnest(list_transform(generate_series(1, len(toks) - 2),
         |                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
         |              FROM t WHERE len(toks) >= 3)
         |        GROUP BY doc_id, g) GROUP BY doc_id)
         |SELECT uni.doc_id, n_tokens,
         |  round(n_types::DOUBLE / n_tokens, 6) AS ttr,
         |  round(top_tok_n::DOUBLE / n_tokens, 6) AS top_tok_frac,
         |  round(coalesce(dup_tri::DOUBLE / n_tri, 0.0), 6) AS dup_trigram_frac,
         |  (round(top_tok_n::DOUBLE / n_tokens, 6) <= 0.2
         |   AND round(coalesce(dup_tri::DOUBLE / n_tri, 0.0), 6) <= 0.3) AS keep
         |FROM uni LEFT JOIN tri ON uni.doc_id = tri.doc_id
         |ORDER BY uni.doc_id""".stripMargin,

    "curated_corpus" ->
      s"""WITH src AS (
         |  SELECT doc_id, lang, text FROM documents
         |  UNION ALL SELECT doc_id + 10000, lang, text FROM documents),
         |f AS (
         |  SELECT doc_id, lang,
         |    ${duckFingerprint("text")} AS fp,
         |    len(${duckToks("text")})::BIGINT AS n_tok,
         |    round(CASE WHEN length(text) = 0 THEN 0.0
         |      ELSE length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE
         |           / length(text) END, 6) AS digit_ratio
         |  FROM src),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
         |  FROM f)
         |SELECT doc_id, lang, n_tok, digit_ratio FROM r
         |WHERE rn = 1 AND n_tok BETWEEN 10 AND 512 AND digit_ratio <= 0.2
         |ORDER BY doc_id""".stripMargin,

    "sparse_search" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(${duckToks("text")}) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN ('data', 'table', 'query') GROUP BY doc_id, term),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |n AS (SELECT count(*)::DOUBLE AS nd FROM documents)
         |SELECT doc_id, round(sum(tf * ln(nd / df)), 6) AS score
         |FROM tf JOIN df USING (term) CROSS JOIN n
         |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    // delete replay: re-derive the engine's victim (the full-corpus
    // top-1 of the same panel), then rerun the search with that doc
    // subtracted and N decremented — exactly the merge-on-read state the
    // engine serves through the tombstone sidecar
    "sparse_search_deleted" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(${duckToks("text")}) AS term FROM documents),
         |tf0 AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |        WHERE term IN ('data', 'table', 'query') GROUP BY doc_id, term),
         |df0 AS (SELECT term, count(*) AS df FROM tf0 GROUP BY term),
         |n0 AS (SELECT count(*)::DOUBLE AS nd FROM documents),
         |victim AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, round(sum(tf * ln(nd / df)), 6) AS score
         |    FROM tf0 JOIN df0 USING (term) CROSS JOIN n0
         |    GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 1)),
         |tf AS (SELECT * FROM tf0
         |       WHERE doc_id NOT IN (SELECT doc_id FROM victim)),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |n AS (SELECT (count(*) - 1)::DOUBLE AS nd FROM documents)
         |SELECT doc_id, round(sum(tf * ln(nd / df)), 6) AS score
         |FROM tf JOIN df USING (term) CROSS JOIN n
         |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    // stats replay over the dumped artifact itself (not recomputed from
    // documents — the file count is physical layout state): same
    // per-bucket aggregates, same rounded dead-ratio, same CASE
    "postings_stats" ->
      s"""WITH posts AS (
         |  SELECT bucket::INTEGER AS bucket, term, doc_id, filename
         |  FROM read_parquet('__INVIDX_MAINT__/*/*.parquet',
         |         filename=true, hive_partitioning=true)),
         |tombs AS (SELECT DISTINCT doc_id
         |          FROM read_parquet('__INVIDX_MAINT_TOMB__/*.parquet')),
         |agg AS (
         |  SELECT bucket, count(DISTINCT term) AS n_terms, count(*) AS n_postings,
         |    sum(CASE WHEN doc_id IN (SELECT doc_id FROM tombs)
         |             THEN 1 ELSE 0 END) AS dead_postings,
         |    count(DISTINCT filename) AS n_files
         |  FROM posts GROUP BY bucket),
         |r AS (SELECT *, round(dead_postings::DOUBLE / n_postings, 6) AS dead_ratio
         |      FROM agg)
         |SELECT bucket, n_terms::BIGINT AS n_terms, n_postings::BIGINT AS n_postings,
         |  dead_postings::BIGINT AS dead_postings, n_files::BIGINT AS n_files,
         |  dead_ratio,
         |  CASE WHEN dead_ratio > ${graft.operators.InvertedIndex.MaintDeadRatio}
         |         OR n_files > ${graft.operators.InvertedIndex.MaintFilesPerBucket}
         |       THEN 'compact' ELSE 'serve' END AS decision
         |FROM r ORDER BY bucket""".stripMargin,

    "chunk_overlap" ->
      s"""WITH t AS (
         |  SELECT doc_id, len(${duckToks("text")}) AS n FROM documents),
         |st AS (
         |  SELECT doc_id, n, unnest(generate_series(0, n - 1, 64)) AS start
         |  FROM t)
         |SELECT doc_id, (start // 64)::BIGINT AS chunk_id, start::INTEGER AS start,
         |  least(128, n - start)::INTEGER AS len
         |FROM st ORDER BY doc_id, chunk_id""".stripMargin,

    "vocab_kl" ->
      s"""WITH oldc AS (
         |  SELECT term, count(*) AS c_old FROM (
         |    SELECT unnest(${duckToks("text")}) AS term FROM documents)
         |  GROUP BY term),
         |newdocs AS (
         |  SELECT CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
         |  FROM documents WHERE doc_id % 11 <> 0
         |  UNION ALL
         |  SELECT text || ' new' FROM documents WHERE doc_id % 17 = 0),
         |newc AS (
         |  SELECT term, count(*) AS c_new FROM (
         |    SELECT unnest(${duckToks("text")}) AS term FROM newdocs)
         |  GROUP BY term),
         |joined AS (
         |  SELECT coalesce(o.term, n.term) AS term,
         |    coalesce(o.c_old, 0) AS c_old, coalesce(n.c_new, 0) AS c_new
         |  FROM oldc o FULL OUTER JOIN newc n ON o.term = n.term),
         |tot AS (SELECT count(*) AS v, sum(c_old) AS n_old, sum(c_new) AS n_new
         |        FROM joined),
         |contrib AS (
         |  SELECT term, c_old, c_new,
         |    ((c_new + 1)::DOUBLE / (n_new + v)) *
         |      ln(((c_new + 1)::DOUBLE / (n_new + v)) /
         |         ((c_old + 1)::DOUBLE / (n_old + v))) AS raw
         |  FROM joined CROSS JOIN tot),
         |kl AS (SELECT round(sum(raw), 6) AS kl FROM contrib)
         |SELECT term, c_old::BIGINT AS c_old, c_new::BIGINT AS c_new,
         |  round(raw, 6) AS contrib, kl.kl
         |FROM contrib CROSS JOIN kl
         |ORDER BY contrib DESC, term LIMIT 10""".stripMargin,

    "bool_search" ->
      s"""WITH toks AS (
         |  SELECT DISTINCT doc_id, unnest(${duckToks("text")}) AS term
         |  FROM documents)
         |SELECT doc_id FROM toks WHERE term = 'data'
         |INTERSECT SELECT doc_id FROM toks WHERE term = 'table'
         |EXCEPT SELECT doc_id FROM toks WHERE term = 'join'
         |ORDER BY doc_id""".stripMargin,

    "snippet_extract" ->
      s"""WITH base AS (
         |  SELECT doc_id, ${duckToks("text")} AS l FROM documents),
         |toks AS (
         |  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS i
         |  FROM base),
         |firstpos AS (
         |  SELECT doc_id, min(i) AS p1 FROM toks
         |  WHERE term = 'column' GROUP BY doc_id)
         |SELECT f.doc_id, f.p1::INTEGER AS pos,
         |  array_to_string(b.l[greatest(f.p1 - 3, 1) : f.p1 + 3], ' ') AS snippet
         |FROM firstpos f JOIN base b USING (doc_id)
         |ORDER BY f.doc_id""".stripMargin,

    // Consecutive-position replay: DuckDB subscripts are 1-based and
    // Spark's posexplode 0-based, but adjacency (b.i = a.i + 1) is
    // base-independent.
    "phrase_search" ->
      s"""WITH base AS (
         |  SELECT doc_id, ${duckToks("text")} AS l FROM documents),
         |toks AS (
         |  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS i
         |  FROM base)
         |SELECT a.doc_id, count(*)::INTEGER AS n_matches
         |FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
         |WHERE a.term = 'window' AND b.term = 'join'
         |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin,

    "sparse_search_batch" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(${duckToks("text")}) AS term FROM documents),
         |qt(qid, term) AS (VALUES (1, 'data'), (1, 'table'),
         |                         (2, 'query'), (2, 'join'), (3, 'scan')),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |       WHERE term IN (SELECT term FROM qt) GROUP BY doc_id, term),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |n AS (SELECT count(*)::DOUBLE AS nd FROM documents),
         |scored AS (
         |  SELECT qt.qid::BIGINT AS qid, tf.doc_id,
         |    round(sum(tf.tf * ln(nd / df.df)), 6) AS score
         |  FROM tf JOIN qt USING (term) JOIN df USING (term) CROSS JOIN n
         |  GROUP BY qt.qid, tf.doc_id),
         |r AS (SELECT qid, doc_id, score,
         |        row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rn
         |      FROM scored)
         |SELECT qid, doc_id, score FROM r WHERE rn <= 5
         |ORDER BY qid, score DESC, doc_id""".stripMargin,

    "term_lookup" ->
      s"""SELECT doc_id, count(*)::BIGINT AS tf
         |FROM (SELECT doc_id, unnest(${duckToks("text")}) AS term FROM documents)
         |WHERE term = 'column'
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "bm25_search" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(${duckToks("text")}) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
         |dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id),
         |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
         |df AS (
         |  SELECT tok, count(*) AS df FROM tf
         |  WHERE tok IN ('data', 'table', 'query') GROUP BY tok),
         |scored AS (
         |  SELECT t.doc_id,
         |    ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
         |      * (t.tf * 2.2) / (t.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl)) AS contrib
         |  FROM tf t
         |  JOIN dl l ON l.doc_id = t.doc_id
         |  JOIN df d ON d.tok = t.tok
         |  CROSS JOIN stats s
         |  WHERE t.tok IN ('data', 'table', 'query'))
         |SELECT doc_id, round(sum(contrib), 6) AS score, count(*) AS n_terms_hit
         |FROM scored GROUP BY doc_id
         |ORDER BY score DESC, doc_id ASC
         |LIMIT 10""".stripMargin,

    // Same replay as hybrid_rrf, with the lang predicate applied BEFORE
    // each retriever's row_number ranking (pre-filter) and the BM25/
    // embedding statistics left corpus-wide — mirroring the Spark side's
    // stats-scope decision exactly.
    "hybrid_rrf_filtered" ->
      s"""WITH ${VectorQueries.duckEmbedCteAs("q", "'query: data table query'", "WHERE d0.doc_id = 0")},
         |${VectorQueries.duckEmbedCteAs("p", "'passage: ' || d0.text")},
         |allowed AS (SELECT doc_id FROM documents WHERE lang = 'en'),
         |sem AS (
         |  SELECT p.doc_id, round(sum(p.weight * q.weight), 6) AS sim
         |  FROM pemb p JOIN qemb q ON p.bucket = q.bucket
         |  GROUP BY p.doc_id),
         |semr AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id ASC) AS sem_rnk
         |  FROM sem WHERE doc_id IN (SELECT doc_id FROM allowed)),
         |toks AS (
         |  SELECT doc_id, unnest(${duckToks("text")}) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
         |dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id),
         |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
         |df AS (
         |  SELECT tok, count(*) AS df FROM tf
         |  WHERE tok IN ('data', 'table', 'query') GROUP BY tok),
         |scored AS (
         |  SELECT t.doc_id,
         |    ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
         |      * (t.tf * 2.2) / (t.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl)) AS contrib
         |  FROM tf t
         |  JOIN dl l ON l.doc_id = t.doc_id
         |  JOIN df d ON d.tok = t.tok
         |  CROSS JOIN stats s
         |  WHERE t.tok IN ('data', 'table', 'query')),
         |lex AS (
         |  SELECT doc_id, round(sum(contrib), 6) AS score FROM scored GROUP BY doc_id),
         |lexr AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS lex_rnk
         |  FROM lex WHERE doc_id IN (SELECT doc_id FROM allowed))
         |SELECT coalesce(l.doc_id, s.doc_id) AS doc_id, l.lex_rnk, s.sem_rnk,
         |  round(coalesce(1.0 / (60 + l.lex_rnk), 0.0)
         |      + coalesce(1.0 / (60 + s.sem_rnk), 0.0), 6) AS rrf
         |FROM (SELECT * FROM lexr WHERE lex_rnk <= 20) l
         |FULL OUTER JOIN (SELECT * FROM semr WHERE sem_rnk <= 20) s
         |  ON l.doc_id = s.doc_id
         |ORDER BY rrf DESC, doc_id ASC
         |LIMIT 10""".stripMargin,

    "hybrid_rrf" ->
      s"""WITH ${VectorQueries.duckEmbedCteAs("q", "'query: data table query'", "WHERE d0.doc_id = 0")},
         |${VectorQueries.duckEmbedCteAs("p", "'passage: ' || d0.text")},
         |sem AS (
         |  SELECT p.doc_id, round(sum(p.weight * q.weight), 6) AS sim
         |  FROM pemb p JOIN qemb q ON p.bucket = q.bucket
         |  GROUP BY p.doc_id),
         |semr AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id ASC) AS sem_rnk
         |  FROM sem),
         |toks AS (
         |  SELECT doc_id, unnest(${duckToks("text")}) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
         |dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id),
         |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
         |df AS (
         |  SELECT tok, count(*) AS df FROM tf
         |  WHERE tok IN ('data', 'table', 'query') GROUP BY tok),
         |scored AS (
         |  SELECT t.doc_id,
         |    ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
         |      * (t.tf * 2.2) / (t.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl)) AS contrib
         |  FROM tf t
         |  JOIN dl l ON l.doc_id = t.doc_id
         |  JOIN df d ON d.tok = t.tok
         |  CROSS JOIN stats s
         |  WHERE t.tok IN ('data', 'table', 'query')),
         |lex AS (
         |  SELECT doc_id, round(sum(contrib), 6) AS score FROM scored GROUP BY doc_id),
         |lexr AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS lex_rnk
         |  FROM lex)
         |SELECT coalesce(l.doc_id, s.doc_id) AS doc_id, l.lex_rnk, s.sem_rnk,
         |  round(coalesce(1.0 / (60 + l.lex_rnk), 0.0)
         |      + coalesce(1.0 / (60 + s.sem_rnk), 0.0), 6) AS rrf
         |FROM (SELECT * FROM lexr WHERE lex_rnk <= 20) l
         |FULL OUTER JOIN (SELECT * FROM semr WHERE sem_rnk <= 20) s
         |  ON l.doc_id = s.doc_id
         |ORDER BY rrf DESC, doc_id ASC
         |LIMIT 10""".stripMargin,

    "approx_topk_ops" ->
      s"""WITH toks AS (SELECT unnest(${duckToks("text")}) AS tok FROM documents),
         |c AS (SELECT tok AS item, count(*) AS n FROM toks GROUP BY tok),
         |r AS (SELECT item, n,
         |        row_number() OVER (ORDER BY n DESC, item ASC) AS rnk
         |      FROM c)
         |SELECT item, n, rnk FROM r WHERE rnk <= 10 ORDER BY rnk""".stripMargin,

    "charlm_bits" ->
      """WITH cleaned AS (
        |  SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS cs
        |  FROM documents),
        |chars AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, length(cs)), i -> substr(cs, i, 1))) AS ch
        |  FROM cleaned WHERE length(cs) > 0),
        |dc AS (SELECT doc_id, ch, count(*) AS n FROM chars GROUP BY doc_id, ch),
        |model AS (
        |  SELECT ch, cn::DOUBLE / sum(cn) OVER () AS p
        |  FROM (SELECT ch, sum(n) AS cn FROM dc GROUP BY ch))
        |SELECT dc.doc_id, sum(dc.n)::BIGINT AS n_chars_scored,
        |  round(-sum(dc.n * ln(p) / ln(2.0)) / sum(dc.n), 6) AS bits_per_char
        |FROM dc JOIN model ON dc.ch = model.ch
        |GROUP BY dc.doc_id ORDER BY dc.doc_id""".stripMargin,

    "approx_topk_grouped" ->
      s"""WITH toks AS (
         |  SELECT lang, unnest(${duckToks("text")}) AS tok FROM documents),
         |c AS (SELECT lang, tok AS item, count(*) AS n FROM toks GROUP BY 1, 2),
         |r AS (SELECT lang, item, n,
         |        row_number() OVER (PARTITION BY lang ORDER BY n DESC, item ASC) AS rnk
         |      FROM c)
         |SELECT lang, item, n, rnk FROM r WHERE rnk <= 3
         |ORDER BY lang, rnk""".stripMargin,

    "sentence_dedup" ->
      s"""WITH injected AS (
         |  SELECT doc_id, 'This document is provided as is. ' || text AS text
         |  FROM documents),
         |arr AS (
         |  SELECT doc_id, string_split_regex(text, '\\.\\s+') AS l FROM injected),
         |sents0 AS (
         |  SELECT doc_id, unnest(generate_series(1, len(l))) AS i, l FROM arr),
         |sents AS (
         |  SELECT doc_id, i - 1 AS idx, l[i] AS sent, ${duckFingerprint("l[i]")} AS sfp
         |  FROM sents0 WHERE length(trim(l[i])) > 0),
         |freq AS (
         |  SELECT sfp, count(DISTINCT doc_id) AS n_docs FROM sents GROUP BY sfp)
         |SELECT s.doc_id, count(*) AS n_sents,
         |  sum(CASE WHEN f.n_docs < 3 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
         |  coalesce(string_agg(s.sent, '. ' ORDER BY s.idx)
         |    FILTER (WHERE f.n_docs < 3), '') AS cleaned
         |FROM sents s JOIN freq f ON f.sfp = s.sfp
         |GROUP BY s.doc_id
         |ORDER BY s.doc_id""".stripMargin,

    "colbert_rerank" -> {
      val alpha = CharHist.Alphabet
      val hist = (e: String) =>
        s"""list_transform(generate_series(1, ${alpha.length}),
           |      i -> (length($e) - length(replace($e, substr('$alpha', i, 1), '')))::DOUBLE)""".stripMargin
      s"""WITH dt AS (
         |  SELECT DISTINCT doc_id, unnest(${duckToks("text")}) AS tok
         |  FROM documents),
         |v AS (SELECT DISTINCT tok FROM dt),
         |vh AS (SELECT tok, ${hist("tok")} AS h FROM v),
         |q AS (SELECT * FROM (VALUES (0, 'data'), (1, 'tabel'), (2, 'querys')) t(qidx, qt)),
         |qh AS (SELECT qidx, ${hist("qt")} AS h FROM q),
         |sc AS (
         |  SELECT vh.tok, qh.qidx, ${graft.queries.VectorQueries.duckCosine("vh.h", "qh.h")} AS s
         |  FROM vh CROSS JOIN qh),
         |m AS (
         |  SELECT dt.doc_id, sc.qidx, max(sc.s) AS mx
         |  FROM dt JOIN sc ON sc.tok = dt.tok GROUP BY 1, 2),
         |f AS (SELECT doc_id, round(sum(mx), 6) AS maxsim FROM m GROUP BY doc_id)
         |SELECT doc_id, maxsim FROM f
         |ORDER BY maxsim DESC, doc_id LIMIT 10""".stripMargin
    },

    // NOTE: deliberately UNPRUNED — the exact inverted-index join over
    // every shared hashed shingle (the SAME duckShingleCtes set
    // definition the MinHash oracles replay). Hash-matching the Spark
    // side's prefix-filtered plan proves AllPairs pruning lossless.
    "setsim_join" ->
      s"""WITH ${PipelineQueries.duckShingleCtes(doubledDocsSql)},
         |e AS (SELECT doc_id, unnest(shs) AS s FROM sh),
         |sz AS (SELECT doc_id, len(shs)::BIGINT AS n FROM sh),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ix
         |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |j AS (
         |  SELECT id_a, id_b, round(ix::DOUBLE / (sa.n + sb.n - ix), 6) AS jac
         |  FROM inter
         |  JOIN sz sa ON sa.doc_id = id_a
         |  JOIN sz sb ON sb.doc_id = id_b)
         |SELECT id_a, id_b, jac FROM j WHERE jac >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,

    "substring_dedup" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 0 THEN '$SpanBoiler ' || text
         |         ELSE text END AS text
         |  FROM documents),
         |b AS (
         |  SELECT doc_id,
         |    list_transform(${duckToks("text")}, tok -> ${duckTokHash("tok")}) AS hs
         |  FROM d),
         |base AS (SELECT doc_id, len(hs)::BIGINT AS n_tokens, hs FROM b),
         |w AS (
         |  SELECT doc_id, i,
         |    list_reduce(list_prepend(0::BIGINT, list_slice(hs, i, i + ${SpanW - 1})),
         |      (acc, x) -> (acc * 131 + x) % 1000000007) AS wfp
         |  FROM base, unnest(generate_series(1, (n_tokens - ${SpanW - 1})::INT)) AS g(i)
         |  WHERE n_tokens >= $SpanW),
         |f AS (SELECT wfp, count(DISTINCT doc_id) AS n_docs FROM w GROUP BY wfp),
         |dup AS (SELECT w.doc_id, w.i FROM w JOIN f USING (wfp) WHERE f.n_docs >= 2),
         |nw AS (SELECT doc_id, count(*)::BIGINT AS n_windows FROM w GROUP BY doc_id),
         |dw AS (SELECT doc_id, count(*)::BIGINT AS n_dup_windows FROM dup GROUP BY doc_id),
         |cov AS (
         |  SELECT doc_id, count(DISTINCT p)::BIGINT AS dup_tokens
         |  FROM dup, unnest(generate_series(i, i + ${SpanW - 1})) AS u(p)
         |  GROUP BY doc_id)
         |SELECT base.doc_id, base.n_tokens,
         |  coalesce(nw.n_windows, 0) AS n_windows,
         |  coalesce(dw.n_dup_windows, 0) AS n_dup_windows,
         |  coalesce(cov.dup_tokens, 0) AS dup_tokens,
         |  round(coalesce(cov.dup_tokens, 0)::DOUBLE / base.n_tokens, 6) AS dup_frac
         |FROM base
         |LEFT JOIN nw USING (doc_id)
         |LEFT JOIN dw USING (doc_id)
         |LEFT JOIN cov USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "heavy_hitters_by_group" ->
      s"""WITH t AS (
         |  SELECT lang AS grp, unnest(${duckToks("text")}) AS value
         |  FROM documents),
         |tot AS (SELECT grp, count(*) AS n_total FROM t GROUP BY grp),
         |c AS (SELECT grp, value, count(*) AS n FROM t GROUP BY grp, value)
         |SELECT c.grp, c.value, c.n::BIGINT AS n,
         |  round(c.n::DOUBLE / tot.n_total, 6) AS share
         |FROM c JOIN tot USING (grp)
         |WHERE c.n > 0.038 * tot.n_total
         |ORDER BY grp, value""".stripMargin,

    "snapshot_diff" ->
      s"""WITH old AS (SELECT doc_id, text FROM documents),
         |nw AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
         |  FROM old WHERE doc_id % 11 <> 0
         |  UNION ALL
         |  SELECT doc_id + 1000000, text || ' new' FROM old WHERE doc_id % 17 = 0),
         |o AS (SELECT doc_id, ${duckFingerprint("text")} AS ofp FROM old),
         |n AS (SELECT doc_id, ${duckFingerprint("text")} AS nfp FROM nw),
         |j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, ofp, nfp
         |      FROM o FULL JOIN n ON o.doc_id = n.doc_id)
         |SELECT CASE WHEN nfp IS NULL THEN 'removed'
         |            WHEN ofp IS NULL THEN 'added'
         |            WHEN ofp <> nfp THEN 'changed'
         |            ELSE 'unchanged' END AS status,
         |  count(*)::BIGINT AS n_docs
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    "substring_dedup_incr" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 0 THEN '$SpanBoiler ' || text
         |         ELSE text END AS text
         |  FROM documents),
         |b AS (
         |  SELECT doc_id,
         |    list_transform(${duckToks("text")}, tok -> ${duckTokHash("tok")}) AS hs
         |  FROM d),
         |base AS (SELECT doc_id, len(hs)::BIGINT AS n_tokens, hs FROM b),
         |w AS (
         |  SELECT doc_id, i,
         |    list_reduce(list_prepend(0::BIGINT, list_slice(hs, i, i + ${SpanW - 1})),
         |      (acc, x) -> (acc * 131 + x) % 1000000007) AS wfp
         |  FROM base, unnest(generate_series(1, (n_tokens - ${SpanW - 1})::INT)) AS g(i)
         |  WHERE n_tokens >= $SpanW),
         |hist AS (SELECT DISTINCT wfp FROM w WHERE doc_id % 2 = 0),
         |winc AS (SELECT doc_id, i, wfp FROM w WHERE doc_id % 2 = 1),
         |dup AS (SELECT winc.doc_id, winc.i FROM winc
         |        WHERE winc.wfp IN (SELECT wfp FROM hist)),
         |nw AS (SELECT doc_id, count(*)::BIGINT AS n_windows FROM winc GROUP BY doc_id),
         |dw AS (SELECT doc_id, count(*)::BIGINT AS n_dup_windows FROM dup GROUP BY doc_id),
         |cov AS (
         |  SELECT doc_id, count(DISTINCT p)::BIGINT AS dup_tokens
         |  FROM dup, unnest(generate_series(i, i + ${SpanW - 1})) AS u(p)
         |  GROUP BY doc_id)
         |SELECT base.doc_id, base.n_tokens,
         |  coalesce(nw.n_windows, 0) AS n_windows,
         |  coalesce(dw.n_dup_windows, 0) AS n_dup_windows,
         |  coalesce(cov.dup_tokens, 0) AS dup_tokens,
         |  round(coalesce(cov.dup_tokens, 0)::DOUBLE / base.n_tokens, 6) AS dup_frac
         |FROM base
         |LEFT JOIN nw USING (doc_id)
         |LEFT JOIN dw USING (doc_id)
         |LEFT JOIN cov USING (doc_id)
         |WHERE base.doc_id % 2 = 1
         |ORDER BY doc_id""".stripMargin,

    "bigram_lm_bits" ->
      s"""WITH t AS (
         |  SELECT doc_id, ${duckToks("text")} AS toks FROM documents),
         |t2 AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 2),
         |bi AS (
         |  SELECT doc_id, toks,
         |    unnest(generate_series(1, len(toks) - 1)) AS i
         |  FROM t2),
         |flat AS (SELECT doc_id, toks[i] AS prev, toks[i+1] AS cur FROM bi),
         |bgc AS (SELECT prev, cur, count(*) AS n_bg FROM flat GROUP BY 1, 2),
         |pv AS (SELECT prev, sum(n_bg)::BIGINT AS n_prev FROM bgc GROUP BY 1),
         |model AS (
         |  SELECT b.prev, b.cur, b.n_bg::DOUBLE / p.n_prev AS p
         |  FROM bgc b JOIN pv p USING (prev)),
         |dc AS (SELECT doc_id, prev, cur, count(*) AS n FROM flat GROUP BY 1, 2, 3)
         |SELECT dc.doc_id, sum(dc.n)::BIGINT AS n_bigrams,
         |  round(-sum(dc.n * ln(m.p) / ln(2.0)) / sum(dc.n), 6) AS bits_per_bigram
         |FROM dc JOIN model m ON m.prev = dc.prev AND m.cur = dc.cur
         |GROUP BY dc.doc_id
         |ORDER BY dc.doc_id""".stripMargin,

    "kneser_ney_bits" ->
      s"""WITH $duckKnModelCtes,
         |dc AS (SELECT doc_id, prev, cur, count(*) AS n FROM flat GROUP BY 1, 2, 3)
         |SELECT dc.doc_id, sum(dc.n)::BIGINT AS n_bigrams,
         |  round(-sum(dc.n * ln(m.p) / ln(2.0)) / sum(dc.n), 6) AS kn_bits_per_bigram
         |FROM dc JOIN model m ON m.prev = dc.prev AND m.cur = dc.cur
         |GROUP BY dc.doc_id
         |ORDER BY dc.doc_id""".stripMargin,

    "rm3_expand" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(${duckToks("text")}) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
         |dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY 1),
         |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
         |df AS (
         |  SELECT tok, count(*) AS df FROM tf
         |  WHERE tok IN ('data', 'table', 'query') GROUP BY 1),
         |contrib AS (
         |  SELECT t.doc_id,
         |    ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
         |      * (t.tf * 2.2) / (t.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl)) AS c
         |  FROM tf t
         |  JOIN dl l ON l.doc_id = t.doc_id
         |  JOIN df d ON d.tok = t.tok
         |  CROSS JOIN stats s
         |  WHERE t.tok IN ('data', 'table', 'query')),
         |fb AS (
         |  SELECT doc_id, round(sum(c), 6) AS score FROM contrib
         |  GROUP BY doc_id ORDER BY score DESC, doc_id ASC LIMIT 10),
         |wt AS (SELECT sum(score) AS w_tot FROM fb),
         |rel AS (
         |  SELECT t.tok, sum(f.score / w.w_tot * t.tf / l.dl) AS p_rel
         |  FROM tf t JOIN fb f ON f.doc_id = t.doc_id
         |  JOIN dl l ON l.doc_id = t.doc_id CROSS JOIN wt w
         |  GROUP BY t.tok),
         |qm AS (SELECT unnest(['data', 'table', 'query']) AS tok,
         |              1.0 / 3 AS p_orig)
         |SELECT coalesce(r.tok, q.tok) AS term,
         |  round(0.5 * coalesce(q.p_orig, 0.0)
         |    + 0.5 * coalesce(r.p_rel, 0.0), 6) AS p_rm3
         |FROM rel r FULL OUTER JOIN qm q ON q.tok = r.tok
         |ORDER BY p_rm3 DESC, term LIMIT 15""".stripMargin,

    "domain_reweight" ->
      s"""WITH $duckKnModelCtes,
         |uni AS (SELECT cur, count(*)::BIGINT AS n_cur FROM flat GROUP BY 1),
         |un AS (SELECT count(*)::BIGINT AS n_all FROM flat),
         |dc AS (SELECT doc_id, prev, cur, count(*) AS n FROM flat GROUP BY 1, 2, 3),
         |dom AS (
         |  SELECT d.source, sum(dc.n)::BIGINT AS n_bigrams,
         |    round(-sum(dc.n * ln(u.n_cur::DOUBLE / un.n_all) / ln(2.0))
         |      / sum(dc.n), 6) AS uni_bits,
         |    round(-sum(dc.n * ln(m.p) / ln(2.0)) / sum(dc.n), 6) AS kn_bits
         |  FROM dc
         |  JOIN model m ON m.prev = dc.prev AND m.cur = dc.cur
         |  JOIN uni u ON u.cur = dc.cur
         |  CROSS JOIN un
         |  JOIN documents d ON d.doc_id = dc.doc_id
         |  GROUP BY d.source),
         |nn AS (SELECT sum(n_bigrams)::BIGINT AS nn FROM dom),
         |w AS (
         |  SELECT source, n_bigrams, uni_bits, kn_bits,
         |    greatest(round(uni_bits - kn_bits, 6), 0.0) AS excess,
         |    n_bigrams::DOUBLE / nn.nn::DOUBLE
         |      * exp(greatest(round(uni_bits - kn_bits, 6), 0.0)) AS w_raw
         |  FROM dom CROSS JOIN nn),
         |z AS (SELECT sum(w_raw) AS z FROM w)
         |SELECT source, n_bigrams, uni_bits, kn_bits, excess,
         |  round(w_raw / z.z, 6) AS weight
         |FROM w CROSS JOIN z ORDER BY source""".stripMargin,

    "word_sim" ->
      """WITH v AS (SELECT word, n_word, vec::DOUBLE[] AS vec
        |           FROM read_parquet('__WORDVEC__/*.parquet')),
        |p AS (SELECT word AS probe, vec AS pv FROM v
        |      ORDER BY n_word DESC, word ASC LIMIT 5),
        |scored AS (
        |  SELECT p.probe, v.word,
        |    round(list_dot_product(p.pv, v.vec) /
        |      (sqrt(list_dot_product(p.pv, p.pv)) *
        |       sqrt(list_dot_product(v.vec, v.vec))), 6) AS cos
        |  FROM v CROSS JOIN p WHERE v.word <> p.probe),
        |ranked AS (
        |  SELECT probe, word, cos,
        |    row_number() OVER (PARTITION BY probe
        |                       ORDER BY cos DESC, word ASC)::BIGINT AS rank
        |  FROM scored)
        |SELECT probe, word, cos, rank FROM ranked
        |WHERE rank <= 5 ORDER BY probe, rank""".stripMargin,

    "wordvec_norms" ->
      """WITH v AS (SELECT vec::DOUBLE[] AS vec
        |           FROM read_parquet('__WORDVEC__/*.parquet')),
        |e AS (SELECT vec, unnest(generate_series(1, len(vec))) AS i FROM v)
        |SELECT (i - 1)::BIGINT AS j, count(*)::BIGINT AS n_words,
        |  round(sum(vec[i] * vec[i]), 6) AS energy
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,

    // analogy replay: rebuild the same probes from the dumped vectors
    // ((v(a) − v(b)) + v(c) in the same IEEE order), prune to the dumped
    // trained cells, rank the rounded cosine — dumped-vector +
    // dumped-index replay end to end
    "word_analogy" ->
      s"""WITH $duckWordAnalogyCtes
         |SELECT pid, wa, wb, wc, word, cos, rank FROM ranked
         |WHERE rank <= 5 ORDER BY pid, rank""".stripMargin,

    "word_analogy_recall" ->
      s"""WITH $duckWordAnalogyCtes,
         |exscored AS (
         |  SELECT p.pid, e.word,
         |    round(${VectorQueries.duckCosine("e.vec", "p.q")}, 6) AS cos
         |  FROM v e CROSS JOIN probes p
         |  WHERE e.word <> p.wa AND e.word <> p.wb AND e.word <> p.wc),
         |exact AS (
         |  SELECT pid, word FROM (
         |    SELECT pid, word, row_number() OVER (
         |        PARTITION BY pid ORDER BY cos DESC, word ASC) AS rank
         |    FROM exscored)
         |  WHERE rank <= 5),
         |appr AS (SELECT pid, word FROM ranked WHERE rank <= 5)
         |SELECT a.pid, 5 AS k, count(*)::BIGINT AS n_hit,
         |  round(count(*) / 5.0, 6) AS recall
         |FROM appr a
         |WHERE EXISTS (SELECT 1 FROM exact x
         |              WHERE x.pid = a.pid AND x.word = a.word)
         |GROUP BY a.pid ORDER BY a.pid""".stripMargin,

    "dsir_select" ->
      s"""WITH t AS (
         |  SELECT doc_id, ${duckToks("text")} AS toks FROM documents),
         |t2 AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 2),
         |bi AS (
         |  SELECT doc_id, toks,
         |    unnest(generate_series(1, len(toks) - 1)) AS i
         |  FROM t2),
         |flat AS (SELECT doc_id, toks[i] AS prev, toks[i+1] AS cur FROM bi),
         |tgt AS (SELECT doc_id FROM documents
         |        WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')),
         |rawc AS (SELECT prev, cur, count(*) AS n_r FROM flat GROUP BY 1, 2),
         |tgtc AS (
         |  SELECT prev, cur, count(*) AS n_t
         |  FROM flat WHERE doc_id IN (SELECT doc_id FROM tgt) GROUP BY 1, 2),
         |model AS (
         |  SELECT r.prev, r.cur, r.n_r, coalesce(tc.n_t, 0) AS n_t
         |  FROM rawc r LEFT JOIN tgtc tc ON tc.prev = r.prev AND tc.cur = r.cur),
         |tot AS (
         |  SELECT sum(n_r)::BIGINT AS nr_tot, sum(n_t)::BIGINT AS nt_tot,
         |    count(*)::BIGINT AS v
         |  FROM model),
         |scored AS (
         |  SELECT m.prev, m.cur,
         |    ln((m.n_t + 1)::DOUBLE / (t.nt_tot + t.v))
         |      - ln((m.n_r + 1)::DOUBLE / (t.nr_tot + t.v)) AS llr_f
         |  FROM model m CROSS JOIN tot t),
         |dc AS (SELECT doc_id, prev, cur, count(*) AS n FROM flat GROUP BY 1, 2, 3)
         |SELECT dc.doc_id, sum(dc.n)::BIGINT AS n_bigrams,
         |  round(sum(dc.n * s.llr_f) / sum(dc.n), 6) AS llr_per_bigram
         |FROM dc JOIN scored s ON s.prev = dc.prev AND s.cur = dc.cur
         |GROUP BY dc.doc_id
         |ORDER BY llr_per_bigram DESC, dc.doc_id LIMIT 100""".stripMargin,

    "pii_pseudonymize" ->
      """SELECT 'u-' || substr(md5(user_id::VARCHAR), 1, 12) AS user_pseudo,
        |  count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "pii_scrub" ->
      s"""WITH tainted AS (
         |  SELECT doc_id,
         |    text || ' contact user' || doc_id || '@example.com or 555-' ||
         |    lpad((doc_id % 10000)::VARCHAR, 4, '0') AS text
         |  FROM documents)
         |SELECT doc_id,
         |  len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS n_emails,
         |  len(regexp_extract_all(text, '[0-9]{3}-[0-9]{4}')) AS n_phones,
         |  regexp_replace(regexp_replace(text,
         |    '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'),
         |    '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS scrubbed
         |FROM tainted ORDER BY doc_id""".stripMargin,

    "vocab_coverage" ->
      s"""WITH c AS (
         |  SELECT tok, count(*) AS n
         |  FROM (SELECT unnest(${duckToks("text")}) AS tok FROM documents)
         |  GROUP BY tok),
         |t AS (SELECT sum(n)::BIGINT AS total FROM c),
         |r AS (
         |  SELECT tok, n, row_number() OVER (ORDER BY n DESC, tok ASC) AS rank,
         |    sum(n) OVER (ORDER BY n DESC, tok ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
         |  FROM c)
         |SELECT rank, tok, n, round(cum::DOUBLE / total, 6) AS cum_frac
         |FROM r, t WHERE rank <= 30 ORDER BY rank""".stripMargin,

    "length_buckets" ->
      s"""WITH t AS (
         |  SELECT (ceil(len(${duckToks("text")}) / 64.0) * 64)::BIGINT AS bucket,
         |    len(${duckToks("text")})::BIGINT AS n_tokens
         |  FROM documents)
         |SELECT bucket, count(*) AS n_docs,
         |  sum(n_tokens)::BIGINT AS real_tokens,
         |  (bucket * count(*))::BIGINT AS padded_tokens,
         |  round(sum(n_tokens)::DOUBLE / (bucket * count(*)), 6) AS efficiency
         |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin,

    "token_counts" ->
      s"""SELECT lang, sum(len(${duckToks("text")}))::BIGINT AS total_tokens,
         |  round(avg(len(${duckToks("text")})), 6) AS avg_tokens,
         |  count(*) AS n_docs
         |FROM documents
         |GROUP BY lang
         |ORDER BY lang""".stripMargin
  )

  /** The 3 deterministic analogy probes over the dumped word vectors:
    * (pid, wa, wb, wc, q) with q = (v(a) − v(b)) + v(c), triples drawn
    * from the top-4 words by (n_word desc, word asc). Driver-side model
    * metadata (4 vocab rows); the oracle rebuilds the SAME probes from
    * the dump with the identical (x − y) + z IEEE order.
    */
  private def wordAnalogyProbes(s: org.apache.spark.sql.SparkSession,
                                dir: String): DataFrame = {
    val top = s.read.parquet(graft.operators.WordVec.vectorsPath(dir))
      .orderBy(col("n_word").desc, col("word").asc).limit(4)
      .select(col("word"), col("vec")).collect()
      .map(r => (r.getString(0), r.getSeq[Double](1).toArray))
    val trips = Seq((0, 1, 2), (1, 2, 3), (2, 3, 0))
    import s.implicits._
    trips.zipWithIndex.map { case ((ia, ib, ic), pid) =>
      val q = top(ia)._2.indices
        .map(i => (top(ia)._2(i) - top(ib)._2(i)) + top(ic)._2(i)).toSeq
      (pid.toLong, top(ia)._1, top(ib)._1, top(ic)._1, q)
    }.toDF("pid", "wa", "wb", "wc", "q")
  }

  /** Shared CTEs of the word-analogy replays, ending in `ranked`
    * (pid, wa, wb, wc, word, cos, rank) over the cell-pruned candidates.
    * `v` is the full dumped vector table (the recall face's exact arm
    * reuses it).
    */
  private def duckWordAnalogyCtes: String = {
    val cosCent = VectorQueries.duckCosine("c.centroid", "p.q")
    val cosVec = VectorQueries.duckCosine("e.vec", "p.q")
    s"""v AS (SELECT word, n_word, vec::DOUBLE[] AS vec
       |      FROM read_parquet('__WORDVEC__/*.parquet')),
       |top4 AS (
       |  SELECT word, vec, row_number() OVER (
       |      ORDER BY n_word DESC, word ASC) AS rk
       |  FROM v QUALIFY rk <= 4),
       |probes AS (
       |  SELECT t.pid::BIGINT AS pid, a.word AS wa, b.word AS wb, c.word AS wc,
       |    list_transform(generate_series(1, len(a.vec)),
       |      i -> (a.vec[i] - b.vec[i]) + c.vec[i]) AS q
       |  FROM (VALUES (0, 1, 2, 3), (1, 2, 3, 4), (2, 3, 4, 1)) t(pid, ra, rb, rc)
       |  JOIN top4 a ON a.rk = t.ra
       |  JOIN top4 b ON b.rk = t.rb
       |  JOIN top4 c ON c.rk = t.rc),
       |wcents AS (SELECT cell, centroid FROM read_parquet('__WORDANN_CENTS__/*.parquet')),
       |wivf AS (SELECT word, vec::DOUBLE[] AS vec, cell
       |         FROM read_parquet('__WORDANN__/*/*.parquet', hive_partitioning=true)),
       |pcell AS (
       |  SELECT pid, cell FROM (
       |    SELECT p.pid, c.cell, row_number() OVER (
       |        PARTITION BY p.pid
       |        ORDER BY round($cosCent, 6) DESC, c.cell ASC) AS crnk
       |    FROM wcents c CROSS JOIN probes p)
       |  WHERE crnk <= 2),
       |ranked AS (
       |  SELECT pid, wa, wb, wc, word, cos, row_number() OVER (
       |      PARTITION BY pid ORDER BY cos DESC, word ASC)::BIGINT AS rank
       |  FROM (
       |    SELECT p.pid, p.wa, p.wb, p.wc, e.word,
       |      round($cosVec, 6) AS cos
       |    FROM wivf e
       |    JOIN pcell pc ON e.cell = pc.cell
       |    JOIN probes p ON p.pid = pc.pid
       |    WHERE e.word <> p.wa AND e.word <> p.wb AND e.word <> p.wc))""".stripMargin
  }
}
