package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.TextOps
import graft.operators.{Dedup, GlobalRowNum, LogReg}

/** Training-data assembly operators: deterministic dataset splitting,
  * stratified sampling, and token-budget sequence packing — the steps
  * between a cleaned corpus and a training run.
  *
  * Scale design notes (100 TB):
  *  - Splits are per-row hash projections: map-only, no shuffle, and the
  *    assignment is a pure function of the id, so re-running the pipeline
  *    (or running it per-shard on different clusters) yields the same
  *    split. In production the hash would be xxhash64; here it is an
  *    explicit Knuth multiplicative hash because the oracle must compute
  *    the identical value in DuckDB (murmur/xxhash are engine-specific —
  *    see the conscious-omission list in QueriesSpec).
  *  - Stratified sampling shuffles once on the stratum key (window
  *    row_number + per-stratum count), giving EXACT per-stratum sample
  *    sizes. When approximate sizes suffice, the hash-threshold path
  *    (`data_split`'s shape: keep iff bucket < frac*100) is map-only and
  *    preferred at scale; the window variant is the exact-count tool.
  *    Skewed strata are bounded: row_number windows spill, and the sort
  *    key (hash, id) is unique so no single value dominates a partition
  *    beyond the stratum itself.
  *  - Sequence packing is the "concat documents, slice into fixed token
  *    windows" step before tokenizer sharding. A single global cumulative
  *    sum would serialize on one partition, so packing is SHARDED: docs
  *    are hashed into independent shards and each shard packs its own
  *    contiguous token stream (running-sum window per shard). Shards pack
  *    in parallel; sequence identity is (shard, seq_id). That is exactly
  *    how a 1000-executor job packs 100 TB — per-shard order is total and
  *    deterministic, cross-shard order is irrelevant to training.
  */
object TrainQueries {

  /** The contamination shingle digest (doc_id, shs) staged once per
    * (session, dir) — see the `contamination` comment below. Named so the
    * bench harness can pre-build it as an explicit `stage:shingles` line
    * item (graft.Stages).
    */
  private[graft] def stagedShingles(s: SparkSession, dir: String): DataFrame =
    graft.StageCache.getOrStage(s, s"shingles:$dir") {
      spread(documents(s, dir))
        .withColumn("hs", TextOps.tokenHashes(col("text")))
        .select(col("doc_id"), Dedup.shingleHashes(col("hs")).as("shs"))
    }

  /** Deterministic provenance URL for a fixture doc: subdomain, site, and
    * TLD are arithmetic in doc_id, so the DuckDB oracle can reconstruct
    * the parts Spark extracts by actually parsing the URL.
    */
  private def withUrl(docs: DataFrame): DataFrame = {
    val tld = element_at(
      array(lit("com"), lit("org"), lit("net"), lit("io"), lit("edu")),
      (col("doc_id") % 5 + 1).cast("int"))
    docs.withColumn("url",
      concat(lit("https://w"), col("doc_id") % 7,
        lit(".site"), col("doc_id") % 13,
        lit("."), tld, lit("/doc/"), col("doc_id")))
  }

  /** Knuth multiplicative hash of a non-negative id, kept in [0, 2^32):
    * (id * 2654435761) mod 2^32. Cross-engine-portable integer arithmetic
    * (the product of a 32-bit id and the constant fits a 64-bit signed
    * long; fixture ids are far smaller).
    */
  private def idHash(id: Column): Column =
    (id * lit(2654435761L)) % lit(4294967296L)

  /** Split bucket in [0,100): uses bits 16.. of the hash — the low bits of
    * a multiplicative hash of sequential ids are strided, the high bits mix.
    */
  private val bucketSqlExpr =
    "((doc_id * 2654435761) % 4294967296) div 65536 % 100"
  private val bucketDuck =
    "((doc_id * 2654435761) % 4294967296) // 65536 % 100"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Contiguous global example numbering — every training run wants
    // stable example ids over a deterministic corpus order. The obvious
    // `row_number() OVER (ORDER BY …)` plans a SINGLE-partition window
    // (all 100 TB through one task); GlobalRowNum is the scalable
    // two-pass offset scheme. The oracle IS the single-partition window
    // (fine at sf), proving the distributed numbering bit-exact against
    // the plan we refused to run.
    "global_rownum" -> ((s, dir) => {
      GlobalRowNum.withRowNumber(
        documents(s, dir).select(col("doc_id"), col("n_chars")),
        Seq(col("n_chars"), col("doc_id")), numPartitions = 8)
        .orderBy(col("rn"))
    }),

    // HTML boilerplate extraction — the step-zero of every web corpus:
    // crawled pages arrive as markup, training text is the main content
    // with nav/script/style/footer boilerplate and entities stripped. The
    // fixture is plain text, so each doc is first wrapped in a
    // deterministic page (title/style/script/nav from doc_id arithmetic —
    // the multimodal synthesis trick), then Spark extracts the content
    // div, strips tags, decodes entities, and collapses whitespace while
    // the oracle runs the identical chain in SQL: a hash match proves
    // the extraction, and TrainQueriesSpec proves exact roundtrip (clean
    // text == original + the injected entity span). Map-only projection
    // over codegen'd regexes — the C4-grade heuristic extractor; a
    // DOM-parser variant would slot into mapPartitions like MediaCodec.
    "html_extract" -> ((s, dir) => {
      val did = col("doc_id").cast("string")
      val html = concat(
        lit("<html><head><title>Doc "), did,
        lit("</title><style>body{font-size:"),
        (col("doc_id") % 7 + lit(9)).cast("string"),
        lit("px}</style><script>var id="), did,
        lit(";track(id);</script></head><body><nav>Home | About | Page "),
        (col("doc_id") % 13).cast("string"),
        lit("</nav><div class=\"content\"><p>"), col("text"),
        lit("</p><span>A &amp; B &lt;tag&gt;</span></div>" +
          "<footer>&copy; example.com</footer></body></html>"))
      documents(s, dir)
        .select(col("doc_id"), html.as("html"))
        .withColumn("main",
          regexp_extract(col("html"), "<div class=\"content\">(.*?)</div>", 1))
        .withColumn("clean", trim(regexp_replace(
          regexp_replace(regexp_replace(regexp_replace(
            regexp_replace(col("main"), "<[^>]+>", " "),
            "&amp;", "&"), "&lt;", "<"), "&gt;", ">"),
          "\\s+", " ")))
        .select(col("doc_id"), col("clean"),
          length(col("clean")).as("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // Web-corpus curation, C4-style: documents carry provenance URLs (the
    // fixture has none, so they are synthesized deterministically from
    // doc_id — the multimodal trick: Spark PARSES the real URL string with
    // parse_url while the oracle re-derives the parts arithmetically, so a
    // hash match proves the parse). Per-registrable-domain corpus stats:
    // the report a crawl-curation pass starts from.
    "domain_stats" -> ((s, dir) => {
      withUrl(documents(s, dir))
        .withColumn("host", parse_url(col("url"), lit("HOST")))
        .withColumn("domain", regexp_extract(col("host"), "^[^.]+\\.(.*)$", 1))
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextOps.tokenCount(col("text")).cast("long")).as("total_tokens"),
          countDistinct(col("host")).as("n_hosts"))
        .orderBy(col("domain"))
    }),

    // Per-domain quota capping (the Common-Crawl "no domain dominates the
    // corpus" rule): keep the first 5 docs per registrable domain in
    // deterministic doc_id order. The window partitions by domain — never
    // global — so skew is bounded by the largest single domain.
    "domain_cap" -> ((s, dir) => {
      val w = Window.partitionBy(col("domain")).orderBy(col("doc_id"))
      withUrl(documents(s, dir))
        .withColumn("host", parse_url(col("url"), lit("HOST")))
        .withColumn("domain", regexp_extract(col("host"), "^[^.]+\\.(.*)$", 1))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("doc_id"), col("host"), col("domain"))
        .orderBy(col("doc_id"))
    }),

    // Weighted sampling WITHOUT replacement at scale (Efraimidis-Spirakis
    // 2006): each row gets key = u^(1/w) for a uniform u and weight w; the
    // global top-k by key IS an exact weighted sample without replacement
    // — and top-k is TakeOrderedAndProject, so the "sample" never
    // shuffles more than k rows per partition. Deterministic u from a
    // multiplicative hash of doc_id (reproducible corpus draws — the same
    // property data_split uses), weights = document length: the
    // long-document-upweighting mixture draw of training-data assembly.
    "weighted_sample" -> ((s, dir) => {
      val u = ((col("doc_id") * 2654435761L) % 1000000007L).cast("double") /
        lit(1000000007.0)
      documents(s, dir)
        .select(col("doc_id"), col("n_chars"),
          round(pow(u, lit(1.0) / col("n_chars").cast("double")), 6).as("es_key"))
        .orderBy(col("es_key").desc, col("doc_id").asc)
        .limit(50)
    }),

    // Deterministic train/val/test split: 80/10/10 by hash bucket.
    // Map-only; assignment is a pure function of doc_id (stable across
    // reruns, shards, and engines).
    "data_split" -> ((s, dir) => {
      documents(s, dir)
        .select(col("doc_id"), expr(bucketSqlExpr).as("bucket"))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test"))
        .orderBy(col("doc_id"))
    }),

    // Exact-count stratified sample: deterministic 20% per language.
    // One shuffle on the stratum key; rows ordered inside each stratum by
    // (hash, id) — a deterministic pseudo-random order — and the first
    // ceil(n/5) kept.
    "stratified_sample" -> ((s, dir) => {
      val byLang = Window.partitionBy(col("lang"))
      val w = byLang.orderBy(idHash(col("doc_id")).asc, col("doc_id").asc)
      documents(s, dir)
        .select(col("doc_id"), col("lang"))
        .withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(byLang))
        .filter(col("rn") <= expr("(cnt + 4) div 5"))
        .select(col("doc_id"), col("lang"), col("rn"))
        .orderBy(col("lang"), col("rn"))
    }),

    // Corpus mixing: hit a target language mixture under a global token
    // budget. Each language gets budget = total × weight; docs are taken
    // in deterministic hash order (a reproducible pseudo-random shuffle)
    // until the language's budget is exhausted — a doc is in iff its FIRST
    // token lands inside the budget, so the cut is a pure function of the
    // corpus. One shuffle on the lang key; the running-sum window spills,
    // and strata are languages so no partition exceeds a language's share.
    "corpus_mix" -> ((s, dir) => {
      val budget = typedLit(Map("en" -> 5000L, "de" -> 2000L,
        "fr" -> 2000L, "es" -> 1000L))
      val w = Window.partitionBy(col("lang"))
        .orderBy(idHash(col("doc_id")).asc, col("doc_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      documents(s, dir)
        .select(col("doc_id"), col("lang"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tok"))
        .withColumn("cum", sum(col("n_tok")).over(w))
        .filter(col("cum") - col("n_tok") < element_at(budget, col("lang")))
        .select(col("doc_id"), col("lang"), col("n_tok"), col("cum"))
        .orderBy(col("lang"), col("cum"))
    }),

    // Incremental dedup: the daily-increment shape — a new batch arrives,
    // is deduped against the HISTORICAL fingerprint index (anti-join on
    // digests, never text) and within itself (keep-first window). The
    // historical side at 100 TB is a compact (fp, keeper) table bucketed
    // on fp, making the anti-join co-located and shuffle-free.
    "incremental_dedup" -> ((s, dir) => {
      val fp = TextOps.fingerprint(col("text"))
      val hist = documents(s, dir).filter(col("doc_id") < 400)
        .select(fp.as("fp")).distinct()
      // the "incoming batch": tail of the corpus + a re-sent copy of some
      // historical docs (true incremental duplicates to catch)
      val batchSrc = documents(s, dir).select(col("doc_id"), col("text"))
      val batch = batchSrc.filter(col("doc_id") >= 400)
        .union(batchSrc.filter(col("doc_id") < 50)
          .select((col("doc_id") + 20000).as("doc_id"), col("text")))
        .withColumn("fp", fp)
      val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
      batch
        .join(hist, Seq("fp"), "left_anti")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("fp"))
        .orderBy(col("doc_id"))
    }),

    // Benchmark-contamination scan: for every training doc, the fraction of
    // its word-3-shingles that appear in any "benchmark" doc (here: the
    // deterministic doc_id % 97 == 0 subset standing in for an eval set).
    // Scale shape: the benchmark shingle set is tiny relative to the corpus
    // (an eval suite is MBs, the corpus is TBs) → distinct benchmark digests
    // are BROADCAST and the per-shingle hit test is a map-side left-semi
    // join; only (doc_id, n_hit/n_shingle) digests are aggregated. No
    // shuffle touches document text.
    "contamination" -> ((s, dir) => {
      // shingle kernel feeds THREE consumers (bench set, totals, hits) AND
      // every later contamination scan over the same corpus — staged once
      // per (session, dir) via StageCache (digests only, never text);
      // persist(DISK_ONLY) at real scale. Same staging rule as bm25-tf and
      // lshVerifiedPairs; a bare localCheckpoint here re-shingled the
      // corpus on every invocation (round-3 verdict's slowest query).
      val sh = stagedShingles(s, dir)
      val benchSh = sh.filter(col("doc_id") % 97 === 0)
        .select(explode(col("shs")).as("sh")).distinct()
      val trainSh = sh.filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"), explode(col("shs")).as("sh"))
      val totals = trainSh.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"))
      val hits = trainSh.join(broadcast(benchSh), Seq("sh"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
      totals.join(hits, Seq("doc_id"), "left")
        .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
        .withColumn("hit_frac",
          round(col("n_hit").cast("double") / col("n_shingles"), 6))
        .withColumn("contaminated", col("hit_frac") >= 0.2)
        .orderBy(col("doc_id"))
    }),

    // Sharded sequence packing: per shard, concat docs in id order and
    // assign each doc to the 2048-token window its first token lands in.
    // seq_tokens > 2048 happens when a doc straddles a boundary — the
    // downstream slicer splits it; the packer only decides membership.
    "pack_sequences" -> ((s, dir) => {
      val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      documents(s, dir)
        .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tok"))
        .withColumn("cum", sum(col("n_tok")).over(w))
        .withColumn("seq_id", expr("(cum - n_tok) div 2048"))
        .groupBy(col("shard"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("seq_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("shard"), col("seq_id"))
    }),

    // THE capstone composition: the full release pipeline in one query —
    // Deterministic per-EPOCH shuffle — the training-order operator:
    // every epoch reads the corpus in a different but REPRODUCIBLE
    // order (order key = md5(epoch:doc_id)), so a crashed epoch resumes
    // at the same permutation and two trainers on the same seed see the
    // same batches. One range-partitioned sort per epoch — exactly the
    // shuffle the reorder semantically requires; at 100 TB the sort key
    // is a digest and text rides it once. The query emits both epochs'
    // first-10 windows; the oracle replays the same md5 ordering (the
    // windows provably differ across epochs — that's the point).
    "epoch_shuffle" -> ((s, dir) => {
      def epoch(e: Int) = documents(s, dir)
        .select(lit(e).as("epoch"), col("doc_id"),
          md5(concat(lit(s"$e:"), col("doc_id").cast("string"))).as("ord"))
        .orderBy(col("ord")).limit(10)
      epoch(1).unionByName(epoch(2))
        .select(col("epoch"), col("doc_id"), col("ord"))
        .orderBy(col("epoch"), col("ord"))
    }),

    // doubled corpus → exact-dedup keeper (one fp-window shuffle) →
    // quality gates (map-side) → deterministic hash split (map-side) →
    // per-(split, lang) manifest stats (one partial+final agg). Two
    // shuffles end-to-end for dedup + curate + split + audit; this is the
    // "what are we actually shipping to the trainer" report.
    "train_manifest" -> ((s, dir) => {
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
        .withColumn("bucket", expr(bucketSqlExpr))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tokens"))
        .orderBy(col("split"), col("lang"))
    }),

    // URL canonicalization dedup — the crawl-frontier step BEFORE any
    // content dedup: the same page arrives as scheme/host-case variants,
    // default-port forms, tracking-parameter decorations, fragments, and
    // trailing slashes. Three deterministic messy variants per doc are
    // synthesized (the multimodal trick: the oracle re-derives them from
    // the same arithmetic and runs the same canonicalizer), collapsed by
    // the canonical form. Map-only regex chain + one digest-keyed groupBy;
    // a production canonicalizer adds param re-sorting (order-insensitive
    // keys) — here the synthesized params are already ordered, noted.
    "url_canonical" -> ((s, dir) => {
      val did = col("doc_id")
      val base = concat(lit("http://w"), did % 7, lit(".site"), did % 13,
        lit(".com/doc/"), did)
      val messy = documents(s, dir).filter(did < 40).select(did.as("doc_id"),
          array(
            concat(lit("HTTP://W"), did % 7, lit(".SITE"), did % 13,
              lit(".COM:80/doc/"), did, lit("#sec"), did % 4),
            concat(base, lit("/")),
            concat(base, lit("?utm_source=feed&utm_medium=email"))
          ).as("urls"))
        .select(col("doc_id"), explode(col("urls")).as("url"))
      val canon = {
        val noFrag = regexp_replace(col("url"), "#.*$", "")
        val noUtm = regexp_replace(noFrag, "[?&]utm_[^&#]*", "")
        val prefix = regexp_replace(
          lower(regexp_extract(noUtm, "^([a-zA-Z]+://[^/?#]+)", 1)),
          ":80$", "")
        val rest = regexp_replace(noUtm, "^[a-zA-Z]+://[^/?#]+", "")
        regexp_replace(concat(prefix, rest), "/$", "")
      }
      messy.withColumn("canonical", canon)
        .groupBy(col("canonical"))
        .agg(count(lit(1)).as("n_variants"),
          countDistinct(col("url")).as("n_distinct_raw"))
        .orderBy(col("canonical"))
    }),

    // Deterministic negative sampling — the contrastive-pair assembly step
    // (anchor, positive, k in-batch negatives): each anchor draws 4
    // negatives as a pure hash function of (anchor, slot), so reruns,
    // shards, and engines agree on every pair. The +1 … % (N−1) offset
    // construction EXCLUDES self by arithmetic, not by a filter that would
    // leave variable-length lists. Map-only over the anchors; N is one
    // broadcast digest row. Negatives join their text length to show the
    // pairs are materializable without moving the corpus twice.
    "neg_samples" -> ((s, dir) => {
      val n = documents(s, dir).agg((max(col("doc_id")) + 1).as("n"))
      val anchors = documents(s, dir).filter(col("doc_id") < 30)
        .select(col("doc_id"), explode(sequence(lit(0), lit(3))).as("slot"))
        .crossJoin(broadcast(n))
        .withColumn("neg_id",
          (col("doc_id") + 1 +
            (col("doc_id") * 2654435761L + col("slot") * 2246822519L) %
              (col("n") - 1)) % col("n"))
      anchors
        .join(documents(s, dir).select(col("doc_id").as("neg_id"),
          col("n_chars").as("neg_chars")), Seq("neg_id"))
        .select(col("doc_id"), col("slot"), col("neg_id"), col("neg_chars"))
        .orderBy(col("doc_id"), col("slot"))
    }),

    // Trained quality classifier — score every doc with the IRLS-fitted
    // logistic model (operators/LogReg): p = σ(w·x) over the cheap text-
    // statistic features, predicted label at 0.5. Map-only scoring (one
    // fused sigmoid expression, weights inlined as literals — the
    // broadcast-model posture); the oracle replays the SAME dumped
    // weights, summing the linear predictor in the same fixed order.
    "logreg_quality" -> ((s, dir) => {
      val w = LogReg.model(s, dir).toSeq
      documents(s, dir)
        // round-14: ONE fused text-stats scan per row feeds label +
        // features (bit-identical values — TextStatsSpec)
        .select(col("doc_id"), TextOps.textStats(col("text")).as("__st"))
        .withColumn("p_raw", LogReg.sigmoid(LogReg.linearFromStats(col("__st"), w)))
        .select(col("doc_id"),
          LogReg.labelFromStats(col("__st")).cast("long").as("y"),
          round(col("p_raw"), 6).as("p_quality"),
          when(col("p_raw") >= 0.5, 1L).otherwise(0L).as("pred"))
        .orderBy(col("doc_id"))
    }),

    // Classifier evaluation off the scored corpus: confusion counts +
    // accuracy — one partial+final aggregation over the map-only scores.
    "logreg_eval" -> ((s, dir) => {
      val w = LogReg.model(s, dir).toSeq
      documents(s, dir)
        .select(TextOps.textStats(col("text")).as("__st"))
        .select(LogReg.labelFromStats(col("__st")).cast("long").as("y"),
          when(LogReg.sigmoid(LogReg.linearFromStats(col("__st"), w)) >= 0.5, 1L)
            .otherwise(0L).as("pred"))
        .agg(sum(col("y") * col("pred")).as("tp"),
          sum((lit(1L) - col("y")) * col("pred")).as("fp"),
          sum((lit(1L) - col("y")) * (lit(1L) - col("pred"))).as("tn"),
          sum(col("y") * (lit(1L) - col("pred"))).as("fn"),
          round(avg((col("y") === col("pred")).cast("double")), 6).as("accuracy"))
    }),

    // K-FOLD cross-validation report for the quality classifier — the
    // generalization answer the held-in eval can't give: each fold's
    // model (trained on the other folds, operators/LogReg.cvModel) scores
    // ITS OWN held-out fold map-only with the dumped weights as literals;
    // per-fold confusion counts + accuracy. Spread in per-fold accuracy
    // is the overfitting signal. The oracle replays each fold's scoring
    // from the same dump (per-fold pivot), never re-fitting.
    "logreg_cv" -> ((s, dir) => {
      LogReg.cvModel(s, dir)
      val byFold = s.read.parquet(LogReg.cvPath(dir)).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (k, rs) => k -> rs.sortBy(_._2).map(_._3).toSeq }
      byFold.map { case (k, wk) =>
        documents(s, dir).filter(col("doc_id") % LogReg.CvFolds === k)
          .select(lit(k).as("fold"), TextOps.textStats(col("text")).as("__st"))
          .select(col("fold"),
            LogReg.labelFromStats(col("__st")).cast("long").as("y"),
            when(LogReg.sigmoid(LogReg.linearFromStats(col("__st"), wk)) >= 0.5, 1L)
              .otherwise(0L).as("pred"))
      }.reduce(_ unionByName _)
        .groupBy(col("fold"))
        .agg(count(lit(1)).as("n_test"),
          sum(col("y") * col("pred")).as("tp"),
          sum((lit(1L) - col("y")) * col("pred")).as("fp"),
          round(avg((col("y") === col("pred")).cast("double")), 6)
            .as("accuracy"))
        .orderBy(col("fold"))
    }),

    // Fit diagnostics: the per-iteration deviance trace the IRLS dump
    // carries (iter 0 = the w=0 start; LogRegSpec pins monotone descent).
    "logreg_trace" -> ((s, dir) => {
      LogReg.model(s, dir)
      s.read.parquet(LogReg.tracePath(dir))
        .select(col("iter"), round(col("deviance"), 6).as("deviance"))
        .orderBy(col("iter"))
    }),

    // Isotonic calibration report: per-score-bin empirical rate (raw,
    // recomputed live from the corpus) beside the PAV-pooled calibrated
    // rate (replayed from the dumped map) — the reliability table that
    // says whether the classifier's probabilities MEAN anything.
    // Calibrated serving = this ≤20-row broadcast join.
    "logreg_calibrate" -> ((s, dir) => {
      val w = LogReg.model(s, dir).toSeq
      LogReg.calibration(s, dir)
      val calMap = s.read.parquet(LogReg.calibPath(dir))
        .select(col("bin"), col("cal_rate"))
      documents(s, dir)
        .select(TextOps.textStats(col("text")).as("__st"))
        .select(LogReg.labelFromStats(col("__st")).as("y"),
          LogReg.sigmoid(LogReg.linearFromStats(col("__st"), w)).as("p"))
        .withColumn("bin", LogReg.binOf(col("p")))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), round(avg(col("y")), 6).as("raw_rate"))
        .join(broadcast(calMap), "bin")
        .select(col("bin"), col("n"), col("raw_rate"),
          round(col("cal_rate"), 6).as("cal_rate"))
        .orderBy(col("bin"))
    }),

    // Trained MULTICLASS lang-id (operators/LangId): the dumped
    // one-vs-rest model, one (class, j) weight per row — the dumped-model
    // replay face (the oracle reads the same parquet; the fit is
    // engine-specific and never re-run).
    "langid_model" -> ((s, dir) => {
      graft.operators.LangId.model(s, dir)
      s.read.parquet(graft.operators.LangId.modelPath(dir))
        .select(col("class"), col("j"), col("feat"), round(col("w"), 6).as("w"))
        .orderBy(col("class"), col("j"))
    }),

    // Lang-id confusion matrix: map-only K-score argmax (weights as
    // literals, round-6 scores, earliest-class tiebreak) then one
    // partial+final count aggregation — the oracle recomputes the SAME
    // scoring from the dump, so the whole multiclass serve path
    // hash-checks cross-engine.
    "langid_eval" -> ((s, dir) => {
      graft.operators.LangId.scored(s, dir)
        .groupBy(col("lang"), col("pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("pred"))
    }),

    // Headline accuracy beside the majority-class share — the "did the
    // model learn ANYTHING" gate (LangIdSpec pins accuracy > majority).
    "langid_accuracy" -> ((s, dir) => {
      graft.operators.LangId.scored(s, dir)
        .agg(count(lit(1)).as("n"),
          sum((col("lang") === col("pred")).cast("long")).as("n_correct"),
          round(avg((col("lang") === col("pred")).cast("double")), 6)
            .as("accuracy"))
        .crossJoin(broadcast(
          documents(s, dir).groupBy(col("lang")).agg(count(lit(1)).as("cn"))
            .agg(round(max(col("cn")).cast("double") /
              sum(col("cn")).cast("double"), 6).as("majority_share"))))
    })
  )

  val oracles: Map[String, String] = Map(

    "html_extract" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>Doc ' || doc_id ||
        |    '</title><style>body{font-size:' || (doc_id % 7 + 9) ||
        |    'px}</style><script>var id=' || doc_id ||
        |    ';track(id);</script></head><body><nav>Home | About | Page ' ||
        |    (doc_id % 13) ||
        |    '</nav><div class="content"><p>' || text ||
        |    '</p><span>A &amp; B &lt;tag&gt;</span></div>' ||
        |    '<footer>&copy; example.com</footer></body></html>' AS html
        |  FROM documents),
        |m AS (SELECT doc_id,
        |        regexp_extract(html, '<div class="content">(.*?)</div>', 1) AS main
        |      FROM h),
        |c AS (SELECT doc_id,
        |        trim(regexp_replace(
        |          replace(replace(replace(
        |            regexp_replace(main, '<[^>]+>', ' ', 'g'),
        |            '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
        |          '\s+', ' ', 'g')) AS clean
        |      FROM m)
        |SELECT doc_id, clean, length(clean) AS n_chars
        |FROM c ORDER BY doc_id""".stripMargin,

    "domain_stats" ->
      s"""WITH u AS (
         |  SELECT doc_id, text,
         |    'w' || (doc_id % 7) || '.site' || (doc_id % 13) || '.' ||
         |      (['com','org','net','io','edu'])[(doc_id % 5 + 1)] AS host,
         |    'site' || (doc_id % 13) || '.' ||
         |      (['com','org','net','io','edu'])[(doc_id % 5 + 1)] AS domain
         |  FROM documents)
         |SELECT domain, count(*) AS n_docs,
         |  sum(len(${TextQueries.duckToks("text")}))::BIGINT AS total_tokens,
         |  count(DISTINCT host) AS n_hosts
         |FROM u GROUP BY domain ORDER BY domain""".stripMargin,

    "domain_cap" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'w' || (doc_id % 7) || '.site' || (doc_id % 13) || '.' ||
        |      (['com','org','net','io','edu'])[(doc_id % 5 + 1)] AS host,
        |    'site' || (doc_id % 13) || '.' ||
        |      (['com','org','net','io','edu'])[(doc_id % 5 + 1)] AS domain
        |  FROM documents),
        |r AS (SELECT *, row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rn
        |      FROM u)
        |SELECT doc_id, host, domain FROM r WHERE rn <= 5
        |ORDER BY doc_id""".stripMargin,

    "global_rownum" ->
      """SELECT doc_id, n_chars,
        |  row_number() OVER (ORDER BY n_chars, doc_id)::BIGINT AS rn
        |FROM documents ORDER BY rn""".stripMargin,

    "weighted_sample" ->
      """SELECT doc_id, n_chars,
        |  round(pow(((doc_id * 2654435761) % 1000000007)::DOUBLE / 1000000007.0,
        |    1.0 / n_chars::DOUBLE), 6) AS es_key
        |FROM documents
        |ORDER BY es_key DESC, doc_id ASC
        |LIMIT 50""".stripMargin,
    "data_split" ->
      s"""SELECT doc_id, $bucketDuck AS bucket,
         |  CASE WHEN $bucketDuck < 80 THEN 'train'
         |       WHEN $bucketDuck < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin,

    "stratified_sample" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS cnt
        |  FROM documents)
        |SELECT doc_id, lang, rn FROM r
        |WHERE rn <= (cnt + 4) // 5
        |ORDER BY lang, rn""".stripMargin,

    "corpus_mix" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, len(${TextQueries.duckToks("text")})::BIGINT AS n_tok
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, lang, n_tok,
         |    sum(n_tok) OVER (PARTITION BY lang
         |      ORDER BY (doc_id * 2654435761) % 4294967296, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
         |  FROM t)
         |SELECT doc_id, lang, n_tok, cum FROM c
         |WHERE cum - n_tok < CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2000
         |  WHEN 'fr' THEN 2000 WHEN 'es' THEN 1000 ELSE NULL END
         |ORDER BY lang, cum""".stripMargin,

    "incremental_dedup" ->
      s"""WITH fps AS (
         |  SELECT doc_id, ${TextQueries.duckFingerprint("text")} AS fp FROM documents),
         |hist AS (SELECT DISTINCT fp FROM fps WHERE doc_id < 400),
         |batch AS (
         |  SELECT doc_id, fp FROM fps WHERE doc_id >= 400
         |  UNION ALL
         |  SELECT doc_id + 20000, fp FROM fps WHERE doc_id < 50),
         |nn AS (
         |  SELECT doc_id, fp FROM batch
         |  WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.fp = batch.fp)),
         |r AS (
         |  SELECT doc_id, fp,
         |    row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
         |  FROM nn)
         |SELECT doc_id, fp FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "contamination" ->
      s"""WITH ${PipelineQueries.duckShingleCtes("SELECT doc_id, text FROM documents")},
         |bench AS (
         |  SELECT DISTINCT s FROM (SELECT unnest(shs) AS s FROM sh WHERE doc_id % 97 = 0)),
         |train AS (
         |  SELECT doc_id, unnest(shs) AS s FROM sh WHERE doc_id % 97 <> 0),
         |tot AS (SELECT doc_id, count(*) AS n_shingles FROM train GROUP BY doc_id),
         |hit AS (
         |  SELECT doc_id, count(*) AS n_hit FROM train
         |  WHERE EXISTS (SELECT 1 FROM bench b WHERE b.s = train.s)
         |  GROUP BY doc_id)
         |SELECT tot.doc_id, n_shingles, coalesce(n_hit, 0)::BIGINT AS n_hit,
         |  round(coalesce(n_hit, 0)::DOUBLE / n_shingles, 6) AS hit_frac,
         |  round(coalesce(n_hit, 0)::DOUBLE / n_shingles, 6) >= 0.2 AS contaminated
         |FROM tot LEFT JOIN hit ON tot.doc_id = hit.doc_id
         |ORDER BY tot.doc_id""".stripMargin,

    "pack_sequences" ->
      s"""WITH t AS (
         |  SELECT doc_id, doc_id % 8 AS shard,
         |    len(${TextQueries.duckToks("text")})::BIGINT AS n_tok
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, shard, n_tok,
         |    sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
         |  FROM t)
         |SELECT shard, (cum - n_tok) // 2048 AS seq_id, count(*) AS n_docs,
         |  sum(n_tok)::BIGINT AS seq_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM c GROUP BY shard, seq_id
         |ORDER BY shard, seq_id""".stripMargin,

    "epoch_shuffle" ->
      """WITH e AS (
        |  SELECT 1 AS epoch, doc_id, md5('1:' || doc_id::VARCHAR) AS ord
        |  FROM documents ORDER BY ord LIMIT 10),
        |f AS (
        |  SELECT 2 AS epoch, doc_id, md5('2:' || doc_id::VARCHAR) AS ord
        |  FROM documents ORDER BY ord LIMIT 10)
        |SELECT epoch, doc_id, ord FROM (
        |  SELECT * FROM e UNION ALL SELECT * FROM f)
        |ORDER BY epoch, ord""".stripMargin,

    "train_manifest" ->
      s"""WITH src AS (
         |  SELECT doc_id, lang, text FROM documents
         |  UNION ALL SELECT doc_id + 10000, lang, text FROM documents),
         |f AS (
         |  SELECT doc_id, lang,
         |    ${TextQueries.duckFingerprint("text")} AS fp,
         |    len(${TextQueries.duckToks("text")})::BIGINT AS n_tok,
         |    round(CASE WHEN length(text) = 0 THEN 0.0
         |      ELSE length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE
         |           / length(text) END, 6) AS digit_ratio
         |  FROM src),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
         |  FROM f),
         |kept AS (
         |  SELECT doc_id, lang, n_tok FROM r
         |  WHERE rn = 1 AND n_tok BETWEEN 10 AND 512 AND digit_ratio <= 0.2),
         |sp AS (
         |  SELECT lang, n_tok,
         |    CASE WHEN $bucketDuck < 80 THEN 'train'
         |         WHEN $bucketDuck < 90 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM kept)
         |SELECT split, lang, count(*) AS n_docs, sum(n_tok)::BIGINT AS total_tokens
         |FROM sp GROUP BY split, lang
         |ORDER BY split, lang""".stripMargin,

    "url_canonical" ->
      """WITH m AS (
        |  SELECT doc_id, unnest([
        |    'HTTP://W' || (doc_id % 7) || '.SITE' || (doc_id % 13) ||
        |      '.COM:80/doc/' || doc_id || '#sec' || (doc_id % 4),
        |    'http://w' || (doc_id % 7) || '.site' || (doc_id % 13) ||
        |      '.com/doc/' || doc_id || '/',
        |    'http://w' || (doc_id % 7) || '.site' || (doc_id % 13) ||
        |      '.com/doc/' || doc_id || '?utm_source=feed&utm_medium=email'
        |  ]) AS url
        |  FROM documents WHERE doc_id < 40),
        |c AS (
        |  SELECT url,
        |    regexp_replace(
        |      regexp_replace(
        |        lower(regexp_extract(
        |          regexp_replace(regexp_replace(url, '#.*$', ''),
        |            '[?&]utm_[^&#]*', '', 'g'),
        |          '^([a-zA-Z]+://[^/?#]+)', 1)),
        |        ':80$', '') ||
        |      regexp_replace(
        |        regexp_replace(regexp_replace(url, '#.*$', ''),
        |          '[?&]utm_[^&#]*', '', 'g'),
        |        '^[a-zA-Z]+://[^/?#]+', ''),
        |      '/$', '') AS canonical
        |  FROM m)
        |SELECT canonical, count(*) AS n_variants,
        |  count(DISTINCT url) AS n_distinct_raw
        |FROM c GROUP BY canonical ORDER BY canonical""".stripMargin,

    "neg_samples" ->
      """WITH n AS (SELECT max(doc_id) + 1 AS n FROM documents),
        |a AS (
        |  SELECT d.doc_id, s.slot,
        |    (d.doc_id + 1 +
        |      (d.doc_id * 2654435761 + s.slot * 2246822519) % (n.n - 1)) % n.n
        |      AS neg_id
        |  FROM documents d
        |  CROSS JOIN generate_series(0, 3) s(slot)
        |  CROSS JOIN n
        |  WHERE d.doc_id < 30)
        |SELECT a.doc_id, a.slot, a.neg_id, d2.n_chars AS neg_chars
        |FROM a JOIN documents d2 ON d2.doc_id = a.neg_id
        |ORDER BY a.doc_id, a.slot""".stripMargin,

    "logreg_quality" ->
      s"""WITH w AS ($duckLogregWeights),
         |s AS (SELECT doc_id,
         |        ($duckLogregY)::BIGINT AS y,
         |        1.0 / (1.0 + exp(-($duckLogregZ))) AS p_raw
         |      FROM documents CROSS JOIN w)
         |SELECT doc_id, y, round(p_raw, 6) AS p_quality,
         |  (CASE WHEN p_raw >= 0.5 THEN 1 ELSE 0 END)::BIGINT AS pred
         |FROM s ORDER BY doc_id""".stripMargin,

    "logreg_eval" ->
      s"""WITH w AS ($duckLogregWeights),
         |s AS (SELECT ($duckLogregY)::BIGINT AS y,
         |        (CASE WHEN 1.0 / (1.0 + exp(-($duckLogregZ))) >= 0.5
         |          THEN 1 ELSE 0 END)::BIGINT AS pred
         |      FROM documents CROSS JOIN w)
         |SELECT sum(y * pred)::BIGINT AS tp,
         |  sum((1 - y) * pred)::BIGINT AS fp,
         |  sum((1 - y) * (1 - pred))::BIGINT AS tn,
         |  sum(y * (1 - pred))::BIGINT AS fn,
         |  round(avg(CASE WHEN y = pred THEN 1.0 ELSE 0.0 END), 6) AS accuracy
         |FROM s""".stripMargin,

    "logreg_trace" ->
      """SELECT iter, round(deviance, 6) AS deviance
        |FROM read_parquet('__LOGREG_TRACE__/*.parquet')
        |ORDER BY iter""".stripMargin,

    "logreg_cv" -> {
      val folds = (0 until LogReg.CvFolds).map { k =>
        s"""SELECT $k AS fold, ($duckLogregY)::BIGINT AS y,
           |  (CASE WHEN 1.0 / (1.0 + exp(-($duckLogregZ))) >= 0.5
           |    THEN 1 ELSE 0 END)::BIGINT AS pred
           |FROM documents CROSS JOIN (${duckLogregCvWeights(k)}) w
           |WHERE doc_id % ${LogReg.CvFolds} = $k""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH s AS (
         |$folds)
         |SELECT fold, count(*)::BIGINT AS n_test,
         |  sum(y * pred)::BIGINT AS tp,
         |  sum((1 - y) * pred)::BIGINT AS fp,
         |  round(avg(CASE WHEN y = pred THEN 1.0 ELSE 0.0 END), 6) AS accuracy
         |FROM s GROUP BY fold ORDER BY fold""".stripMargin
    },

    "logreg_calibrate" ->
      s"""WITH w AS ($duckLogregWeights),
         |s AS (SELECT ($duckLogregY) AS y,
         |        1.0 / (1.0 + exp(-($duckLogregZ))) AS p
         |      FROM documents CROSS JOIN w),
         |b AS (SELECT least(floor(p * ${LogReg.CalBins}),
         |          ${LogReg.CalBins - 1})::BIGINT AS bin,
         |        count(*) AS n, round(avg(y), 6) AS raw_rate
         |      FROM s GROUP BY 1),
         |c AS (SELECT bin, cal_rate
         |      FROM read_parquet('__LOGREG_CAL__/*.parquet'))
         |SELECT b.bin, b.n, b.raw_rate, round(c.cal_rate, 6) AS cal_rate
         |FROM b JOIN c USING (bin) ORDER BY b.bin""".stripMargin,

    "langid_model" ->
      """SELECT class, j, feat, round(w, 6) AS w
        |FROM read_parquet('__LANGID_W__/*.parquet')
        |ORDER BY class, j""".stripMargin,

    "langid_eval" ->
      s"""WITH ${duckLangidScored}
         |SELECT lang, pred, count(*)::BIGINT AS n
         |FROM p GROUP BY lang, pred ORDER BY lang, pred""".stripMargin,

    "langid_accuracy" ->
      s"""WITH ${duckLangidScored},
         |mj AS (
         |  SELECT round(max(cn)::DOUBLE / sum(cn)::DOUBLE, 6) AS majority_share
         |  FROM (SELECT count(*) AS cn FROM documents GROUP BY lang))
         |SELECT count(*)::BIGINT AS n,
         |  sum(CASE WHEN lang = pred THEN 1 ELSE 0 END)::BIGINT AS n_correct,
         |  round(avg(CASE WHEN lang = pred THEN 1.0 ELSE 0.0 END), 6) AS accuracy,
         |  any_value(majority_share) AS majority_share
         |FROM p CROSS JOIN mj""".stripMargin
  )

  /** The lang-id scoring replay: pivot the dumped (class, j, w) rows into
    * one wide weight row, compute the 14 shared feature expressions once
    * per doc, each class's round-6 linear score in fixed j order, then
    * the earliest-class-tiebreak argmax as a CASE chain (branch k fires
    * iff z_k ≥ every LATER class's score — the first true branch is the
    * argmax with ties to the asc-earliest class, exactly
    * LangId.predict's strict-greater fold).
    */
  private def duckLangidScored: String = {
    import graft.operators.LangId
    val t = TextQueries.duckToks("text")
    val xs = duckLogregX ++ LangId.FeatTokens.map { tok =>
      s"""CASE WHEN len($t) = 0 THEN 0.0
         | ELSE len(list_filter($t, x -> x = '$tok'))::DOUBLE / len($t)::DOUBLE END""".stripMargin
    }
    val pivot = LangId.Classes.flatMap { k =>
      (0 until LangId.Dim).map(j =>
        s"max(CASE WHEN class = '$k' AND j = $j THEN w END) AS ${k}_w$j")
    }.mkString("SELECT ", ", ", " FROM read_parquet('__LANGID_W__/*.parquet')")
    val featCols = xs.zipWithIndex
      .map { case (x, j) => s"($x) AS x$j" }.mkString(",\n    ")
    val zCols = LangId.Classes.map { k =>
      val z = (0 until LangId.Dim).map(j => s"f.x$j * w.${k}_w$j").mkString(" + ")
      s"round($z, 6) AS z_$k"
    }.mkString(",\n    ")
    val branches = LangId.Classes.init.zipWithIndex.map { case (k, i) =>
      val later = LangId.Classes.drop(i + 1).map(k2 => s"z_$k >= z_$k2")
      s"WHEN ${later.mkString(" AND ")} THEN '$k'"
    }.mkString("\n      ")
    s"""w AS ($pivot),
       |f AS (SELECT doc_id, lang,
       |    $featCols
       |  FROM documents),
       |s AS (SELECT f.doc_id, f.lang,
       |    $zCols
       |  FROM f CROSS JOIN w),
       |p AS (SELECT doc_id, lang,
       |    CASE $branches
       |      ELSE '${LangId.Classes.last}' END AS pred
       |  FROM s)""".stripMargin
  }

  /** Pivot the dumped weight rows (j, feat, w) into one row of w0..w5 —
    * the oracle's broadcast of the trained model.
    */
  private def duckLogregWeights: String =
    (0 until LogReg.Dim)
      .map(j => s"max(CASE WHEN j = $j THEN w END) AS w$j")
      .mkString("SELECT ", ", ", " FROM read_parquet('__LOGREG_W__/*.parquet')")

  /** Fold-k pivot of the CV dump (fold, j, w) into one w0..w5 row. */
  private def duckLogregCvWeights(k: Int): String =
    (0 until LogReg.Dim)
      .map(j => s"max(CASE WHEN j = $j THEN w END) AS w$j")
      .mkString("SELECT ", ", ",
        s" FROM read_parquet('__LOGREG_CV__/*.parquet') WHERE fold = $k")

  /** The quality label LogReg.label computes: type-token ratio ≥ 0.7
    * (the Gopher-style non-repetitive-doc gate) — exact integer-ratio
    * arithmetic, so both engines compare the identical double.
    */
  private def duckLogregY: String = {
    val t = TextQueries.duckToks("text")
    s"""CASE WHEN len($t) = 0 THEN 0
       | WHEN len(list_distinct($t))::DOUBLE / len($t)::DOUBLE >= 0.7 THEN 1
       | ELSE 0 END""".stripMargin
  }

  /** The linear predictor over the SAME feature expressions TextOps
    * computes (the quality_scores twins), summed in the same left-to-right
    * order as LogReg.linear — the only cross-engine divergence left in the
    * score is the exp() ULP, absorbed by round-6.
    */
  /** The six LogReg feature expressions, model order (x0 = bias) — ONE
    * SQL definition shared by the binary quality scorers and the
    * multiclass [[graft.operators.LangId]] replay.
    */
  private[queries] def duckLogregX: Seq[String] = {
    val t = TextQueries.duckToks("text")
    val stops = TextOps.Stopwords.map(w => s"'$w'").mkString(", ")
    Seq(
      "1.0",
      s"len($t)::DOUBLE / 100.0",
      s"""CASE WHEN len($t) = 0 THEN 0.0
         | ELSE list_sum(list_transform($t, x -> length(x)))::DOUBLE / len($t)::DOUBLE END""".stripMargin,
      """CASE WHEN length(text) = 0 THEN 0.0
        | ELSE length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE / length(text)::DOUBLE END""".stripMargin,
      """CASE WHEN length(text) = 0 THEN 0.0
        | ELSE length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / length(text)::DOUBLE END""".stripMargin,
      s"""CASE WHEN len($t) = 0 THEN 0.0
         | ELSE len(list_filter($t, x -> list_contains([$stops], x)))::DOUBLE / len($t)::DOUBLE END""".stripMargin)
  }

  private def duckLogregZ: String =
    duckLogregX.zipWithIndex
      .map { case (x, j) => s"($x) * w.w$j" }
      .mkString(" + ")
}
