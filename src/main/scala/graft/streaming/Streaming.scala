package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events table.
  *
  * The reference is strictly request/response + batch ETL (SURVEY.md §2B:
  * streaming ABSENT) — this is north-star scope. Design rule: every
  * streaming computation is the SAME DataFrame transformation as its batch
  * counterpart (RelationalQueries "events_window", TextQueries-style aggs),
  * applied to a readStream source — Structured Streaming's incremental
  * execution of an unchanged logical plan. Batch results are therefore the
  * exact oracle for the streaming results (asserted in StreamingSpec).
  *
  * At scale: the parquet file source is swapped for Kafka/queue sources;
  * watermark + windowed state keeps per-executor state bounded; state store
  * compaction/checkpointing are Spark-managed.
  */
object Streaming {

  /** Streaming read of an events parquet directory, ts normalized to
    * TimestampType exactly like the batch reader ([[graft.Tables.events]]).
    * The file source needs an explicit schema, and the fixture's physical
    * ts type has changed across driver drops (TIMESTAMP(NANOS) → long under
    * nanosAsLong; round-7: timestamp[us] NTZ) — so take the schema from the
    * file footer via a one-off batch read and normalize per type, keeping
    * the stream reader generation-agnostic the same way the batch reader is.
    */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.tune(spark) // pins session zone UTC: NTZ cast below is zone-sensitive
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val raw = spark.readStream
      .schema(fileSchema)
      .option("pathGlobFilter", "events.parquet") // file source needs a dir
      .parquet(dir)
    fileSchema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }

  /** Tumbling-window counts/sums per event type — identical transformation
    * for batch and streaming input (the batch run is the oracle).
    * Watermark bounds state: windows older than 2 hours of event time are
    * finalized and evicted.
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      // group by the window STRUCT (not .getField("start")): append mode
      // requires the watermarked event-time column to be visible in the
      // grouping keys; the start field is projected out after the agg
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Sliding (hopping) window aggregation — the streaming face of the
    * batch `sliding_window_agg` query (identical transformation; the
    * batch run is the oracle). 1-hour windows every 15 minutes: each
    * event expands into len/slide = 4 open windows, so per-key state is
    * 4× the tumbling footprint but still bounded by the watermark
    * horizon; eviction finalizes each window when the watermark passes
    * its end, exactly as in the tumbling face.
    */
  def slidingWindowAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n"), col("total_value"))

  /** CHAINED stateful operators — two window aggregations in ONE streaming
    * query (hourly partials re-aggregated into 4-hour rollups), the
    * pre-Spark-3.4 impossibility that forced intermediate Kafka topics
    * between stateful stages. `window(col("window"), …)` re-windows the
    * first aggregate's event-time window column, so watermark propagation
    * crosses the stage boundary: the downstream agg finalizes a 4-hour
    * window only when the watermark proves every upstream hourly partial
    * inside it is final. The plan carries TWO state stores (spec-pinned
    * via the progress metrics).
    *
    * At scale this halves the infrastructure of every rollup cascade
    * (raw → minutely → hourly → daily): one query, one checkpoint, no
    * replay topic between tiers — and the downstream state is one row per
    * open coarse window, not per event.
    */
  def chainedWindowAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("hour_value"))
      .groupBy(window(col("window"), "4 hours"), col("event_type"))
      .agg(sum(col("n")).as("n"), round(sum(col("hour_value")), 2).as("total_value"))
      .select(unix_micros(col("window.start")).as("win4_start_us"),
        col("event_type"), col("n"), col("total_value"))

  /** Native session-window aggregation — the streaming face of the batch
    * `session_window_agg` query (identical transformation; the batch run
    * is the oracle). Spark maintains MERGING session state per user: an
    * event within 30 minutes of an open session extends it (and can fuse
    * two open sessions); the watermark closes and emits sessions whose
    * [start, last+gap) window has provably no more members. The one
    * built-in stateful operator whose state is interval-shaped rather
    * than key/window-shaped.
    */
  def sessionWindowAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("value_sum"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"), col("value_sum"))

  /** Streaming exactly-once dedup: drop replayed event ids, state bounded
    * by the watermark (duplicates are only expected within the lateness
    * horizon). Streaming twin of the batch dedup_exact operator family.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming read of a documents parquet directory — the corpus as a
    * stream (the shape of continuous ingestion: each arriving file is a
    * micro-batch).
    */
  def readDocumentsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = graft.Tables.documents(spark, dir).schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
  }

  /** The embed pipeline as a stream: EXACTLY the batch projection (fused
    * native kernel) applied to a streaming source — map-only, so it is a
    * stateless streaming query (no watermark, no state store); at scale
    * this is continuous ingestion embedding at file-arrival latency.
    */
  def embedStream(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.TextOps.hashEmbedFused(
        graft.functions.TextOps.passageText(col("text"))).as("embedding"))

  /** Streaming retrieval: score arriving documents against a SMALL query
    * set — the continuous-ingestion face of knn search ("alert me when a
    * document similar to any watched query arrives"). The query table is
    * the broadcast side of a stream-static equi-join on a constant key
    * (i.e. each micro-batch fans out over the watched queries map-side);
    * embedding uses the same fused kernel as the batch path, so the
    * per-(query, doc) scores are bit-identical to batch scoring —
    * StreamingSpec asserts per-trigger parity. Stateless: no watermark, no
    * state store; at 100 TB-a-day ingest this is a map-only job at
    * file/queue-arrival latency.
    *
    * `queries` has (qid, q_emb). Output: (qid, doc_id, sim).
    */
  def retrievalScores(docs: DataFrame, queries: DataFrame): DataFrame = {
    val embedded = docs.select(col("doc_id"),
        graft.functions.TextOps.hashEmbedFused(
          graft.functions.TextOps.passageText(col("text"))).as("emb"))
      .withColumn("__one", lit(1))
    embedded.join(broadcast(queries.withColumn("__one", lit(1))), "__one")
      .withColumn("sim", round(
        graft.functions.VectorOps.cosine(col("emb"), col("q_emb")), 6))
      .select(col("qid"), col("doc_id"), col("sim"))
  }

  /** Frozen BM25 corpus statistics — the index metadata a streaming scorer
    * carries: corpus size, average document length, per-query-term document
    * frequencies. KBs regardless of corpus size.
    */
  case class Bm25Stats(nDocs: Long, avgdl: Double, df: Map[String, Long])

  /** Snapshot the staged batch inverted-index digests into [[Bm25Stats]] —
    * the "build index offline, score online" split: batch owns the
    * corpus-level pass, the stream scores against the frozen snapshot.
    */
  def bm25Snapshot(s: SparkSession, dir: String, qTerms: Seq[String]): Bm25Stats = {
    // dfMap is collected to the driver: sound only while it stays index
    // METADATA (a handful of query terms), never a per-corpus table
    require(qTerms.size <= 1024,
      s"bm25Snapshot collects one df per query term; ${qTerms.size} terms is a corpus-sized pull")
    val tf = graft.queries.TextQueries.bm25Tf(s, dir)
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val st = dl.agg(count(lit(1)), avg(col("dl"))).head()
    val dfMap = tf.filter(col("tok").isin(qTerms: _*))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Bm25Stats(st.getLong(0), st.getDouble(1), dfMap)
  }

  /** Streaming BM25 scoring: arriving documents scored for a fixed term
    * query against the FROZEN stats snapshot — a pure projection (per-doc
    * term counts via array HOFs, idf/avgdl from the broadcast snapshot, the
    * same double literals as the batch scorer), so it is a stateless
    * streaming query; per-doc scores match the batch BM25 pipeline
    * (StreamingSpec asserts parity). The lexical twin of retrievalScores.
    */
  def bm25Stream(docs: DataFrame, stats: Bm25Stats, qTerms: Seq[String]): DataFrame = {
    val staged = docs
      .withColumn("toks", graft.functions.TextOps.tokens(col("text")))
      .withColumn("dl", size(col("toks")).cast("long"))
    def tfOf(term: String) =
      size(filter(col("toks"), t => t === lit(term))).cast("long")
    val contribs = qTerms.map { term =>
      val dfv = stats.df.getOrElse(term, 0L)
      // same IEEE op sequence as the batch scorer's column expression
      val idf = math.log((stats.nDocs - dfv + 0.5) / (dfv + 0.5) + 1.0)
      val tfc = tfOf(term)
      when(tfc > 0,
        lit(idf) * (tfc * lit(2.2)) /
          (tfc + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / lit(stats.avgdl))))
        .otherwise(lit(0.0))
    }
    val hits = qTerms.map(t => when(tfOf(t) > 0, 1L).otherwise(0L))
    staged.select(col("doc_id"),
        round(contribs.reduce(_ + _), 6).as("score"),
        hits.reduce(_ + _).as("n_terms_hit"))
      .filter(col("n_terms_hit") > 0)
  }

  /** Streaming contamination check — the batch `contamination` gate at
    * ingestion time: each arriving document's distinct shingle set is
    * intersected with the benchmark shingle set (an eval suite is MBs vs a
    * TB corpus, so it ships as a broadcast literal/variable, here a typed
    * literal array). Pure projection — no explode, no aggregation, no
    * streaming state; per-doc results are identical to the batch query's
    * (n_shingles, n_hit, hit_frac, contaminated) columns (asserted in
    * StreamingSpec).
    */
  def contaminationStream(docs: DataFrame, benchShingles: Array[Long]): DataFrame = {
    val shs = graft.operators.Dedup.shingleHashes(
      graft.functions.TextOps.tokenHashes(col("text")))
    docs.select(col("doc_id"), shs.as("shs"))
      .select(col("doc_id"),
        size(col("shs")).cast("long").as("n_shingles"),
        size(array_intersect(col("shs"), typedLit(benchShingles))).cast("long").as("n_hit"))
      .withColumn("hit_frac", round(when(col("n_shingles") === 0, 0.0)
        .otherwise(col("n_hit").cast("double") / col("n_shingles")), 6))
      .withColumn("contaminated", col("hit_frac") >= 0.2)
  }

  /** Per-query top-k over scored (qid, doc_id, sim) rows — shared by the
    * batch oracle and the per-trigger `foreachBatch` ranking of the
    * streaming twin (a global top-k is an aggregation, so the stream ranks
    * each micro-batch in its sink).
    */
  def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col("doc_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Continuous serving of a TRAINED IVF index: each micro-batch of query
    * vectors (qid, q_emb) probes the static cell-partitioned layout
    * exactly like the batch `ann_ivf_kmeans_batch` path — per-qid centroid
    * probe over the broadcast trained centers, cell equi-join against only
    * the probed partitions, per-qid top-k (Ann.ivfSearchBatch, the
    * identical plan). foreachBatch is the right tool here: the per-trigger
    * ranking needs non-time windows (unsupported on a streaming frame) and
    * the index probe is already a batch-shaped job against the layout; at
    * scale this is the standard "stream of queries served against a
    * static index" deployment, re-reading only probed cell directories
    * per trigger. StreamingSpec asserts per-trigger output ≡ the batch
    * search over exactly that trigger's queries.
    */
  def ivfServe(queries: DataFrame, layoutPath: String, cents: DataFrame,
               k: Int, nprobe: Int)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ivf = batch.sparkSession.read.parquet(layoutPath)
        sink(graft.operators.Ann.ivfSearchBatch(ivf, batch, "cell", cents,
          "vec_id", "embedding", k, nprobe), batchId)
      }
      .start()

  /** Continuous IVFADC serving: each micro-batch of query vectors
    * (qid, q_emb) is served by `Ivfpq.searchBatchResidual` — union-of-
    * probed-cells pruned scan over the 8-byte residual codes, literal ADC
    * tables, TopKPerKey shortlist, exact rescore of shortlist rows only.
    * The trigger's queries are collected to the driver: a serving batch
    * is API-sized, and the probe/table arithmetic is driver math over
    * broadcast index metadata by design (same class as the single-query
    * probe). StreamingSpec asserts per-trigger ≡ the batch search over
    * exactly that trigger's queries.
    */
  def ivfpqServe(queries: DataFrame, sfDir: String, k: Int, nprobe: Int,
                 shortlistN: Int = 20,
                 // maintenance/production faces pass straight through to
                 // the batch search: serve an appended/tombstoned/compacted
                 // caller-owned layout, and/or a metadata pre-filter
                 codesDirOverride: Option[String] = None,
                 rescoreDirOverride: Option[String] = None,
                 filterIds: Option[DataFrame] = None,
                 // false when the stream's qids are request ids rather
                 // than corpus vec_ids (see Ivfpq.searchBatchResidual)
                 excludeSelf: Boolean = true)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val qs = batch.select(col("qid"),
            graft.functions.VectorOps.l2Normalize(
              graft.functions.VectorOps.toDoubleArray(col("q_emb"))).as("qn"))
          .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
        if (qs.nonEmpty)
          sink(graft.operators.Ivfpq.searchBatchResidual(
            batch.sparkSession, sfDir, qs, k, shortlistN, nprobe,
            codesDirOverride = codesDirOverride,
            rescoreDirOverride = rescoreDirOverride,
            filterIds = filterIds, excludeSelf = excludeSelf), batchId)
      }
      .start()

  /** REGISTRY-RESOLVED batch retrieval — one serve call against
    * whatever index is registered for a corpus table (round-11 verdict
    * #6): the graph registration wins when present (better recall at a
    * smaller scored budget — the same precedence the transparent
    * rewrites encode), else the IVF registration serves through the
    * skew-hardened explicit batch face (Ann.ivfSearchBatchTopK at the
    * REGISTRATION'S nprobe — the same probe width the rewrites honor), else the call refuses
    * loudly. Output normalized to (qid, vec_id, sim, rnk) across both
    * routes. The batch twin [[indexServe]] streams over — registered
    * queries oracle THIS face (index_serve_batch replays the graph walk
    * verbatim), StreamingSpec pins per-trigger ≡ one batch serve.
    */
  def indexServeBatch(panel: DataFrame, corpusPath: String, k: Int,
                      // optional metadata-filter route (round-12 verdict
                      // "What's missing" #2 — filtered serving symmetry):
                      // graph registrations serve through the ACORN pool
                      // (Hnsw.searchFilteredIn — the predicate ranges over
                      // (qid, vec_id, sim), the explicit filtered face's
                      // contract), IVF through the whole-cell composition
                      // (the predicate ranges over the corpus row and is
                      // applied BEFORE the per-cell rank, so the result is
                      // exactly "top-k matching rows of each qid's probed
                      // cell" — the single face's filtered-search
                      // semantics, exact within the cell)
                      filter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val spark = panel.sparkSession
    // the filter contract is ROUTE-DEPENDENT by design (the two faces
    // filter different frames); an unresolvable predicate must fail with
    // the contract spelled out, not a bare unresolved-column error on
    // whatever route the registry happened to pick (round-13 review)
    def contractError(route: String, schema: String, ae: Throwable): Nothing =
      sys.error(s"indexServeBatch filter did not resolve on the $route " +
        s"route, which filters $schema — registry-resolved serving picks " +
        s"the route, so the predicate must fit the index that covers the " +
        s"table (cause: ${ae.getMessage})")
    graft.plans.HnswGraphRegistry.lookup(Seq(corpusPath)) match {
      case Some(e) =>
        (filter match {
          case Some(pred) =>
            // resolve the predicate against the pool SCHEMA first, on an
            // empty local frame (driver-only): the walk's own failures
            // (missing artifacts) must surface as themselves, and a
            // typo'd predicate must fail BEFORE paying a graph walk
            // (round-13 second-pass review finding)
            import spark.implicits._
            try Seq.empty[(Long, Long, Double)]
              .toDF("qid", "vec_id", "sim").filter(pred)
            catch { case ae: org.apache.spark.sql.AnalysisException =>
              contractError("GRAPH", "the visited pool (qid, vec_id, sim)", ae) }
            graft.operators.Hnsw.searchFilteredIn(
              spark, e.edgesDir, e.metaDir, panel, k, pred)
          case None =>
            graft.operators.Hnsw.searchIn(spark, e.edgesDir, e.metaDir, panel, k)
        }).select(col("qid"), col("vec_id"), col("sim"), col("rnk"))
      case None => graft.plans.IvfIndexRegistry.lookup(Seq(corpusPath)) match {
        case Some(e) if e.idCol.isDefined && e.embCol.isDefined =>
          val cents = graft.operators.Ann.centroidsDf(spark, e.medoids)
          val corpus = spark.read.parquet(corpusPath)
          val filtered = try filter.map(corpus.filter).getOrElse(corpus)
            catch { case ae: org.apache.spark.sql.AnalysisException =>
              contractError("IVF", "the corpus row (its own columns)", ae) }
          graft.operators.Ann.ivfSearchBatchTopK(
              filtered, panel, e.cellCol,
              cents, e.idCol.get, e.embCol.get, k, nprobe = e.nprobe)
            .select(col("qid"), col(e.idCol.get).as("vec_id"),
              col("sim"), col("rnk"))
        case Some(_) => sys.error(s"IVF registration for $corpusPath " +
          "carries no id/emb columns — register via register() or an " +
          "overload that captures idCol and embCol")
        case None => sys.error(s"no index registered for $corpusPath")
      }
    }
  }

  /** Single-query registry-resolved serve — the reference's actual API
    * shape (`POST /api/search`, ONE query —
    * `/root/reference/WebAPI/Program.cs`): wrap the vector as a 1-row
    * panel and delegate to [[indexServeBatch]] verbatim (HnswSpec pins
    * the equivalence), returning the k rows without the panel plumbing.
    */
  def indexServeOne(spark: org.apache.spark.sql.SparkSession,
                    corpusPath: String, qVec: Array[Double], k: Int,
                    filter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    import spark.implicits._
    // float panel — the corpus element type, the beamIds probe discipline
    val panel = Seq((0L, qVec.toSeq)).toDF("qid", "q_emb")
      .select(col("qid"), col("q_emb").cast("array<float>").as("q_emb"))
    indexServeBatch(panel, corpusPath, k, filter)
      .select(col("vec_id"), col("sim"), col("rnk"))
  }

  /** [[indexServeBatch]]'s THRESHOLD twin — registry-resolved batch
    * range serving: every corpus row with round-6 sim ≥ t per qid,
    * served by whatever index covers the table. Graph registrations win
    * (ONE batch range walk — Hnsw.searchRangeIn, the approximate
    * bounded-frontier face); else a radii-armed IVF registration with
    * id/emb columns serves PROVABLY EXACTLY through the entry-based
    * admission face (Ann.ivfRangeSearchBatchIn — union-of-admitted-cells
    * partition prune + per-qid refinement + exact refilter); else the
    * call refuses loudly. Output (qid, vec_id, sim) across both routes.
    */
  def indexServeRangeBatch(panel: DataFrame, corpusPath: String,
                           t: Double): DataFrame = {
    val spark = panel.sparkSession
    graft.plans.HnswGraphRegistry.lookup(Seq(corpusPath)) match {
      case Some(e) =>
        graft.operators.Hnsw.searchRangeIn(spark, e.edgesDir, e.metaDir, panel, t)
          .select(col("qid"), col("vec_id"), col("sim"))
      case None => graft.plans.IvfIndexRegistry.lookup(Seq(corpusPath)) match {
        case Some(e) if e.radii.nonEmpty && e.idCol.isDefined && e.embCol.isDefined =>
          graft.operators.Ann.ivfRangeSearchBatchIn(spark, corpusPath,
            e.cellCol, e.idCol.get, e.embCol.get, e.medoids, e.radii,
            panel, t, excludeSelf = false)
        case Some(_) => sys.error(s"IVF registration for $corpusPath is not " +
          "range-armed — register with radii plus id/emb columns " +
          "(registerCentroidsWithRadii with idCol)")
        case None => sys.error(s"no index registered for $corpusPath")
      }
    }
  }

  /** Continuous serving against a REGISTERED index: each micro-batch of
    * query vectors (qid, q_emb) resolves the registry and runs ONE batch
    * serve ([[indexServeBatch]]) — the retrieval symmetry of the
    * streaming index MAINTENANCE faces (per-trigger graph appends/
    * deletes) that already exist. foreachBatch for the same reason as
    * [[ivfServe]]: the per-trigger ranking is a batch-shaped job against
    * static index artifacts, re-reading only beam buckets / probed cells
    * per trigger. Empty triggers are skipped (the isEmpty probe is a
    * limit-1 job). The threshold twin is [[indexServeRange]] — a
    * separate entry point rather than a mode flag, so a range serve can
    * never be called with a dead k that reads like a cap (review
    * finding).
    */
  def indexServe(queries: DataFrame, corpusPath: String, k: Int,
                 // the filtered route, streaming twin (see indexServeBatch)
                 filter: Option[org.apache.spark.sql.Column] = None)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          sink(indexServeBatch(batch, corpusPath, k, filter), batchId)
      }
      .start()

  /** [[indexServe]]'s threshold twin: per-trigger registry-resolved
    * RANGE serving via [[indexServeRangeBatch]].
    */
  def indexServeRange(queries: DataFrame, corpusPath: String, t: Double)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) sink(indexServeRangeBatch(batch, corpusPath, t), batchId)
      }
      .start()

  /** Streaming data-quality gate: the ingest pipeline's per-trigger
    * publish/quarantine decision. Each micro-batch is evaluated against
    * the declared constraint suite (ONE aggregate pass over the batch —
    * [[graft.operators.DataQuality.report]]) and the stamped report rows
    * (check_name, observed, passed, batch_id) go to the sink; the caller
    * decides publish vs quarantine from the rows — the gate itself never
    * throws, exactly like the batch report. Empty triggers are skipped
    * (no rows means nothing to gate; the isEmpty probe is a limit-1 job).
    * At scale this is the standard last-stage of a streaming ingest: the
    * report is KB-sized however wide the batch is, and the batch data
    * itself is only read once.
    */
  def dqGate(stream: DataFrame,
             checks: Seq[graft.operators.DataQuality.Check])(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          sink(graft.operators.DataQuality.report(batch, checks)
            .withColumn("batch_id", lit(batchId)), batchId)
      }
      .start()

  /** Streaming CDC apply — the upsert SINK loop: each trigger's changeset
    * (key, op ∈ d/u/i, value) merges into the bucket-partitioned parquet
    * snapshot via [[graft.operators.CdcSnapshot.applyBatch]]: only the
    * buckets the changeset's keys hash into are read (partition-pruned),
    * rewritten, and per-bucket atomically swapped — the copy-on-write
    * table loop that turns a CDC stream into an always-queryable keyed
    * snapshot whose per-trigger cost scales with change volume, not
    * table size. Closes the CDC story the way appendAndMaybeCompact
    * closes the index-maintenance story.
    */
  def cdcApply(changes: DataFrame, snapshotPath: String,
               keyCol: String = "key")(
      afterBatch: Long => Unit = _ => ()): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.CdcSnapshot.applyBatch(
          batch.sparkSession, snapshotPath, batch, keyCol)
        afterBatch(batchId)
      }
      .start()

  /** Streaming deletes against a merge-on-read table: each trigger's batch
    * of doomed keys becomes ONE appended position-delete delta —
    * [[graft.operators.DeletionVectors.deleteWhere]] per micro-batch, no
    * data file ever rewritten on the hot path (the GDPR/retention stream
    * shape: deletes trickle in continuously; compaction is a separate
    * scheduled job, not a per-trigger cost). foreachBatch bodies run
    * sequentially, so delta appends never race each other; a batch's
    * deletes are visible to any MOR read started after the trigger
    * commits.
    */
  def dvDeleteStream(doomedKeys: DataFrame, root: String,
                     keyCol: String = "doc_id")(
      afterBatch: (Long, Long) => Unit = (_, _) => ()): org.apache.spark.sql.streaming.StreamingQuery =
    doomedKeys.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val n = graft.operators.DeletionVectors.deleteKeys(
          batch.sparkSession, root, batch, keyCol)
        afterBatch(batchId, n)
      }
      .start()

  /** Streaming ingestion into the transaction-log table: each trigger's
    * batch becomes ONE atomic commit ([[graft.operators.TxnLog.append]])
    * — staged immutable files, manifest, pointer flip. Readers resolve
    * whole trigger-batches or nothing, ever (the exactly-the-batch
    * visibility a foreachBatch parquet append CANNOT give: a plain
    * append is visible file-by-file as tasks finish). Downstream
    * incremental consumers follow the commit stream with
    * [[graft.operators.TxnLog.changes]] version windows.
    */
  def txnAppendStream(rows: DataFrame, root: String)(
      afterBatch: (Long, Int) => Unit = (_, _) => ()): org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val v = graft.operators.TxnLog.append(batch, root)
        afterBatch(batchId, v)
      }
      .start()

  /** EXACTLY-ONCE streaming ingestion into the txn-log table — the
    * hardened form of [[txnAppendStream]]: each trigger commits through
    * [[graft.operators.TxnLog.appendOnce]], whose (appId, batchId)
    * watermark rides IN the manifest — marker and data are one atomic
    * commit, so foreachBatch's at-least-once redelivery is a provable
    * no-op and no crash can apply data without advancing the watermark.
    */
  def txnAppendStreamOnce(rows: DataFrame, root: String, appId: String)(
      afterBatch: (Long, Option[Int]) => Unit = (_, _) => ()): org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        afterBatch(batchId,
          graft.operators.TxnLog.appendOnce(batch, root, appId, batchId))
      }
      .start()

  /** Stream enrichment against slowly-changing reference data: each
    * trigger left-joins the batch onto a FRESH read of the CDC-maintained
    * snapshot — an upstream reference change is visible to the very next
    * trigger. The bucket swap is rename-atomic, but a reader that listed
    * files JUST before a concurrent swap can hit since-deleted paths; a
    * deployment running enrichment and [[cdcApply]] concurrently
    * schedules them on the same trigger loop (as here — foreachBatch
    * bodies run sequentially per stream) or reads with
    * `spark.sql.files.ignoreMissingFiles` and retries. The cross-trigger
    * point-in-time guarantee of a real table format needs its txn log
    * (see [[graft.operators.CdcSnapshot]]).
    */
  def enrichWithSnapshot(stream: DataFrame, snapshotPath: String,
                         keyCol: String = "key")(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ref = graft.operators.CdcSnapshot
          .read(batch.sparkSession, snapshotPath)
          .select(col(keyCol), col("value").as("ref_value"))
        sink(batch.join(ref, Seq(keyCol), "left"), batchId)
      }
      .start()

  /** Streaming drift monitor: each micro-batch's value distribution is
    * PSI-compared against the STATIC baseline snapshot (the training
    * corpus / last release), batch_id-stamped per-bin rows to the sink —
    * the alarm wire for "today's ingest no longer looks like what the
    * model was trained on". Rides [[graft.operators.DataQuality.psiDrift]]
    * per trigger: the baseline reduces to its nBins-row digest each
    * trigger (at scale: precompute the baseline digest once — the batch
    * side of psiDrift is one count-aggregate either way).
    */
  def psiGate(stream: DataFrame, baseline: DataFrame,
              value: org.apache.spark.sql.Column, nBins: Int, width: Double)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          sink(graft.operators.DataQuality
            .psiDrift(baseline, batch, value, nBins, width)
            .withColumn("batch_id", lit(batchId)), batchId)
      }
      .start()

  /** Streaming heavy hitters: a one-pass bounded-memory frequency summary
    * maintained across triggers. Each micro-batch computes its
    * per-partition MG summaries distributed (≤ k rows per partition —
    * the only thing collected, KB metadata like the BM25 snapshot), and
    * the driver folds them into a running k-counter summary via the MG
    * merge. Mergeability (Agarwal et al. 2012) gives the global
    * guarantee: after any number of triggers the summary never
    * overcounts, undercounts by at most n/k, and therefore still
    * contains EVERY value with true frequency > n/k. Unlike the batch
    * path there is no exact recount — rows already streamed past cannot
    * be recounted, so the bounded-error estimate IS the streaming
    * answer (the inherent one-pass trade; callers needing exactness run
    * the batch operator over the archived corpus).
    *
    * The summary lives in a durable (batchId, summary) JOURNAL, not a
    * closure var: foreachBatch is at-least-once and a restarted query
    * drops closure state, so a redelivered trigger must find its batchId
    * already applied (no double-merge — the never-overcounts guarantee
    * survives redelivery) and a restarted query must resume the saved
    * summary (HeavyHitters.applyJournaled; atomic tmp+rename writes).
    */
  def heavyHittersStream(stream: DataFrame, value: org.apache.spark.sql.Column,
                         k: Int, journalPath: String)(
      sink: (Map[String, Long], Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val batchPairs = graft.operators.HeavyHitters
          .summaries(batch, value, k)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        sink(graft.operators.HeavyHitters
          .applyJournaled(journalPath, batchId, batchPairs, k), batchId)
      }
      .start()

  /** Stream-STATIC anti join: the streaming face of incremental dedup —
    * arriving docs/events are checked against a static historical index
    * (here: an id blocklist standing in for the fingerprint table) and
    * only unseen rows pass. The static side is re-scannable per
    * micro-batch; at scale it is a compact digest table (broadcast or
    * bucketed), so each micro-batch pays one map-side anti join — no
    * streaming state at all (unlike dropDuplicates, nothing accumulates).
    */
  def antiJoinStatic(stream: DataFrame, static: DataFrame,
                     key: String): DataFrame =
    stream.join(static, Seq(key), "left_anti")

  /** Stream-stream inner join: views within the hour preceding each click,
    * per user. The SAME transformation serves batch (the oracle) and
    * streaming inputs; for streaming, both inputs must carry a watermark —
    * with the time-range predicate Spark bounds both join-state buffers to
    * the interval + lateness horizon, so state does not grow with the
    * stream. Output times are epoch micros (cross-engine-stable longs).
    */
  def clickViewJoin(clicks: DataFrame, views: DataFrame): DataFrame =
    clickViewIntervalJoin(clicks, views, "inner")

  /** Shared body of the three interval-join faces — one place owns the
    * interval predicate and output shape, so the batch oracles and the
    * streaming faces cannot drift apart. user_id coalesces across sides
    * only for fullOuter (the one face with view-only rows).
    */
  private def clickViewIntervalJoin(clicks: DataFrame, views: DataFrame,
                                    joinType: String): DataFrame = {
    val c = clicks.select(col("user_id"), col("event_id").as("click_id"),
      col("ts").as("click_ts"))
    val v = views.select(col("user_id").as("v_user_id"),
      col("event_id").as("view_id"), col("ts").as("view_ts"))
    val uid = if (joinType == "fullOuter")
      coalesce(col("user_id"), col("v_user_id")) else col("user_id")
    c.join(v,
        col("user_id") === col("v_user_id") &&
          col("view_ts") >= col("click_ts") - expr("INTERVAL 60 MINUTES") &&
          col("view_ts") <= col("click_ts"),
        joinType)
      .select(uid.as("user_id"), col("click_id"), col("view_id"),
        unix_micros(col("click_ts")).as("click_us"),
        unix_micros(col("view_ts")).as("view_us"))
  }

  /** Stream-stream LEFT OUTER interval join — the join face people get
    * wrong. Matched (click, view) pairs emit exactly like the inner join,
    * as soon as both rows have arrived; a click with NO view in its
    * preceding hour emits exactly ONE null-padded row — and only when the
    * watermark passes the click's timestamp, because until every view
    * that could still satisfy `view_ts ≤ click_ts` has provably arrived,
    * "no match" is not yet a fact. The null row's emission is therefore
    * tied to state EVICTION (StreamingSpec asserts numRowsRemoved > 0),
    * and a pending click near the head of the stream is not a bug — its
    * verdict is simply not in evidence yet. Same bounded state as
    * [[clickViewJoin]]: both sides watermarked, the range predicate
    * bounds both buffers to interval + lateness.
    */
  def clickViewJoinLeftOuter(clicks: DataFrame, views: DataFrame): DataFrame =
    clickViewIntervalJoin(clicks, views, "leftOuter")

  /** Stream-stream FULL OUTER interval join — completes the outer-face
    * matrix (inner / left / full). Matches emit eagerly; a click with no
    * view null-pads once its watermark verdict is in (as in
    * [[clickViewJoinLeftOuter]]); symmetrically a view that no LATER
    * click ever claimed null-pads on ITS eviction — note the asymmetric
    * horizon: a view stays claimable for the full 60-minute interval
    * AFTER its timestamp, so its verdict lands an interval later than a
    * click's. user_id must coalesce across sides: an unmatched view has
    * no click-side columns. Both state buffers stay bounded by
    * interval + lateness exactly as in the inner join.
    */
  def clickViewJoinFullOuter(clicks: DataFrame, views: DataFrame): DataFrame =
    clickViewIntervalJoin(clicks, views, "fullOuter")

  // --- stateful sessionization -------------------------------------------

  case class Ev(user_id: Long, event_id: Long, tsMicros: Long, value: Double)
  /** Ev plus the watermarked event-time column (which must survive into a
    * stateful operator's input for EventTimeTimeout to be allowed).
    */
  case class EvW(user_id: Long, event_id: Long, tsMicros: Long, value: Double,
                 ts: java.sql.Timestamp)
  case class SessionState(sessionSeq: Int, lastTsMicros: Long,
                          n: Long, valueSum: Double, startMicros: Long)
  case class SessionOut(user_id: Long, session_seq: Int, n_events: Long,
                        session_start_us: Long, session_end_us: Long,
                        value_sum: Double)

  val SessionGapMicros: Long = 30L * 60 * 1000 * 1000 // 30 minutes

  /** Event-time sessionization with mapGroupsWithState: sessions close
    * after a 30-minute gap. Streaming shape of the batch "sessionize"
    * query (window lag + running sum), which is its oracle.
    *
    * Emits only the LAST open session per user on each trigger in this
    * simplified form; the batch query remains the source of truth for
    * full history. Input must be per-user ordered within a batch (true
    * for the fixture's single-file replay).
    */
  def sessionizeStream(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val typed = events.select(
      col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("tsMicros"), col("value")).as[Ev]
    typed.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionOut](GroupStateTimeout.NoTimeout) {
        (uid, rows, state: GroupState[SessionState]) =>
          var st = state.getOption.getOrElse(SessionState(0, Long.MinValue, 0L, 0.0, Long.MinValue))
          rows.toSeq.sortBy(e => (e.tsMicros, e.event_id)).foreach { e =>
            st =
              if (st.lastTsMicros == Long.MinValue ||
                  e.tsMicros - st.lastTsMicros > SessionGapMicros)
                SessionState(st.sessionSeq + 1, e.tsMicros, 1L, e.value, e.tsMicros)
              else
                st.copy(lastTsMicros = e.tsMicros, n = st.n + 1,
                  valueSum = st.valueSum + e.value)
          }
          state.update(st)
          SessionOut(uid, st.sessionSeq, st.n, st.startMicros, st.lastTsMicros,
            st.valueSum)
      }.toDF()
  }

  case class KeyedRow(k: Long, v: String)

  /** First-seen keeper on the Spark 4 `transformWithState` API: a
    * [[org.apache.spark.sql.streaming.StatefulProcessor]] whose per-key
    * `ValueState` carries a TTL — the state-store-native way to bound
    * dedup state by TIME without coupling it to an event-time watermark
    * (`dropDuplicatesWithinWatermark`'s trade-off). After `ttl` of
    * processing time the key's state expires on its own and a later
    * replay is treated as a fresh first sighting. Requires the RocksDB
    * state store provider.
    */
  class FirstSeenProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[Long, KeyedRow, KeyedRow] {
    @transient private var seen: ValueState[Boolean] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen",
        org.apache.spark.sql.Encoders.scalaBoolean, TTLConfig(ttl))
    override def handleInputRows(key: Long, rows: Iterator[KeyedRow],
                                 timers: TimerValues): Iterator[KeyedRow] =
      if (seen.exists()) Iterator.empty
      else { seen.update(true); rows.take(1) } // also dedups within the batch
  }

  /** Streaming TTL dedup via `transformWithState` — the modern face of
    * [[dedupStream]]: same exactly-once-per-key semantics, but state
    * lifetime is an explicit TTL instead of a watermark horizon.
    */
  def dedupTtlStream(spark: SparkSession, rows: DataFrame,
                     ttl: java.time.Duration): DataFrame = {
    import spark.implicits._
    rows.select(col("k"), col("v")).as[KeyedRow]
      .groupByKey(_.k)
      .transformWithState(new FirstSeenProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Append())
      .toDF()
  }

  // --- state schema evolution across a checkpoint restart ---------------

  case class CntV1(n: Long)
  case class CntV2(n: Long, lastLen: Option[Long])
  case class CntOut(k: Long, n: Long, lastLen: Long)

  /** Per-key running row count — generation 1 of an operator whose state
    * struct will later grow a field. Output carries −1 in the slot the
    * next generation will fill, so both generations share one schema.
    */
  class CountProcessorV1
      extends StatefulProcessor[Long, KeyedRow, CntOut] {
    @transient private var st: ValueState[CntV1] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CntV1]("cnt",
        org.apache.spark.sql.Encoders.product[CntV1], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[KeyedRow],
                                 timers: TimerValues): Iterator[CntOut] = {
      val n = (if (st.exists()) st.get().n else 0L) + rows.size
      st.update(CntV1(n))
      Iterator.single(CntOut(key, n, -1L))
    }
  }

  /** Generation 2: the state gains `lastLen` (length of the key's most
    * recent value). The added field is an Option with a None default —
    * the one evolution shape Avro state encoding resolves for state
    * written by generation 1 (missing field → None); non-Option or
    * defaultless additions are refused at query start.
    */
  class CountProcessorV2
      extends StatefulProcessor[Long, KeyedRow, CntOut] {
    @transient private var st: ValueState[CntV2] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CntV2]("cnt",
        org.apache.spark.sql.Encoders.product[CntV2], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[KeyedRow],
                                 timers: TimerValues): Iterator[CntOut] = {
      val buf = rows.toSeq
      val prior = if (st.exists()) st.get() else CntV2(0L, None)
      val next = CntV2(prior.n + buf.size,
        buf.lastOption.map(_.v.length.toLong).orElse(prior.lastLen))
      st.update(next)
      Iterator.single(CntOut(key, next.n, next.lastLen.getOrElse(-1L)))
    }
  }

  /** The evolution harness: the SAME logical query at either state-schema
    * generation, so a spec can restart gen 2 on gen 1's checkpoint — the
    * mid-flight operator upgrade every long-lived streaming pipeline
    * eventually ships. Whether that restart RESUMES (Avro state encoding,
    * additive Option field) or REFUSES LOUDLY (default UnsafeRow encoding
    * — schema check at query start) is pinned by StateEvolutionSpec; what
    * must never happen is a silent blank-state restart.
    */
  def runningCountStream(spark: SparkSession, rows: DataFrame,
                         gen2: Boolean): DataFrame = {
    import spark.implicits._
    val keyed = rows.select(col("k"), col("v")).as[KeyedRow].groupByKey(_.k)
    (if (gen2)
      keyed.transformWithState(new CountProcessorV2,
        TimeMode.None(), OutputMode.Append())
    else
      keyed.transformWithState(new CountProcessorV1,
        TimeMode.None(), OutputMode.Append())).toDF()
  }

  case class GapEv(user_id: Long, tsMicros: Long, event_id: Long)
  case class LastSeen(tsMicros: Long)

  /** Streaming twin of the batch `ts_gaps` monitor: per-user last-seen
    * timestamp carried in `flatMapGroupsWithState`; a silence longer than
    * `gapSeconds` between consecutive events (including ACROSS triggers —
    * the state is exactly one timestamp per key) emits one gap row. The
    * alerting face of gap detection: the batch query audits history, this
    * one fires as the stream runs, with O(1) state per key. Out-of-order
    * arrivals never rewind the state (last-seen is a running max), so a
    * late event can close no-longer-open history but cannot re-open it;
    * gaps wholly inside already-seen time are the batch monitor's job.
    */
  def gapStream(spark: SparkSession, rows: DataFrame,
                gapSeconds: Long = 12L * 3600): DataFrame = {
    import spark.implicits._
    rows.select(col("user_id"), col("tsMicros"), col("event_id"))
      .as[GapEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastSeen, (Long, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[GapEv], st: GroupState[LastSeen]) =>
          val sorted = it.toSeq.sortBy(e => (e.tsMicros, e.event_id))
          val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Long)]
          var last = st.getOption
          sorted.foreach { e =>
            last.foreach { l =>
              val d = e.tsMicros - l.tsMicros
              if (d > gapSeconds * 1000000L)
                out += ((uid, l.tsMicros, e.tsMicros, d / 1000000L))
            }
            // keep the MAX last-seen: an out-of-order event arriving in a
            // later trigger must not rewind state to its earlier timestamp
            // — that would re-open already-covered history and emit a
            // spurious overlapping gap (the batch ts_gaps oracle sorts
            // globally, so it can never produce one). A late event still
            // never BACKFILLS a silence already emitted; that is inherent
            // to one-timestamp-per-key state, not to this max.
            if (last.forall(_.tsMicros < e.tsMicros))
              last = Some(LastSeen(e.tsMicros))
          }
          last.foreach(st.update)
          out.iterator
      }.toDF("user_id", "gap_start_us", "gap_end_us", "gap_seconds")
  }

  case class EwmaEv(user_id: Long, tsMicros: Long, event_id: Long, value: Double)
  case class EwmaState(n: Long, s: Double)

  /** Streaming twin of the batch `ewma_user_value` query: per-user running
    * EWMA (s_i = 0.3·x_i + 0.7·s_{i-1}) carried across triggers in
    * `mapGroupsWithState` — the fold CONTINUES from the checkpointed
    * (n, s) pair, so feeding the same events in any batch split yields
    * bit-identical state to the one-shot batch fold, provided each batch
    * arrives in (ts, event_id) order per key (each trigger sorts its own
    * slice; cross-trigger order is the arrival order, as in any log-
    * compacted feature store). Update mode: every trigger emits each
    * touched user's latest (n_events, ewma).
    */
  def ewmaStream(spark: SparkSession, rows: DataFrame): DataFrame = {
    import spark.implicits._
    rows.select(col("user_id"), col("tsMicros"), col("event_id"), col("value"))
      .as[EwmaEv]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[EwmaEv], st: GroupState[EwmaState]) =>
          val sorted = it.toSeq.sortBy(e => (e.tsMicros, e.event_id))
          var n = st.getOption.map(_.n).getOrElse(0L)
          var s = st.getOption.map(_.s).getOrElse(0.0)
          sorted.foreach { e =>
            s = if (n == 0L) e.value else 0.3 * e.value + 0.7 * s
            n += 1
          }
          st.update(EwmaState(n, s))
          (uid, n, s)
      }.toDF("user_id", "n_events", "ewma")
  }

  case class CusumEv(event_type: String, dayUs: Long, x: Double)
  case class CusumState(n: Long, s: Double)

  /** Streaming CUSUM drift monitor — the monitoring twin of the batch
    * `cusum_shift` query: per-key cumulative deviation
    * S ← max(0, S + x − μ) carried across triggers in
    * `mapGroupsWithState`, fed by an upstream windowed count (the x
    * values). The baseline μ per key is broadcast-sized reference state
    * fit OFFLINE on a training period — exactly how production monitors
    * pin their baseline so the monitored stream can't drag the target
    * along with the drift it should be flagging. Same fold-continuation
    * contract as [[ewmaStream]]/[[holtStream]]: any trigger split of the
    * per-key-ordered feed reaches the identical (n, S).
    */
  def cusumStream(spark: SparkSession, rows: DataFrame,
                  mu: Map[String, Double]): DataFrame = {
    import spark.implicits._
    rows.select(col("event_type"), col("dayUs"), col("x")).as[CusumEv]
      .groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (k: String, it: Iterator[CusumEv], st: GroupState[CusumState]) =>
          val sorted = it.toSeq.sortBy(_.dayUs)
          var s = st.getOption.getOrElse(CusumState(0L, 0.0))
          val target = mu.getOrElse(k, 0.0)
          sorted.foreach { e =>
            s = CusumState(s.n + 1, math.max(0.0, s.s + e.x - target))
          }
          st.update(s)
          (k, s.n, s.s)
      }.toDF("event_type", "n_days", "s")
  }

  case class DecayState(n: Long, s: Double, sv: Double, lastUs: Long)

  /** Streaming exponentially-decayed counter — the fold form of the batch
    * `decayed_counts` query and the canonical feature-store counter: on
    * each event, first decay the standing state by the elapsed gap
    * (S ← S·e^(−λΔt)), then add the new observation. Telescoping makes
    * the fold equal the batch sum Σe^(−λ(t_ref − t_i)) up to floating
    * error: the product of incremental exps accumulates ~1 ulp per event
    * where the batch computes one exp per event, so the streaming twin is
    * asserted to a 1e-9 RELATIVE tolerance rather than bit-equality — the
    * honest contract for a multiplicative fold (EWMA/Holt are additive
    * folds and can promise bit-equality; this one cannot, and says so).
    */
  def decayedCountStream(spark: SparkSession, rows: DataFrame,
                         lambdaPerDay: Double): DataFrame = {
    import spark.implicits._
    val usPerDay = 86400000000.0
    rows.select(col("event_type"), col("tsMicros"), col("value")).as[DecayEv]
      .groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (k: String, it: Iterator[DecayEv], st: GroupState[DecayState]) =>
          val sorted = it.toSeq.sortBy(_.tsMicros)
          var s = st.getOption.getOrElse(DecayState(0L, 0.0, 0.0, Long.MinValue))
          sorted.foreach { e =>
            val decay = if (s.n == 0L) 1.0
              else math.exp(-lambdaPerDay * (e.tsMicros - s.lastUs) / usPerDay)
            s = DecayState(s.n + 1, s.s * decay + 1.0,
              s.sv * decay + e.value, e.tsMicros)
          }
          st.update(s)
          (k, s.n, s.s, s.sv, s.lastUs)
      }.toDF("event_type", "n_raw", "decayed_n", "decayed_sum", "last_us")
  }

  case class DecayEv(event_type: String, tsMicros: Long, value: Double)

  case class HoltState(n: Long, l: Double, b: Double)

  /** Streaming twin of the batch `holt_forecast` query: per-user Holt
    * level+trend smoothing carried across triggers in
    * `mapGroupsWithState`. Same fold-continuation contract as
    * [[ewmaStream]]: state initializes (l = x_0, b = 0) on the first
    * event ever seen for a key, then every later event applies the
    * identical double ops the batch fold applies, so any batch split of
    * the same per-key-ordered feed reaches bit-identical (n, l, b).
    * Update mode: each trigger emits every touched user's latest
    * (n_events, level, trend, forecast3).
    */
  def holtStream(spark: SparkSession, rows: DataFrame): DataFrame = {
    import spark.implicits._
    rows.select(col("user_id"), col("tsMicros"), col("event_id"), col("value"))
      .as[EwmaEv]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[EwmaEv], st: GroupState[HoltState]) =>
          val sorted = it.toSeq.sortBy(e => (e.tsMicros, e.event_id))
          var s = st.getOption.getOrElse(HoltState(0L, 0.0, 0.0))
          sorted.foreach { e =>
            s = if (s.n == 0L) HoltState(1L, e.value, 0.0)
            else {
              val l1 = 0.4 * e.value + 0.6 * (s.l + s.b)
              HoltState(s.n + 1, l1, 0.2 * (l1 - s.l) + 0.8 * s.b)
            }
          }
          st.update(s)
          (uid, s.n, s.l, s.b, s.l + 3.0 * s.b)
      }.toDF("user_id", "n_events", "level", "trend", "forecast3")
  }

  /** Streaming sparse-search serve — the LEXICAL twin of [[ivfpqServe]]:
    * each trigger's text queries are answered from the persisted postings
    * layout via the bulk batch face (union-of-probed-buckets scan,
    * broadcast query routing, TopKPerKey ranking). Queries collect to the
    * driver — a serving batch is API-sized, and bucket probing is driver
    * arithmetic by design, exactly as the vector serve collects its
    * query embeddings.
    */
  def sparseServe(queries: DataFrame, sfDir: String, k: Int = 5)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val qs = batch.select(col("qid"), col("terms"))
          .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSeq)).toSeq
        if (qs.nonEmpty)
          sink(graft.operators.InvertedIndex.sparseSearchBatch(
            batch.sparkSession, sfDir, qs, k), batchId)
        ()
      }.start()

  /** Streaming inverted-index maintenance — the postings twin of the IVF
    * `appendAndMaybeCompact` loop: each trigger's docs append per-bucket
    * postings (served immediately), then compaction fires iff any
    * bucket's file count crossed the policy threshold — the always-
    * appending text index stays off the small-files spiral without a
    * human watching it.
    */
  def postingsIngestStream(spark: SparkSession, docs: DataFrame, sfDir: String,
                           maxFilesPerBucket: Int = 2)(
      afterBatch: (Long, Boolean) => Unit = (_, _) => ()): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        if (!b.isEmpty) {
          graft.operators.InvertedIndex.appendDocs(spark, sfDir, b)
          val dir = graft.operators.InvertedIndex.layout(spark, sfDir)
          val perBucket = spark.read.parquet(dir).inputFiles
            .groupBy(f => f.split("/").init.last).values.map(_.length)
          val compact = perBucket.exists(_ > maxFilesPerBucket)
          if (compact)
            graft.operators.InvertedIndex.compactPostings(spark, sfDir)
          afterBatch(id, compact)
        }
        ()
      }.start()

  /** Streaming WRITE-AUDIT-PUBLISH ingestion — the gated form of
    * [[txnAppendStream]]: every micro-batch stages into the transaction
    * log, the declarative DQ suite audits the staged whole-table
    * candidate, and the batch publishes (one atomic commit) or aborts
    * (table untouched, slot reopened) on the verdict. A poisoned trigger
    * therefore quarantines itself instead of landing — the difference
    * between "bad data arrived and we alerted" and "bad data never became
    * the table". Verdicts journal per batch_id for the orchestrator.
    * Same at-least-once posture as [[txnAppendStream]]: a redelivered
    * trigger would re-stage; exactly-once pairs the commit with an
    * (appId, batchId) high-watermark in the manifest, as Delta's txn
    * action does.
    */
  def wapIngestStream(spark: SparkSession, docs: DataFrame, root: String,
                      checks: Seq[graft.operators.DataQuality.Check],
                      verdicts: java.util.Queue[(Long, Boolean)]): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (b: DataFrame, id: Long) =>
        if (!b.isEmpty) {
          val (published, _) = graft.operators.TxnLog.wapAppend(b, root, checks)
          verdicts.add((id, published))
        }
        ()
      }.start()

  case class HwState(buf: List[Double], l: Double, b: Double,
                     s: List[Double], n: Long)

  /** Streaming Holt-WINTERS — the triple-smoothing twin of the batch
    * `holt_winters` query, continuing the identical fold from checkpointed
    * state. The init contract is stateful: the first 2m=8 values BUFFER in
    * state (no model yet — HW has no defensible estimate before two
    * seasons); the 8th arrival computes the classic init and immediately
    * folds the second season through the update, exactly as the batch
    * fold consumes elements m+1..n. From then on each event applies the
    * same double ops in the same order, so any per-key-ordered batch
    * split reaches bit-identical (l, b, s).
    *
    * State per key is max(8 buffered doubles, 2 + m doubles) — O(m),
    * stream-length-independent.
    */
  def holtWintersStream(spark: SparkSession, rows: DataFrame): DataFrame = {
    import spark.implicits._
    def step(state: HwState, x: Double): HwState = {
      val l1 = 0.4 * (x - state.s.head) + 0.6 * (state.l + state.b)
      val b1 = 0.2 * (l1 - state.l) + 0.8 * state.b
      val sNew = 0.3 * (x - l1) + 0.7 * state.s.head
      HwState(Nil, l1, b1, state.s.tail :+ sNew, state.n + 1)
    }
    rows.select(col("user_id"), col("tsMicros"), col("event_id"), col("value"))
      .as[EwmaEv]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[EwmaEv], st: GroupState[HwState]) =>
          val sorted = it.toSeq.sortBy(e => (e.tsMicros, e.event_id))
          var s = st.getOption.getOrElse(HwState(Nil, 0.0, 0.0, Nil, 0L))
          sorted.foreach { e =>
            s =
              if (s.n >= 8L) step(s, e.value)
              else {
                val buf = s.buf :+ e.value
                if (buf.length < 8) HwState(buf, 0.0, 0.0, Nil, s.n + 1)
                else {
                  val l0 = (buf(0) + buf(1) + buf(2) + buf(3)) / 4.0
                  val b0 = ((buf(4) + buf(5) + buf(6) + buf(7)) / 4.0 -
                    (buf(0) + buf(1) + buf(2) + buf(3)) / 4.0) / 4.0
                  var cur = HwState(Nil, l0, b0,
                    List(buf(0) - l0, buf(1) - l0, buf(2) - l0, buf(3) - l0), 4L)
                  buf.drop(4).foreach { x => cur = step(cur, x) }
                  cur
                }
              }
          }
          st.update(s)
          val ready = s.n >= 8L && s.s.nonEmpty
          (uid, s.n, ready,
            if (ready) s.l else 0.0, if (ready) s.b else 0.0,
            if (ready) s.s.head else 0.0,
            if (ready) s.l + s.b + s.s.head else 0.0)
      }.toDF("user_id", "n_events", "ready", "level", "trend", "s_next", "forecast1")
  }

  case class FunnelEv(user_id: Long, event_type: String, tsMicros: Long)
  case class FunnelState(viewed: Boolean, clicked: Boolean, purchased: Boolean,
                         views: List[Long], clicks: List[Long])
  case class FunnelTransition(user_id: Long, stage: String)

  /** Streaming funnel state machine — the streaming twin of the batch
    * `funnel_stages` query (view → click → purchase, ≤4 h between
    * consecutive steps, any qualifying chain). Per-user state holds only
    * what future events can still use:
    *  - view timestamps that can still qualify a click (≤ horizon old),
    *  - QUALIFIED click timestamps that can still qualify a purchase,
    *  - the three reached-stage flags.
    * Everything older than the horizon is pruned each batch, so state per
    * user is bounded by events-per-horizon, not stream length. Each stage
    * transition is emitted exactly once (Append semantics).
    */
  def funnelStream(spark: SparkSession, events: DataFrame,
                   horizonHours: Int = 4): DataFrame = {
    import spark.implicits._
    val horizonUs = horizonHours * 3600L * 1000000L
    events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tsMicros"))
      .as[FunnelEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelTransition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid, rows, state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(
            FunnelState(viewed = false, clicked = false, purchased = false, Nil, Nil))
          val out = List.newBuilder[FunnelTransition]
          var maxTs = Long.MinValue
          rows.toSeq.sortBy(_.tsMicros).foreach { e =>
            maxTs = math.max(maxTs, e.tsMicros)
            e.event_type match {
              case "view" =>
                if (!st.viewed) out += FunnelTransition(uid, "1_view")
                st = st.copy(viewed = true, views = e.tsMicros :: st.views)
              case "click" =>
                if (st.views.exists(v => e.tsMicros > v && e.tsMicros <= v + horizonUs)) {
                  if (!st.clicked) out += FunnelTransition(uid, "2_click")
                  st = st.copy(clicked = true, clicks = e.tsMicros :: st.clicks)
                }
              case "purchase" =>
                if (!st.purchased &&
                    st.clicks.exists(c => e.tsMicros > c && e.tsMicros <= c + horizonUs)) {
                  out += FunnelTransition(uid, "3_purchase")
                  st = st.copy(purchased = true)
                }
              case _ => ()
            }
          }
          // prune: nothing older than horizon can qualify a future event
          st = st.copy(
            views = st.views.filter(_ + horizonUs >= maxTs),
            clicks = if (st.purchased) Nil else st.clicks.filter(_ + horizonUs >= maxTs))
          state.update(st)
          out.result().iterator
      }.toDF()
  }

  /** Full session emission with flatMapGroupsWithState (Append mode +
    * event-time timeout): a session is emitted exactly when it CLOSES —
    * either a same-user event arrives past the 30-minute gap, or the
    * watermark passes the open session's gap horizon (timeout). Unlike
    * `sessionizeStream` (latest-state-per-trigger), this emits every
    * session exactly once, which is what a downstream sink wants.
    * State per user is one open session; the watermark bounds its lifetime.
    */
  def sessionizeClosed(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    // the watermark column must survive into the stateful operator's input
    val typed = events.select(
        col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tsMicros"), col("value"),
        col("ts"))
      .withWatermark("ts", "1 minute")
      .as[EvW]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (uid, rows: Iterator[EvW], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator(SessionOut(uid, st.sessionSeq, st.n, st.startMicros,
              st.lastTsMicros, st.valueSum))
          } else {
            var closed = List.empty[SessionOut]
            var open = state.getOption
            rows.toSeq.sortBy(e => (e.tsMicros, e.event_id)).foreach { e =>
              open = open match {
                case Some(st) if e.tsMicros - st.lastTsMicros > SessionGapMicros =>
                  closed ::= SessionOut(uid, st.sessionSeq, st.n, st.startMicros,
                    st.lastTsMicros, st.valueSum)
                  Some(SessionState(st.sessionSeq + 1, e.tsMicros, 1L, e.value, e.tsMicros))
                case Some(st) =>
                  Some(st.copy(lastTsMicros = e.tsMicros, n = st.n + 1,
                    valueSum = st.valueSum + e.value))
                case None =>
                  Some(SessionState(1, e.tsMicros, 1L, e.value, e.tsMicros))
              }
            }
            open.foreach { st =>
              state.update(st)
              // close the open session when event time passes its gap horizon
              state.setTimeoutTimestamp((st.lastTsMicros + SessionGapMicros) / 1000)
            }
            closed.reverse.iterator
          }
      }.toDF()
  }

  /** Running (n_rows, fp) over an unbounded stream — the ingest-side twin
    * of the batch `table_fingerprint` query: the 60-bit md5 row digests
    * sum modularly, and a modular sum is commutative + associative, so the
    * streaming global aggregate holds ONE (count, sum) pair of state
    * regardless of stream length, and at every trigger the emitted
    * fingerprint equals the batch fingerprint of everything ingested so
    * far (asserted per-trigger in StreamingSpec). This is how a replica's
    * integrity check runs against a live ingest feed: no rescan, no
    * payload retention — the fingerprint folds forward.
    */
  def fingerprintStream(rows: DataFrame, canon: org.apache.spark.sql.Column): DataFrame =
    rows
      .select(graft.functions.Digests.digest60(canon).as("h"))
      .agg(count(lit(1)).as("n_rows"),
        // coalesce: sum() over zero rows is NULL, but an EMPTY table must
        // fingerprint as (0, 0) — downstream staleness probes getLong(1)
        expr(s"CAST(coalesce(sum(CAST(h AS DECIMAL(38,0))), 0) % ${graft.functions.Digests.FingerprintMod} AS BIGINT)")
          .as("fp"))

  /** Run a streaming DataFrame to completion against the memory sink and
    * return the materialized result (test/demo harness; production uses a
    * real sink + checkpoint).
    */
  def runToMemory(spark: SparkSession, streamDf: DataFrame, name: String,
                  mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val q = streamDf.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }
}
