package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ann, Hnsw}
import graft.plans.{HnswGraphRegistry, IndexCatalog, IvfIndexRegistry, MvRegistry, SqlIndexRegistry}

/** The SQL DDL index surface (round-12 verdict, next-round #3): a
  * SQL-only user creates, lists, uses (transparently — the whole point of
  * the rewrite matrix), and drops indexes without touching the Scala API.
  */
class SqlDdlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def servedBy(df: org.apache.spark.sql.DataFrame) =
    IndexCatalog.servedBy(df)

  test("SQL-only lifecycle: CREATE INDEX → bare SQL top-k is index-served → SHOW lists it → DROP stops serving") {
    Hnsw.layout(spark, sf)
    val corpus = Hnsw.rewriteCorpusLayout(spark, sf)
    try {
      HnswGraphRegistry.clear(); IvfIndexRegistry.clear(); MvRegistry.clear()
      SqlIndexRegistry.clear()
      spark.sql(s"CREATE INDEX sql_hnsw ON '$corpus' USING HNSW (embedding) " +
        s"OPTIONS (id_col 'vec_id', edges_dir '${Hnsw.edgesPath(sf)}', " +
        s"meta_dir '${Hnsw.metaPath(sf)}')").collect()
      assert(HnswGraphRegistry.lookup(Seq(corpus)).isDefined,
        "CREATE INDEX did not register the graph")
      // the bare SQL top-k — the HnswTopKRewrite shape, no Scala column
      // API anywhere: literal query vector as a folded SQL array cast
      val qv = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0)
      val arrLit = s"CAST(array(${qv.mkString(", ")}) AS ARRAY<FLOAT>)"
      def topk = spark.sql(
        s"""SELECT vec_id, round(cosine_sim(embedding, $arrLit), 6) AS sim
           |FROM parquet.`$corpus` WHERE vec_id <> 0
           |ORDER BY sim DESC, vec_id ASC LIMIT 5""".stripMargin)
      val df = topk
      val tags = servedBy(df)
      assert(tags.exists(_.startsWith("hnsw:")),
        s"bare SQL top-k was not graph-served: $tags")
      // served result ≡ the explicit graph walk's exact-rescored top-5
      val want = Hnsw.search(spark, sf,
          Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
            .select(lit(0L).as("qid"), col("embedding").as("q_emb")), k = 5)
        .orderBy(col("rnk")).collect().map(_.getLong(1)).toSeq
      assert(df.collect().map(_.getLong(0)).toSeq === want,
        "SQL-created index served a different top-k than the explicit walk")
      // SHOW INDEXES lists it under its DDL name, with the catalog columns
      val shown = spark.sql("SHOW INDEXES")
        .filter(col("index_name") === "sql_hnsw").collect()
      assert(shown.length === 1)
      assert(shown.head.getAs[String]("kind") === "hnsw")
      assert(shown.head.getAs[String]("decision") === "serve")
      // DROP stops the serving — the same query runs exact afterwards
      spark.sql("DROP INDEX sql_hnsw").collect()
      assert(HnswGraphRegistry.lookup(Seq(corpus)).isEmpty)
      assert(servedBy(topk).isEmpty, "dropped index still served")
      // dropping an unknown name refuses loudly
      intercept[RuntimeException] { spark.sql("DROP INDEX sql_hnsw").collect() }
      // re-binding a live name to a DIFFERENT target refuses (round-13
      // review: a silent replace orphaned the old registration with no
      // SQL verb able to drop it); same-target re-CREATE stays idempotent
      spark.sql(s"CREATE INDEX sql_hnsw ON '$corpus' USING HNSW (embedding) " +
        s"OPTIONS (id_col 'vec_id', edges_dir '${Hnsw.edgesPath(sf)}', " +
        s"meta_dir '${Hnsw.metaPath(sf)}')").collect()
      spark.sql(s"CREATE INDEX sql_hnsw ON '$corpus' USING HNSW (embedding) " +
        s"OPTIONS (id_col 'vec_id', edges_dir '${Hnsw.edgesPath(sf)}', " +
        s"meta_dir '${Hnsw.metaPath(sf)}')").collect() // idempotent re-put
      val clash = intercept[RuntimeException] {
        spark.sql("CREATE INDEX sql_hnsw ON '/elsewhere' USING IVF (embedding) " +
          "OPTIONS (id_col 'vec_id')").collect()
      }
      assert(clash.getMessage.contains("already bound"))
      // ...and the refused CREATE armed nothing
      assert(IvfIndexRegistry.lookup(Seq("/elsewhere")).isEmpty)
    } finally {
      HnswGraphRegistry.clear(); IvfIndexRegistry.clear(); MvRegistry.clear()
      SqlIndexRegistry.clear()
    }
  }

  test("CREATE INDEX USING IVF: registers a cell layout (medoid build), or TRAINS one via layout_dir") {
    val layoutDir = java.nio.file.Files
      .createTempDirectory("graft-ddl-ivf").toString + "/layout"
    try {
      HnswGraphRegistry.clear(); IvfIndexRegistry.clear(); SqlIndexRegistry.clear()
      // (a) the metadata build over an existing cell-partitioned table
      val labelPath = Ann.ivfLayout(spark, sf)
      spark.sql(s"CREATE INDEX lbl_ivf ON '$labelPath' USING IVF (embedding) " +
        "OPTIONS (id_col 'vec_id', cell_col 'label')").collect()
      val e1 = IvfIndexRegistry.lookup(Seq(labelPath))
      assert(e1.isDefined && e1.get.fingerprint.nonEmpty && e1.get.rebuildable,
        "DDL register did not build staleness-armed medoid metadata")
      // (b) the ARTIFACT build: train k-means on a plain table and write
      // the cell-partitioned layout to layout_dir, registered trained
      spark.sql(s"CREATE INDEX trn_ivf ON '$sf/embeddings.parquet' " +
        "USING IVF (embedding) OPTIONS (id_col 'vec_id', " +
        s"layout_dir '$layoutDir', k '10')").collect()
      val e2 = IvfIndexRegistry.lookup(Seq(layoutDir))
      assert(e2.isDefined && e2.get.medoids.size === 10 &&
        e2.get.fingerprint.nonEmpty && !e2.get.rebuildable,
        "DDL train did not register trained centers staleness-armed")
      val built = spark.read.parquet(layoutDir)
      assert(built.count() === Tables.embeddings(spark, sf).count(),
        "trained layout dropped rows")
      assert(built.select(col("cell")).distinct().count() === 10L)
      // the trained layout serves the transparent top-k with a REAL
      // partition prune (one cell directory of the ten)
      graft.expressions.GraftFunctions.register(spark)
      val qv = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0)
      val arrLit = s"CAST(array(${qv.mkString(", ")}) AS ARRAY<FLOAT>)"
      val df = spark.sql(
        s"""SELECT vec_id, round(cosine_sim(embedding, $arrLit), 6) AS sim
           |FROM parquet.`$layoutDir`
           |ORDER BY sim DESC, vec_id ASC LIMIT 5""".stripMargin)
      df.collect()
      assert(servedBy(df).exists(_.startsWith("ivf:")),
        "trained DDL index did not serve the SQL top-k")
      val nf = PlanTestUtil.scannedFiles(df).get
      val base = spark.read.parquet(layoutDir).filter(col("vec_id") >= 0)
      base.collect()
      assert(nf < PlanTestUtil.scannedFiles(base).get,
        s"no partition pruning: read $nf files")
      spark.sql("DROP INDEX trn_ivf").collect()
      spark.sql("DROP INDEX lbl_ivf").collect()
      assert(IvfIndexRegistry.isEmpty)
    } finally {
      HnswGraphRegistry.clear(); IvfIndexRegistry.clear(); SqlIndexRegistry.clear()
    }
  }

  test("MV through the DDL front door; SAVE/LOAD INDEXES round-trip in bare SQL; conf-driven auto-load") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-ddl-save").toString + "/manifest"
    val mvSrc = java.nio.file.Files
      .createTempDirectory("graft-ddl-mv").toString + "/src"
    try {
      HnswGraphRegistry.clear(); IvfIndexRegistry.clear(); MvRegistry.clear()
      SqlIndexRegistry.clear()
      Tables.documents(spark, sf).select(col("doc_id"), col("lang"), col("n_chars"))
        .write.mode("overwrite").parquet(mvSrc)
      spark.sql(s"CREATE INDEX docs_mv ON '$mvSrc' USING MV (lang) " +
        s"OPTIONS (mv_path '$mvSrc-mv', sum_cols 'n_chars')").collect()
      // def, not val: a DataFrame caches its QueryExecution, and every
      // serving check here must RE-OPTIMIZE (the auto-load hook lives in
      // the optimizer pass)
      def agg = spark.read.parquet(mvSrc).groupBy(col("lang"))
        .agg(count(lit(1)).as("cnt"))
      assert(servedBy(agg).exists(_.startsWith("mv:")),
        "SQL-created MV did not serve the covered aggregate")
      val aggRows = agg.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      // also register a graph index, then persist EVERYTHING in bare SQL
      Hnsw.layout(spark, sf)
      val corpus = Hnsw.rewriteCorpusLayout(spark, sf)
      spark.sql(s"CREATE INDEX sql_h2 ON '$corpus' USING HNSW (embedding) " +
        s"OPTIONS (id_col 'vec_id', edges_dir '${Hnsw.edgesPath(sf)}', " +
        s"meta_dir '${Hnsw.metaPath(sf)}')").collect()
      val saved = spark.sql(s"SAVE INDEXES TO '$root'").head().getString(0)
      assert(saved.startsWith(root), s"unexpected manifest dir $saved")
      // the "restart"
      HnswGraphRegistry.clear(); IvfIndexRegistry.clear(); MvRegistry.clear()
      assert(servedBy(agg).isEmpty)
      val restored = spark.sql(s"LOAD INDEXES FROM '$root'").head().getLong(0)
      assert(restored === 2L, s"expected 2 restored registrations, got $restored")
      assert(servedBy(agg).exists(_.startsWith("mv:")),
        "SQL LOAD did not re-arm the MV registration")
      assert(agg.collect().map(r => (r.getString(0), r.getLong(1))).toSet
        === aggRows)
      assert(HnswGraphRegistry.lookup(Seq(corpus)).isDefined)
      // conf-driven auto-load: a cleared session with ONLY the conf set
      // re-arms on first optimizer use — zero code
      HnswGraphRegistry.clear(); IvfIndexRegistry.clear(); MvRegistry.clear()
      graft.plans.IndexCatalog.resetAutoLoad()
      spark.conf.set("spark.graft.catalog.root", root)
      try {
        assert(servedBy(agg).exists(_.startsWith("mv:")),
          "conf-only session did not auto-load the durable catalog")
        assert(HnswGraphRegistry.lookup(Seq(corpus)).isDefined,
          "auto-load missed the graph registration")
      } finally spark.conf.unset("spark.graft.catalog.root")
      // DROP the MV through the DDL layer
      spark.sql("DROP INDEX docs_mv").collect()
      assert(MvRegistry.lookup(Seq(mvSrc)).isEmpty)
      assert(servedBy(agg).isEmpty, "dropped MV still served")
    } finally {
      HnswGraphRegistry.clear(); IvfIndexRegistry.clear(); MvRegistry.clear()
      SqlIndexRegistry.clear(); graft.plans.IndexCatalog.resetAutoLoad()
    }
  }

  test("non-DDL SQL is untouched by the injected parser") {
    assert(spark.sql("SELECT 1 + 1 AS two").head().getInt(0) === 2)
    // and a syntax error in ordinary SQL still surfaces as a parse error
    intercept[Exception] { spark.sql("SELEKT 1") }
  }
}
