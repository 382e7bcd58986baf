package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing evidence: two tables bucketed on the join key join WITHOUT
  * any Exchange — the co-located fact⋈fact layout that removes the
  * biggest shuffle of the star schema at 100 TB (write once bucketed,
  * join forever shuffle-free).
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Drop + physically remove managed tables (a crashed earlier run can
    * orphan the managed-table dirs — the fresh in-memory catalog no longer
    * knows them).
    */
  private def resetTables(names: String*): Unit = names.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val d = new java.io.File(s"spark-warehouse/$t")
    if (d.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(d)
    }
  }

  private def withoutBroadcast[A](body: => A): A = {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("bucketed tables join with no shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    resetTables("b_orders", "b_lineitem")
    Tables.orders(spark, sf)
      .write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("b_orders")
    Tables.lineitem(spark, sf)
      .write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(round(sum(col("l_quantity")), 2).as("qty"))

    // tiny test tables would broadcast — force the shuffle-join path the
    // bucketing is designed for, and execute THIS queryExecution so AQE
    // finalizes its plan
    val (result, plan) = withoutBroadcast {
      val r = joined.collect().sortBy(_.getString(0)).toSeq
      (r, joined.queryExecution.executedPlan.toString)
    }
    // the join itself must not shuffle either side (bucket layout is the
    // exchange); only the final aggregation exchanges its digests
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a bucket-friendly join in:\n$plan")
    val joinKeyExchanges = "Exchange hashpartitioning\\((l|o)_orderkey".r
      .findAllIn(plan).length
    assert(joinKeyExchanges === 0,
      s"join inputs were shuffled despite bucketing:\n$plan")

    // and the result matches the plain (shuffling) join
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(round(sum(col("l_quantity")), 2).as("qty"))
    assert(result === plain.collect().sortBy(_.getString(0)).toSeq)
  }

  test("persistent bucketed fingerprint index: the daily dedup anti-join needs no exchange") {
    // The incremental_dedup claim, proven: the historical fingerprint set
    // is written ONCE bucketed on fp (at 100 TB it is the compact
    // (fp)-digest index, not the corpus); each daily batch — produced by
    // the same pipeline, so also written bucketed — anti-joins against it
    // with ZERO exchanges on the join key: the bucket layout IS the
    // shuffle, paid at write time, amortized over every subsequent day.
    import graft.functions.TextOps
    val sf = "/root/testdata/sf0.001"
    resetTables("b_fp_hist", "b_fp_batch")
    val docs = Tables.documents(spark, sf)
    docs.filter(col("doc_id") < 400)
      .select(TextOps.fingerprint(col("text")).as("fp")).distinct()
      .write.bucketBy(8, "fp").sortBy("fp").saveAsTable("b_fp_hist")
    docs.filter(col("doc_id") >= 400)
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .union(docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 20000).as("doc_id"),
          TextOps.fingerprint(col("text")).as("fp")))
      .write.bucketBy(8, "fp").sortBy("fp").saveAsTable("b_fp_batch")

    val survivors = spark.table("b_fp_batch")
      .join(spark.table("b_fp_hist"), Seq("fp"), "left_anti")
    val (result, plan) = withoutBroadcast {
      (survivors.collect().map(_.getAs[Long]("doc_id")).sorted.toSeq,
        survivors.queryExecution.executedPlan.toString)
    }
    val fpExchanges = "Exchange hashpartitioning\\(fp".r.findAllIn(plan).length
    assert(fpExchanges === 0,
      s"anti-join shuffled despite the bucketed fp index:\n$plan")
    assert(plan.contains("SortMergeJoin") && plan.contains("LeftAnti"),
      s"expected a sort-merge anti-join over the bucket layout:\n$plan")

    // equality with the plain (unbucketed, shuffling) anti-join
    val fp = TextOps.fingerprint(col("text"))
    val hist = docs.filter(col("doc_id") < 400).select(fp.as("fp")).distinct()
    val batch = docs.filter(col("doc_id") >= 400)
      .select(col("doc_id"), fp.as("fp"))
      .union(docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 20000).as("doc_id"), fp.as("fp")))
    val plain = batch.join(hist, Seq("fp"), "left_anti")
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(result === plain)
  }
}
