package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MergeScdSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.01"

  test("merge_upsert resolves matches with a broadcast join (snapshot never shuffles)") {
    val df = SparkEntry.queries("merge_upsert")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"CDC matched-row resolution must broadcast the changeset:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "the snapshot side must not shuffle for a broadcast-sized changeset")
  }

  test("merge_upsert applies delete > update > insert with correct counts") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val nBase = docs.count()
    val nDel = docs.filter($"doc_id" % 17 === 3).count()
    val nUpd = docs.filter($"doc_id" % 17 =!= 3 && $"doc_id" % 10 === 0).count()
    val nIns = docs.filter($"doc_id" % 17 =!= 3 && $"doc_id" % 10 =!= 0 &&
      $"doc_id" % 23 === 5).count()
    val out = SparkEntry.queries("merge_upsert")(spark, sf)
    val bySrc = out.groupBy($"src").count().as[(String, Long)].collect().toMap
    assert(bySrc.getOrElse("u", 0L) === nUpd)
    assert(bySrc.getOrElse("i", 0L) === nIns)
    assert(bySrc.getOrElse("k", 0L) === nBase - nDel - nUpd)
    assert(out.count() === nBase - nDel + nIns)
    // updated rows actually carry the new value
    val upd = out.filter($"src" === "u").join(docs, "doc_id")
      .filter(out("n_chars") =!= docs("n_chars") + 1000L).count()
    assert(upd === 0, "every updated row must carry n_chars + 1000")
  }

  test("scd2_history: versions are dense, intervals chain, exactly one current row per user") {
    import spark.implicits._
    val out = SparkEntry.queries("scd2_history")(spark, sf).cache()
    try {
      assert(out.count() > 0)
      // exactly one open-ended (current) version per user
      val current = out.groupBy($"user_id")
        .agg(sum(when($"is_current", 1L).otherwise(0L)).as("n_cur"))
        .filter($"n_cur" =!= 1L).count()
      assert(current === 0, "each user must have exactly one current row")
      // versions dense from 1 and valid_to == next version's valid_from
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"version")
      val chained = out
        .withColumn("expect_v", row_number().over(w).cast("long"))
        .withColumn("next_from", lead($"valid_from", 1).over(w))
        .filter($"version" =!= $"expect_v" ||
          ($"valid_to".isNotNull && $"valid_to" =!= $"next_from"))
        .count()
      assert(chained === 0, "versions must be dense and intervals must chain")
      // no consecutive versions share a state (changes-only collapse)
      val rep = out.withColumn("prev_state", lag($"state", 1).over(w))
        .filter($"prev_state".isNotNull && $"prev_state" === $"state").count()
      assert(rep === 0, "consecutive versions must differ in state")
    } finally { out.unpersist(); () }
  }
}
