package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BatchedInference
import graft.operators.BatchedInference.{DocText, HashingEmbedder}

class BatchedInferenceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("batched mapPartitions inference ≡ per-row expression path, bit-for-bit") {
    val batched = SparkEntry.queries("embed_batched")(spark, sf).collect()
    val perRow = SparkEntry.queries("embed_documents")(spark, sf).collect()
    assert(batched.length === perRow.length && batched.nonEmpty)
    batched.zip(perRow).foreach { case (b, p) => assert(b === p) }
  }

  test("model initialized exactly once per non-empty partition") {
    val counter = spark.sparkContext.longAccumulator("model_inits")
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").repartition(7).as[DocText]
    BatchedInference.embedPartitions(docs, () => new HashingEmbedder(),
      batchSize = 16, initCounter = Some(counter)).count()
    val nonEmpty = docs.rdd.mapPartitions(it => Iterator(if (it.hasNext) 1 else 0))
      .collect().sum
    assert(counter.value === nonEmpty.toLong)
    assert(counter.value <= 7L && counter.value > 0L)
  }

  test("batch boundaries never change results (batchSize 1 vs 7 vs 10000)") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text").as[DocText]
    def run(bs: Int) = BatchedInference
      .embedPartitions(docs, () => new HashingEmbedder(), batchSize = bs)
      .collect().sortBy(_.doc_id).map(r => (r.doc_id, r.embedding.toSeq))
    val a = run(1); val b = run(7); val c = run(10000)
    assert(a === b)
    assert(b === c)
  }
}
