package graft

import org.scalatest.funsuite.AnyFunSuite

/** The native Generator UDTF must reproduce the HOF chunking pipeline
  * exactly, and generate nothing for tokenless rows.
  */
class ChunkGenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("generator ≡ transform+posexplode chunking, row for row") {
    val hof = SparkEntry.queries("chunk_explode")(spark, sf).collect().map(_.toSeq)
    val gen = SparkEntry.queries("chunk_udtf")(spark, sf).collect().map(_.toSeq)
    assert(gen.nonEmpty)
    assert(hof.toSeq === gen.toSeq)
  }

  test("null and tokenless inputs generate zero rows; cap at 512 tokens") {
    import spark.implicits._
    graft.expressions.GraftFunctions.register(spark)
    Seq((1L, null: String), (2L, "###"), (3L, "a b c d e"),
      (4L, (1 to 600).map(i => s"t$i").mkString(" ")))
      .toDF("id", "text").createOrReplaceTempView("cg_edge")
    val rows = spark.sql(
      """SELECT id, c.chunk_idx, c.n_tokens FROM cg_edge
        |LATERAL VIEW chunk_gen(text, 2) c AS chunk_idx, chunk_text, n_tokens
        |ORDER BY id, chunk_idx""".stripMargin).collect()
    assert(!rows.exists(r => r.getLong(0) == 1L || r.getLong(0) == 2L))
    val three = rows.filter(_.getLong(0) == 3L)
    assert(three.map(_.getInt(1)).toSeq === Seq(0, 1, 2))
    assert(three.map(_.getInt(2)).toSeq === Seq(2, 2, 1))
    // 600 tokens truncate to 512 → 256 chunks of 2
    val four = rows.filter(_.getLong(0) == 4L)
    assert(four.length === 256)
    assert(four.map(_.getInt(2)).sum === 512)
  }
}
