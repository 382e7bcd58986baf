package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Malformed-record handling on the semi-structured ingest path — the
  * read-side quarantine posture (the codec twin lives in MediaCodec /
  * Phash: count + exclude, never job-fatal, never silent). Spark's three
  * parser modes are the contract: PERMISSIVE routes the raw bad line
  * into `columnNameOfCorruptRecord` (quarantine — the 100 TB default:
  * one corrupt shard line must not kill a day-long ingest, and the
  * quarantined raw text is what the repair job reads), DROPMALFORMED
  * silently shrinks the table (measured here so the loss is a known
  * quantity, not a surprise), FAILFAST refuses the batch (the gate for
  * data you'd rather reject than patch).
  */
class BadRecordsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def writeJsonl(): String = {
    val dir = Files.createTempDirectory("graft_badrec").toFile.getAbsolutePath
    Files.writeString(Paths.get(s"$dir/part-0.jsonl"),
      """{"id": 1, "text": "good row"}
        |{"id": 2 "text": "missing comma"}
        |{"id": 3, "text": "another good row"}
        |not json at all
        |{"id": 4, "text": "tail good row"}
        |""".stripMargin)
    dir
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType),
    StructField("_corrupt", StringType)))

  test("PERMISSIVE quarantines the raw bad lines; good rows all survive") {
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(writeJsonl())
    // caching avoids the known Spark restriction on querying only the
    // corrupt column from a raw-parse scan
    df.cache().count()
    val good = df.filter(col("_corrupt").isNull)
      .select(col("id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(good === Set((1L, "good row"), (3L, "another good row"),
      (4L, "tail good row")))
    val bad = df.filter(col("_corrupt").isNotNull)
      .select(col("_corrupt")).collect().map(_.getString(0))
    assert(bad.length === 2)
    assert(bad.exists(_.contains("missing comma")), s"raw line lost: ${bad.toSeq}")
    assert(bad.contains("not json at all"))
    df.unpersist()
  }

  test("DROPMALFORMED shrinks silently (measured); FAILFAST refuses the batch") {
    val dir = writeJsonl()
    val dropped = spark.read
      .schema(StructType(schema.dropRight(1)))
      .option("mode", "DROPMALFORMED").json(dir)
    assert(dropped.count() === 3) // the loss is a known quantity
    val e = intercept[Exception] {
      spark.read.schema(StructType(schema.dropRight(1)))
        .option("mode", "FAILFAST").json(dir).collect()
    }
    assert((e.toString + Option(e.getCause).mkString).toLowerCase
      .contains("malformed"), s"unexpected failure mode: $e")
  }
}
