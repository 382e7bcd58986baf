package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spark 4 runs ANSI SQL mode by default: integral divide-by-zero and
  * malformed casts are runtime ERRORS (silent-corruption-proof), and the
  * `try_*` family is the row-level quarantine that turns exactly those
  * failures into NULLs — one bad row must not kill a 100 TB job, but it
  * must also never silently become a wrong number. The registered
  * `try_funcs` query oracles the NULL semantics; this spec pins the
  * throwing half of the contract.
  */
class AnsiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("ANSI throws on div-by-zero and bad casts; try_* quarantines the same rows to NULL") {
    assert(spark.conf.get("spark.sql.ansi.enabled") === "true",
      "engine contract: ANSI mode on")
    intercept[Exception](
      Seq(1).toDF("a").select(expr("a div 0")).collect())
    intercept[Exception](
      Seq("abc").toDF("s").select(col("s").cast("int")).collect())
    val out = Seq(1).toDF("a").select(
      expr("try_divide(a, 0)").as("d"),
      expr("try_cast('abc' AS INT)").as("c")).head()
    assert(out.isNullAt(0) && out.isNullAt(1))
  }
}
