package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{GraftFunctions, JaroWinkler}

/** The Jaro-Winkler kernel is only useful if it matches the oracle's
  * (DuckDB `jaro_winkler_similarity`) bit-for-bit — the `er_fuzzy_match`
  * linkage filters on the score, so a divergent transposition count or a
  * differently-gated prefix boost silently shifts which pairs match.
  * The constants below were probed from DuckDB directly (this session)
  * and pin every semantic branch: the classic Winkler census pairs, the
  * 0.7 boost gate (strictly greater), the 4-char prefix cap, integer
  * half-transpositions, empty-string and window-zero behavior.
  */
class JaroWinklerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("kernel matches DuckDB jaro_winkler_similarity on probed pairs") {
    // (a, b, duckdb jaro_winkler_similarity) — probed values, not derived
    val pinned = Seq(
      ("martha", "marhta", 0.9611111111111111),      // classic: m=6, t=1, prefix 3
      ("dixon", "dicksonx", 0.8133333333333332),     // classic: boost over 0.7667
      ("jellyfish", "smellyfish", 0.8962962962962964), // no common prefix → no boost
      ("CRATE", "TRACE", 0.7333333333333334),        // >0.7 but prefix 0
      ("DwAyNE", "DuANE", 0.8400000000000001),       // case-sensitive, m=4 t=0
      ("abcdxxxx", "abcyyyyyyyyyy", 0.5352564102564102), // jaro<0.7 → boost gated off
      ("ab", "abcdefghijklmnop", 0.7666666666666667),  // boost fires just above gate
      ("aaaaab", "aaaaac", 0.9333333333333333),      // common prefix 5 capped at 4
      ("abcdef", "bcadef", 0.9444444444444445),      // 3 mismatches → t = 3/2 = 1 (integer)
      ("a", "a", 1.0),
      ("abcdef", "abcdef", 1.0),
      ("ab", "ba", 0.0),                             // window 0 → no matches
      ("abc", "", 0.0),
      ("", "", 0.0))                                 // DuckDB: empty → 0, not 1
    pinned.foreach { case (a, b, expect) =>
      assert(jw(a, b) === expect, s"jw($a, $b)")
    }
  }

  test("kernel is symmetric and bounded on random-ish pairs") {
    val words = Seq("ring", "widget", "small ring", "red widget", "brand#17",
      "economy", "promo burnished", "standard", "smal ring", "rde widget")
    for (a <- words; b <- words) {
      val s1 = jw(a, b)
      assert(s1 === jw(b, a), s"symmetry $a/$b")
      assert(s1 >= 0.0 && s1 <= 1.0)
      if (a == b) assert(s1 === 1.0)
    }
  }

  test("expression evaluates inside the plan (codegen path) and handles null") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(("martha", "marhta"), ("dixon", "dicksonx"), (null, "x"))
      .toDF("a", "b")
      .select(GraftFunctions.jaroWinkler(col("a"), col("b")).as("sim"))
    val got = df.collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(got(0) == 0.9611111111111111)
    assert(got(1) == 0.8133333333333332)
    assert(got(2) == null) // null in → null out, like built-in string funcs
  }

  test("blocked linkage never exceeds the within-block candidate space") {
    // the ER scale contract: candidates = Σ_blocks C(|block|, 2), not C(N, 2)
    val e = Tables.part(spark, "/root/testdata/sf0.001")
      .select(col("p_partkey").as("pk"), col("p_name").as("blk"))
    val blockPairs = e.groupBy("blk").count()
      .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")))
      .first().getLong(0)
    val a = e.select(col("pk").as("pk_a"), col("blk"))
    val b = e.select(col("pk").as("pk_b"), col("blk"))
    val candidates = a.join(b, Seq("blk")).filter(col("pk_a") < col("pk_b")).count()
    assert(candidates == blockPairs)
    val n = e.count()
    assert(candidates < n * (n - 1) / 2, "blocking must prune the cartesian")
  }
}
