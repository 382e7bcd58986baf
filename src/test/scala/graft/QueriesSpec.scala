package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must run at sf0.001 and keep its oracle
  * invariants: non-degenerate schema, deterministic ordering contract
  * (verified row-for-row against DuckDB by tools/check.py — here we assert
  * the cheap structural facts per query).
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  /** Queries with no DuckDB-expressible semantics (driver falls back to a
    * rows-only check). EMPTY since round 5: every formerly-omitted query
    * (ann_lsh, embed_mllib, the PQ/IVFPQ family, the trained-IVF family)
    * is now oracled by dumped-index replay — the trained state is written
    * to parquet and the oracle replays search over the same files. Any
    * future query landing here makes the first test below fail until it
    * either gets an oracle or earns a justified entry.
    */
  val consciousOracleOmissions: Set[String] = Set.empty

  test("every query has an oracle or a conscious omission") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet --
      consciousOracleOmissions
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name runs at sf0.001 with a sane schema") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.columns.distinct.length === df.columns.length,
        s"duplicate column names in $name: ${df.columns.mkString(",")}")
      assert(df.count() >= 0)
    }
  }

  test("q1_agg produces the 6 (returnflag, linestatus) groups") {
    assert(SparkEntry.queries("q1_agg")(spark, sf).count() === 6)
  }

  test("topk_orders returns exactly 10 rows, price descending") {
    val prices = SparkEntry.queries("topk_orders")(spark, sf)
      .collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.length === 10)
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("rollup_agg grand total row equals table count") {
    val rows = SparkEntry.queries("rollup_agg")(spark, sf).collect()
    val total = rows.filter(_.getAs[Int]("gid") === 3).map(_.getAs[Long]("n"))
    assert(total.length === 1)
    assert(total.head === Tables.lineitem(spark, sf).count())
  }
}
