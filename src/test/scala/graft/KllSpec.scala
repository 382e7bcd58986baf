package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Kll

/** Invariants of the deterministic-compaction KLL quantile sketch beyond
  * what the oracled audit query (kll_quantiles) checks: exact weight
  * conservation, the carried error certificate's soundness across the
  * whole quantile range, and merge ≡ mergeable (per-half sketches merged
  * in either order still certify correctly — the property that lets the
  * state ship across executors/days).
  */
class KllSpec extends AnyFunSuite {

  private def build(xs: Seq[Double]): Kll.Buf =
    xs.foldLeft(Kll.sketchAgg.zero)(Kll.sketchAgg.reduce)

  // deterministic pseudo-data with heavy ties and skew — adversarial for
  // rank estimates (no Random: fixed multiplicative walk)
  private val data: Seq[Double] =
    (1 to 5000).map(i => ((i * 2654435761L) % 1000) / 7.0)

  private def trueRankBounds(v: Double): (Long, Long) = {
    val lt = data.count(_ < v).toLong
    val le = data.count(_ <= v).toLong
    (lt + 1, le)
  }

  test("total weight is conserved exactly (sketch self-reports N)") {
    val sk = build(data)
    assert(Kll.items(sk).map(_._2).sum === data.length.toLong)
  }

  test("every percentile 1..99 lands within the sketch's own certificate") {
    val sk = build(data)
    val its = Kll.items(sk)
    val n = data.length
    for (p <- 1 to 99) {
      val q = p / 100.0
      val est = Kll.estimate(its, q)
      val (rLo, rHi) = trueRankBounds(est)
      assert(rHi >= q * n - sk.err && rLo <= q * n + sk.err,
        s"q=$q est=$est rank[$rLo,$rHi] outside ${q * n} ± ${sk.err}")
    }
  }

  test("the certificate is not vacuous (err ≪ N at this size)") {
    val sk = build(data)
    assert(sk.err < data.length / 4,
      s"err=${sk.err} too loose to audit anything at n=${data.length}")
  }

  test("per-half merge: weight conserved, certificate sound, order-insensitive bound") {
    val (a, b) = data.splitAt(data.length / 2)
    val merged = Kll.sketchAgg.merge(build(a), build(b))
    val mergedRev = Kll.sketchAgg.merge(build(b), build(a))
    val n = data.length
    for (m <- Seq(merged, mergedRev)) {
      assert(Kll.items(m).map(_._2).sum === n.toLong)
      for (q <- Seq(0.1, 0.5, 0.9)) {
        val est = Kll.estimate(Kll.items(m), q)
        val (rLo, rHi) = trueRankBounds(est)
        assert(rHi >= q * n - m.err && rLo <= q * n + m.err,
          s"merged q=$q est=$est rank[$rLo,$rHi] outside ${q * n} ± ${m.err}")
      }
    }
  }

  test("distributed build over events matches a local fold's certificate class") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    Kll.layout(spark, sf)
    val items = spark.read.parquet(Kll.itemsPath(sf))
      .as[(Double, Long)].collect().toSeq
    val meta = spark.read.parquet(Kll.metaPath(sf)).head()
    val (err, n) = (meta.getLong(0), meta.getLong(1))
    val exact = Tables.events(spark, sf).select("value").as[Double].collect().sorted
    assert(items.map(_._2).sum === exact.length.toLong)
    assert(n === exact.length.toLong)
    for (q <- Seq(0.25, 0.5, 0.9, 0.99)) {
      val est = Kll.estimate(items, q)
      val lt = exact.count(_ < est).toLong
      val le = exact.count(_ <= est).toLong
      assert(le >= q * n - err && lt + 1 <= q * n + err,
        s"q=$q est=$est rank[${lt + 1},$le] outside ${q * n} ± $err")
    }
  }
}
