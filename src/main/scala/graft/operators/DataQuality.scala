package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suites (the Deequ model, built
  * from scratch on plain aggregates): a suite of named checks — each an
  * aggregate METRIC plus a pass PREDICATE over it — evaluated against a
  * table in ONE aggregate pass, producing a (check, observed, passed)
  * report instead of throwing. The report-not-exception posture is the
  * pipeline-gate shape: a 100 TB ingest job runs the suite as its last
  * stage and the orchestrator decides publish/quarantine from the report
  * rows.
  *
  * Scale shape: all metrics ride a single partial+final aggregate over
  * the table (one job, one 1-row result); the report rows are a map-only
  * explode of that single row — adding a 40th check adds zero scans.
  * Exact distinct counts are the one non-partial-friendly metric class;
  * [[uniquenessRatio]] uses count_distinct deliberately (the audit wants
  * exactness) — swap approx_count_distinct at volumes where a 5% bound
  * is acceptable.
  */
object DataQuality {

  /** One constraint: `observed` must be an aggregate expression; `pass`
    * receives the observed metric column (post-aggregation) and returns
    * a boolean column.
    */
  final case class Check(name: String, observed: Column,
                         pass: Column => Column)

  /** Fraction of rows where `c` is non-null. */
  def completeness(c: Column): Column =
    avg(c.isNotNull.cast("int")).cast("double")

  /** Exact distinct/total ratio — 1.0 iff the column is a key. */
  def uniquenessRatio(c: Column): Column =
    count_distinct(c).cast("double") / count(lit(1))

  /** Fraction of rows whose value is in the allowed set. NULL counts as
    * NOT in-set (isin yields NULL on NULL input, and avg would silently
    * skip it — a null-riddled column must not pass a domain check).
    */
  def inSetRatio(c: Column, allowed: Seq[String]): Column =
    avg(coalesce(c.isin(allowed: _*), lit(false)).cast("int")).cast("double")

  /** Population Stability Index between a baseline and a current
    * population of one numeric column — the distribution-shift monitor a
    * training pipeline runs between corpus snapshots (PSI < 0.1 stable,
    * 0.1–0.25 moderate, > 0.25 significant by the usual banking-scorecard
    * convention). Fixed-width binning (caller supplies width; values
    * clamp into [0, nBins-1] so outliers land in the edge bins rather
    * than vanish), Laplace-smoothed shares (+0.5 per bin over a full bin
    * spine) so empty bins cannot produce ln(0).
    *
    * Scale shape: each side is one partial+final count aggregate down to
    * nBins rows; everything after — spine join, shares, contributions,
    * the PSI sum — is arithmetic over that nBins-row frame (the
    * unpartitioned window sums are bounded by nBins, not the data).
    */
  def psiDrift(base: DataFrame, cur: DataFrame, value: Column,
               nBins: Int, width: Double): DataFrame = {
    require(nBins > 1, "need at least 2 bins")
    require(width > 0, "bin width must be positive")
    // NULLs are excluded, not binned: Spark's least/greatest SKIP nulls,
    // so an unfiltered NULL would land in the top bin and fake a right
    // shift. A null-rate change is dq_checks' completeness business.
    def binned(df: DataFrame) = df
      .select(value.cast("double").as("v")).filter(col("v").isNotNull)
      .select(greatest(lit(0L),
        least(lit(nBins - 1L), floor(col("v") / width).cast("long"))).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("c"))
    val spine = base.sparkSession.range(nBins).select(col("id").as("bin"))
    val joined = spine
      .join(binned(base).withColumnRenamed("c", "cb"), Seq("bin"), "left")
      .join(binned(cur).withColumnRenamed("c", "cc"), Seq("bin"), "left")
      .select(col("bin"), coalesce(col("cb"), lit(0L)).as("n_base"),
        coalesce(col("cc"), lit(0L)).as("n_cur"))
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy(Seq.empty[Column]: _*) // nBins-row frame — bounded
    val smooth = 0.5 * nBins
    joined
      .withColumn("pb",
        (col("n_base") + 0.5) / (sum(col("n_base")).over(all) + smooth))
      .withColumn("pc",
        (col("n_cur") + 0.5) / (sum(col("n_cur")).over(all) + smooth))
      .withColumn("raw", (col("pb") - col("pc")) * log(col("pb") / col("pc")))
      .select(col("bin"), col("n_base"), col("n_cur"),
        round(col("pb"), 6).as("p_base"), round(col("pc"), 6).as("p_cur"),
        round(col("raw"), 6).as("contrib"),
        round(sum(col("raw")).over(all), 6).as("psi"))
      .orderBy(col("bin"))
  }

  /** Evaluate the suite: one aggregate pass, then a map-only explode into
    * the (check, observed, passed) report, ordered by check name.
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    require(checks.map(_.name).distinct.length == checks.length,
      "duplicate check names")
    val metrics = checks.map(c => c.observed.cast("double").as(c.name))
    val agged = df.agg(metrics.head, metrics.tail: _*)
    // the pass predicate sees the RAW metric; only the displayed value
    // rounds. Gating on the rounded value would wave through a 1-in-10M
    // completeness/uniqueness miss (0.9999999 rounds to 1.0) — exactly
    // the rows an exactness check exists to catch.
    agged.select(explode(array(checks.map { c =>
        struct(lit(c.name).as("check_name"),
          round(col(c.name), 6).as("observed"),
          c.pass(col(c.name)).as("passed"))
      }: _*)).as("r"))
      .select(col("r.check_name"), col("r.observed"), col("r.passed"))
      .orderBy(col("check_name"))
  }
}
