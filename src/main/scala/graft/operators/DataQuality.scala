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

  /** Evaluate the suite: one aggregate pass, then a map-only explode into
    * the (check, observed, passed) report, ordered by check name.
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    require(checks.map(_.name).distinct.length == checks.length,
      "duplicate check names")
    val metrics = checks.map(c => round(c.observed.cast("double"), 6).as(c.name))
    val agged = df.agg(metrics.head, metrics.tail: _*)
    agged.select(explode(array(checks.map { c =>
        struct(lit(c.name).as("check_name"),
          col(c.name).as("observed"),
          c.pass(col(c.name)).as("passed"))
      }: _*)).as("r"))
      .select(col("r.check_name"), col("r.observed"), col("r.passed"))
      .orderBy(col("check_name"))
  }
}
