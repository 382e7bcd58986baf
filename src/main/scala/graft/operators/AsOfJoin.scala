package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: each left row picks the most recent right row with
  * the same key and right.ts <= left.ts (inclusive).
  *
  * Implemented with the union + ordered-window + last(ignoreNulls) carry
  * technique rather than a range join: a naive theta join
  * (l.key = r.key AND r.ts <= l.ts) plans as a broadcast nested loop and
  * explodes at scale, while this shape is ONE shuffle by key and a single
  * ordered pass per partition — the standard distributed as-of layout.
  * Spark has no built-in as-of operator (SURVEY.md §2B); DuckDB's native
  * ASOF JOIN is the oracle for its semantics.
  *
  * Determinism: the carry window orders by (ts, side, id) — right rows
  * sort before left rows at equal ts, making the join inclusive; id breaks
  * remaining ties.
  *
  * The carried payload is a SINGLE struct of all payload columns with one
  * last(ignoreNulls) — the matched right row is atomic (nulls inside it are
  * carried as-is), matching DuckDB ASOF semantics. Per-column carries would
  * backfill a null payload column from an OLDER right row, stitching values
  * from different rows.
  */
object AsOfJoin {

  /** @param left      rows to enrich
    * @param right     rows providing the carried payload
    * @param keyCol    equi-key on both sides
    * @param tsCol     event-time column on both sides
    * @param idCol     unique id on both sides (tie-break)
    * @param payload   right-side columns to carry (renamed as given)
    * @return left rows + carried payload columns (null when no prior right
    *         row exists — left-join semantics)
    */
  def backward(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
               idCol: String, payload: Map[String, String]): DataFrame =
    carry(left, right, keyCol, tsCol, idCol, payload, ascending = true)

  /** Forward as-of join: each left row picks the EARLIEST right row with
    * the same key and right.ts >= left.ts (inclusive) — "the next quote
    * after the order". Identical one-shuffle union+window shape with the
    * time axis reversed; DuckDB's `ASOF LEFT JOIN ... ON l.ts <= r.ts` is
    * the oracle.
    */
  def forward(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
              idCol: String, payload: Map[String, String]): DataFrame =
    carry(left, right, keyCol, tsCol, idCol, payload, ascending = false)

  private def carry(left: DataFrame, right: DataFrame, keyCol: String,
                    tsCol: String, idCol: String, payload: Map[String, String],
                    ascending: Boolean): DataFrame = {
    val leftCols = left.columns
    val pay = payload.toSeq // freeze iteration order
    // one struct = one atomic matched row; struct(...) is never null itself,
    // so last(ignoreNulls) skips only the left-side placeholder rows
    val payStruct = struct(pay.map { case (src, dst) => col(src).as(dst) }: _*)
    val payType = right.select(payStruct.as("__pay")).schema("__pay").dataType
    val tagged =
      right.select(
        (Seq(col(keyCol), col(tsCol), col(idCol), lit(0).as("__side"),
          payStruct.as("__pay")) ++
          leftCols.filterNot(Seq(keyCol, tsCol, idCol).contains)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
      .unionByName(
        left.select(
          (Seq(col(keyCol), col(tsCol), col(idCol), lit(1).as("__side"),
            lit(null).cast(payType).as("__pay")) ++
            leftCols.filterNot(Seq(keyCol, tsCol, idCol).contains).map(col)): _*))
    val tsOrder = if (ascending) col(tsCol).asc else col(tsCol).desc
    val w = Window.partitionBy(col(keyCol))
      .orderBy(tsOrder, col("__side"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = tagged
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
    pay.foldLeft(carried.filter(col("__side") === 1)) { case (df, (_, dst)) =>
        df.withColumn(dst, col(s"__match.$dst"))
      }
      .drop("__side", "__pay", "__match")
  }
}
