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
               idCol: String, payload: Map[String, String]): DataFrame = {
    val leftCols = left.columns
    val tagged =
      right.select(
        (Seq(col(keyCol), col(tsCol), col(idCol), lit(0).as("__side")) ++
          payload.map { case (src, dst) => col(src).as(s"__p_$dst") } ++
          leftCols.filterNot(Seq(keyCol, tsCol, idCol).contains)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
      .unionByName(
        left.select(
          (Seq(col(keyCol), col(tsCol), col(idCol), lit(1).as("__side")) ++
            payload.map { case (_, dst) => lit(null).cast(right.schema(
              payload.find(_._2 == dst).get._1).dataType).as(s"__p_$dst") } ++
            leftCols.filterNot(Seq(keyCol, tsCol, idCol).contains).map(col)): _*))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = payload.values.foldLeft(tagged) { (df, dst) =>
      df.withColumn(dst, last(col(s"__p_$dst"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .drop("__side")
      .drop(payload.values.map(d => s"__p_$d").toSeq: _*)
  }
}
