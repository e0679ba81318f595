package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `pd.merge_asof` (backward direction), Spark-first.
  *
  * Reference: legacy HPAT surface, `sdc/tests/test_join.py:52-340`
  * (`test_merge_asof*`, all `@skip_numba_jit`): for each left row, attach
  * the most recent right row with `right.time <= left.time`, optionally
  * matched within `by` key columns.
  *
  * Implementation — union + running `last(..., ignoreNulls)` window,
  * NOT a range join:
  *   1. tag left rows 1 / right rows 0 and union them;
  *   2. one shuffle-sort per `by` key on (time, tag) — at equal times the
  *      right row sorts first, so `l.time >= r.time` inclusive semantics
  *      hold;
  *   3. `last(rightCol, ignoreNulls)` over rows (unboundedPreceding,
  *      currentRow) carries the latest right value forward;
  *   4. keep the left-tagged rows.
  *
  * Scale: cost is one shuffle + sort of |L|+|R| partitioned by `by` —
  * the same shape as a sort-merge join, with no row explosion for dense
  * right sides (a naive `l.time >= r.time` range join is O(|L|·|R|) per
  * key). Skewed `by` keys are handled by AQE; without `by` keys this
  * degrades to a single-partition sort, which is inherent to the global
  * asof semantics (callers should provide keys at scale).
  */
object MergeAsof {

  /** @param left      left frame (one output row per left row)
    * @param right     right frame
    * @param on        time column name present in both frames
    * @param by        equi-match key columns present in both frames
    * @param rightCols right value columns to attach (renamed as-is)
    */
  def backward(left: DataFrame, right: DataFrame, on: String,
               by: Seq[String], rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val tag = "__asof_is_left"

    val rightSlim = right.select((by :+ on).map(col) ++ rightCols.map(col): _*)
    // Null-fill the non-shared columns on each side before the union.
    val lTagged = left
      .select((leftCols.map(col) :+ lit(1).as(tag)) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rTagged = rightSlim
      .select(leftCols.map(c =>
        if (by.contains(c) || c == on) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        (lit(0).as(tag) +: rightCols.map(col)): _*)

    val unioned = lTagged.unionByName(rTagged)
    val w0 = if (by.nonEmpty) Window.partitionBy(by.map(col): _*) else Window.partitionBy()
    val w = w0.orderBy(col(on).asc, col(tag).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = rightCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col(tag) === 1).drop(tag)
  }
}
