package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `pd.merge_asof` (backward / forward / nearest directions), Spark-first.
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

  private val tag = "__asof_is_left"

  /** Tagged union of left rows (tag=1) and slimmed right rows (tag=0),
    * each side null-filled to the shared schema. */
  private def taggedUnion(left: DataFrame, right: DataFrame, on: String,
                          by: Seq[String], rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightSlim = right.select((by :+ on).map(col) ++ rightCols.map(col): _*)
    val lTagged = left
      .select((leftCols.map(col) :+ lit(1).as(tag)) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rTagged = rightSlim
      .select(leftCols.map(c =>
        if (by.contains(c) || c == on) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        (lit(0).as(tag) +: rightCols.map(col)): _*)
    lTagged.unionByName(rTagged)
  }

  private def part(by: Seq[String]) =
    if (by.nonEmpty) Window.partitionBy(by.map(col): _*) else Window.partitionBy()

  /** @param left      left frame (one output row per left row)
    * @param right     right frame
    * @param on        time column name present in both frames
    * @param by        equi-match key columns present in both frames
    * @param rightCols right value columns to attach (renamed as-is)
    */
  def backward(left: DataFrame, right: DataFrame, on: String,
               by: Seq[String], rightCols: Seq[String]): DataFrame = {
    val unioned = taggedUnion(left, right, on, by, rightCols)
    val w = part(by).orderBy(col(on).asc, col(tag).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col(tag) === 1).drop(tag)
  }

  /** `direction='forward'`: the EARLIEST right row with
    * `right.time >= left.time`. Same one-shuffle union shape as
    * [[backward]] with the frame flipped: at equal times the right row
    * sorts after the left (tag desc), so the inclusive match holds. */
  def forward(left: DataFrame, right: DataFrame, on: String,
              by: Seq[String], rightCols: Seq[String]): DataFrame = {
    val unioned = taggedUnion(left, right, on, by, rightCols)
    val w = part(by).orderBy(col(on).asc, col(tag).desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = rightCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, first(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col(tag) === 1).drop(tag)
  }

  /** `direction='nearest'`: whichever of the backward/forward matches is
    * closer in time (ties → backward, pandas semantics). Both directions
    * are carried over ONE numeric-range-ordered sort — range frames make
    * the equal-time right row visible to both directions, so the union
    * is still shuffled and sorted exactly once.
    *
    * The right side should be unique per (by, on): with several right
    * rows at the identical time the carried value among those peers is
    * engine-order-dependent (pandas has the same positional caveat) —
    * pre-aggregate the right side as the query layer does. */
  def nearest(left: DataFrame, right: DataFrame, on: String,
              by: Seq[String], rightCols: Seq[String]): DataFrame = {
    val unioned = taggedUnion(left, right, on, by, rightCols)
      .withColumn("__t", unix_micros(col(on)))
      .withColumn("__rt", when(col(tag) === 0, unix_micros(col(on))))
    val wB = part(by).orderBy(col("__t"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = part(by).orderBy(col("__t"))
      .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    val bt = last(col("__rt"), ignoreNulls = true).over(wB)
    val ft = first(col("__rt"), ignoreNulls = true).over(wF)
    val pickBwd = bt.isNotNull &&
      (ft.isNull || (col("__t") - bt) <= (ft - col("__t")))
    val filled = rightCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, when(pickBwd,
        last(col(c), ignoreNulls = true).over(wB))
        .otherwise(first(col(c), ignoreNulls = true).over(wF)))
    }
    filled.filter(col(tag) === 1).drop(tag, "__t", "__rt")
  }
}
