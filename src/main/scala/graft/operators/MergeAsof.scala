package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** The matched right ROW carried as one struct: non-null for every
    * right row even when its value fields are null, so the fill attaches
    * the matched row's fields exactly — null values included (pandas and
    * DuckDB ASOF semantics) — and every rightCol comes from the SAME
    * matched row. */
  private def rowStruct(on: String, rightCols: Seq[String]): Column =
    when(col(tag) === 0, struct((on +: rightCols).map(col): _*))

  /** `direction='backward'` (pandas default): for each left row, the
    * LATEST right row with `right.time <= left.time` (strictly `<` when
    * `allowExactMatches=false`, pandas' parameter of the same name).
    *
    * Both pandas refinements are free riders on the one-shuffle plan:
    * exact-match exclusion is purely a SORT TIE-BREAK (at equal times
    * the right row sorts before the left for inclusive semantics and
    * after it for strict, so the growing frame sees exactly the
    * admissible rows — no extra pass), and `tolerance` is a per-row
    * post-predicate on the carried match's time (too-distant matches
    * null out, the left row survives — pandas semantics).
    *
    * @param left      left frame (one output row per left row)
    * @param right     right frame
    * @param on        time column name present in both frames (any
    *                  orderable type)
    * @param by        equi-match key columns present in both frames
    * @param rightCols right value columns to attach (renamed as-is)
    * @param tolerance max allowed `left.on − match.on` as a literal of
    *                  the difference type (INTERVAL for timestamps,
    *                  numeric for numeric keys); None = unbounded
    * @param allowExactMatches false = require `right.time < left.time`
    */
  def backward(left: DataFrame, right: DataFrame, on: String,
               by: Seq[String], rightCols: Seq[String],
               tolerance: Option[Column] = None,
               allowExactMatches: Boolean = true): DataFrame = {
    val unioned = taggedUnion(left, right, on, by, rightCols)
      .withColumn("__r", rowStruct(on, rightCols))
    val tagOrder = if (allowExactMatches) col(tag).asc else col(tag).desc
    val w = part(by).orderBy(col(on).asc, tagOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
    val admissible = tolerance match {
      case Some(tol) => (col(on) - col("__m").getField(on)) <= tol
      case None => lit(true)
    }
    rightCols.foldLeft(filled) { (df, c) =>
      df.withColumn(c, when(admissible, col("__m").getField(c)))
    }.filter(col(tag) === 1).drop(tag, "__r", "__m")
  }

  /** `direction='forward'`: the EARLIEST right row with
    * `right.time >= left.time` (strictly `>` when
    * `allowExactMatches=false`). Same one-shuffle union shape as
    * [[backward]], sorted by time DESCENDING so the fill stays a
    * GROWING (unboundedPreceding → currentRow) frame — O(1) per row,
    * never the O(n²) shrinking-frame evaluation. In descending order
    * the preceding rows are exactly those with time ≥ current; the
    * equal-time tie-break and `tolerance` (bounding `match.on − left.on`)
    * work as in [[backward]]. */
  def forward(left: DataFrame, right: DataFrame, on: String,
              by: Seq[String], rightCols: Seq[String],
              tolerance: Option[Column] = None,
              allowExactMatches: Boolean = true): DataFrame = {
    val unioned = taggedUnion(left, right, on, by, rightCols)
      .withColumn("__r", rowStruct(on, rightCols))
    val tagOrder = if (allowExactMatches) col(tag).asc else col(tag).desc
    val w = part(by).orderBy(col(on).desc, tagOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
    val admissible = tolerance match {
      case Some(tol) => (col("__m").getField(on) - col(on)) <= tol
      case None => lit(true)
    }
    rightCols.foldLeft(filled) { (df, c) =>
      df.withColumn(c, when(admissible, col("__m").getField(c)))
    }.filter(col(tag) === 1).drop(tag, "__r", "__m")
  }

  /** `direction='nearest'`: whichever of the backward/forward matches is
    * closer in time (ties → backward, pandas semantics). Two linear
    * growing-frame passes over the one shuffled union — an ascending
    * sort carrying the backward match and a descending one carrying the
    * forward match — then a per-row distance compare. `on` may be any
    * type whose subtraction is orderable (timestamp → interval, numeric
    * → numeric), so integer and date on-keys work like the other
    * directions.
    *
    * The right side should be unique per (by, on): with several right
    * rows at the identical time the carried row among those peers is
    * engine-order-dependent (pandas has the same positional caveat) —
    * pre-aggregate the right side as the query layer does. */
  def nearest(left: DataFrame, right: DataFrame, on: String,
              by: Seq[String], rightCols: Seq[String]): DataFrame = {
    val unioned = taggedUnion(left, right, on, by, rightCols)
      .withColumn("__r", rowStruct(on, rightCols))
    val wB = part(by).orderBy(col(on).asc, col(tag).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = part(by).orderBy(col(on).desc, col(tag).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("__mb", last(col("__r"), ignoreNulls = true).over(wB))
      .withColumn("__mf", last(col("__r"), ignoreNulls = true).over(wF))
    val bt = col("__mb").getField(on)
    val ft = col("__mf").getField(on)
    val pickBwd = bt.isNotNull &&
      (ft.isNull || (col(on) - bt) <= (ft - col(on)))
    rightCols.foldLeft(filled) { (df, c) =>
      df.withColumn(c, when(pickBwd, col("__mb").getField(c))
        .otherwise(col("__mf").getField(c)))
    }.filter(col(tag) === 1).drop(tag, "__r", "__mb", "__mf")
  }
}
