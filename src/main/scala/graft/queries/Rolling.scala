package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** SURVEY §2.6 rolling windows.
  *
  * Reference surface: `S.rolling(window, min_periods)` +
  * `sum/mean/min/max/count/std/var/median/quantile/corr/cov/skew/kurt/apply`
  * (`sdc/datatypes/hpat_pandas_series_rolling_functions.py:139-1135`):
  * trailing row-count frames, `min_periods` = required non-NaN count, else
  * NaN output.
  *
  * Spark mapping: `Window.partitionBy(keys).orderBy(order)
  * .rowsBetween(-(w-1), 0)`; the `min_periods` gate is
  * `when(count(x).over(frame) >= minp, agg).otherwise(null)`.
  *
  * Scale: windows are partitioned by supplier key, so the sort is
  * per-partition after one shuffle — no global single-partition window in
  * the hot path. Running sums use decimal accumulation (exact ⇒
  * partitioning-independent).
  */
object Rolling {

  private val dec2 = DecimalType(30, 2)

  val queries: Map[String, Q] = Map(
    // rolling sum/mean/min/max/count, window=5, min_periods=3
    "q_rolling_basic" -> ((s, dir) => {
      val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(order: _*)
        .rowsBetween(-4, Window.currentRow)
      val cnt = count(col("l_extendedprice")).over(w)
      val rsum = sum(col("l_extendedprice").cast(dec2)).over(w).cast("double")
      Tables(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("l_shipdate"))
        .withColumn("roll_cnt", cnt)
        .withColumn("roll_sum", when(cnt >= 3, rsum))
        .withColumn("roll_mean", when(cnt >= 3, rsum / cnt))
        .withColumn("roll_min", when(cnt >= 3, min(col("l_extendedprice")).over(w)))
        .withColumn("roll_max", when(cnt >= 3, max(col("l_extendedprice")).over(w)))
        .drop("l_shipdate")
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // rolling var/std from exact windowed power sums, window=4, minp=4
    "q_rolling_var_std" -> ((s, dir) => {
      val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(order: _*)
        .rowsBetween(-3, Window.currentRow)
      val x = col("l_quantity")
      val n = count(x).over(w).cast("double")
      val s1 = sum(x.cast(dec2)).over(w).cast("double")
      val s2 = sum((x * x).cast(DecimalType(34, 4))).over(w).cast("double")
      val variance = (s2 - s1 * s1 / n) / (n - lit(1.0))
      Tables(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), x,
          col("l_shipdate"))
        .withColumn("roll_var", when(n >= 4, variance))
        .withColumn("roll_std", when(n >= 4, sqrt(variance)))
        .drop("l_shipdate")
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_rolling_basic" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |  COUNT(l_extendedprice) OVER w AS roll_cnt,
        |  CASE WHEN COUNT(l_extendedprice) OVER w >= 3
        |    THEN CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) OVER w AS DOUBLE)
        |  END AS roll_sum,
        |  CASE WHEN COUNT(l_extendedprice) OVER w >= 3
        |    THEN CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) OVER w AS DOUBLE)
        |         / COUNT(l_extendedprice) OVER w
        |  END AS roll_mean,
        |  CASE WHEN COUNT(l_extendedprice) OVER w >= 3
        |    THEN MIN(l_extendedprice) OVER w END AS roll_min,
        |  CASE WHEN COUNT(l_extendedprice) OVER w >= 3
        |    THEN MAX(l_extendedprice) OVER w END AS roll_max
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "q_rolling_var_std" ->
      """WITH t AS (SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  CAST(COUNT(l_quantity) OVER w AS DOUBLE) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) OVER w AS DOUBLE) AS s1,
        |  CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(34,4))) OVER w AS DOUBLE) AS s2
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber
        |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))
        |SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  CASE WHEN n >= 4 THEN (s2 - s1*s1/n) / (n - 1.0) END AS roll_var,
        |  CASE WHEN n >= 4 THEN SQRT((s2 - s1*s1/n) / (n - 1.0)) END AS roll_std
        |FROM t ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin
  )
}
