package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions._

/** SURVEY §2.11 null handling with pandas NaN≡missing semantics.
  *
  * Reference: `S.dropna` (`hpat_pandas_series_functions.py:3962`),
  * `S.fillna` (`:4040`), `isna/notna` kernels (`sdc/hiframes/api.py:53-107`
  * — float NaN is the missing value; strings use a validity bitmap).
  *
  * The driver tables are null-free, so nulls are derived in-query
  * (`nullif`) — identically on the oracle side — to exercise the paths.
  */
object NullOps {

  val queries: Map[String, Q] = Map(
    // isna / notna / fillna / dropna counts over a derived nullable column
    "q_null_handling" -> ((s, dir) => {
      val disc = nullif(col("l_discount"), lit(0.0))
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), disc.as("disc_n"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("disc_n").isNull, 1).otherwise(0)).as("n_na"),
          count(col("disc_n")).as("n_dropna"),
          dsum(coalesce(col("disc_n"), lit(-1.0))).as("sum_filled"))
    }),

    // row-level fillna + dropna projection
    "q_fillna_rows" -> ((s, dir) => {
      val disc = nullif(col("l_discount"), lit(0.0))
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), disc.as("disc_n"))
        .withColumn("disc_filled", coalesce(col("disc_n"), lit(9.99)))
        .filter(col("l_orderkey") <= 1000)
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // aggregates skip missing (pandas skipna=True): mean over non-null only
    "q_skipna_mean" -> ((s, dir) => {
      val disc = nullif(col("l_discount"), lit(0.0))
      Tables(s, dir, "lineitem")
        .select(disc.as("disc_n"))
        .agg(
          (dsum(col("disc_n")) / count(col("disc_n"))).as("mean_disc"),
          min(col("disc_n")).as("min_disc"),
          max(col("disc_n")).as("max_disc"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_null_handling" ->
      """SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN NULLIF(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_na,
        |  COUNT(NULLIF(l_discount, 0.0)) AS n_dropna,
        |  CAST(SUM(CAST(COALESCE(NULLIF(l_discount, 0.0), -1.0)
        |    AS DECIMAL(30,2))) AS DOUBLE) AS sum_filled
        |FROM lineitem""".stripMargin,

    "q_fillna_rows" ->
      """SELECT l_orderkey, l_linenumber,
        |  NULLIF(l_discount, 0.0) AS disc_n,
        |  COALESCE(NULLIF(l_discount, 0.0), 9.99) AS disc_filled
        |FROM lineitem WHERE l_orderkey <= 1000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_skipna_mean" ->
      """SELECT
        |  CAST(SUM(CAST(NULLIF(l_discount, 0.0) AS DECIMAL(30,2))) AS DOUBLE)
        |    / COUNT(NULLIF(l_discount, 0.0)) AS mean_disc,
        |  MIN(NULLIF(l_discount, 0.0)) AS min_disc,
        |  MAX(NULLIF(l_discount, 0.0)) AS max_disc
        |FROM lineitem""".stripMargin
  )
}
