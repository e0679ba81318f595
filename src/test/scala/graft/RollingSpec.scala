package graft

import org.apache.spark.sql.functions._

import graft.queries.Rolling

/** Rolling-window semantics: min_periods gating and frame math. */
class RollingSpec extends SparkSpecBase {
  import spark.implicits._

  test("min_periods gates every rolling output to null below threshold") {
    val df = Rolling.queries("q_rolling_basic")(spark, sf).cache()
    val bad = df.filter(
      (col("roll_cnt") < 3 && col("roll_sum").isNotNull) ||
      (col("roll_cnt") >= 3 && col("roll_sum").isNull)).count()
    assert(bad == 0)
    df.unpersist()
  }

  test("rolling mean equals rolling sum over count") {
    val df = Rolling.queries("q_rolling_basic")(spark, sf)
    val bad = df.filter(col("roll_mean").isNotNull &&
      abs(col("roll_mean") - col("roll_sum") / col("roll_cnt")) > 1e-9).count()
    assert(bad == 0)
  }

  test("rolling var is non-negative and std = sqrt(var)") {
    val df = Rolling.queries("q_rolling_var_std")(spark, sf)
    val bad = df.filter(col("roll_var").isNotNull &&
      (col("roll_var") < -1e-12 ||
       abs(col("roll_std") - sqrt(col("roll_var"))) > 1e-9)).count()
    assert(bad == 0)
  }

  test("rolling median sits between rolling min and max of the frame") {
    val df = Rolling.queries("q_rolling_median_quantile")(spark, sf)
    val bad = df.filter(col("roll_median").isNotNull &&
      (col("roll_q25") > col("roll_median"))).count()
    assert(bad == 0)
  }

  test("rolling corr is within [-1, 1]") {
    val df = Rolling.queries("q_rolling_corr_cov")(spark, sf)
    val bad = df.filter(col("roll_corr").isNotNull &&
      (col("roll_corr") > 1.000001 || col("roll_corr") < -1.000001)).count()
    assert(bad == 0)
  }

  test("rolling apply (sum of squared deviations) is never negative") {
    val df = Rolling.queries("q_rolling_apply")(spark, sf)
    val bad = df.filter(col("roll_apply").isNotNull &&
      col("roll_apply") < 0).count()
    assert(bad == 0)
  }
}
