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

  // Regression (first hit at organic sf10): a window of 6 IDENTICAL
  // quantities has m2 exactly 0, and ANSI-mode Divide throws
  // DIVIDE_BY_ZERO even on doubles. pandas yields NaN for a constant
  // window (NaN ≡ missing ⇒ NULL here); the varied partition must keep
  // its non-null outputs. No driver fixture contains a constant 6-run,
  // so this stages its own two-supplier lineitem.
  test("rolling skew/kurt null out zero-variance windows instead of throwing") {
    import spark.implicits._
    // TempDirs.create registers a recursive shutdown-hook cleanup —
    // File.deleteOnExit would leak the dir (it only removes EMPTY
    // directories, and the parquet part files inside are unregistered).
    val dir = TempDirs.create("graft-skewkurt-")
    val constant = (1 to 8).map(i => (7L, 100L + i, i, 1000L + i, 25.0,
      java.sql.Timestamp.valueOf(f"1995-01-$i%02d 00:00:00")))
    val varied = (1 to 8).map(i => (8L, 200L + i, i, 2000L + i,
      (i % 5 + 1).toDouble,
      java.sql.Timestamp.valueOf(f"1995-02-$i%02d 00:00:00")))
    (constant ++ varied)
      .toDF("l_suppkey", "l_orderkey", "l_linenumber", "l_partkey",
        "l_quantity", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = Rolling.queries("q_rolling_skew_kurt")(spark, dir.toString)
      .collect() // the pre-guard plan ANSI-throws here
    assert(out.length == 16)
    val bySupp = out.groupBy(_.getLong(0))
    assert(bySupp(7L).forall(r =>
      r.isNullAt(r.fieldIndex("roll_skew")) &&
      r.isNullAt(r.fieldIndex("roll_kurt"))))
    assert(bySupp(8L).count(r =>
      !r.isNullAt(r.fieldIndex("roll_skew")) &&
      !r.isNullAt(r.fieldIndex("roll_kurt"))) == 4) // rows 5..8: n >= 5
  }
}
