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
  *
  * Window order MUST be a total order: (l_orderkey, l_linenumber) is NOT
  * unique in the driver's lineitem (456,861 distinct of 600,000 rows at
  * sf0.1), and a tied window order makes every frame engine-order-
  * dependent — each engine picks its own tie order and the rolling values
  * diverge. (l_orderkey, l_linenumber, l_partkey, l_suppkey) IS unique,
  * so l_partkey completes the order under the suppkey partition.
  */
object Rolling {

  private val dec2 = DecimalType(30, 2)

  val queries: Map[String, Q] = Map(
    // rolling sum/mean/min/max/count, window=5, min_periods=3.
    // The decimal sum uses the O(1)-per-row cumulative difference (see
    // q_rolling_skew_kurt — exact, bit-identical); min/max are not
    // invertible, so they keep the sliding frame (cheap long compares).
    "q_rolling_basic" -> ((s, dir) => {
      val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"))
      val wPart = Window.partitionBy(col("l_suppkey")).orderBy(order: _*)
      val w = wPart.rowsBetween(-4, Window.currentRow)
      val wRun = wPart.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // roll_cnt is pandas' min_periods gate: COUNT of NON-NULL values in
      // the frame — not the row count (least(row_number, w) would diverge
      // on any null-bearing value column). The sliding count is cheap long
      // increments, like min/max; only the decimal sum uses the O(1)
      // cumulative-difference trick.
      // One Window pass for all same-spec functions (running sum +
      // sliding count/min/max share the (partition, order) spec; the
      // exec groups them by frame internally), a second pass for the lag
      // over the first pass's output — withColumn chains would leave
      // Projects between Window nodes and defeat CollapseWindow.
      val cums = Tables(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_extendedprice"), col("l_shipdate"))
        .select(col("*"),
          sum(col("l_extendedprice").cast(dec2)).over(wRun).as("__c1"),
          count(col("l_extendedprice")).over(w).as("roll_cnt"),
          min(col("l_extendedprice")).over(w).as("__min"),
          max(col("l_extendedprice")).over(w).as("__max"))
        .select(col("*"), lag(col("__c1"), 5).over(wPart).as("__l1"))
      val cnt = col("roll_cnt")
      val rsum = (col("__c1") - coalesce(col("__l1"), lit(0))).cast("double")
      cums
        .withColumn("roll_sum", when(cnt >= 3, rsum))
        .withColumn("roll_mean", when(cnt >= 3, rsum / cnt))
        .withColumn("roll_min", when(cnt >= 3, col("__min")))
        .withColumn("roll_max", when(cnt >= 3, col("__max")))
        .drop("l_shipdate", "l_partkey", "__c1", "__l1", "__min", "__max")
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // rolling var/std from exact windowed power sums, window=4, minp=4.
    // l_quantity is integer-valued (1..50, stored double), so the power
    // sums run in exact LONG arithmetic — bit-identical to the oracle's
    // decimal sums once cast to double (both are exact integers ≪ 2^53;
    // overflow needs Σq² > 2^63 ⇒ ~4·10^15 rows per partition) — and a
    // long sum aggregates several× faster than a decimal one.
    "q_rolling_var_std" -> ((s, dir) => {
      val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(order: _*)
        .rowsBetween(-3, Window.currentRow)
      val x = col("l_quantity")
      val xl = x.cast("long")
      val n = count(x).over(w).cast("double")
      val s1 = sum(xl).over(w).cast("double")
      val s2 = sum(xl * xl).over(w).cast("double")
      val variance = (s2 - s1 * s1 / n) / (n - lit(1.0))
      Tables(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_partkey"), x,
          col("l_shipdate"))
        .withColumn("roll_var", when(n >= 4, variance))
        .withColumn("roll_std", when(n >= 4, sqrt(variance)))
        .drop("l_shipdate", "l_partkey")
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // rolling median + quantile (exact, linear interpolation — pandas
    // default), window=5, minp=3. percentile() is an aggregate usable
    // over a window frame; rounded to 6dp because the two engines
    // interpolate with differently-associated (equal-valued) formulas.
    "q_rolling_median_quantile" -> ((s, dir) => {
      val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(order: _*)
        .rowsBetween(-4, Window.currentRow)
      val x = col("l_quantity")
      val n = count(x).over(w)
      Tables(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_partkey"), x,
          col("l_shipdate"))
        .withColumn("roll_median",
          when(n >= 3, round(expr("percentile(l_quantity, 0.5)").over(w), 6)))
        .withColumn("roll_q25",
          when(n >= 3, round(expr("percentile(l_quantity, 0.25)").over(w), 6)))
        .drop("l_shipdate", "l_partkey")
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // rolling corr/cov of (quantity, extendedprice) from exact windowed
    // cross sums, window=6, minp=4 (pairwise: only rows where both sides
    // are present count — `count(x*y)` — matching pandas pairwise frames).
    // Like q_rolling_skew_kurt, the five power/cross sums run as O(1)/row
    // running sums + a lag(win) cumulative difference instead of O(w)/row
    // sliding recomputes (measured ~4.8 s → ~1.5 s at sf0.1); the sums
    // are exact (longs for integer-valued quantity, decimals for price),
    // so the differences are bit-identical to the oracle's sliding sums.
    "q_rolling_corr_cov" -> ((s, dir) => {
      val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"))
      val wPart = Window.partitionBy(col("l_suppkey")).orderBy(order: _*)
      val wRun = wPart.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val w = wPart.rowsBetween(-5, Window.currentRow)
      val x = col("l_quantity")
      val y = col("l_extendedprice")
      val xl = x.cast("long")
      val win = 6
      val dec4a = DecimalType(34, 4)
      val dec4b = DecimalType(38, 4)
      val cums = Tables(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), x, y, col("l_shipdate"))
        .withColumn("__n", count(x * y).over(w))
        .withColumn("__cx", sum(xl).over(wRun))
        .withColumn("__cxx", sum(xl * xl).over(wRun))
        .withColumn("__cy", sum(y.cast(dec2)).over(wRun))
        .withColumn("__cyy", sum((y * y).cast(dec4b)).over(wRun))
        .withColumn("__cxy", sum((x * y).cast(dec4a)).over(wRun))
      def winSum(c: String) =
        (col(c) - coalesce(lag(col(c), win).over(wPart), lit(0))).cast("double")
      val n = col("__n").cast("double")
      val sx = winSum("__cx")
      val sy = winSum("__cy")
      val sxx = winSum("__cxx")
      val syy = winSum("__cyy")
      val sxy = winSum("__cxy")
      val corr = (n * sxy - sx * sy) /
        (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
      val cov = (sxy - sx * sy / n) / (n - lit(1.0))
      cums
        .withColumn("roll_corr", when(col("__n") >= 4, round(corr, 6)))
        .withColumn("roll_cov", when(col("__n") >= 4, round(cov, 4)))
        .drop("l_shipdate", "l_partkey", "__n", "__cx", "__cxx", "__cy",
          "__cyy", "__cxy")
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // rolling skew/kurt with pandas bias corrections (G1/G2), window=6,
    // minp=5, from exact windowed power sums s1..s4 (same derivation as
    // Aggregates.q_agg_skew; kurt reference
    // `sdc/datatypes/hpat_pandas_series_rolling_functions.py:1013`)
    "q_rolling_skew_kurt" -> ((s, dir) => {
      val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"))
      // Sliding frames make Spark recompute every frame from scratch
      // (SlidingWindowFunctionFrame is O(w) decimal adds per row — four
      // power sums measured 5.5s at sf0.1). The sums are EXACT decimals,
      // so the O(1)-per-row cumulative-difference S_i − S_{i−w} over the
      // running (unbounded-preceding) frame yields bit-identical window
      // sums; the running frame uses Spark's streaming accumulation and
      // lag() is a single buffered-row lookup.
      val wPart = Window.partitionBy(col("l_suppkey")).orderBy(order: _*)
      val wRun = wPart.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val x = col("l_quantity")
      val win = 6
      // NOTE on plan shape (measured at sf0.1, 32 cores): this withColumn
      // chain yields one Window node per running sum plus analyzer-placed
      // lag nodes — 2.5 s. Two "cleaner" consolidations both LOSE:
      // all five window functions in one select (one fat Window node)
      // and a single node computing all four lags each measured ~6 s —
      // stacked single-function passes over the shared sort pipeline
      // better than one node driving several accumulators/offset readers
      // per row. Keep the chain exactly as is.
      // l_quantity is integer-valued (1..50): the four power sums run in
      // exact LONG arithmetic (q⁴ ≤ 6.25e6/row ⇒ overflow needs ~10^12
      // rows per supplier partition), identical to the oracle's decimal
      // sums after the cast to double, at a fraction of the agg cost.
      val xl = x.cast("long")
      val cums = Tables(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), x, col("l_shipdate"))
        .withColumn("__rn", row_number().over(wPart))
        .withColumn("__c1", sum(xl).over(wRun))
        .withColumn("__c2", sum(xl * xl).over(wRun))
        .withColumn("__c3", sum(xl * xl * xl).over(wRun))
        .withColumn("__c4", sum(xl * xl * xl * xl).over(wRun))
      def winSum(c: String) =
        (col(c) - coalesce(lag(col(c), win).over(wPart), lit(0L))).cast("double")
      val n = least(col("__rn"), lit(win)).cast("double")
      val s1 = winSum("__c1")
      val s2 = winSum("__c2")
      val s3 = winSum("__c3")
      val s4 = winSum("__c4")
      val mean = s1 / n
      val m2 = s2 / n - mean * mean
      val m3 = s3 / n - lit(3.0) * mean * (s2 / n) + lit(2.0) * mean * mean * mean
      val m4 = s4 / n - lit(4.0) * mean * (s3 / n) +
        lit(6.0) * mean * mean * (s2 / n) - lit(3.0) * mean * mean * mean * mean
      val g1 = (m3 / (m2 * sqrt(m2))) * sqrt(n * (n - lit(1.0))) / (n - lit(2.0))
      val g2 = ((n + lit(1.0)) * (m4 / (m2 * m2) - lit(3.0)) + lit(6.0)) *
        (n - lit(1.0)) / ((n - lit(2.0)) * (n - lit(3.0)))
      // Zero-variance guard: a window of 6 IDENTICAL quantities has m2
      // exactly 0.0 (the power sums are exact longs, so no cancellation
      // residue), and ANSI-mode Divide throws DIVIDE_BY_ZERO even on
      // doubles. pandas returns NaN for a constant window (NaN ≡ missing
      // here ⇒ NULL). First hit at organic sf10 — 600 Zipf-skewed rows
      // per supplier make a 6-run of equal quantities likely; no smaller
      // fixture produced one. CaseWhen codegen evaluates g1/g2 only when
      // the predicate holds, so the guarded branch never divides by 0.
      val nonDegenerate = n >= 5 && m2 > 0
      cums
        // floor(x·1e6 + 0.5)/1e6 — NOT round(): skew/kurt suffer
        // catastrophic cancellation, and on a half-boundary value Spark's
        // exact-decimal HALF_UP and DuckDB's float-multiply ROUND disagree
        // by one last digit. Explicit floor arithmetic is the identical
        // IEEE op sequence on both engines (oracle mirrors it verbatim).
        // + 0.0 normalizes IEEE −0.0 (a tiny negative skew rounds to −0.0
        // in DuckDB but +0.0 in Spark).
        .withColumn("roll_skew",
          when(nonDegenerate, floor(g1 * lit(1e6) + lit(0.5)) / lit(1e6) + lit(0.0)))
        .withColumn("roll_kurt",
          when(nonDegenerate, floor(g2 * lit(1e6) + lit(0.5)) / lit(1e6) + lit(0.0)))
        .drop("l_shipdate", "l_partkey", "__rn", "__c1", "__c2", "__c3", "__c4")
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // rolling(center=True): the frame straddles the current row —
    // window=5 means 2 before, current, 2 after
    // (`sdc/datatypes/hpat_pandas_rolling_types.py:52-81` center param;
    // same min_periods non-null gate)
    "q_rolling_center" -> ((s, dir) => {
      val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(order: _*)
        .rowsBetween(-2, 2)
      val x = col("l_quantity")
      val xl = x.cast("long")
      val n = count(x).over(w)
      val rmean = sum(xl).over(w).cast("double") / n
      Tables(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), x, col("l_shipdate"))
        .withColumn("roll_cmean", when(n >= 3, rmean))
        .withColumn("roll_cmax", when(n >= 3, max(x).over(w)))
        .drop("l_shipdate", "l_partkey")
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // expanding(min_periods=3): the unbounded-preceding sibling of
    // rolling — Spark's streaming accumulation frame, O(1)/row
    // (parity-plus: pandas surface, absent in the reference)
    "q_expanding" -> ((s, dir) => {
      val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val x = col("l_quantity")
      val xl = x.cast("long")
      val n = count(x).over(w)
      Tables(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), x, col("l_shipdate"))
        .withColumn("exp_sum", when(n >= 3, sum(xl).over(w).cast("double")))
        .withColumn("exp_mean", when(n >= 3, sum(xl).over(w).cast("double") / n))
        .drop("l_shipdate", "l_partkey")
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // rolling('7D', on='l_shipdate'): TIME-based trailing window — a
    // RANGE frame over epoch days (reference constructor's `on` param,
    // `sdc/datatypes/hpat_pandas_rolling_types.py:52-81`). Range frames
    // include ties as peers, so same-day rows see identical frames and
    // the values are engine-order independent by construction.
    "q_rolling_time" -> ((s, dir) => {
      val days = unix_date(col("l_shipdate").cast("date"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(days)
        .rangeBetween(-6, Window.currentRow)
      val xl = col("l_quantity").cast("long")
      val n = count(col("l_quantity")).over(w)
      Tables(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_shipdate"))
        .withColumn("w7_sum", sum(xl).over(w).cast("double"))
        .withColumn("w7_n", n)
        .drop("l_shipdate")
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // rolling(window=5, win_type='triang').mean()
    // (`sdc/datatypes/hpat_pandas_rolling_types.py:52-81` win_type
    // param): a weighted window is Σ w_k·x_{i-k} / Σ w_k — for a FIXED
    // window that is a lag composition, one window pass producing the
    // lags and a plain codegen projection for the weighted sum (no
    // per-row array building). Triangular weights [1,2,3,2,1] are used
    // in integer form (proportional to scipy's [1/3,2/3,1,2/3,1/3] —
    // normalization cancels in the mean), so every product/sum is exact
    // integer-in-double and engine-order independent; min_periods
    // defaults to the window size for weighted windows (lag(4) null ⇒
    // result null, which the when() makes explicit).
    "q_rolling_wintype" -> ((s, dir) => {
      val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(order: _*)
      val x = col("l_quantity")
      def lg(k: Int) = lag(x, k).over(w)
      val wsum = lg(4) * 1 + lg(3) * 2 + lg(2) * 3 + lg(1) * 2 + x * 1
      Tables(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), x, col("l_shipdate"))
        .withColumn("roll_wmean", when(lg(4).isNotNull, wsum / 9.0))
        .drop("l_shipdate", "l_partkey")
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // S.ewm(alpha=0.5).mean() (adjusted=True), truncated to the 20
    // nearest lags — the distributed-exactness choice, stated honestly:
    // α=1/2 makes every weight 2^-j, so each term x·2^-j is an EXACT
    // double (integral l_quantity scaled by a power of two) and the
    // 20-term sum of multiples of 2^-19 under magnitude 100 is exact in
    // ANY association — bit-identical across engines with no rounding.
    // The dropped tail weighs < 2^-19 of the newest term (far below any
    // sensible output precision), and the truncation is what keeps the
    // op a per-row lag composition in one codegen Window pass instead of
    // an order-sensitive running recurrence. Missing leading history
    // renormalizes the denominator — pandas adjusted=True semantics at
    // a partition head.
    "q_ewm" -> ((s, dir) => {
      val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(order: _*)
      val x = col("l_quantity")
      def lg(k: Int) = if (k == 0) x else lag(x, k).over(w)
      val num = (0 until 20).map(j =>
        coalesce(lg(j), lit(0)) * lit(math.pow(0.5, j))).reduceLeft(_ + _)
      val den = (0 until 20).map(j =>
        when(lg(j).isNotNull, lit(math.pow(0.5, j))).otherwise(lit(0.0)))
        .reduceLeft(_ + _)
      Tables(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), x, col("l_shipdate"))
        .withColumn("ewm", num / den)
        .drop("l_shipdate", "l_partkey")
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // rolling(window=5).rank(method='min'): the rank of the current
    // value among the window's 5 — 1 + the count of strictly-smaller
    // window members, i.e. a 4-lag comparison chain in ONE codegen
    // Window pass (no per-row array build/sort). Pure integer
    // comparisons ⇒ engine-identical; min_periods = window (lag(4)
    // null gates the head like the weighted window).
    "q_rolling_rank" -> ((s, dir) => {
      val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(order: _*)
      val x = col("l_quantity")
      def lg(k: Int) = lag(x, k).over(w)
      val rk = lit(1L) + (1 to 4).map(j =>
        when(lg(j) < x, 1L).otherwise(0L)).reduceLeft(_ + _)
      Tables(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), x, col("l_shipdate"))
        .withColumn("roll_rank", when(lg(4).isNotNull, rk))
        .drop("l_shipdate", "l_partkey")
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // S.ewm(alpha=0.5).var(bias=False) / .std() — the ewm second
    // moment, same adjusted-weight 20-lag truncation as q_ewm:
    //   m = Σw·x/Σw,  var_b = Σw·x²/Σw − m²,
    //   var = var_b · (Σw)² / ((Σw)² − Σw²)   (bias correction)
    // With α=1/2 every w=2⁻ʲ and w²=4⁻ʲ, so Σw, Σw², Σw·x and Σw·x²
    // are all EXACT doubles in any association (x ≤ 50, x² ≤ 2500,
    // granularity 2⁻³⁸ — well inside 53 bits); the remaining ops are
    // one correctly-rounded division/multiply chain mirrored verbatim
    // by the oracle, so the compare is bit-exact with no rounding.
    // The (Σw)² > Σw² gate is the n ≥ 2 condition — it nulls the
    // partition head exactly where pandas emits NaN and keeps the
    // division away from zero on both engines. var_b ≥ 0 exactly when
    // the window is constant (all sums collapse to exact powers), so
    // sqrt never sees a negative.
    "q_ewm_var" -> ((s, dir) => {
      val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(order: _*)
      val x = col("l_quantity")
      def lg(k: Int) = if (k == 0) x else lag(x, k).over(w)
      val num = (0 until 20).map(j =>
        coalesce(lg(j), lit(0)) * lit(math.pow(0.5, j))).reduceLeft(_ + _)
      val s2 = (0 until 20).map(j =>
        coalesce(lg(j) * lg(j), lit(0)) * lit(math.pow(0.5, j)))
        .reduceLeft(_ + _)
      val den = (0 until 20).map(j =>
        when(lg(j).isNotNull, lit(math.pow(0.5, j))).otherwise(lit(0.0)))
        .reduceLeft(_ + _)
      val den2 = (0 until 20).map(j =>
        when(lg(j).isNotNull, lit(math.pow(0.25, j))).otherwise(lit(0.0)))
        .reduceLeft(_ + _)
      val m = num / den
      val vb = s2 / den - m * m
      val v = when(den * den > den2,
        vb * (den * den) / (den * den - den2))
      Tables(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), x, col("l_shipdate"))
        .withColumn("ewm_var", v)
        .withColumn("ewm_std", sqrt(v))
        .drop("l_shipdate", "l_partkey")
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // rolling('7D', closed=...) (`hpat_pandas_rolling_types.py:52-81`
    // closed param): offset windows with each endpoint open or closed.
    // On the integer day grid the four pandas frames map exactly onto
    // inclusive RANGE bounds: right (t-7D,t] = [-6,0] (q_rolling_time),
    // left [t-7D,t) = [-7,-1], both [t-7D,t] = [-7,0], neither
    // (t-7D,t) = [-6,-1]. min_periods defaults to 1 for offset windows;
    // an empty left/neither frame yields null (sum over zero rows) on
    // both engines.
    "q_rolling_closed" -> ((s, dir) => {
      val days = unix_date(col("l_shipdate").cast("date"))
      def w(lo: Int, hi: Int) = Window.partitionBy(col("l_suppkey"))
        .orderBy(days).rangeBetween(lo, hi)
      val xl = col("l_quantity").cast("long")
      Tables(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_shipdate"))
        .withColumn("wl_sum", sum(xl).over(w(-7, -1)).cast("double"))
        .withColumn("wl_n", count(xl).over(w(-7, -1)))
        .withColumn("wb_n", count(xl).over(w(-7, 0)))
        .withColumn("wn_n", count(xl).over(w(-6, -1)))
        .drop("l_shipdate")
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // rolling.apply(func): arbitrary lambda folded over the ordered frame
    // — `collect_list` preserves frame order, `aggregate` runs the JVM
    // lambda; here func = sum of squared deviations from the frame's
    // first element (not expressible as a stock rolling method)
    "q_rolling_apply" -> ((s, dir) => {
      val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(order: _*)
        .rowsBetween(-3, Window.currentRow)
      Tables(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity"), col("l_shipdate"))
        .withColumn("frame", collect_list(col("l_quantity")).over(w))
        .withColumn("roll_apply", when(size(col("frame")) >= 4,
          round(expr(
            "aggregate(frame, 0D, (acc, v) -> acc + (v - frame[0]) * (v - frame[0]))"),
            6)))
        .drop("l_shipdate", "l_partkey", "frame")
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // per-key lead/lag (pandas shift ±1 within groupby): inter-shipment
    // gap and the next line's quantity per supplier. One suppkey
    // shuffle + in-partition sort; no global window, no funnel.
    "q_lead_lag" -> ((s, dir) => {
      // (l_orderkey, l_linenumber) is NOT unique in the fixture at
      // sf0.1 — l_partkey completes the total order (a tied order key
      // would let the two engines pick different lead/lag neighbors)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"))
      Tables(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_shipdate"), col("l_quantity"))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          datediff(col("l_shipdate"), lag(col("l_shipdate"), 1).over(w))
            .as("gap_days"),
          lead(col("l_quantity"), 1).over(w).as("next_qty"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // first_value / last_value / nth_value over the full per-key frame
    // (pandas groupby().first()/last()/nth(1) on an explicit order) —
    // one row per key via the rank filter, so the window pass and the
    // reduction ride a single supplier shuffle. Same completed total
    // order as q_lead_lag (tied ship dates would let engines pick
    // different first/last rows).
    "q_window_firstlast" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"))
      val wf = w.rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .unboundedFollowing)
      Tables(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_shipdate"), col("l_quantity"))
        .withColumn("__rn", row_number().over(w))
        .withColumn("first_qty", first(col("l_quantity")).over(wf))
        .withColumn("last_qty", last(col("l_quantity")).over(wf))
        .withColumn("second_qty", nth_value(col("l_quantity"), 2).over(wf))
        .filter(col("__rn") === 1)
        .select(col("l_suppkey"), col("first_qty"), col("last_qty"),
          col("second_qty"))
        .orderBy(col("l_suppkey"))
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
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "q_rolling_var_std" ->
      """WITH t AS (SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  CAST(COUNT(l_quantity) OVER w AS DOUBLE) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) OVER w AS DOUBLE) AS s1,
        |  CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(34,4))) OVER w AS DOUBLE) AS s2
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
        |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))
        |SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  CASE WHEN n >= 4 THEN (s2 - s1*s1/n) / (n - 1.0) END AS roll_var,
        |  CASE WHEN n >= 4 THEN SQRT((s2 - s1*s1/n) / (n - 1.0)) END AS roll_std
        |FROM t ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "q_rolling_median_quantile" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  CASE WHEN COUNT(l_quantity) OVER w >= 3
        |    THEN ROUND(quantile_cont(l_quantity, 0.5) OVER w, 6) END AS roll_median,
        |  CASE WHEN COUNT(l_quantity) OVER w >= 3
        |    THEN ROUND(quantile_cont(l_quantity, 0.25) OVER w, 6) END AS roll_q25
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "q_rolling_corr_cov" ->
      """WITH t AS (SELECT l_suppkey, l_orderkey, l_linenumber,
        |  l_quantity, l_extendedprice,
        |  CAST(COUNT(l_quantity*l_extendedprice) OVER w AS DOUBLE) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) OVER w AS DOUBLE) AS sx,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) OVER w AS DOUBLE) AS sy,
        |  CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(34,4))) OVER w AS DOUBLE) AS sxx,
        |  CAST(SUM(CAST(l_extendedprice*l_extendedprice AS DECIMAL(38,4))) OVER w AS DOUBLE) AS syy,
        |  CAST(SUM(CAST(l_quantity*l_extendedprice AS DECIMAL(38,4))) OVER w AS DOUBLE) AS sxy
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
        |  ROWS BETWEEN 5 PRECEDING AND CURRENT ROW))
        |SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |  CASE WHEN n >= 4 THEN ROUND((n*sxy - sx*sy) /
        |    (SQRT(n*sxx - sx*sx) * SQRT(n*syy - sy*sy)), 6) END AS roll_corr,
        |  CASE WHEN n >= 4 THEN ROUND((sxy - sx*sy/n) / (n - 1.0), 4) END AS roll_cov
        |FROM t ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "q_rolling_skew_kurt" ->
      """WITH t AS (SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  CAST(COUNT(l_quantity) OVER w AS DOUBLE) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) OVER w AS DOUBLE) AS s1,
        |  CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(34,4))) OVER w AS DOUBLE) AS s2,
        |  CAST(SUM(CAST(l_quantity*l_quantity*l_quantity AS DECIMAL(38,6))) OVER w AS DOUBLE) AS s3,
        |  CAST(SUM(CAST(l_quantity*l_quantity*l_quantity*l_quantity AS DECIMAL(38,8))) OVER w AS DOUBLE) AS s4
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
        |  ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)),
        |m AS (SELECT *, s1/n AS mean,
        |  s2/n - (s1/n)*(s1/n) AS m2,
        |  s3/n - 3.0*(s1/n)*(s2/n) + 2.0*(s1/n)*(s1/n)*(s1/n) AS m3,
        |  s4/n - 4.0*(s1/n)*(s3/n) + 6.0*(s1/n)*(s1/n)*(s2/n)
        |    - 3.0*(s1/n)*(s1/n)*(s1/n)*(s1/n) AS m4
        |FROM t)
        |SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  CASE WHEN n >= 5 AND m2 > 0 THEN FLOOR(
        |    (m3 / (m2 * SQRT(m2))) * SQRT(n*(n - 1.0)) / (n - 2.0)
        |      * 1e6 + 0.5) / 1e6 + 0.0
        |  END AS roll_skew,
        |  CASE WHEN n >= 5 AND m2 > 0 THEN FLOOR(
        |    ((n + 1.0) * (m4/(m2*m2) - 3.0) + 6.0)
        |      * (n - 1.0) / ((n - 2.0) * (n - 3.0)) * 1e6 + 0.5) / 1e6 + 0.0
        |  END AS roll_kurt
        |FROM m ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "q_rolling_center" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  CASE WHEN COUNT(l_quantity) OVER w >= 3
        |    THEN CAST(SUM(CAST(l_quantity AS BIGINT)) OVER w AS DOUBLE)
        |         / COUNT(l_quantity) OVER w
        |  END AS roll_cmean,
        |  CASE WHEN COUNT(l_quantity) OVER w >= 3
        |    THEN MAX(l_quantity) OVER w END AS roll_cmax
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
        |  ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "q_rolling_time" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) OVER w AS DOUBLE) AS w7_sum,
        |  COUNT(l_quantity) OVER w AS w7_n
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
        |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    // same left-assoc literal-order weighted sum as the Spark side —
    // all terms are integers in double, so the fold is exact
    "q_rolling_wintype" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  CASE WHEN LAG(l_quantity, 4) OVER w IS NOT NULL THEN
        |    (LAG(l_quantity, 4) OVER w * 1 + LAG(l_quantity, 3) OVER w * 2
        |     + LAG(l_quantity, 2) OVER w * 3 + LAG(l_quantity, 1) OVER w * 2
        |     + l_quantity * 1) / 9.0
        |  END AS roll_wmean
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    // ewm replica — the same 20-lag chain, left-associated like the
    // Spark reduceLeft; exact by the powers-of-two argument above, so
    // association is belt-and-braces
    "q_ewm" -> {
      val num = (0 until 20).map(j =>
        if (j == 0) "l_quantity * POWER(0.5, 0)"
        else s"COALESCE(LAG(l_quantity, $j) OVER w, 0) * POWER(0.5, $j)")
        .mkString(" + ")
      val den = (0 until 20).map(j =>
        if (j == 0) "POWER(0.5, 0)"
        else s"CASE WHEN LAG(l_quantity, $j) OVER w IS NOT NULL " +
          s"THEN POWER(0.5, $j) ELSE 0.0 END")
        .mkString(" + ")
      s"""SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
         |  ($num) / ($den) AS ewm
         |FROM lineitem
         |WINDOW w AS (PARTITION BY l_suppkey
         |  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey)
         |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin
    },

    "q_rolling_rank" -> {
      val cmp = (1 to 4).map(j =>
        s"CASE WHEN LAG(l_quantity, $j) OVER w < l_quantity " +
          "THEN 1 ELSE 0 END").mkString(" + ")
      s"""SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
         |  CASE WHEN LAG(l_quantity, 4) OVER w IS NOT NULL
         |    THEN CAST(1 + $cmp AS BIGINT) END AS roll_rank
         |FROM lineitem
         |WINDOW w AS (PARTITION BY l_suppkey
         |  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey)
         |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin
    },

    // ewm var/std replica — the identical left-associated 20-lag
    // chains and the identical division/multiply sequence as the Spark
    // side; exact by the powers-of-two argument, so no rounding
    "q_ewm_var" -> {
      def t(j: Int) =
        if (j == 0) "l_quantity" else s"LAG(l_quantity, $j) OVER w"
      val num = (0 until 20).map(j =>
        if (j == 0) "l_quantity * POWER(0.5, 0)"
        else s"COALESCE(${t(j)}, 0) * POWER(0.5, $j)").mkString(" + ")
      val s2 = (0 until 20).map(j =>
        if (j == 0) "(l_quantity * l_quantity) * POWER(0.5, 0)"
        else s"COALESCE(${t(j)} * ${t(j)}, 0) * POWER(0.5, $j)")
        .mkString(" + ")
      val den = (0 until 20).map(j =>
        if (j == 0) "POWER(0.5, 0)"
        else s"CASE WHEN ${t(j)} IS NOT NULL " +
          s"THEN POWER(0.5, $j) ELSE 0.0 END").mkString(" + ")
      val den2 = (0 until 20).map(j =>
        if (j == 0) "POWER(0.25, 0)"
        else s"CASE WHEN ${t(j)} IS NOT NULL " +
          s"THEN POWER(0.25, $j) ELSE 0.0 END").mkString(" + ")
      val m = s"(($num) / ($den))"
      val vb = s"(($s2) / ($den) - $m * $m)"
      val v = s"CASE WHEN ($den) * ($den) > ($den2) " +
        s"THEN ($vb * (($den) * ($den))) / (($den) * ($den) - ($den2)) END"
      s"""SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
         |  $v AS ewm_var,
         |  SQRT($v) AS ewm_std
         |FROM lineitem
         |WINDOW w AS (PARTITION BY l_suppkey
         |  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey)
         |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin
    },

    "q_rolling_closed" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) OVER wl AS DOUBLE) AS wl_sum,
        |  COUNT(l_quantity) OVER wl AS wl_n,
        |  COUNT(l_quantity) OVER wb AS wb_n,
        |  COUNT(l_quantity) OVER wn AS wn_n
        |FROM lineitem
        |WINDOW
        |  wl AS (PARTITION BY l_suppkey
        |    ORDER BY date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
        |    RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING),
        |  wb AS (PARTITION BY l_suppkey
        |    ORDER BY date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
        |    RANGE BETWEEN 7 PRECEDING AND CURRENT ROW),
        |  wn AS (PARTITION BY l_suppkey
        |    ORDER BY date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
        |    RANGE BETWEEN 6 PRECEDING AND 1 PRECEDING)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "q_expanding" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  CASE WHEN COUNT(l_quantity) OVER w >= 3
        |    THEN CAST(SUM(CAST(l_quantity AS BIGINT)) OVER w AS DOUBLE)
        |  END AS exp_sum,
        |  CASE WHEN COUNT(l_quantity) OVER w >= 3
        |    THEN CAST(SUM(CAST(l_quantity AS BIGINT)) OVER w AS DOUBLE)
        |         / COUNT(l_quantity) OVER w
        |  END AS exp_mean
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "q_rolling_apply" ->
      """WITH t AS (SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  list(l_quantity) OVER w AS frame
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
        |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))
        |SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  CASE WHEN len(frame) >= 4 THEN ROUND(
        |    list_sum(list_transform(frame,
        |      v -> (v - frame[1]) * (v - frame[1]))), 6)
        |  END AS roll_apply
        |FROM t ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "q_lead_lag" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(datediff('day',
        |    CAST(lag(l_shipdate, 1) OVER w AS DATE),
        |    CAST(l_shipdate AS DATE)) AS INT) AS gap_days,
        |  lead(l_quantity, 1) OVER w AS next_qty
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "q_window_firstlast" ->
      """WITH t AS (SELECT l_suppkey,
        |  row_number() OVER w AS rn,
        |  first_value(l_quantity) OVER wf AS first_qty,
        |  last_value(l_quantity) OVER wf AS last_qty,
        |  nth_value(l_quantity, 2) OVER wf AS second_qty
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey),
        |wf AS (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT l_suppkey, first_qty, last_qty, second_qty
        |FROM t WHERE rn = 1 ORDER BY l_suppkey""".stripMargin
  )
}
