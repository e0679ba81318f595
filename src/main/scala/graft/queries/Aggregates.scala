package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions._

/** SURVEY §2.4 full-column reductions.
  *
  * Reference surface: Series `sum/prod/min/max/mean/median/std/var/count/
  * skew/quantile/idxmax/idxmin/nunique/unique/value_counts/describe/corr/
  * cov` (`sdc/datatypes/hpat_pandas_series_functions.py`, NaN-skipping
  * kernels `sdc/functions/numpy_like.py`, moments
  * `sdc/functions/statistics.py:31-44`).
  *
  * Numeric policy: aggregates over fixed-decimal data are computed with
  * exact decimal power sums and then combined with IEEE-deterministic
  * scalar arithmetic, so results are bit-identical regardless of
  * partition count — both for the DuckDB oracle and for cluster
  * reproducibility. All sums stay single-pass, map-side-combined hash
  * aggregates (partial + final) — the same plan shape at any scale.
  */
object Aggregates {

  // Composite positional index for idxmax/idxmin on lineitem:
  // l_linenumber is 1..7, so this is a dense unique per-row label.
  private def liIdx = col("l_orderkey") * 10 + col("l_linenumber")

  val queries: Map[String, Q] = Map(
    // pd.cut with fixed bins (histogramming): integer bin index from
    // fixed-width bounds — a pure projection feeding a hash agg, the
    // canonical data-profiling scan shape
    // 2D histogram (the heatmap feed: np.histogram2d / pd.cut × cut):
    // quantity deciles × 2-point discount bands in ONE hash aggregate.
    // The discount bin goes through an exact decimal-to-cents integer
    // (0.07·100 as a double is 7.000000000000001 — the decimal cast
    // sidesteps the classic float-binning bug on both engines).
    "q_histogram_2d" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .select(floor((col("l_quantity") - 1) / 10).cast("long").as("qty_bin"),
          (col("l_discount").cast(DecimalType(12, 2)) * 100).cast("long")
            .as("__d100"),
          col("l_extendedprice"))
        .withColumn("disc_bin", expr("__d100 div 2"))
        .groupBy(col("qty_bin"), col("disc_bin"))
        .agg(count(lit(1)).as("n"),
          dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("qty_bin"), col("disc_bin"))
    }),

    "q_histogram" -> ((s, dir) => {
      val width = 60000.0
      val bin = floor(col("o_totalprice") / width).cast("int")
      Tables(s, dir, "orders")
        .groupBy(bin.as("bin"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy(col("bin"))
    }),

    // sum / min / max / mean / count in one reduction pass
    "q_agg_basic" -> ((s, dir) => {
      Tables(s, dir, "lineitem").agg(
        dsum(col("l_quantity")).as("sum_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        (dsum(col("l_extendedprice")) / count(col("l_extendedprice")))
          .as("mean_price"),
        count(col("l_quantity")).as("cnt"),
        count(lit(1)).as("n_rows"))
    }),

    // prod: product of small integers is exact in double (associative here)
    "q_agg_prod" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(product(col("l_linenumber").cast("double")).as("line_prod"))
        .orderBy(col("l_orderkey"))
    }),

    // var / std (sample, ddof=1 — pandas default) from exact power sums
    "q_agg_var_std" -> ((s, dir) => {
      Tables(s, dir, "lineitem").agg(
        dvarSamp(col("l_quantity")).as("var_qty"),
        dstdSamp(col("l_quantity")).as("std_qty"))
    }),

    // median + quantile (exact, interpolated — pandas default), via the
    // sort-based distributed path (GlobalOrder.exactQuantiles): Spark's
    // `percentile` aggregate hashmaps every distinct value (4.8 s on the
    // near-unique price column at sf0.1; the map must also fit one
    // reducer), the rank pick is ~1.5 s and never exceeds a partition
    "q_agg_quantile" -> ((s, dir) => {
      graft.operators.GlobalOrder.exactQuantiles(
          Tables(s, dir, "lineitem"), col("l_extendedprice"),
          Seq(("median_price", 0.5), ("q25_price", 0.25), ("q75_price", 0.75)))
        .select(round(col("median_price"), 6).as("median_price"),
          round(col("q25_price"), 6).as("q25_price"),
          round(col("q75_price"), 6).as("q75_price"))
    }),

    // skew: pandas bias-corrected G1, from exact decimal power sums
    "q_agg_skew" -> ((s, dir) => {
      val x = col("l_quantity")
      Tables(s, dir, "lineitem")
        .agg(
          count(x).cast("double").as("n"),
          dsum(x).as("s1"),
          sum((x * x).cast(DecimalType(34, 4))).cast("double").as("s2"),
          sum((x * x * x).cast(DecimalType(38, 6))).cast("double").as("s3"))
        .select(
          expr("s1/n").as("mean"), col("n"), col("s1"), col("s2"), col("s3"))
        .select(
          expr("""round(
            ((s3/n - 3*mean*(s2/n) + 2*mean*mean*mean)
             / ((s2/n - mean*mean) * sqrt(s2/n - mean*mean)))
            * sqrt(n*(n-1)) / (n-2), 6)""").as("skew_qty"))
    }),

    // idxmax / idxmin with pandas first-occurrence tie-break
    "q_idxmax" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val mx = li.agg(max(col("l_quantity")).as("mx"),
        min(col("l_quantity")).as("mn"))
      val imax = li.join(mx).filter(col("l_quantity") === col("mx"))
        .agg(min(liIdx).as("idx")).withColumn("which", lit("idxmax"))
      val imin = li.join(mx).filter(col("l_quantity") === col("mn"))
        .agg(min(liIdx).as("idx")).withColumn("which", lit("idxmin"))
      imax.unionByName(imin).select(col("which"), col("idx"))
        .orderBy(col("which"))
    }),

    // nunique / approx variant sanity (exact only in the oracle check)
    "q_nunique" -> ((s, dir) => {
      Tables(s, dir, "lineitem").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_returnflag")).as("n_flags"))
    }),

    // unique: distinct values, sorted
    "q_unique" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .select(col("o_orderpriority")).distinct()
        .orderBy(col("o_orderpriority"))
    }),

    // value_counts(sort=True): count desc, then value asc for determinism
    "q_value_counts" -> ((s, dir) => {
      Tables(s, dir, "customer")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("c_mktsegment"))
    }),

    // value_counts(normalize=True, ascending=True) — the remaining
    // params of the reference's matrix (`hpat_pandas_series_functions
    // .py:1376`; bins=N is q_histogram's machinery). freq = cnt/total:
    // one IEEE divide of exact counts, computed over the 5-row
    // AGGREGATED frame (the unpartitioned window touches 5 rows, never
    // the table).
    "q_value_counts_norm" -> ((s, dir) => {
      Tables(s, dir, "customer")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("cnt"))
        .withColumn("freq",
          col("cnt").cast("double") /
            sum(col("cnt")).over(org.apache.spark.sql.expressions.Window
              .partitionBy()))
        .orderBy(col("cnt").asc, col("c_mktsegment"))
        .select(col("c_mktsegment"), col("freq"))
    }),

    // value_counts on a FLOAT column with pandas' two float quirks
    // (`hpat_pandas_series_functions.py:1505-1516`, SURVEY §7 hard part):
    // NaN is DROPPED (dropna=True default), and +0.0/-0.0 count as ONE
    // bucket. NaN / -0.0 / +0.0 are injected deterministically from
    // event_id so both quirks are actually exercised. Spark's group-key
    // normalization (NormalizeFloatingNumbers) merges ±0 to +0.0 —
    // exactly pandas' float-equality bucketing; the oracle normalizes
    // explicitly with `v + 0.0`. Remaining buckets come from
    // `round(value) % 4` — fmod keeps the dividend's sign in both
    // engines, so negative values form their own (matching) buckets.
    "q_value_counts_float" -> ((s, dir) => {
      val m = pmod(col("event_id"), lit(10))
      val v = when(m === 0, lit(Double.NaN))
        .when(m === 1, lit(-0.0))
        .when(m === 2, lit(0.0))
        .otherwise(round(col("value"), 0) % 4)
      Tables(s, dir, "events")
        .select(v.as("v"))
        // isNotNull too: IsNaN(null) is false in Spark, so a bare
        // !isnan would KEEP a null row (pandas drops missing whether
        // it arrives as NaN or as null; the oracle's WHERE NOT isnan
        // also drops nulls via SQL null semantics)
        .filter(col("v").isNotNull && !isnan(col("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("v"))
    }),

    // describe(): count/mean/std/min/25%/50%/75%/max as named columns
    "q_describe" -> ((s, dir) => {
      val x = col("c_acctbal")
      Tables(s, dir, "customer").agg(
        count(x).as("cnt"),
        (dsum(x) / count(x)).as("mean_v"),
        dstdSamp(x).as("std_v"),
        min(x).as("min_v"),
        round(expr("percentile(c_acctbal, 0.25)"), 6).as("p25"),
        round(expr("percentile(c_acctbal, 0.5)"), 6).as("p50"),
        round(expr("percentile(c_acctbal, 0.75)"), 6).as("p75"),
        max(x).as("max_v"))
    }),

    // describe(percentiles=[...]) (`hpat_pandas_series_functions
    // .py:4351-4487`): caller-chosen percentile list, routed through the
    // sort-based exact quantile path (GlobalOrder.exactQuantiles) — the
    // same scale-safe machinery as q_agg_quantile, just parameterized.
    // The moment columns ride ONE exact-decimal hash aggregate; the
    // 1-row percentile frame joins in by cross product.
    "q_describe_percentiles" -> ((s, dir) => {
      val x = col("c_acctbal")
      val base = Tables(s, dir, "customer")
      val pcts = Seq(("p10", 0.1), ("p30", 0.3), ("p60", 0.6), ("p90", 0.9))
      val pct = graft.operators.GlobalOrder.exactQuantiles(base, x, pcts)
        .select(pcts.map { case (n, _) => round(col(n), 6).as(n) }: _*)
      base.agg(
          count(x).as("cnt"),
          (dsum(x) / count(x)).as("mean_v"),
          dstdSamp(x).as("std_v"),
          min(x).as("min_v"),
          max(x).as("max_v"))
        .crossJoin(pct)
    }),

    // describe() string flavor (`hpat_pandas_series_functions.py:4351`,
    // object dtype branch): count / unique / top / freq; pandas breaks
    // top ties arbitrarily — here deterministically by value asc
    "q_describe_str" -> ((s, dir) => {
      val d = Tables(s, dir, "orders").select(col("o_orderpriority").as("x"))
      val top = d.groupBy(col("x")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("x")).limit(1)
        .select(col("x").as("top"), col("n").as("freq"))
      d.agg(count(col("x")).as("cnt"),
          countDistinct(col("x")).as("uniq"))
        .crossJoin(top)
    }),

    // corr / cov between two series, from exact cross sums
    "q_corr_cov" -> ((s, dir) => {
      val x = col("l_quantity")
      val y = col("l_extendedprice")
      Tables(s, dir, "lineitem")
        .agg(
          count(lit(1)).cast("double").as("n"),
          dsum(x).as("sx"),
          dsum(y).as("sy"),
          sum((x * x).cast(DecimalType(34, 4))).cast("double").as("sxx"),
          sum((y * y).cast(DecimalType(38, 4))).cast("double").as("syy"),
          sum((x * y).cast(DecimalType(38, 4))).cast("double").as("sxy"))
        .select(
          expr("""round((n*sxy - sx*sy) /
            (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)), 6)""").as("corr_qp"),
          expr("round((sxy - sx*sy/n) / (n-1), 4)").as("cov_qp"))
    }),

    // df.corr() — the PAIRWISE correlation matrix over k numeric
    // columns, as one aggregate pass: all k power sums and k·(k−1)/2
    // cross sums ride a single scan with map-side partials (exact
    // decimals, the q_corr_cov recipe), then each pair's corr is a
    // deterministic double expression over the broadcast 1-row frame,
    // unpivoted in-row to tidy (var_a, var_b, corr) rows. At 100 TB
    // this is ONE shuffle of a single short row regardless of k.
    "q_corr_matrix" -> ((s, dir) => {
      val cols = Seq(
        "q" -> col("l_quantity"), "e" -> col("l_extendedprice"),
        "d" -> col("l_discount"))
      val names = Map("q" -> "l_quantity", "e" -> "l_extendedprice",
        "d" -> "l_discount")
      val sums = cols.map { case (k, c) => dsum(c).as(s"s_$k") } ++
        (for ((ka, a) <- cols; (kb, b) <- cols if ka <= kb)
          yield sum((a * b).cast(DecimalType(38, 4))).cast("double")
            .as(s"s_$ka$kb"))
      // fanOut (r15): 9 exact-decimal sums are per-row BigDecimal work,
      // and a small-SF lineitem arrives as ONE scan split — measured
      // 2.7 s single-core at sf0.1. The round-robin fan-out only fires
      // when splits < cores (no-op at scale); decimal sums are exact
      // and order-free, so the result is bit-identical.
      val agged = graft.operators.Parallelism.fanOut(
          Tables(s, dir, "lineitem")
            .select(cols.map { case (_, c) => c }: _*))
        .agg(count(lit(1)).cast("double").as("n"), sums: _*)
      def corr(ka: String, kb: String) = {
        val (sa, sb) = (col(s"s_$ka"), col(s"s_$kb"))
        val (saa, sbb) = (col(s"s_$ka$ka"), col(s"s_$kb$kb"))
        val sab = col(s"s_$ka$kb")
        round((col("n") * sab - sa * sb) /
          (sqrt(col("n") * saa - sa * sa) * sqrt(col("n") * sbb - sb * sb)), 6)
      }
      agged.select(explode(array(
          (for ((ka, _) <- cols; (kb, _) <- cols if ka < kb) yield
            struct(lit(names(ka)).as("var_a"), lit(names(kb)).as("var_b"),
              corr(ka, kb).as("corr"))): _*)).as("s"))
        .select(col("s.var_a"), col("s.var_b"), col("s.corr"))
        .orderBy(col("var_a"), col("var_b"))
    }),

    // Simple least-squares regression (l_quantity → l_extendedprice) in
    // closed form over the same exact decimal power sums as q_corr_cov:
    // one aggregation pass, slope/intercept/r² as pure double arithmetic
    // on identical operands in both engines (r² is the squared-corr
    // PRODUCT — not pow(), which has no cross-engine rounding
    // guarantee). The reference ships this as the distributed-ML shape
    // (`sdc/tests/test_ml.py:90-108` linear regression; its MPI-era
    // kernels are skipped tests, the capability is the point). At 100 TB
    // this is the canonical map-side-combine aggregate: 6 partials per
    // partition, one tiny final reduce.
    "q_linreg" -> ((s, dir) => {
      val x = col("l_quantity")
      val y = col("l_extendedprice")
      Tables(s, dir, "lineitem")
        .agg(
          count(lit(1)).cast("double").as("n"),
          dsum(x).as("sx"),
          dsum(y).as("sy"),
          sum((x * x).cast(DecimalType(34, 4))).cast("double").as("sxx"),
          sum((y * y).cast(DecimalType(38, 4))).cast("double").as("syy"),
          sum((x * y).cast(DecimalType(38, 4))).cast("double").as("sxy"))
        .select(
          expr("round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6)").as("slope"),
          expr("""round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n,
            4)""").as("intercept"),
          expr("""round(((n*sxy - sx*sy) * (n*sxy - sx*sy)) /
            ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6)""").as("r2"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_histogram_2d" ->
      """SELECT CAST(FLOOR((l_quantity - 1) / 10) AS BIGINT) AS qty_bin,
        |  CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) // 2
        |    AS disc_bin,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE)
        |    AS sum_price
        |FROM lineitem GROUP BY 1, 2 ORDER BY qty_bin, disc_bin""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(FLOOR(o_totalprice / 60000.0) AS INT) AS bin,
        |  COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |FROM orders GROUP BY bin ORDER BY bin""".stripMargin,

    "q_agg_basic" ->
      """SELECT
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
        |  MIN(l_quantity) AS min_qty,
        |  MAX(l_quantity) AS max_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE)
        |    / COUNT(l_extendedprice) AS mean_price,
        |  COUNT(l_quantity) AS cnt,
        |  COUNT(*) AS n_rows
        |FROM lineitem""".stripMargin,

    "q_agg_prod" ->
      """SELECT l_orderkey,
        |  PRODUCT(CAST(l_linenumber AS DOUBLE)) AS line_prod
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "q_agg_var_std" ->
      """WITH s AS (SELECT
        |    COUNT(l_quantity) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(34,4))) AS DOUBLE) AS s2
        |  FROM lineitem)
        |SELECT (s2 - s1*s1/n) / (n - 1.0) AS var_qty,
        |       SQRT((s2 - s1*s1/n) / (n - 1.0)) AS std_qty FROM s""".stripMargin,

    "q_agg_quantile" ->
      """SELECT
        |  ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS median_price,
        |  ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS q25_price,
        |  ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS q75_price
        |FROM lineitem""".stripMargin,

    "q_agg_skew" ->
      """WITH s AS (SELECT
        |    CAST(COUNT(l_quantity) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(34,4))) AS DOUBLE) AS s2,
        |    CAST(SUM(CAST(l_quantity*l_quantity*l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s3
        |  FROM lineitem),
        |m AS (SELECT n, s1, s2, s3, s1/n AS mean FROM s)
        |SELECT ROUND(
        |  ((s3/n - 3*mean*(s2/n) + 2*mean*mean*mean)
        |   / ((s2/n - mean*mean) * SQRT(s2/n - mean*mean)))
        |  * SQRT(n*(n-1)) / (n-2), 6) AS skew_qty FROM m""".stripMargin,

    "q_idxmax" ->
      """WITH mx AS (SELECT MAX(l_quantity) AS mx, MIN(l_quantity) AS mn FROM lineitem)
        |SELECT 'idxmax' AS which,
        |  MIN(l_orderkey*10 + l_linenumber) AS idx
        |FROM lineitem, mx WHERE l_quantity = mx
        |UNION ALL
        |SELECT 'idxmin' AS which,
        |  MIN(l_orderkey*10 + l_linenumber) AS idx
        |FROM lineitem, mx WHERE l_quantity = mn
        |ORDER BY which""".stripMargin,

    "q_nunique" ->
      """SELECT COUNT(DISTINCT l_partkey) AS n_parts,
        |       COUNT(DISTINCT l_returnflag) AS n_flags
        |FROM lineitem""".stripMargin,

    "q_unique" ->
      """SELECT DISTINCT o_orderpriority FROM orders
        |ORDER BY o_orderpriority""".stripMargin,

    "q_value_counts" ->
      """SELECT c_mktsegment, COUNT(*) AS cnt FROM customer
        |GROUP BY c_mktsegment ORDER BY cnt DESC, c_mktsegment""".stripMargin,

    "q_value_counts_norm" ->
      """SELECT c_mktsegment,
        |  CAST(cnt AS DOUBLE) / SUM(cnt) OVER () AS freq
        |FROM (SELECT c_mktsegment, COUNT(*) AS cnt FROM customer
        |      GROUP BY c_mktsegment) t
        |ORDER BY cnt ASC, c_mktsegment""".stripMargin,

    // `v0 + 0.0` collapses -0.0 into +0.0 (IEEE: -0.0 + 0.0 = +0.0) so
    // DuckDB's grouping agrees with Spark's normalized float keys.
    "q_value_counts_float" ->
      """WITH s AS (SELECT CASE
        |    WHEN event_id % 10 = 0 THEN CAST('NaN' AS DOUBLE)
        |    WHEN event_id % 10 = 1 THEN -0.0
        |    WHEN event_id % 10 = 2 THEN 0.0
        |    ELSE ROUND(value, 0) % 4 END AS v0
        |  FROM events),
        |n AS (SELECT v0 + 0.0 AS v FROM s WHERE NOT isnan(v0))
        |SELECT v, COUNT(*) AS cnt FROM n
        |GROUP BY v ORDER BY cnt DESC, v""".stripMargin,

    "q_describe_percentiles" ->
      """SELECT
        |  COUNT(c_acctbal) AS cnt,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE)
        |    / COUNT(c_acctbal) AS mean_v,
        |  SQRT((CAST(SUM(CAST(c_acctbal*c_acctbal AS DECIMAL(34,4))) AS DOUBLE)
        |    - CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE)
        |      * CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE)
        |      / COUNT(c_acctbal))
        |    / (COUNT(c_acctbal) - 1.0)) AS std_v,
        |  MIN(c_acctbal) AS min_v,
        |  MAX(c_acctbal) AS max_v,
        |  ROUND(quantile_cont(c_acctbal, 0.1), 6) AS p10,
        |  ROUND(quantile_cont(c_acctbal, 0.3), 6) AS p30,
        |  ROUND(quantile_cont(c_acctbal, 0.6), 6) AS p60,
        |  ROUND(quantile_cont(c_acctbal, 0.9), 6) AS p90
        |FROM customer""".stripMargin,

    "q_describe" ->
      """SELECT
        |  COUNT(c_acctbal) AS cnt,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE)
        |    / COUNT(c_acctbal) AS mean_v,
        |  SQRT((CAST(SUM(CAST(c_acctbal*c_acctbal AS DECIMAL(34,4))) AS DOUBLE)
        |    - CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE)
        |      * CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE)
        |      / COUNT(c_acctbal))
        |    / (COUNT(c_acctbal) - 1.0)) AS std_v,
        |  MIN(c_acctbal) AS min_v,
        |  ROUND(quantile_cont(c_acctbal, 0.25), 6) AS p25,
        |  ROUND(quantile_cont(c_acctbal, 0.5), 6) AS p50,
        |  ROUND(quantile_cont(c_acctbal, 0.75), 6) AS p75,
        |  MAX(c_acctbal) AS max_v
        |FROM customer""".stripMargin,

    "q_describe_str" ->
      """WITH c AS (SELECT o_orderpriority AS x, COUNT(*) AS n
        |  FROM orders GROUP BY 1),
        |t AS (SELECT x AS top, n AS freq FROM c ORDER BY n DESC, x LIMIT 1)
        |SELECT
        |  (SELECT COUNT(o_orderpriority) FROM orders) AS cnt,
        |  (SELECT COUNT(DISTINCT o_orderpriority) FROM orders) AS uniq,
        |  top, freq
        |FROM t""".stripMargin,

    "q_corr_cov" ->
      """WITH s AS (SELECT
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(34,4))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice*l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(l_quantity*l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sxy
        |  FROM lineitem)
        |SELECT ROUND((n*sxy - sx*sy) /
        |         (SQRT(n*sxx - sx*sx) * SQRT(n*syy - sy*sy)), 6) AS corr_qp,
        |       ROUND((sxy - sx*sy/n) / (n-1), 4) AS cov_qp FROM s""".stripMargin,

    "q_corr_matrix" ->
      """WITH s AS (SELECT
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS s_q,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS s_e,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(30,2))) AS DOUBLE) AS s_d,
        |    CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS s_qq,
        |    CAST(SUM(CAST(l_extendedprice*l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS s_ee,
        |    CAST(SUM(CAST(l_discount*l_discount AS DECIMAL(38,4))) AS DOUBLE) AS s_dd,
        |    CAST(SUM(CAST(l_extendedprice*l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS s_eq,
        |    CAST(SUM(CAST(l_discount*l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS s_dq,
        |    CAST(SUM(CAST(l_discount*l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS s_de
        |  FROM lineitem)
        |SELECT * FROM (
        |  SELECT 'l_discount' AS var_a, 'l_extendedprice' AS var_b,
        |    ROUND((n*s_de - s_d*s_e) /
        |      (SQRT(n*s_dd - s_d*s_d) * SQRT(n*s_ee - s_e*s_e)), 6) AS corr FROM s
        |  UNION ALL
        |  SELECT 'l_discount', 'l_quantity',
        |    ROUND((n*s_dq - s_d*s_q) /
        |      (SQRT(n*s_dd - s_d*s_d) * SQRT(n*s_qq - s_q*s_q)), 6) FROM s
        |  UNION ALL
        |  SELECT 'l_extendedprice', 'l_quantity',
        |    ROUND((n*s_eq - s_e*s_q) /
        |      (SQRT(n*s_ee - s_e*s_e) * SQRT(n*s_qq - s_q*s_q)), 6) FROM s)
        |ORDER BY var_a, var_b""".stripMargin,

    "q_linreg" ->
      """WITH s AS (SELECT
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(34,4))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice*l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(l_quantity*l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sxy
        |  FROM lineitem)
        |SELECT ROUND((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
        |       ROUND((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n,
        |         4) AS intercept,
        |       ROUND(((n*sxy - sx*sy) * (n*sxy - sx*sy)) /
        |         ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r2 FROM s""".stripMargin
  )
}
