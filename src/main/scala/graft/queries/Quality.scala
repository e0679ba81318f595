package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions._
import graft.operators.GlobalOrder
import graft.operators.Pin.PinOps

/** Data-quality observability: the profile/constraint surface a
  * production pipeline runs on every ingest (the Deequ/dbt-test shape,
  * parity-plus — the reference has `describe`, not a constraint
  * engine).
  *
  * Both queries are single-pass conditional aggregates: every metric
  * rides ONE scan with map-side partials (the multi-distinct profile
  * plans Spark's expand — one shuffle carrying (column-id, value)
  * pairs), so cost at 100 TB is the scan plus one narrow exchange, not
  * one job per metric.
  */
object Quality {

  val queries: Map[String, Q] = Map(

    // Per-column profile of orders in one aggregate: count, nulls,
    // exact distincts, min/max rendered as strings for a uniform
    // report schema. String renderings stay engine-identical: ints and
    // dates are canonical text; the one double column goes through
    // round(2) so both engines print the same shortest representation.
    // The 1-row wide aggregate is unpivoted to (column, metrics) rows
    // in-row — no second pass.
    "q_profile_columns" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      def prof(c: String, render: org.apache.spark.sql.Column) = Seq(
        count(col(c)).as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(render).as(s"__mn_$c"),
        max(render).as(s"__mx_$c"))
      val cols = Seq(
        ("o_orderkey", col("o_orderkey").cast("string")),
        ("o_custkey", col("o_custkey").cast("string")),
        ("o_orderpriority", col("o_orderpriority")),
        ("o_orderdate", col("o_orderdate").cast("date").cast("string")),
        ("o_totalprice", round(col("o_totalprice"), 2).cast("string")))
      val aggs = cols.flatMap { case (c, r) => prof(c, r) }
      o.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(cols.map { case (c, _) =>
          struct(lit(c).as("column"), col(s"__n_$c").as("n"),
            col(s"__nn_$c").as("n_null"), col(s"__nd_$c").as("n_distinct"),
            col(s"__mn_$c").as("min_s"), col(s"__mx_$c").as("max_s"))
        }: _*)).as("p"))
        .select(col("p.column"), col("p.n"), col("p.n_null"),
          col("p.n_distinct"), col("p.min_s"), col("p.max_s"))
        .orderBy(col("column"))
    }),

    // Whole-warehouse referential integrity: every FK edge of the star
    // schema audited in one report — (edge, fact rows, orphans). Each
    // edge is a left join of the fact's key column against the dim's
    // distinct keys (dims broadcast; the fact never shuffles) plus one
    // conditional count; the seven 1-row results union into the
    // report. The full-mesh audit a warehouse runs nightly.
    "q_fk_audit" -> ((s, dir) => {
      def edge(name: String, fact: org.apache.spark.sql.DataFrame,
               key: String, dim: org.apache.spark.sql.DataFrame,
               dimKey: String) = {
        val keys = dim.select(col(dimKey)).distinct()
          .withColumnRenamed(dimKey, "__dk")
        fact.select(col(key).as("__fk"))
          .join(broadcast(keys), col("__fk") === col("__dk"), "left")
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col("__dk").isNull, 1L).otherwise(0L)).as("n_orphans"))
          .select(lit(name).as("edge"), col("n_rows"), col("n_orphans"))
      }
      val li = Tables(s, dir, "lineitem")
      val frames = Seq(
        edge("lineitem->orders", li, "l_orderkey",
          Tables(s, dir, "orders"), "o_orderkey"),
        edge("lineitem->part", li, "l_partkey",
          Tables(s, dir, "part"), "p_partkey"),
        edge("lineitem->supplier", li, "l_suppkey",
          Tables(s, dir, "supplier"), "s_suppkey"),
        edge("orders->customer", Tables(s, dir, "orders"), "o_custkey",
          Tables(s, dir, "customer"), "c_custkey"),
        edge("customer->nation", Tables(s, dir, "customer"), "c_nationkey",
          Tables(s, dir, "nation"), "n_nationkey"),
        edge("supplier->nation", Tables(s, dir, "supplier"), "s_nationkey",
          Tables(s, dir, "nation"), "n_nationkey"),
        edge("nation->region", Tables(s, dir, "nation"), "n_regionkey",
          Tables(s, dir, "region"), "r_regionkey"))
      frames.reduce(_ union _).orderBy(col("edge"))
    }),

    // Deterministic bootstrap resampling (the CI machinery behind
    // "how stable is this mean"): three resamples of size n drawn WITH
    // replacement, each draw the row at rank (md5(b,slot) mod n) + 1
    // over the deterministic o_orderkey order — random access replaced
    // by an equi-join of the salted slot spine against the two-pass
    // ranked frame, the scale-correct spelling of np.random.choice.
    // Every pick is hash-deterministic (reruns, retries, engines), the
    // resample means are exact-decimal sums of 2-dec picks, and the
    // slot spine is generated from the 1-row count — no driver loop.
    "q_bootstrap_mean" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
      val ranked = GlobalOrder.withRowNumberLong(o,
          Seq(col("o_orderkey")), "rk")
        .pinned // feeds the count AND the pick join
      val n = ranked.agg(max(col("rk")).as("__n"))
      // The slot spine IS the ranked frame: it already holds exactly one
      // row per rank 1..n, spread across partitions — no single-task
      // n-element sequence array (that spelling caps out long before
      // scale; this one inherits the table's own partitioning).
      val spine = ranked.select(col("rk").as("slot"))
        .crossJoin(broadcast(n))
        .select(col("__n"), col("slot"),
          explode(sequence(lit(1), lit(3))).as("b"))
        .withColumn("rk",
          pmod(md5Fold32(concat(lit("boot:"), col("b"), lit(":"),
            col("slot"))), col("__n")) + 1)
        .select(col("b"), col("rk"))
      spine.join(ranked, Seq("rk"))
        .groupBy(col("b"))
        .agg(count(lit(1)).as("n_draws"),
          round(sum(col("o_totalprice").cast(DecimalType(30, 2)))
            .cast("double") / count(lit(1)), 6).as("boot_mean"))
        .orderBy(col("b"))
    }),

    // Normal-approximation CI for the mean from exact power sums — the
    // one-pass companion the bootstrap cross-checks: mean ± 1.96·s/√n,
    // every sum exact decimal, the tail a deterministic double chain.
    "q_mean_ci" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val agg = Tables(s, dir, "orders")
        .agg(count(col("o_totalprice")).as("n"),
          dsum(col("o_totalprice")).as("__s1"),
          sum((col("o_totalprice") * col("o_totalprice"))
            .cast(DecimalType(34, 4))).cast("double").as("__s2"))
      val nd = col("n").cast("double")
      val m = col("__s1") / nd
      val v = (col("__s2") - col("__s1") * col("__s1") / nd) / (nd - 1.0)
      val half = lit(1.96) * sqrt(v) / sqrt(nd)
      agg.select(col("n"), round(m, 6).as("mean"),
        round(m - half, 6).as("ci_lo"), round(m + half, 6).as("ci_hi"))
    }),

    // Population stability index (the binned drift screen paired with
    // q_ks_test's exact CDF distance): click vs view values in 10
    // fixed-width bins, PSI = Σ (pa−pb)·ln(pa/pb). The bin counts are
    // one conditional hash agg; the term sum is quantized to 1e-9
    // longs BEFORE summing (the kmeans quantize-exact pattern) so the
    // cross-bin addition is order-free and the single rounded division
    // at the end is deterministic.
    "q_psi" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
        .filter(col("event_type").isin("click", "view"))
        .select(least(floor(col("value") / 50).cast("int"), lit(9)).as("bin"),
          col("event_type"))
      val bins = ev.groupBy(col("bin"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("ca"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("cb"))
        .pinned // feeds the totals AND the term sum
      val tot = bins.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      val withP = bins.crossJoin(broadcast(tot))
        .withColumn("pa", col("ca").cast("double") / col("na").cast("double"))
        .withColumn("pb", col("cb").cast("double") / col("nb").cast("double"))
        .withColumn("__term",
          when(col("ca") > 0 && col("cb") > 0,
            (col("pa") - col("pb")) * log(col("pa") / col("pb")))
            .otherwise(lit(0.0)))
        .withColumn("__tq",
          floor(col("__term") * lit(1e9) + lit(0.5)).cast("long"))
      withP.agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
          sum(col("__tq")).as("__s"))
        .select(col("n_a"), col("n_b"),
          round(col("__s").cast("double") / lit(1e9), 6).as("psi"))
    }),

    // Benford first-digit screen (the classic fabricated-numbers
    // audit): leading digit = first character of the EXACT integer-cents
    // decimal rendering (no log10, no float-boundary digits, and —
    // unlike a fixed when-chain — correct at every magnitude a
    // DECIMAL(12,2) can hold), observed frequency vs the Benford
    // expectation log10(1+1/d) — inlined as the same double literal on
    // both engines, so the deviation column compares identically.
    "q_benford" -> ((s, dir) => {
      val c = (col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2))
        * 100).cast("long")
      val digit = substring(col("__c").cast("string"), 1, 1).cast("long")
      val expFreq = (1 to 9).map(d => d ->
        BigDecimal(math.log10(1.0 + 1.0 / d))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
      val ev = Tables(s, dir, "events")
        .filter(col("value") >= 0.01)
        .withColumn("__c", c)
        .withColumn("digit", digit)
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val tot = ev.agg(sum(col("n")).as("__t"))
      ev.crossJoin(broadcast(tot))
        .withColumn("freq",
          round(col("n").cast("double") / col("__t").cast("double"), 6))
        .withColumn("exp_freq",
          (1 to 9).foldLeft(lit(Double.NaN)) { case (acc, d) =>
            when(col("digit") === d, lit(expFreq(d))).otherwise(acc) })
        .select(col("digit"), col("n"), col("freq"), col("exp_freq"))
        .orderBy(col("digit"))
    }),

    // Constraint report: key non-null + unique, value-range bounds,
    // domain membership, and referential integrity orders→customer —
    // each check a conditional aggregate; the FK check is a broadcast
    // LEFT anti-style null count riding the same pass shape production
    // validators use (the dim's key set broadcasts; the fact never
    // shuffles). Booleans + violation counts in one row.
    "q_quality_checks" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val custKeys = Tables(s, dir, "customer")
        .select(col("c_custkey")).distinct()
      val joined = o.join(Tables.dimHint("customer", custKeys),
        col("o_custkey") === col("c_custkey"), "left")
      joined.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("o_orderkey").isNull, 1L).otherwise(0L))
          .as("key_nulls"),
        (count(lit(1)) - countDistinct(col("o_orderkey")))
          .as("key_dups"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L))
          .as("price_nonpositive"),
        sum(when(!col("o_orderstatus").isin("F", "O", "P"), 1L)
          .otherwise(0L)).as("status_out_of_domain"),
        sum(when(col("c_custkey").isNull, 1L).otherwise(0L))
          .as("fk_orphans"))
        .withColumn("all_pass",
          col("key_nulls") === 0 && col("key_dups") === 0 &&
            col("price_nonpositive") === 0 &&
            col("status_out_of_domain") === 0 && col("fk_orphans") === 0)
    }))

  val oracle: Map[String, String] = Map(

    "q_profile_columns" -> {
      def row(c: String, render: String) =
        s"""SELECT '$c' AS "column", COUNT($c) AS n,
           |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_null,
           |  COUNT(DISTINCT $c) AS n_distinct,
           |  MIN($render) AS min_s, MAX($render) AS max_s
           |FROM orders""".stripMargin
      Seq(
        row("o_orderkey", "CAST(o_orderkey AS VARCHAR)"),
        row("o_custkey", "CAST(o_custkey AS VARCHAR)"),
        row("o_orderpriority", "o_orderpriority"),
        row("o_orderdate", "CAST(CAST(o_orderdate AS DATE) AS VARCHAR)"),
        row("o_totalprice", "CAST(ROUND(o_totalprice, 2) AS VARCHAR)"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    },

    "q_fk_audit" -> {
      def edge(name: String, fact: String, key: String,
               dim: String, dimKey: String) =
        s"""SELECT '$name' AS edge, COUNT(*) AS n_rows,
           |  CAST(SUM(CASE WHEN d.__dk IS NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_orphans
           |FROM $fact f LEFT JOIN
           |  (SELECT DISTINCT $dimKey AS __dk FROM $dim) d
           |  ON f.$key = d.__dk""".stripMargin
      Seq(
        edge("lineitem->orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        edge("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        edge("lineitem->supplier", "lineitem", "l_suppkey",
          "supplier", "s_suppkey"),
        edge("orders->customer", "orders", "o_custkey",
          "customer", "c_custkey"),
        edge("customer->nation", "customer", "c_nationkey",
          "nation", "n_nationkey"),
        edge("supplier->nation", "supplier", "s_nationkey",
          "nation", "n_nationkey"),
        edge("nation->region", "nation", "n_regionkey",
          "region", "r_regionkey"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY edge")
    },

    // same ranked-join spelling of the with-replacement draw
    "q_bootstrap_mean" ->
      s"""WITH r AS (SELECT o_totalprice,
        |    ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rk FROM orders),
        |n AS (SELECT MAX(rk) AS n FROM r),
        |sp AS (SELECT b,
        |    ${Extras.hex8("'boot:' || b || ':' || slot")} % n + 1 AS rk
        |  FROM n,
        |    (SELECT unnest(generate_series(1, (SELECT n FROM n))) AS slot) s,
        |    (SELECT unnest([1, 2, 3]) AS b) bb)
        |SELECT b, COUNT(*) AS n_draws,
        |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
        |    / COUNT(*), 6) AS boot_mean
        |FROM sp JOIN r USING (rk) GROUP BY b ORDER BY b""".stripMargin,

    "q_mean_ci" ->
      """WITH a AS (SELECT COUNT(o_totalprice) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(34,4)))
        |      AS DOUBLE) AS s2
        |  FROM orders)
        |SELECT n, ROUND(s1 / CAST(n AS DOUBLE), 6) AS mean,
        |  ROUND(s1 / CAST(n AS DOUBLE)
        |    - 1.96 * sqrt((s2 - s1 * s1 / CAST(n AS DOUBLE))
        |        / (CAST(n AS DOUBLE) - 1.0)) / sqrt(CAST(n AS DOUBLE)), 6)
        |    AS ci_lo,
        |  ROUND(s1 / CAST(n AS DOUBLE)
        |    + 1.96 * sqrt((s2 - s1 * s1 / CAST(n AS DOUBLE))
        |        / (CAST(n AS DOUBLE) - 1.0)) / sqrt(CAST(n AS DOUBLE)), 6)
        |    AS ci_hi
        |FROM a""".stripMargin,

    "q_psi" ->
      """WITH ev AS (SELECT LEAST(CAST(FLOOR(value / 50) AS INT), 9) AS bin,
        |    event_type
        |  FROM events WHERE event_type IN ('click', 'view')),
        |b AS (SELECT bin,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
        |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS cb
        |  FROM ev GROUP BY bin),
        |t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
        |    CAST(SUM(cb) AS BIGINT) AS nb FROM b),
        |w AS (SELECT ca, cb, na, nb,
        |    CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) AS pa,
        |    CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE) AS pb FROM b, t),
        |q AS (SELECT na, nb,
        |    CAST(FLOOR(CASE WHEN ca > 0 AND cb > 0
        |      THEN (pa - pb) * ln(pa / pb) ELSE 0.0 END * 1e9 + 0.5)
        |      AS BIGINT) AS tq
        |  FROM w)
        |SELECT na AS n_a, nb AS n_b,
        |  ROUND(CAST(SUM(tq) AS DOUBLE) / 1e9, 6) AS psi
        |FROM q GROUP BY na, nb""".stripMargin,

    "q_benford" -> {
      val ef = (1 to 9).map(d => d -> BigDecimal(math.log10(1.0 + 1.0 / d))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
      val caseExp = (1 to 9)
        .map(d => s"WHEN digit = $d THEN ${ef(d)}")
        .mkString("CASE ", " ", " END")
      s"""WITH c AS (SELECT
        |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
        |  FROM events WHERE value >= 0.01),
        |d AS (SELECT CAST(SUBSTR(CAST(c AS VARCHAR), 1, 1) AS BIGINT)
        |    AS digit FROM c),
        |g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS tt FROM g)
        |SELECT digit, n,
        |  ROUND(CAST(n AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS freq,
        |  $caseExp AS exp_freq
        |FROM g, t ORDER BY digit""".stripMargin
    },

    "q_quality_checks" ->
      """WITH j AS (SELECT o.*, c.c_custkey AS ck
        |  FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |    ON o.o_custkey = c.c_custkey)
        |SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS key_nulls,
        |  CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS key_dups,
        |  CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS price_nonpositive,
        |  CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS status_out_of_domain,
        |  CAST(SUM(CASE WHEN ck IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS fk_orphans,
        |  (SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) = 0
        |    AND COUNT(*) = COUNT(DISTINCT o_orderkey)
        |    AND SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) = 0
        |    AND SUM(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
        |          THEN 1 ELSE 0 END) = 0
        |    AND SUM(CASE WHEN ck IS NULL THEN 1 ELSE 0 END) = 0)
        |    AS all_pass
        |FROM j""".stripMargin)
}
