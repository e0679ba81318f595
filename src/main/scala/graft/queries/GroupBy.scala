package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions._
import graft.operators.{GlobalOrder, Skew}
import graft.operators.Pin.PinOps

/** SURVEY §2.5 GroupBy.
  *
  * Reference surface: `df.groupby(by)` + `count/max/mean/median/min/prod/
  * std/sum/var` (`sdc/datatypes/hpat_pandas_groupby_functions.py:361-597`;
  * chunk-dict build + merge `hpat_pandas_dataframe_functions.py:2993-3108`).
  * The reference's chunked-dict-then-merge is exactly Spark's partial/final
  * hash aggregate, so everything here is a plain `groupBy().agg()` —
  * map-side combine first, one shuffle on the group key, no sort unless
  * the query asks for sorted keys.
  */
object GroupBy {

  val queries: Map[String, Q] = Map(

    // df.groupby(k)[['x','y']].corr() — per-group Pearson correlation
    // from exact power sums: ONE hash aggregate of decimal-exact
    // sums (quantity integral, discount 2-dec ⇒ every sum exact), then
    // one deterministic double expression per group, rounded. Same
    // single-scan shape as q_corr_matrix, keyed.
    "q_groupby_corr" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val x = col("l_quantity")
      val y = col("l_discount")
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(x.cast(DecimalType(20, 0))).cast("double").as("sx"),
          sum(y.cast(DecimalType(20, 2))).cast("double").as("sy"),
          sum((x * y).cast(DecimalType(24, 2))).cast("double").as("sxy"),
          sum((x * x).cast(DecimalType(24, 0))).cast("double").as("sxx"),
          sum((y * y).cast(DecimalType(24, 4))).cast("double").as("syy"))
        .select(col("l_returnflag"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))), 6)
            .as("corr_qd"))
        .orderBy(col("l_returnflag"))
    }),

    // pandas resample('M').ohlc() per supplier: open/close are the
    // first/last price in (shipdate, orderkey, linenumber, partkey)
    // order inside each month, high/low plain extrema — ONE hash
    // aggregate on the (suppkey, month) key via min_by/max_by over the
    // struct order key; no window, no sort, map-side partials. The
    // oracle replays open/close as rank-1 picks of the same total
    // order in both directions.
    "q_groupby_ohlc" -> ((s, dir) => {
      val ord = struct(col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), col("l_partkey"))
      Tables(s, dir, "lineitem")
        .groupBy(col("l_suppkey"),
          date_trunc("month", col("l_shipdate").cast("date")).cast("date")
            .as("month"))
        .agg(min_by(col("l_extendedprice"), ord).as("open"),
          max(col("l_extendedprice")).as("high"),
          min(col("l_extendedprice")).as("low"),
          max_by(col("l_extendedprice"), ord).as("close"))
        .orderBy(col("l_suppkey"), col("month"))
    }),

    // pandas groupby.cumcount() + .ngroup(sort=True): the ordinal of
    // each row within its group (by positional order) and the group's
    // index among sorted keys. cumcount is ONE value-partitioned
    // window — the same key shuffle any per-group op pays (o_orderkey
    // is unique, so the order inside each partition is total).
    // ngroup = dense rank of the key, computed on the DISTINCT-KEY
    // frame via the two-pass row number — never a global window over
    // the table — and broadcast back.
    "q_cumcount_ngroup" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
      val keys = Tables(s, dir, "orders")
        .select(col("o_orderpriority")).distinct()
      val ng = GlobalOrder.withRowNumberLong(
          keys, Seq(col("o_orderpriority")), "__rn")
        .select(col("o_orderpriority"), (col("__rn") - 1).as("ngroup"))
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
        .withColumn("cumcount", row_number().over(w).cast("long") - 1)
        .join(broadcast(ng), Seq("o_orderpriority"))
        .orderBy(col("o_orderkey"))
    }),
    // Flagship TPC-H-Q1 shape: scan → filter → groupBy → multi-agg → sort.
    // Mirrors reference lifecycle E2 (`df.groupby('A').sum()`).
    "q_tpch_q1" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val dec2 = DecimalType(30, 2)
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          // product sums carry scale 4/6; rescale to 2 dp IN DECIMAL
          // (exact HALF_UP on both engines) before the double cast —
          // at sf1 magnitudes (~2.4e12) the scale-6 scaled integer
          // exceeds 2^53 and the raw decimal→double conversion differs
          // by an ulp between engines
          sum(col("l_extendedprice").cast(dec2) *
              (lit(BigDecimal(1)).cast(dec2) - col("l_discount").cast(dec2)))
            .cast(dec2).cast("double").as("sum_disc_price"),
          sum(col("l_extendedprice").cast(dec2) *
              (lit(BigDecimal(1)).cast(dec2) - col("l_discount").cast(dec2)) *
              (lit(BigDecimal(1)).cast(dec2) + col("l_tax").cast(dec2)))
            .cast(dec2).cast("double").as("sum_charge"),
          (dsum(col("l_quantity")) / count(col("l_quantity"))).as("avg_qty"),
          (dsum(col("l_extendedprice")) / count(col("l_extendedprice")))
            .as("avg_price"),
          (dsum(col("l_discount")) / count(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // TPC-H Q3 (shipping-priority variant on the fixture's columns):
    // the canonical 3-table join + agg + top-k. Plan shape at scale:
    // the BUILDING customers broadcast into orders while they fit
    // (size-gated via Tables.dimHint — customer scales with SF, so the
    // hint is never forced; AQE converts from measured sizes at scale),
    // the orders×lineitem equi-join shuffles on orderkey (the
    // fact-fact join — no way around it), revenue is an exact decimal
    // sum, and the top-10 is TakeOrderedAndProject, never a global
    // sort. Fixture dates run 1995..2001, so the classic 1995-03-15
    // split becomes 1997-01-01.
    "q_tpch_q3" -> ((s, dir) => {
      val cut = lit("1997-01-01").cast("timestamp")
      val cust = Tables(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ord = Tables(s, dir, "orders")
        .filter(col("o_orderdate") < cut)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_orderpriority"))
      val li = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") > cut)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.dimHint("customer", cust),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(discountedRevenue(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q6 (forecast revenue change): the pushdown showcase — all
    // three filters reach the parquet scan, the aggregate is one exact
    // decimal sum with map-side partials; zero shuffles beyond the
    // final single-row reduce.
    "q_tpch_q6" -> ((s, dir) => {
      val dec2 = DecimalType(12, 2)
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast(DecimalType(30, 2)) *
            col("l_discount").cast(dec2))
          .cast("double").as("revenue"))
    }),

    // TPC-H Q5 (local supplier volume): the 6-table join. Scale shape:
    // region/nation (fixed 5/25 rows) carry forced broadcast hints;
    // supplier and customer are size-gated (they scale with SF — at
    // small SF Catalyst's estimate still broadcasts them, at 100 TB
    // the plan degrades to shuffle joins with AQE converting back when
    // the measured size allows). The one unavoidable shuffle is
    // orders×lineitem on orderkey. The
    // c_nationkey = s_nationkey "local" constraint is a post-join filter
    // between two broadcast-sourced columns, so it costs nothing extra.
    "q_tpch_q5" -> ((s, dir) => {
      val supp = Tables(s, dir, "supplier")
        .join(broadcast(Tables(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables(s, dir, "region")
            .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val ord = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.dimHint("customer", Tables(s, dir, "customer")
            .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.dimHint("supplier", supp),
          col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(discountedRevenue(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc)
    }),

    // TPC-H Q10 (returned-item reporting): revenue lost to returns per
    // customer, top 20. One orderkey shuffle (lineitem×orders); customer
    // and nation broadcast; the top-20 is TakeOrderedAndProject with
    // c_custkey as the deterministic tiebreak.
    "q_tpch_q10" -> ((s, dir) => {
      val ord = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      Tables(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.dimHint("customer", Tables(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
        .agg(sum(discountedRevenue(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q14 (promotion effect): conditional-aggregate ratio over a
    // broadcast part join. Numerator and denominator are exact decimal
    // sums cast to double; the final (100·num)/den is two correctly-
    // rounded IEEE double ops, bit-identical on any engine.
    "q_tpch_q14" -> ((s, dir) => {
      val rev = discountedRevenue(col("l_extendedprice"), col("l_discount"))
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
        .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
        .join(Tables.dimHint("part", Tables(s, dir, "part")
            .select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", rev)
            .otherwise(lit(BigDecimal(0)).cast(DecimalType(30, 2))))
            .cast("double").as("promo_revenue_abs"),
          sum(rev).cast("double").as("total_revenue"))
        .select(
          ((lit(100.0) * col("promo_revenue_abs")) / col("total_revenue"))
            .as("promo_pct"),
          col("total_revenue"))
    }),

    // TPC-H Q18 (large-volume customers): HAVING over a fact aggregate,
    // then join back. The qualifying-order set (sum qty > 300) is tiny
    // after the first shuffle, so AQE broadcasts it into orders; customer
    // broadcasts; top-100 is TakeOrderedAndProject with o_orderkey as
    // the deterministic tiebreak. l_quantity is integral (1..50), so the
    // double sum is exact in any order.
    "q_tpch_q18" -> ((s, dir) => {
      val big = Tables(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 300)
      Tables(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.dimHint("customer", Tables(s, dir, "customer")
            .select(col("c_custkey"), col("c_name"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // TPC-H Q4 (order priority checking), adapted: the fixture lacks
    // l_commitdate/l_receiptdate, so "late" = EXISTS a lineitem shipped
    // more than 30 days after the order date — same decorrelated-EXISTS
    // shape. The date window prunes orders at the scan (pushed filter);
    // the left-semi shuffle carries only (l_orderkey, l_shipdate) on
    // the probe side and stops at the first match per order.
    "q_tpch_q4" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val l = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      o.join(l, col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // TPC-H Q12 (shipping-mode priority split), adapted: the fixture
    // lacks l_shipmode, so l_returnflag plays the mode column — same
    // fact-fact equi-join + conditional-count shape. Both sides project
    // to two columns before the orderkey shuffle; the CASE counts are
    // map-side partial longs.
    "q_tpch_q12" -> ((s, dir) => {
      val hi = Seq("1-URGENT", "2-HIGH")
      val l = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_returnflag"))
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin(hi: _*), 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(!col("o_orderpriority").isin(hi: _*), 1L).otherwise(0L))
            .as("low_line_count"))
        .orderBy(col("l_returnflag"))
    }),

    // TPC-H Q7 (volume shipping between two nations): revenue flow
    // supplier-nation → customer-nation per shipment year, both
    // directions. Scale shape: both nation paths are broadcast dims
    // (suppliers and customers pre-filtered to the two nations, so the
    // supplier broadcast prunes lineitem to ~2/25 of its rows BEFORE
    // the one real shuffle, lineitem×orders on orderkey); the
    // different-nation constraint is a post-join filter between two
    // broadcast-sourced columns.
    "q_tpch_q7" -> ((s, dir) => {
      val nats = Seq("NATION_3", "NATION_7")
      val supp = Tables(s, dir, "supplier")
        .join(broadcast(Tables(s, dir, "nation")
            .filter(col("n_name").isin(nats: _*))
            .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("supp_nation"))
      val cust = Tables(s, dir, "customer")
        .join(broadcast(Tables(s, dir, "nation")
            .filter(col("n_name").isin(nats: _*))
            .select(col("n_nationkey").as("cn_key"),
              col("n_name").as("cust_nation"))),
          col("c_nationkey") === col("cn_key"))
        .select(col("c_custkey"), col("cust_nation"))
      val ord = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
          col("l_extendedprice"), col("l_discount"))
        .join(Tables.dimHint("supplier", supp),
          col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.dimHint("customer", cust),
          col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(discountedRevenue(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // TPC-H Q13 (customer order-count distribution): left outer join +
    // two-level aggregate. The first groupBy keys on the JOIN key, so
    // it rides the join's hash partitioning — one custkey shuffle
    // total; the histogram re-agg is |distinct counts| rows, free.
    // The priority exclusion lives on the orders side BEFORE the join
    // so excluded-only customers still appear with c_count = 0.
    "q_tpch_q13" -> ((s, dir) => {
      val ord = Tables(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_custkey"), col("o_orderkey"))
      Tables(s, dir, "customer").select(col("c_custkey"))
        .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q15 (top supplier): max join-back. Per-supplier revenue is
    // kept DECIMAL through the max and the equality compare — exact, so
    // FP ties can't split the answer across engines — and cast to
    // double only at output (scaled value < 2^53 ⇒ exact conversion).
    // The agg frame feeds two consumers (the 1-row max and the probe),
    // so it is localCheckpoint'd: ONE lineitem scan, not two plans.
    "q_tpch_q15" -> ((s, dir) => {
      val rev = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(discountedRevenue(col("l_extendedprice"), col("l_discount")))
          .as("total_rev"))
        .pinned
      val top = rev.agg(max(col("total_rev")).as("max_rev"))
      rev.join(broadcast(top), col("total_rev") === col("max_rev"))
        .join(Tables.dimHint("supplier", Tables(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast("double").as("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // TPC-H Q16 (parts/supplier relationship), adapted: the fixture has
    // no partsupp, so "suppliers of a part" comes from lineitem, and
    // the complaint exclusion is s_acctbal < 0. Plan shape: the
    // exclusion list and the filtered part dim both broadcast (the
    // anti-join build side is a handful of keys); COUNT(DISTINCT) is
    // Spark's two-phase distinct aggregate — partial de-dup on
    // (brand, type, size, suppkey) map-side, then the count.
    "q_tpch_q16" -> ((s, dir) => {
      val excl = Tables(s, dir, "supplier")
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      val pt = Tables(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#5" &&
          col("p_type") =!= "MEDIUM" &&
          col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
        .select(col("p_partkey"), col("p_brand"), col("p_type"),
          col("p_size"))
      Tables(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey"))
        .join(Tables.dimHint("supplier", excl),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(Tables.dimHint("part", pt),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // TPC-H Q17 (small-quantity-order revenue): the decorrelated
    // per-part average. The brand's parts broadcast-semi-join prunes
    // lineitem BEFORE the partkey shuffle, so both the avg aggregate
    // and the probe carry only the brand's lines (~1/25 of the table);
    // the pruned frame feeds both, so it's localCheckpoint'd — one
    // scan. threshold = 0.2·avg is two correctly-rounded IEEE ops on
    // an exact sum/count (l_quantity is integral, group sums < 2^53),
    // so the comparison is bit-identical cross-engine.
    "q_tpch_q17" -> ((s, dir) => {
      val pt = Tables(s, dir, "part")
        .filter(col("p_brand") === "Brand#5").select(col("p_partkey"))
      val li = Tables(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        .join(Tables.dimHint("part", pt),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .pinned
      val avgq = li.groupBy(col("l_partkey"))
        .agg((sum(col("l_quantity")) / count(col("l_quantity")))
          .as("avg_qty"))
        .withColumnRenamed("l_partkey", "ap_partkey")
      li.join(avgq, col("l_partkey") === col("ap_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((sum(col("l_extendedprice").cast(DecimalType(30, 2)))
          .cast("double") / 7.0).as("avg_yearly"))
    }),

    // TPC-H Q19 (discounted revenue): the disjunctive-predicate join.
    // part broadcasts; the OR-of-ANDs over (brand, size, quantity)
    // evaluates inside the broadcast join's codegen stage; the common
    // quantity range (1..30) is factored out of the disjunction so it
    // pushes to the lineitem parquet scan.
    "q_tpch_q19" -> ((s, dir) => {
      val pt = Tables(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      Tables(s, dir, "lineitem")
        .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
        .select(col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
        .join(Tables.dimHint("part", pt),
          col("l_partkey") === col("p_partkey") && (
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
            col("l_quantity") <= 11) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
            col("l_quantity") >= 20)))
        .agg(sum(discountedRevenue(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
    }),

    // TPC-H Q21 (suppliers who kept orders waiting), adapted: "late" =
    // shipped > 60 days after the order date on an 'F' order (the
    // fixture has no commit/receipt dates). The late frame is built
    // once — one orderkey fact-fact shuffle — and localCheckpoint'd
    // because it feeds both the probe and the NOT-EXISTS side.
    // EXISTS / NOT EXISTS are a left-semi and a left-anti join on
    // orderkey with the supplier inequality in the join condition;
    // the probe is one nation's suppliers (broadcast), so the semi/
    // anti shuffles carry two narrow long columns each.
    "q_tpch_q21" -> ((s, dir) => {
      val ordF = Tables(s, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val late = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(ordF, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select(col("l_orderkey"), col("l_suppkey"))
        .pinned
      val suppN = Tables(s, dir, "supplier")
        .join(broadcast(Tables(s, dir, "nation")
            .filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"))
      val others = Tables(s, dir, "lineitem")
        .select(col("l_orderkey").as("o2_okey"), col("l_suppkey").as("o2_skey"))
      val lateOthers = late
        .select(col("l_orderkey").as("o3_okey"), col("l_suppkey").as("o3_skey"))
      late.join(Tables.dimHint("supplier", suppN),
          col("l_suppkey") === col("s_suppkey"))
        .join(others, col("l_orderkey") === col("o2_okey") &&
          col("l_suppkey") =!= col("o2_skey"), "left_semi")
        .join(lateOthers, col("l_orderkey") === col("o3_okey") &&
          col("l_suppkey") =!= col("o3_skey"), "left_anti")
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }),

    // TPC-H Q22 (global sales opportunity), adapted: nationkey plays
    // the phone country code, and — because the fixture's custkeys are
    // dense (every customer has SOME order) — "never ordered" becomes
    // "no order since 1999", i.e. lapsed customers. The positive-
    // balance average is one exact scalar (decimal sum / count, IEEE
    // divide — deterministic) cross-joined as a 1-row broadcast; the
    // lapse test is a custkey anti-join against the date-pruned
    // two-column orders projection.
    "q_tpch_q22" -> ((s, dir) => {
      val cust = Tables(s, dir, "customer")
        .filter(col("c_nationkey").isin(1, 3, 5, 7, 9))
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      val avgPos = cust.filter(col("c_acctbal") > 0)
        .agg((dsum(col("c_acctbal")) / count(col("c_acctbal")))
          .as("avg_bal"))
      cust.join(broadcast(avgPos))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(Tables(s, dir, "orders")
            .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy(col("c_nationkey"))
    }),

    // TPC-H Q2 (minimum-cost supplier), adapted: the fixture has no
    // partsupp, so "can supply part p" = "has shipped part p" (distinct
    // (l_partkey, l_suppkey) pairs — ONE shuffle over two long columns)
    // and s_acctbal plays ps_supplycost. The region-filtered
    // supplier⋈nation dim and the size/type part filter both broadcast;
    // the per-part minimum is a tiny agg over the candidate pairs that
    // broadcasts back for the equality probe (min is a SELECTION, not
    // arithmetic — double equality is exact cross-engine). Top-100 is
    // bounded (TakeOrderedAndProject), never a global sort.
    "q_tpch_q2" -> ((s, dir) => {
      val pt = Tables(s, dir, "part")
        .filter(col("p_size") === 9 && col("p_type") === "LARGE")
        .select(col("p_partkey"))
      val supp = Tables(s, dir, "supplier")
        .join(broadcast(Tables(s, dir, "nation")
            .join(broadcast(Tables(s, dir, "region")
                .filter(col("r_name") === "EUROPE")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
          col("n_name"))
      val cand = Tables(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        .join(Tables.dimHint("part", pt),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.dimHint("supplier", supp),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("p_partkey"), col("s_name"), col("s_acctbal"),
          col("n_name"))
        .pinned
      val mins = cand.groupBy(col("p_partkey").as("mp_partkey"))
        .agg(min(col("s_acctbal")).as("min_bal"))
      cand.join(Tables.dimHint("part", mins),
          col("p_partkey") === col("mp_partkey") &&
            col("s_acctbal") === col("min_bal"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }),

    // TPC-H Q8 (national market share): one nation's share of a
    // region's PROMO-part volume per order year. Scale shape: part
    // filter and the customer→nation→region path broadcast-prune the
    // lineitem side BEFORE the one real shuffle (lineitem×orders on
    // orderkey); supplier→nation broadcasts to tag each line with its
    // supplier nation. share = conditional decimal sum / total decimal
    // sum — both exact, one IEEE divide at output.
    "q_tpch_q8" -> ((s, dir) => {
      val zero = lit(BigDecimal(0)).cast(DecimalType(30, 2))
      val pt = Tables(s, dir, "part")
        .filter(col("p_type") === "PROMO").select(col("p_partkey"))
      val cust = Tables(s, dir, "customer")
        .join(broadcast(Tables(s, dir, "nation")
            .join(broadcast(Tables(s, dir, "region")
                .filter(col("r_name") === "AMERICA")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val supp = Tables(s, dir, "supplier")
        .join(broadcast(Tables(s, dir, "nation")
            .select(col("n_nationkey").as("sn_key"),
              col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sn_key"))
        .select(col("s_suppkey"), col("supp_nation"))
      val ord = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") <= lit("1996-12-31").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
        .join(Tables.dimHint("customer", cust),
          col("o_custkey") === col("c_custkey"), "left_semi")
      val vol = discountedRevenue(col("l_extendedprice"), col("l_discount"))
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(Tables.dimHint("part", pt),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .join(Tables.dimHint("supplier", supp),
          col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_4", vol)
              .otherwise(zero)).cast("double") /
            sum(vol).cast("double")).as("mkt_share"))
        .orderBy(col("o_year"))
    }),

    // TPC-H Q9 (product-type profit), adapted: no partsupp, so unit
    // cost = p_retailprice / 2 (exact in DECIMAL: retailprice has one
    // decimal digit). profit = extendedprice·(1−discount) −
    // cost·quantity, all DECIMAL until the output cast, so group sums
    // are order-independent and cross-engine exact. part (name LIKE)
    // and supplier→nation broadcast; the one real shuffle is
    // lineitem×orders on orderkey, then a (nation, year) hash agg.
    "q_tpch_q9" -> ((s, dir) => {
      val dec2 = DecimalType(12, 2)
      val profit =
        discountedRevenue(col("l_extendedprice"), col("l_discount")) -
        col("p_retailprice").cast(dec2) * lit(BigDecimal(0.5)).cast(DecimalType(2, 1)) *
          col("l_quantity").cast(dec2)
      val pt = Tables(s, dir, "part")
        .filter(col("p_name").like("%gear%"))
        .select(col("p_partkey"), col("p_retailprice"))
      val supp = Tables(s, dir, "supplier")
        .join(broadcast(Tables(s, dir, "nation")
            .select(col("n_nationkey"), col("n_name").as("nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("nation"))
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .join(Tables.dimHint("part", pt),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.dimHint("supplier", supp),
          col("l_suppkey") === col("s_suppkey"))
        .join(Tables(s, dir, "orders")
            .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(sum(profit).cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // TPC-H Q11 (important stock), adapted: inventory value per part =
    // decimal sum of l_extendedprice over one nation's suppliers
    // (partsupp's availqty·supplycost is absent). The nation's supplier
    // keys broadcast as a semi-join, the per-part agg is the one
    // shuffle, and the grand total is a 1-row broadcast probe against
    // the same checkpointed agg — one lineitem scan. The threshold
    // compare stays DECIMAL (total × 0.001 is exact), so no FP tie can
    // split the answer.
    "q_tpch_q11" -> ((s, dir) => {
      val suppN = Tables(s, dir, "supplier")
        .join(broadcast(Tables(s, dir, "nation")
            .filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val value = Tables(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
        .join(Tables.dimHint("supplier", suppN),
          col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_extendedprice").cast(DecimalType(30, 2))).as("value"))
        .pinned
      val thresh = value
        .agg((sum(col("value")) *
          lit(BigDecimal(0.001)).cast(DecimalType(4, 3))).as("min_value"))
      value.join(broadcast(thresh))
        .filter(col("value") > col("min_value"))
        .select(col("l_partkey"), col("value").cast("double").as("part_value"))
        .orderBy(col("part_value").desc, col("l_partkey"))
    }),

    // TPC-H Q20 (excess-stock suppliers), adapted: a supplier "holds
    // excess stock" when some small-named part shipped > 40 units total
    // in 1997–98 (availqty is absent). Chain of prunes: part filter
    // broadcasts into a semi-join, the date window pushes to the scan,
    // the (suppkey, partkey) agg is the one shuffle, and the surviving
    // supplier keys — a handful — broadcast into the final semi-join
    // against the nation's suppliers. Integer quantity sums are exact.
    "q_tpch_q20" -> ((s, dir) => {
      val pt = Tables(s, dir, "part")
        .filter(col("p_name").like("small%")).select(col("p_partkey"))
      val excess = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
        .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
        .join(Tables.dimHint("part", pt),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(dsum(col("l_quantity")).as("qty"))
        .filter(col("qty") > 40)
        .select(col("l_suppkey")).distinct()
      Tables(s, dir, "supplier")
        .join(broadcast(Tables(s, dir, "nation")
            .filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .join(Tables.dimHint("supplier", excess),
          col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_name"))
    }),

    // per-group top-k (groupby.head/nlargest-per-group): top-3 orders
    // by price within each priority. The rank filter plans as Spark's
    // WindowGroupLimit (pinned): every MAP task keeps only its local
    // top-3 per group BEFORE the shuffle, so a 5-value partition key —
    // normally a 5-reducer funnel — receives ≤ 3·numMapTasks rows per
    // group, not the table. That partial/final split is exactly the
    // hand-built two-phase top-k, supplied by the optimizer.
    "q_groupby_topk" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .orderBy(col("o_orderpriority"), col("rk"))
    }),

    // groupby multi-agg: count/min/max/sum/mean per single key
    "q_groupby_agg" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          dsum(col("o_totalprice")).as("sum_price"),
          (dsum(col("o_totalprice")) / count(col("o_totalprice")))
            .as("mean_price"))
        .orderBy(col("o_orderpriority"))
    }),

    // groupby first/last (pandas gb.first()/gb.last()) with the frame's
    // order made EXPLICIT: min_by/max_by on a unique (orderkey,
    // linenumber) key folded into one long — a hash aggregate with
    // map-side partials, not a window funnel over sorted groups
    // (l_linenumber ≤ 7, so key = orderkey*10 + linenumber is injective).
    "q_groupby_first_last" -> ((s, dir) => {
      val okey = (col("l_orderkey") * 10 + col("l_linenumber")).cast("long")
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          min_by(col("l_extendedprice"), okey).as("first_price"),
          max_by(col("l_extendedprice"), okey).as("last_price"),
          min_by(col("l_quantity"), okey).as("first_qty"),
          max_by(col("l_quantity"), okey).as("last_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // groupby var/std via exact per-group power sums.
    // x² is formed in DECIMAL arithmetic (cast-then-multiply), not as a
    // double product cast to decimal: o_totalprice² ≈ 3.6e11 needs 15-16
    // significant digits at scale 4, where the double product's ulp
    // (~6e-5) is comparable to the decimal rounding boundary (5e-5), so
    // Spark and the oracle could round the last digit differently.
    // DECIMAL(18,2)×DECIMAL(18,2) = DECIMAL(37,4) is exact in both engines.
    // The final values are still rounded: once the exact scaled sum exceeds
    // 2^53 the DECIMAL→DOUBLE conversion itself is engine-dependent by an
    // ulp (Java rounds the decimal correctly; DuckDB goes through int128 →
    // double → scale, two roundings), so derived doubles of ~1e10 magnitude
    // can differ at the 1e-5 level. Rounding var to 2 and std to 6 decimals
    // leaves ≥3 orders of magnitude of slack.
    "q_groupby_var_std" -> ((s, dir) => {
      val x = col("o_totalprice")
      val xd = x.cast(DecimalType(18, 2))
      Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(x).cast("double").as("n"),
          dsum(x).as("s1"),
          sum(xd * xd).cast("double").as("s2"))
        .select(col("o_orderpriority"),
          round(expr("(s2 - s1*s1/n) / (n - 1.0)"), 2).as("var_price"),
          round(expr("sqrt((s2 - s1*s1/n) / (n - 1.0))"), 6).as("std_price"))
        .orderBy(col("o_orderpriority"))
    }),

    // groupby median (exact percentile per group)
    "q_groupby_median" -> ((s, dir) => {
      Tables(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(round(expr("percentile(c_acctbal, 0.5)"), 6).as("median_bal"))
        .orderBy(col("c_mktsegment"))
    }),

    // groupby.quantile(q=[...]) — the parameterized twin of
    // q_groupby_median (same per-group exact value-map aggregate,
    // linear interpolation; fine for the handful of groups here — for
    // high-cardinality value domains the two-pass rank machinery of
    // q_agg_quantile is the scale path). One array-percentile pass,
    // both quantiles from the same sketchless exact state.
    "q_groupby_quantile" -> ((s, dir) => {
      Tables(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(expr("percentile(c_acctbal, array(0.25D, 0.75D))").as("__p"))
        .select(col("c_mktsegment"),
          round(element_at(col("__p"), 1), 6).as("q25_bal"),
          round(element_at(col("__p"), 2), 6).as("q75_bal"))
        .orderBy(col("c_mktsegment"))
    }),

    // groupby.prod (`sdc/datatypes/hpat_pandas_groupby_functions.py:421`):
    // per-group product as a hash aggregate (map-side partial products —
    // product is commutative/associative, so the two-phase plan is the
    // same shape as sum). Exactness policy: FP multiplication is NOT
    // associative in general, so the factors are kept integer-valued and
    // small ((l_quantity % 5) + 1 ∈ {1..5}; ≤17 lines per order ⇒
    // product ≤ 5^17 ≈ 7.6e11 < 2^53) — every partial product is an
    // exact integer in double, making the result partitioning-invariant
    // and bit-identical to the oracle. (Raw l_quantity overflows 2^53 at
    // sf0.1: max per-order product measured 1.7e23.)
    "q_groupby_prod" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(product((col("l_quantity") % 5) + 1).as("prod_qm"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("l_orderkey"))
    }),

    // groupby.idxmax()/idxmin() (`sdc/datatypes/hpat_pandas_series
    // _functions.py` idxmax/idxmin are whole-column — q_idxmax; the
    // per-group form is the everyday argmax-row pandas op). pandas
    // returns the FIRST index hitting the extreme, so the tie-break is
    // the (orderkey, linenumber) position key. Each branch is a
    // rank-1 filter that Spark plans as map-side WindowGroupLimit
    // (one survivor per group per mapper before the shuffle — pinned
    // for q_groupby_topk in PlanShapeSpec), so a 3-value key is no
    // reducer funnel; the union of the two branches shares the scan.
    "q_groupby_idxmax" -> ((s, dir) => {
      val base = Tables(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"))
      def pick(w: org.apache.spark.sql.expressions.WindowSpec, which: String) =
        base.withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("l_returnflag"), lit(which).as("which"),
            col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val wMax = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity").desc, col("l_orderkey"), col("l_linenumber"))
      val wMin = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity").asc, col("l_orderkey"), col("l_linenumber"))
      pick(wMax, "idxmax").unionAll(pick(wMin, "idxmin"))
        .orderBy(col("l_returnflag"), col("which"))
    }),

    // pivot_table(index, columns, values, aggfunc='sum') — reference
    // `sdc/tests/test_groupby.py:743-760` (legacy HPAT pivot surface, the
    // pivot values declared up front like its `pivots={'pt': [...]}`
    // decorator; Spark's groupBy().pivot() likewise takes explicit values
    // to keep the schema static and the plan a single two-phase hash agg)
    "q_pivot" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(dsum(col("l_quantity")))
        .orderBy(col("l_returnflag"))
    }),

    // Skew-safe aggregation: l_returnflag has 3 values over the whole
    // table — the canonical heavy-key shape. The salted two-phase agg
    // splits each key over 16 content-derived sub-keys so no reducer
    // owns a whole key's stream; exact longs/decimals make the result
    // identical to the direct groupBy (which is what the oracle runs).
    "q_salted_agg" -> ((s, dir) => {
      Skew.saltedSumCount(Tables(s, dir, "lineitem"),
          "l_returnflag", "l_extendedprice",
          saltFrom = col("l_orderkey"), buckets = 16)
        .orderBy(col("l_returnflag"))
    }),

    // groupby.transform('mean'): the per-group statistic broadcast back
    // onto every row. l_returnflag has 3 values, so the scale-safe
    // spelling is hash-aggregate (map-side partials collapse each mapper
    // to 3 rows) + broadcast join back — NOT Window.partitionBy(key),
    // which would funnel the whole table through ≤3 reducer tasks (the
    // exact heavy-key funnel q_salted_agg exists to avoid). The window
    // spelling is only right when key cardinality ≈ parallelism or more.
    "q_groupby_transform" -> ((s, dir) => {
      val dec2 = DecimalType(30, 2)
      val li = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("l_quantity"))
      val means = li.groupBy(col("l_returnflag"))
        .agg((sum(col("l_quantity").cast(dec2)).cast("double") /
          count(col("l_quantity"))).as("__gm"))
      li.join(broadcast(means), Seq("l_returnflag"))
        .withColumn("grp_mean_qty", round(col("__gm"), 6))
        .withColumn("demeaned", round(col("l_quantity") - col("__gm"), 6))
        .drop("__gm")
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // melt / unpivot — the inverse reshape of q_pivot (parity-plus: the
    // reference pivots only). Spark's native unpivot is a single
    // narrow Expand projection — rows×2 out, no shuffle before the
    // final sort; pandas-melt default column names (variable, value).
    "q_melt" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity").as("qty"), col("l_extendedprice").as("price")),
          "variable", "value")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("variable"))
    }),

    // two-level grouping + having-style post-filter
    "q_groupby_multi_key" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sq"))
        .filter(col("n") > 10)
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    })
  )

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) *
      |      (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2))))
      |    * 100 + 0.5) AS BIGINT) AS DOUBLE) / 100.0 AS sum_disc_price,
      |  CAST(CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) *
      |      (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2))) *
      |      (CAST(1 AS DECIMAL(8,2)) + CAST(l_tax AS DECIMAL(8,2))))
      |    * 100 + 0.5) AS BIGINT) AS DOUBLE) / 100.0 AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE)
      |    / COUNT(l_quantity) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE)
      |    / COUNT(l_extendedprice) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(30,2))) AS DOUBLE)
      |    / COUNT(l_discount) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val oracle: Map[String, String] = Map(
    // identical power-sum expression sequence, exact decimal interiors
    "q_groupby_corr" ->
      """WITH a AS (SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(20,0))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(20,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(24,2)))
        |      AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(24,0)))
        |      AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(24,4)))
        |      AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  ROUND((n * sxy - sx * sy) /
        |    sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_qd
        |FROM a ORDER BY l_returnflag""".stripMargin,

    "q_groupby_ohlc" ->
      """WITH t AS (SELECT l_suppkey,
        |    date_trunc('month', CAST(l_shipdate AS DATE)) AS month,
        |    l_extendedprice,
        |    ROW_NUMBER() OVER (PARTITION BY l_suppkey,
        |        date_trunc('month', CAST(l_shipdate AS DATE))
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey)
        |      AS rn_a,
        |    ROW_NUMBER() OVER (PARTITION BY l_suppkey,
        |        date_trunc('month', CAST(l_shipdate AS DATE))
        |      ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC,
        |        l_partkey DESC) AS rn_d
        |  FROM lineitem)
        |SELECT l_suppkey, month,
        |  MAX(CASE WHEN rn_a = 1 THEN l_extendedprice END) AS open,
        |  MAX(l_extendedprice) AS high,
        |  MIN(l_extendedprice) AS low,
        |  MAX(CASE WHEN rn_d = 1 THEN l_extendedprice END) AS close
        |FROM t GROUP BY l_suppkey, month
        |ORDER BY l_suppkey, month""".stripMargin,

    "q_cumcount_ngroup" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_orderkey) - 1 AS BIGINT) AS cumcount,
        |  CAST(DENSE_RANK() OVER (ORDER BY o_orderpriority) - 1 AS BIGINT)
        |    AS ngroup
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_tpch_q1" -> q1Sql,

    "q_tpch_q3" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2)) *
        |    (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |    AS DOUBLE) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > TIMESTAMP '1997-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q_tpch_q6" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2)) *
        |    CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q_tpch_q5" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2)) *
        |    (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |    AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC""".stripMargin,

    "q_tpch_q10" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2)) *
        |    (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |    AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q_tpch_q14" ->
      """WITH j AS (
        |  SELECT p_type,
        |    CAST(l_extendedprice AS DECIMAL(30,2)) *
        |      (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
        |      AS rev
        |  FROM lineitem, part
        |  WHERE l_partkey = p_partkey
        |    AND l_shipdate >= TIMESTAMP '1996-09-01'
        |    AND l_shipdate < TIMESTAMP '1996-10-01')
        |SELECT (100.0 * promo_revenue_abs) / total_revenue AS promo_pct,
        |  total_revenue
        |FROM (
        |  SELECT
        |    CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev
        |      ELSE CAST(0 AS DECIMAL(30,2)) END) AS DOUBLE)
        |      AS promo_revenue_abs,
        |    CAST(SUM(rev) AS DOUBLE) AS total_revenue
        |  FROM j)""".stripMargin,

    "q_tpch_q4" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_tpch_q12" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem, orders
        |WHERE l_orderkey = o_orderkey
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  sum_qty
        |FROM orders, customer,
        |  (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
        |   FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300) big
        |WHERE o_orderkey = big.l_orderkey AND o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q_tpch_q7" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(SUM(rev) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
        |    CAST(l_extendedprice AS DECIMAL(30,2)) *
        |      (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
        |      AS rev
        |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
        |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        |    AND c_nationkey = n2.n_nationkey
        |    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        |    AND l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01') shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q_tpch_q13" ->
      """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM (
        |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(30,2)) *
        |      (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |      AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM rev, supplier
        |WHERE l_suppkey = s_suppkey
        |  AND total_rev = (SELECT MAX(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q_tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        |  AND p_brand <> 'Brand#5' AND p_type <> 'MEDIUM'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q_tpch_q17" ->
      """WITH li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem, part
        |  WHERE l_partkey = p_partkey AND p_brand = 'Brand#5'),
        |avgq AS (
        |  SELECT l_partkey AS ap_partkey,
        |    SUM(l_quantity) / COUNT(l_quantity) AS avg_qty
        |  FROM li GROUP BY l_partkey)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE)
        |    / 7.0 AS avg_yearly
        |FROM li, avgq
        |WHERE l_partkey = ap_partkey AND l_quantity < 0.2 * avg_qty""".stripMargin,

    "q_tpch_q19" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2)) *
        |    (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |    AS DOUBLE) AS revenue
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        |  AND l_quantity >= 1 AND l_quantity <= 30
        |  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
        |      AND l_quantity <= 11)
        |    OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
        |      AND l_quantity BETWEEN 10 AND 20)
        |    OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |      AND l_quantity >= 20))""".stripMargin,

    "q_tpch_q21" ->
      """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM supplier, nation, lineitem l1, orders
        |WHERE s_nationkey = n_nationkey AND n_name = 'NATION_3'
        |  AND l1.l_suppkey = s_suppkey AND l1.l_orderkey = o_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,

    "q_tpch_q22" ->
      """SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE c_nationkey IN (1, 3, 5, 7, 9)
        |  AND c_acctbal > (
        |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE)
        |      / COUNT(c_acctbal)
        |    FROM customer
        |    WHERE c_nationkey IN (1, 3, 5, 7, 9) AND c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q_tpch_q2" ->
      """WITH cand AS (
        |  SELECT p_partkey, s_name, s_acctbal, n_name
        |  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs,
        |    part, supplier, nation, region
        |  WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
        |    AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |    AND p_size = 9 AND p_type = 'LARGE' AND r_name = 'EUROPE')
        |SELECT s_acctbal, s_name, n_name, p_partkey
        |FROM cand c
        |WHERE s_acctbal = (SELECT MIN(s_acctbal) FROM cand m
        |                   WHERE m.p_partkey = c.p_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    "q_tpch_q8" ->
      """SELECT o_year,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_4' THEN rev
        |    ELSE CAST(0 AS DECIMAL(30,2)) END) AS DOUBLE)
        |    / CAST(SUM(rev) AS DOUBLE) AS mkt_share
        |FROM (
        |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(30,2)) *
        |      (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
        |      AS rev,
        |    n2.n_name AS supp_nation
        |  FROM lineitem, orders, customer, supplier, part,
        |    nation n1, nation n2, region
        |  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |    AND c_nationkey = n1.n_nationkey
        |    AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
        |    AND l_suppkey = s_suppkey AND s_nationkey = n2.n_nationkey
        |    AND l_partkey = p_partkey AND p_type = 'PROMO'
        |    AND o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate <= TIMESTAMP '1996-12-31') all_nations
        |GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q_tpch_q9" ->
      """SELECT nation, o_year, CAST(SUM(profit) AS DOUBLE) AS sum_profit
        |FROM (
        |  SELECT n_name AS nation,
        |    CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(30,2)) *
        |      (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
        |    - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.5 AS DECIMAL(2,1))
        |      * CAST(l_quantity AS DECIMAL(12,2)) AS profit
        |  FROM lineitem, orders, part, supplier, nation
        |  WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
        |    AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |    AND p_name LIKE '%gear%') profit
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin,

    "q_tpch_q11" ->
      """WITH v AS (
        |  SELECT l_partkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS value
        |  FROM lineitem, supplier, nation
        |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |    AND n_name = 'NATION_3'
        |  GROUP BY l_partkey)
        |SELECT l_partkey, CAST(value AS DOUBLE) AS part_value
        |FROM v
        |WHERE value > (SELECT SUM(value) * CAST(0.001 AS DECIMAL(4,3)) FROM v)
        |ORDER BY part_value DESC, l_partkey""".stripMargin,

    "q_tpch_q20" ->
      """SELECT s_suppkey, s_name
        |FROM supplier, nation
        |WHERE s_nationkey = n_nationkey AND n_name = 'NATION_3'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem, part
        |    WHERE l_partkey = p_partkey AND p_name LIKE 'small%'
        |      AND l_shipdate >= TIMESTAMP '1997-01-01'
        |      AND l_shipdate < TIMESTAMP '1999-01-01'
        |    GROUP BY l_suppkey, l_partkey
        |    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) > 40)
        |ORDER BY s_name""".stripMargin,

    "q_groupby_topk" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(rk AS INT) AS rk
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) t
        |WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin,

    "q_groupby_agg" ->
      """SELECT o_orderpriority,
        |  COUNT(*) AS n,
        |  MIN(o_totalprice) AS min_price,
        |  MAX(o_totalprice) AS max_price,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
        |    / COUNT(o_totalprice) AS mean_price
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_groupby_first_last" ->
      """SELECT l_returnflag,
        |  arg_min(l_extendedprice, l_orderkey*10 + l_linenumber) AS first_price,
        |  arg_max(l_extendedprice, l_orderkey*10 + l_linenumber) AS last_price,
        |  arg_min(l_quantity, l_orderkey*10 + l_linenumber) AS first_qty,
        |  arg_max(l_quantity, l_orderkey*10 + l_linenumber) AS last_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q_groupby_var_std" ->
      """WITH s AS (SELECT o_orderpriority,
        |    CAST(COUNT(o_totalprice) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
        |             * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s2
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority,
        |  ROUND((s2 - s1*s1/n) / (n - 1.0), 2) AS var_price,
        |  ROUND(SQRT((s2 - s1*s1/n) / (n - 1.0)), 6) AS std_price
        |FROM s ORDER BY o_orderpriority""".stripMargin,

    "q_groupby_median" ->
      """SELECT c_mktsegment,
        |  ROUND(quantile_cont(c_acctbal, 0.5), 6) AS median_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_groupby_quantile" ->
      """SELECT c_mktsegment,
        |  ROUND(quantile_cont(c_acctbal, 0.25), 6) AS q25_bal,
        |  ROUND(quantile_cont(c_acctbal, 0.75), 6) AS q75_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_groupby_idxmax" ->
      """WITH base AS (SELECT l_returnflag, l_orderkey, l_linenumber,
        |    l_quantity FROM lineitem),
        |mx AS (SELECT l_returnflag, 'idxmax' AS which, l_orderkey,
        |    l_linenumber, l_quantity FROM base
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |    ORDER BY l_quantity DESC, l_orderkey, l_linenumber) = 1),
        |mn AS (SELECT l_returnflag, 'idxmin' AS which, l_orderkey,
        |    l_linenumber, l_quantity FROM base
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |    ORDER BY l_quantity ASC, l_orderkey, l_linenumber) = 1)
        |SELECT * FROM mx UNION ALL SELECT * FROM mn
        |ORDER BY l_returnflag, which""".stripMargin,

    "q_groupby_prod" ->
      """SELECT l_orderkey,
        |  PRODUCT(l_quantity % 5 + 1) AS prod_qm,
        |  COUNT(*) AS n_lines
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "q_pivot" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_linestatus = 'F'
        |    THEN CAST(l_quantity AS DECIMAL(30,2)) END) AS DOUBLE) AS "F",
        |  CAST(SUM(CASE WHEN l_linestatus = 'O'
        |    THEN CAST(l_quantity AS DECIMAL(30,2)) END) AS DOUBLE) AS "O"
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q_salted_agg" ->
      """SELECT l_returnflag, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_v
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q_groupby_transform" ->
      """WITH t AS (SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,2)))
        |      OVER (PARTITION BY l_returnflag) AS DOUBLE)
        |    / COUNT(l_quantity) OVER (PARTITION BY l_returnflag) AS gm
        |FROM lineitem)
        |SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
        |  ROUND(gm, 6) AS grp_mean_qty,
        |  ROUND(l_quantity - gm, 6) AS demeaned
        |FROM t ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_melt" ->
      """SELECT l_orderkey, l_linenumber, 'qty' AS variable,
        |  l_quantity AS value FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'price', l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, variable""".stripMargin,

    "q_groupby_multi_key" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sq
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |HAVING COUNT(*) > 10
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
