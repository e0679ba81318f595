package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.GlobalOrder

/** Frame-algebra fills: pandas merge_ordered / combine_first, the
  * whole-frame nunique, and the remaining str transform trio
  * (translate / repeat / slice_replace). Reference anchors: merge at
  * `sdc/datatypes/hpat_pandas_functions.py` merge family;
  * str ops at `hpat_pandas_series_functions.py` str.* section —
  * merge_ordered/combine_first are parity-plus everyday pandas.
  */
object Reshape {

  val queries: Map[String, Q] = Map(

    // pd.concat([orders.o_totalprice, customer.c_acctbal], axis=1):
    // positional (index-free) column concatenation of two frames of
    // DIFFERENT lengths — outer on the positional index, null-padding
    // the shorter side, exactly pandas' RangeIndex alignment. Each
    // side's global position comes from the two-pass range-partitioned
    // row number (no single-partition window); the align is then a
    // plain equi-join on pos. At scale both sides shuffle once on pos —
    // the unavoidable cost of positional semantics on unordered
    // storage, and the reason axis=1 concat of co-partitioned data
    // should ride a shared sort key instead (see q_bucketed_join).
    "q_concat_axis1" -> ((s, dir) => {
      val a = GlobalOrder.withRowNumberLong(
          Tables(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice")),
          Seq(col("o_orderkey")), "pos")
        .select(col("pos"), col("o_totalprice"))
      val b = GlobalOrder.withRowNumberLong(
          Tables(s, dir, "customer").select(col("c_custkey"), col("c_acctbal")),
          Seq(col("c_custkey")), "pos")
        .select(col("pos"), col("c_acctbal"))
      a.join(b, Seq("pos"), "full_outer").orderBy(col("pos"))
    }),

    // pd.merge_ordered(left, right, on='day', fill_method='ffill'):
    // ordered full outer merge of two daily series, forward-filling
    // both value columns. Both inputs are ALREADY day-aggregated (one
    // day-keyed shuffle each at any corpus size), so the merged spine
    // is calendar-scale — the two ffill range passes run on days, not
    // rows. The fixture's order dates (1990s) and event dates (2024)
    // are disjoint, so the merge exercises the long all-null prefix /
    // suffix that the ffill carry chain exists for.
    "q_merge_ordered" -> ((s, dir) => {
      val l = Tables(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n_orders"))
      val r = Tables(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(round(col("value"), 3).cast(DecimalType(30, 3)))
          .cast("double").as("sum_value"))
      val merged = l.join(r, Seq("day"), "full_outer")
      val f1 = GlobalOrder.withFfill(merged, Seq(col("day")),
        col("n_orders"), "n_orders_ff")
      GlobalOrder.withFfill(f1, Seq(col("day")),
          col("sum_value"), "sum_value_ff")
        .select(col("day"), col("n_orders_ff"), col("sum_value_ff"))
        .orderBy(col("day"))
    }),

    // df.combine_first(other): keep the caller's value where present,
    // fall back to other's — a full outer key join + one coalesce per
    // column. 'F'-status prices overlaid on a half-price fallback
    // covering every order: every row of either side survives.
    "q_combine_first" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val left = o.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_totalprice").as("__p1"))
      val right = o
        .select(col("o_orderkey"), (col("o_totalprice") / 2).as("__p2"))
      left.join(right, Seq("o_orderkey"), "full_outer")
        .select(col("o_orderkey"),
          coalesce(col("__p1"), col("__p2")).as("price"),
          col("__p1").isNotNull.as("from_self"))
        .orderBy(col("o_orderkey"))
    }),

    // df.nunique(): distinct count of EVERY column in one statement.
    // Spark plans multi-distinct via expand (one pass, grouping-id
    // tagged partials) — no per-column re-scan.
    "q_nunique_all" -> ((s, dir) => {
      Tables(s, dir, "orders").agg(
        countDistinct(col("o_orderkey")).as("u_orderkey"),
        countDistinct(col("o_custkey")).as("u_custkey"),
        countDistinct(col("o_orderstatus")).as("u_orderstatus"),
        countDistinct(col("o_totalprice")).as("u_totalprice"),
        countDistinct(col("o_orderpriority")).as("u_orderpriority"))
    }),

    // pandas pivot_table(index, columns, values, aggfunc='sum',
    // margins=True): the detail grid as conditional exact-decimal sums
    // (a static column set — no dynamic pivot pass over the data to
    // discover keys), the margin row as the SAME aggregate without the
    // grouping key, unioned in. Two map-side-combining passes over the
    // source; the margin row costs a 1-row aggregate, not a cube.
    "q_pivot_margins" -> ((s, dir) => {
      val price = col("o_totalprice").cast(DecimalType(30, 2))
      def cell(st: String) =
        sum(when(col("o_orderstatus") === st, price)).cast("double")
      val o = Tables(s, dir, "orders")
      val detail = o.groupBy(col("o_orderpriority"))
        .agg(cell("F").as("f_sum"), cell("O").as("o_sum"),
          cell("P").as("p_sum"), sum(price).cast("double").as("all_sum"))
      val margin = o.agg(cell("F").as("f_sum"), cell("O").as("o_sum"),
          cell("P").as("p_sum"), sum(price).cast("double").as("all_sum"))
        .withColumn("o_orderpriority", lit("All"))
        .select(detail.columns.map(col): _*)
      detail.unionByName(margin)
        .orderBy((col("o_orderpriority") === "All").cast("int"),
          col("o_orderpriority"))
    }),

    // df.stack(): wide → long with the index carried — one codegen
    // `stack` generator (rows multiply in-stage, no shuffle), columns
    // coerced to the common double type exactly as pandas coerces to a
    // common dtype. The inverse (unstack/wide) is the pivot family
    // above; non-null fixture columns make dropna moot.
    "q_stack" -> ((s, dir) => {
      Tables(s, dir, "customer")
        .select(col("c_custkey"), expr(
          "stack(2, 'acctbal', CAST(c_acctbal AS DOUBLE), " +
            "'nationkey', CAST(c_nationkey AS DOUBLE)) AS (variable, value)"))
        .orderBy(col("c_custkey"), col("variable"))
    }),

    // str.translate / str.repeat / str.slice_replace — pure
    // projections; slice_replace is the substr composition (pandas
    // s.str.slice_replace(1, 3, 'XX')) spelled identically on both
    // engines.
    "q_str_translate" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          translate(substring(col("text"), 1, 30), "aeiou", "AEIOU")
            .as("t_vowels"),
          repeat(col("lang"), 2).as("lang2"),
          concat(substring(col("source"), 1, 1), lit("XX"),
            substring(col("source"), 4, 1000)).as("src_spliced"))
        .orderBy(col("doc_id"))
    }))

  val oracle: Map[String, String] = Map(
    // unpivot spelled as the UNION ALL normal form
    "q_stack" ->
      """SELECT c_custkey, variable, value FROM (
        |  SELECT c_custkey, 'acctbal' AS variable,
        |    CAST(c_acctbal AS DOUBLE) AS value FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE)
        |  FROM customer)
        |ORDER BY c_custkey, variable""".stripMargin,

    "q_concat_axis1" ->
      """WITH a AS (SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS pos,
        |    o_totalprice FROM orders),
        |b AS (SELECT ROW_NUMBER() OVER (ORDER BY c_custkey) AS pos,
        |    c_acctbal FROM customer)
        |SELECT COALESCE(a.pos, b.pos) AS pos, o_totalprice, c_acctbal
        |FROM a FULL OUTER JOIN b ON a.pos = b.pos
        |ORDER BY pos""".stripMargin,

    "q_merge_ordered" ->
      """WITH l AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |             COUNT(*) AS n_orders FROM orders GROUP BY 1),
        |r AS (SELECT CAST(ts AS DATE) AS day,
        |        CAST(SUM(CAST(ROUND(value, 3) AS DECIMAL(30,3))) AS DOUBLE)
        |          AS sum_value
        |      FROM events GROUP BY 1),
        |m AS (SELECT COALESCE(l.day, r.day) AS day, l.n_orders, r.sum_value
        |      FROM l FULL OUTER JOIN r ON l.day = r.day)
        |SELECT day,
        |  CAST(LAST_VALUE(n_orders IGNORE NULLS) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_orders_ff,
        |  LAST_VALUE(sum_value IGNORE NULLS) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_value_ff
        |FROM m ORDER BY day""".stripMargin,

    "q_combine_first" ->
      """WITH l AS (SELECT o_orderkey, o_totalprice AS p1 FROM orders
        |           WHERE o_orderstatus = 'F'),
        |r AS (SELECT o_orderkey, o_totalprice / 2 AS p2 FROM orders)
        |SELECT COALESCE(l.o_orderkey, r.o_orderkey) AS o_orderkey,
        |  COALESCE(l.p1, r.p2) AS price,
        |  l.p1 IS NOT NULL AS from_self
        |FROM l FULL OUTER JOIN r ON l.o_orderkey = r.o_orderkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_nunique_all" ->
      """SELECT
        |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS u_orderkey,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS u_custkey,
        |  CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS u_orderstatus,
        |  CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS u_totalprice,
        |  CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS u_orderpriority
        |FROM orders""".stripMargin,

    "q_pivot_margins" ->
      """WITH cells AS (
        |  SELECT o_orderpriority,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F'
        |      THEN CAST(o_totalprice AS DECIMAL(30,2)) END) AS DOUBLE) AS f_sum,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'O'
        |      THEN CAST(o_totalprice AS DECIMAL(30,2)) END) AS DOUBLE) AS o_sum,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'P'
        |      THEN CAST(o_totalprice AS DECIMAL(30,2)) END) AS DOUBLE) AS p_sum,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS all_sum
        |  FROM orders GROUP BY o_orderpriority
        |  UNION ALL
        |  SELECT 'All',
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F'
        |      THEN CAST(o_totalprice AS DECIMAL(30,2)) END) AS DOUBLE),
        |    CAST(SUM(CASE WHEN o_orderstatus = 'O'
        |      THEN CAST(o_totalprice AS DECIMAL(30,2)) END) AS DOUBLE),
        |    CAST(SUM(CASE WHEN o_orderstatus = 'P'
        |      THEN CAST(o_totalprice AS DECIMAL(30,2)) END) AS DOUBLE),
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
        |  FROM orders)
        |SELECT * FROM cells
        |ORDER BY CAST(o_orderpriority = 'All' AS INT), o_orderpriority""".stripMargin,

    "q_str_translate" ->
      """SELECT doc_id,
        |  translate(substr(text, 1, 30), 'aeiou', 'AEIOU') AS t_vowels,
        |  repeat(lang, 2) AS lang2,
        |  substr(source, 1, 1) || 'XX' || substr(source, 4, 1000)
        |    AS src_spliced
        |FROM documents ORDER BY doc_id""".stripMargin)
}
