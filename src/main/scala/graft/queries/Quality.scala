package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

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
      val joined = o.join(broadcast(custKeys),
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
