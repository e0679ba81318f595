package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions._

/** SURVEY §2.9 datetime surface.
  *
  * Reference: `Timestamp.year/month/day/hour/...` field extraction
  * (`sdc/hiframes/pd_timestamp_ext.py:119-135`), datetime comparisons and
  * DatetimeIndex min/max (`sdc/tests/test_date.py:50-175`), `parse_dates`
  * in read_csv. All map to codegen'd `year/month/dayofmonth/hour/minute/
  * second/date_trunc` over native TimestampType.
  */
object Datetime {

  val queries: Map[String, Q] = Map(
    // pandas df.between_time('09:00', '17:00') (inclusive='both'):
    // time-of-day filter independent of the date. The condition is the
    // epoch-microsecond remainder mod one day — pure long arithmetic,
    // no hour/minute decomposition edge cases, identical on both
    // engines (ts is post-1970, so the remainder is non-negative).
    // A pure pushable filter: nothing shuffles.
    "q_between_time" -> ((s, dir) => {
      val tod = pmod(unix_micros(col("ts")), lit(86400000000L))
      Tables(s, dir, "events")
        .filter(tod.between(lit(9L * 3600000000L), lit(17L * 3600000000L)))
        .select(col("event_id"), col("ts"), col("user_id"))
        .orderBy(col("event_id"))
    }),

    // pandas MonthEnd offset parity: the month-end date, days to it,
    // and an is-month-end flag — pure date-arithmetic projection
    // (last_day is exact calendar math on both engines, no timezone).
    "q_dt_month_end" -> ((s, dir) => {
      val d = col("o_orderdate").cast("date")
      Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          last_day(d).as("month_end"),
          datediff(last_day(d), d).cast("int").as("days_to_me"),
          (d === last_day(d)).cast("int").as("is_month_end"))
        .orderBy(col("o_orderkey"))
    }),

    // field extraction
    "q_dt_fields" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          quarter(col("o_orderdate")).as("q"))
        .orderBy(col("o_orderkey"))
    }),

    // range filter + min/max reduction over timestamps
    "q_dt_filter_minmax" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .agg(count(lit(1)).as("n"),
          min(col("l_shipdate")).as("min_ship"),
          max(col("l_shipdate")).as("max_ship"))
    }),

    // truncate-to-month rollup (time-bucketed aggregation)
    "q_dt_trunc_month" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("revenue"))
        .orderBy(col("month"))
    }),

    // strftime-style formatting (pandas dt.strftime; numeric patterns
    // only — month/day NAMES are locale traps across engines)
    "q_dt_format" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          date_format(col("o_orderdate"), "yyyy/MM/dd").as("ymd"),
          date_format(col("o_orderdate"), "DDD").cast("int").as("doy"))
        .orderBy(col("o_orderkey"))
    }),

    // date arithmetic: days between ship date and a fixed epoch + add
    "q_dt_arith" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          datediff(col("l_shipdate"), lit("1992-01-01").cast("date"))
            .as("days_since"),
          date_add(col("l_shipdate").cast("date"), 30).cast("timestamp")
            .as("ship_plus30"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_dt_month_end" ->
      """SELECT o_orderkey,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |    last_day(CAST(o_orderdate AS DATE))) AS INT) AS days_to_me,
        |  CAST(CASE WHEN CAST(o_orderdate AS DATE) =
        |    last_day(CAST(o_orderdate AS DATE)) THEN 1 ELSE 0 END AS INT)
        |    AS is_month_end
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_between_time" ->
      """SELECT event_id, ts, user_id FROM events
        |WHERE epoch_us(ts) % 86400000000
        |  BETWEEN 9 * 3600000000 AND 17 * 3600000000
        |ORDER BY event_id""".stripMargin,

    "q_dt_fields" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(day(o_orderdate) AS INT) AS d,
        |  CAST(quarter(o_orderdate) AS INT) AS q
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_dt_filter_minmax" ->
      """SELECT COUNT(*) AS n, MIN(l_shipdate) AS min_ship,
        |  MAX(l_shipdate) AS max_ship
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'""".stripMargin,

    "q_dt_trunc_month" ->
      """SELECT date_trunc('month', o_orderdate) AS month,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,

    // ship_plus30 is TIMESTAMP (not DATE) on BOTH sides deliberately: the
    // reference's date + offset yields datetime64[ns] (pandas Timestamp at
    // midnight), so TIMESTAMP is the reference-faithful output type — the
    // oracle's cast mirrors that semantics rather than the implementation.
    "q_dt_format" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m') AS ym,
        |  strftime(o_orderdate, '%Y/%m/%d') AS ymd,
        |  CAST(strftime(o_orderdate, '%j') AS INT) AS doy
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_dt_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS INT)
        |    AS days_since,
        |  CAST(CAST(l_shipdate AS DATE) + 30 AS TIMESTAMP) AS ship_plus30
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
