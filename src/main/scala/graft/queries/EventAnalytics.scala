package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-analytics tier: CDC latest-wins upsert, SCD2 history
  * construction, funnel conversion, cohort retention, and Markov
  * transition counts — the warehouse queries an events table exists to
  * answer, and the mutation patterns (upsert, slowly-changing
  * dimensions) a lakehouse write path is built from. All windows
  * partition on user_id (high-cardinality — no reducer funnel); every
  * output is exact integers/timestamps or rounded doubles.
  */
object EventAnalytics {

  val queries: Map[String, Q] = Map(

    // CDC latest-wins upsert: the MERGE "take the newest version per
    // key" resolution, as one map-side rank-1 filter (WindowGroupLimit
    // — one survivor per key per mapper crosses the shuffle). The
    // deterministic version order is (ts, event_id): event_id is the
    // unique change sequence, so replays/retries resolve identically.
    "q_upsert_latest" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables(s, dir, "events")
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"),
          round(col("value"), 6).as("value"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // SCD2 history: each change row becomes an effective-dated version
    // [valid_from, valid_to) with valid_to = next change's ts (null =
    // current). One lead() over the per-key change order — the window
    // rides a user_id shuffle; nothing global. This is the batch
    // construction of a slowly-changing dimension from a change log.
    "q_scd2" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts").as("valid_from"),
          round(col("value"), 6).as("value"))
        .withColumn("valid_to",
          lead(col("valid_from"), 1).over(Window.partitionBy(col("user_id"))
            .orderBy(col("valid_from"), col("event_id"))))
        .withColumn("is_current", col("valid_to").isNull)
        .orderBy(col("user_id"), col("valid_from"), col("event_id"))
    }),

    // Funnel conversion view→click→purchase: stage k's entry time is
    // the user's FIRST stage-k event at-or-after their stage-(k−1)
    // entry. Each stage is one filtered agg + one user-keyed join —
    // three key-appropriate shuffles, no window over the raw stream,
    // conditional semantics exact under any partitioning. Output is
    // the 1-row funnel report.
    "q_funnel" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      def stage(etype: String) = ev.filter(col("event_type") === etype)
      val v = stage("view").groupBy(col("user_id"))
        .agg(min(col("ts")).as("t_view"))
      val c = stage("click").join(v, "user_id")
        .filter(col("ts") >= col("t_view"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
      val p = stage("purchase").join(c, "user_id")
        .filter(col("ts") >= col("t_click"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .agg(count(col("t_view")).as("n_view"),
          count(col("t_click")).as("n_click"),
          count(col("t_purchase")).as("n_purchase"))
    }),

    // Cohort retention: cohort = the user's first-activity week,
    // cell (cohort_week, week_offset) = distinct users from that
    // cohort active offset weeks later. Two hash aggs (first-week per
    // user; distinct (user, week)) joined on user — the join key IS
    // the agg key, so one user shuffle serves both sides; the matrix
    // agg is over the tiny (cohort, offset) domain.
    "q_retention" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      val weeks = ev.distinct()
      val cohort = weeks.groupBy(col("user_id"))
        .agg(min(col("wk")).as("cohort_wk"))
      weeks.join(cohort, "user_id")
        .select(col("cohort_wk").cast("date").as("cohort_week"),
          floor(datediff(col("wk"), col("cohort_wk")) / 7).cast("int")
            .as("week_offset"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    // Markov transition counts: (previous event_type → event_type)
    // frequencies over each user's timeline — the session-mining
    // primitive behind next-action models. One lag() riding the
    // user_id shuffle, then a hash agg on the tiny transition domain.
    "q_transition_counts" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("prev_type"), col("event_type"))
    })
  )

  val oracle: Map[String, String] = Map(

    "q_upsert_latest" ->
      """SELECT user_id, event_type, event_id, ROUND(value, 6) AS value
        |FROM events
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |  ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id, event_type""".stripMargin,

    "q_scd2" ->
      """SELECT user_id, event_id,
        |  CAST(ts AS TIMESTAMP) AS valid_from,
        |  ROUND(value, 6) AS value,
        |  LEAD(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS valid_to,
        |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    IS NULL AS is_current
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id, valid_from, event_id""".stripMargin,

    "q_funnel" ->
      """WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts) AS t_click
        |  FROM events e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= v.t_view
        |  GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
        |  FROM events e JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
        |  GROUP BY e.user_id)
        |SELECT COUNT(v.t_view) AS n_view, COUNT(c.t_click) AS n_click,
        |  COUNT(p.t_purchase) AS n_purchase
        |FROM v LEFT JOIN c ON c.user_id = v.user_id
        |       LEFT JOIN p ON p.user_id = v.user_id""".stripMargin,

    "q_retention" ->
      """WITH weeks AS (SELECT DISTINCT user_id,
        |    date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk FROM events),
        |cohort AS (SELECT user_id, MIN(wk) AS cohort_wk
        |  FROM weeks GROUP BY user_id)
        |SELECT CAST(c.cohort_wk AS DATE) AS cohort_week,
        |  CAST(FLOOR(datediff('day', CAST(c.cohort_wk AS DATE),
        |    CAST(w.wk AS DATE)) / 7.0) AS INT) AS week_offset,
        |  COUNT(*) AS n_users
        |FROM weeks w JOIN cohort c ON c.user_id = w.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_transition_counts" ->
      """WITH lagged AS (SELECT event_type,
        |  LAG(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |SELECT prev_type, event_type, COUNT(*) AS n
        |FROM lagged WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, event_type
        |ORDER BY prev_type, event_type""".stripMargin
  )
}
