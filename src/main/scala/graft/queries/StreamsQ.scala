package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.Streams

/** Structured Streaming queries (see graft.streaming.Streams). Each
  * streaming result is materialized from the memory sink after an
  * AvailableNow run, so the DuckDB oracle hash-checks the streaming
  * semantics themselves; the batch twins share the same oracle SQL. */
object StreamsQ {

  val queries: Map[String, Q] = Map(
    // file-source stream → watermark → tumbling window agg → sink
    "q_events_stream" -> ((s, dir) => Streams.eventsWindowed(s, dir)),

    // stateful sessionization, batch twin (windowed gap/cumsum per user)
    "q_sessionize" -> ((s, dir) =>
      Streams.sessionizeBatch(Tables(s, dir, "events"))
        .orderBy(col("user_id"), col("session_id"))),

    // the same sessions via flatMapGroupsWithState on the stream
    "q_sessionize_stream" -> ((s, dir) => Streams.sessionizeStream(s, dir)),

    // the same sessions a THIRD way: Spark's native session_window
    // aggregate (dynamic-gap session windows merged inside the
    // aggregation operator — one user-keyed shuffle, no window-lag
    // pass). The three-way agreement (gap/cumsum ≡ state fold ≡
    // native operator) is the strongest pin the session rule gets;
    // session_start ≡ window.start because the window opens at its
    // first event.
    "q_session_window_native" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("__w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("__w.start").as("session_start"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start"))),

    // streaming exact dedup: dropDuplicates state emits each distinct
    // (event_type, user_id) once; finishing pass counts per type
    "q_stream_dedup" -> ((s, dir) => Streams.dedupStream(s, dir)),

    // bounded-state dedup twin: dropDuplicatesWithinWatermark evicts key
    // state past the watermark delay (the 100 TB default — state scales
    // with ACTIVE keys, not the all-time key domain); evicted keys may
    // re-emit, so the finishing pass re-distincts before counting
    "q_stream_dedup_bounded" -> ((s, dir) => Streams.dedupStreamBounded(s, dir)),

    // stream-static join: per-batch broadcast hash join against the
    // customer dimension, then a stateful grouped count
    "q_stream_join" -> ((s, dir) => Streams.streamStaticJoin(s, dir)),

    // stream-stream inner join with watermark-bounded state on both
    // sides: purchases × trailing-hour clicks per user
    "q_stream_stream_join" -> ((s, dir) => Streams.clickAttribution(s, dir)),

    // streaming drift monitor: per-hour PSI of the value distribution
    // against the static baseline — fixed bins make PSI streamable;
    // the windowed counters are the only state
    "q_stream_drift" -> ((s, dir) => Streams.driftMonitor(s, dir)),

    // streaming data-quality monitor: per-hour violation counters
    // (value cap, null payloads, type domain, error-event rate) — the
    // Quality tier's constraints as watermark-evicted window state
    "q_stream_quality" -> ((s, dir) => Streams.qualityMonitor(s, dir)),

    // streaming ingestion gate: arriving docs contamination-scored
    // against the frozen train corpus in foreachBatch — zero streaming
    // state, exact under any batching (doc-local work); same answer as
    // the q_contamination batch sweep, same oracle
    "q_stream_contamination" -> ((s, dir) => Streams.contaminationIngest(s, dir)),

    // Burst suppression (debounce): keep only the FIRST event of each
    // (user, type) burst, where a burst is a chain of events each within
    // 30 min of its predecessor — the sessionization gap rule applied as
    // a dedup filter (log hygiene before attribution/counting: repeated
    // clicks from a stuck page collapse to one). The window partitions
    // by the (user, type) value key — an ordinary hash shuffle, state
    // bounded per key; never a global order. The micros comparison is
    // exact on both engines; (ts, event_id) is a total order so the lag
    // is deterministic under ties.
    "q_debounce" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .withColumn("__prev", lag(col("ts"), 1).over(w))
        .filter(col("__prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("__prev")) > 1800000000L)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
        .orderBy(col("event_id"))
    })
  )

  private val sessionSql =
    """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events),
      |g AS (SELECT user_id, event_id, ts,
      |  CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) IS NULL
      |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |       THEN 1 ELSE 0 END AS ns
      |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (SELECT user_id, ts,
      |  CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS session_id
      |FROM g)
      |SELECT user_id, session_id, MIN(ts) AS session_start,
      |  COUNT(*) AS n_events
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  private val windowSql =
    """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS win_start,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(ROUND(value, 3) AS DECIMAL(30,3))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_stream_drift" ->
      """WITH bb AS (SELECT LEAST(CAST(FLOOR(value / 50) AS INT), 9) AS bin
        |  FROM events),
        |base AS (SELECT bin, COUNT(*) AS cb FROM bb GROUP BY bin),
        |bt AS (SELECT CAST(SUM(cb) AS BIGINT) AS nb FROM base),
        |bl AS (SELECT bin, CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE) AS pb
        |  FROM base, bt),
        |wc AS (SELECT
        |    time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
        |      AS win_start,
        |    LEAST(CAST(FLOOR(value / 50) AS INT), 9) AS bin,
        |    COUNT(*) AS ca
        |  FROM events GROUP BY 1, 2),
        |wt AS (SELECT win_start, CAST(SUM(ca) AS BIGINT) AS na
        |  FROM wc GROUP BY win_start),
        |j AS (SELECT wc.win_start, wt.na, bl.pb,
        |    CAST(wc.ca AS DOUBLE) / CAST(wt.na AS DOUBLE) AS pa
        |  FROM wc JOIN wt USING (win_start) JOIN bl USING (bin)),
        |q AS (SELECT win_start, na,
        |    CAST(FLOOR(CASE WHEN pa > 0 AND pb > 0
        |      THEN (pa - pb) * ln(pa / pb) ELSE 0.0 END * 1e9 + 0.5)
        |      AS BIGINT) AS tq
        |  FROM j)
        |SELECT win_start, MAX(na) AS n,
        |  ROUND(CAST(SUM(tq) AS DOUBLE) / 1e9, 6) AS psi
        |FROM q GROUP BY win_start ORDER BY win_start""".stripMargin,

    "q_stream_quality" ->
      """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
        |    AS win_start,
        |  COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN value > 300.0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS value_over_cap,
        |  CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS value_nulls,
        |  CAST(SUM(CASE WHEN event_type NOT IN
        |    ('view', 'click', 'purchase', 'signup', 'error')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS type_out_of_domain,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_errors
        |FROM events GROUP BY 1 ORDER BY win_start""".stripMargin,

    "q_events_stream" -> windowSql,
    "q_sessionize" -> sessionSql,
    "q_sessionize_stream" -> sessionSql,
    // the native-operator twin drops session_id (the operator exposes
    // window bounds, not ordinals) — grouping is still per session.
    // Boundary: Spark session windows are CLOSED at the far end — an
    // event at exactly last+gap still merges (SessionWindowSpec pins
    // it) — so the new-session rule is the same strict > the
    // gap/cumsum twin uses.
    "q_session_window_native" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |g AS (SELECT user_id, event_id, ts,
        |  CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |       THEN 1 ELSE 0 END AS ns
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts,
        |  CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS session_id
        |FROM g)
        |SELECT user_id, MIN(ts) AS session_start,
        |  COUNT(*) AS n_events
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,
    "q_stream_dedup" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the bounded variant re-distincts after possible re-emissions;
    // equality with the exact distinct count additionally needs the
    // watermark delay to cover arrival disorder (here: a single-file
    // single-batch replay, so nothing is ever dropped as late — see
    // Streams.dedupStreamBounded's scaladoc for the trade)
    "q_stream_dedup_bounded" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_stream_join" ->
      """SELECT c_mktsegment, event_type, COUNT(*) AS n
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment, event_type
        |ORDER BY c_mktsegment, event_type""".stripMargin,
    // CAST(ts AS TIMESTAMP) truncates DuckDB's nanos to micros — the
    // same normalization the Spark reader applies (Tables/normalize)
    "q_stream_stream_join" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |    event_type FROM events)
        |SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id
        |FROM e p JOIN e c ON c.user_id = p.user_id
        |  AND p.event_type = 'purchase' AND c.event_type = 'click'
        |  AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
        |ORDER BY p.user_id, purchase_id, click_id""".stripMargin,

    // the ingestion gate computes exactly the batch contamination scan
    // (same splits, same shingles) — its oracle, verbatim
    "q_stream_contamination" -> Extras.oracle("q_contamination"),

    "q_debounce" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
        |    LAG(CAST(ts AS TIMESTAMP)) OVER (
        |      PARTITION BY user_id, event_type
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
        |  FROM events)
        |SELECT event_id, user_id, event_type, ts
        |FROM e
        |WHERE prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000
        |ORDER BY event_id""".stripMargin
  )
}
