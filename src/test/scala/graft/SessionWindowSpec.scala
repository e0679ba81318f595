package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Pins the native session_window operator against the gap/cumsum
  * sessionizer, including the half-open boundary the two rules differ
  * on only at EXACTLY the gap duration. */
class SessionWindowSpec extends SparkSpecBase {
  import spark.implicits._

  private def ev(uid: Long, sec: Long): (Long, Long, Timestamp) =
    (uid, sec, new Timestamp(sec * 1000L))

  private def nativeSessions(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("start"), col("n"))
      .orderBy(col("user_id"), col("start"))
      .as[(Long, Timestamp, Long)].collect().toSeq

  test("session_window merges at exactly the gap, splits just past it") {
    val base = 1700000000L
    val df = Seq(
      ev(1, base), ev(1, base + 1800),          // exactly 30m → still merged
      ev(1, base + 1800 + 1801),                // 30m+1s later → new session
      ev(2, base), ev(2, base + 1801))          // just past the gap → split
      .toDF("user_id", "event_id", "ts")
    val got = nativeSessions(df)
    assert(got.map(r => (r._1, r._3)) == Seq((1L, 2L), (1L, 1L), (2L, 1L), (2L, 1L)))
  }

  test("native session_window agrees with the gap/cumsum twin on events") {
    val events = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("ts"))
    val native = nativeSessions(events)
    val twin = Streams.sessionizeBatch(events)
      .select(col("user_id"), col("session_start").as("start"),
        col("n_events").as("n"))
      .orderBy(col("user_id"), col("start"))
      .as[(Long, Timestamp, Long)].collect().toSeq
    // The fixture has no exact-30-minute gap (microsecond timestamps),
    // so the > and >= rules agree and the session sets must be equal.
    assert(native == twin && native.nonEmpty)
  }
}
