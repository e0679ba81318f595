package graft

import java.sql.Timestamp

import graft.streaming.Streams

/** Streaming twins must agree with batch; session folding hand-checked. */
class StreamsSpec extends SparkSpecBase {

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("foldSessions splits on >30min gaps and counts events") {
    val events = Iterator(
      Streams.Event(7L, 1L, ts(0)), Streams.Event(7L, 2L, ts(10)),
      Streams.Event(7L, 3L, ts(45)), // 35min gap -> new session
      Streams.Event(7L, 4L, ts(46)))
    val got = Streams.foldSessions(7L, events).toSeq
    assert(got == Seq(
      Streams.Session(7L, 1, ts(0), 2L),
      Streams.Session(7L, 2, ts(45), 2L)))
  }

  test("a gap of exactly 30min does NOT split (strict > contract)") {
    val events = Iterator(
      Streams.Event(1L, 1L, ts(0)), Streams.Event(1L, 2L, ts(30)))
    assert(Streams.foldSessions(1L, events).toSeq ==
      Seq(Streams.Session(1L, 1, ts(0), 2L)))
  }

  test("streaming sessionization equals the batch twin") {
    val stream = Streams.sessionizeStream(spark, sf)
    val batch = Streams.sessionizeBatch(Tables(spark, sf, "events"))
    assert(stream.count() > 0)
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }

  test("streaming windowed agg equals the batch windowed agg") {
    val stream = Streams.eventsWindowed(spark, sf)
    val batch = SparkEntry.queries("q_events_window")(spark, sf)
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }
}
