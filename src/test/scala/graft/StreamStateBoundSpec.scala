package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Streams

/** Watermark-bounded STATE-SIZE evidence (VERDICT r10 #6): the bounded
  * streaming claims (q_stream_dedup_bounded, q_stream_stream_join) had
  * correctness witnesses but no measured state growth. Here each core
  * is replayed over ≥12 micro-batches of steadily ADVANCING event time
  * (a MemoryStream drives one batch per addData), the per-batch
  * StreamingQueryProgress `stateOperators` metrics (rows + bytes) are
  * recorded, and the series must PLATEAU: the watermark evicts old
  * state as fast as new batches add it, so late-replay state stays at
  * the level set by the lateness horizon — while cumulative input
  * grows linearly. An unbounded operator (dropDuplicates without
  * watermark, an un-ranged join) fails the <40%-of-fed bound
  * immediately at this batch count.
  *
  * Optionally dumps the measured series as a JSON artifact when
  * SPARK_GRAFT_STREAM_STATE_OUT is set (the committed
  * STREAM_STATE.json snapshot).
  */
class StreamStateBoundSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(hour: Int, i: Int): java.sql.Timestamp =
    new java.sql.Timestamp(3600000L * hour + 1000L * i)

  /** Drive `stream` one micro-batch per `batches(i)`, returning per-batch
    * (state rows, state bytes) sums over all stateful operators. */
  private def replay[A](src: MemoryStream[A],
                        out: org.apache.spark.sql.DataFrame,
                        batches: Seq[Seq[A]], name: String): Seq[(Long, Long)] = {
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.map { b =>
        src.addData(b)
        q.processAllAvailable()
        val ops = q.lastProgress.stateOperators
        (ops.map(_.numRowsTotal).sum, ops.map(_.memoryUsedBytes).sum)
      }
    } finally q.stop()
  }

  private def assertPlateau(series: Seq[(Long, Long)], fedRows: Long,
                            what: String): Unit = {
    assert(series.length >= 12, s"$what: expected >=12 batches")
    val rows = series.map(_._1)
    // eviction witnessed: final state is a small fraction of everything fed
    assert(rows.last < 0.4 * fedRows,
      s"$what: final state ${rows.last} rows is not bounded vs $fedRows fed")
    // plateau: the late-replay peak does not exceed the warm-up peak —
    // state reached its watermark-set level and stayed there
    val warm = rows.slice(3, 7).max
    val late = rows.drop(7).max
    assert(late <= warm * 1.5 + 4,
      s"$what: state still growing late in the replay " +
        s"(warm peak $warm, late peak $late; series=$rows)")
  }

  /** JSON-lines artifact: one {"op", "series"} object per replay.
    * The file is truncated by this JVM's FIRST dump — appending across
    * suite re-runs would accumulate duplicate series objects in the
    * committed artifact (ADVICE r11); within one run each test appends
    * its own op line. */
  private val dumpTruncated = new java.util.concurrent.atomic.AtomicBoolean()
  private def maybeDump(tag: String, series: Seq[(Long, Long)]): Unit =
    sys.env.get("SPARK_GRAFT_STREAM_STATE_OUT").foreach { path =>
      val line = series.map { case (r, b) => s"""{"rows":$r,"bytes":$b}""" }
        .mkString(s"""{"op": "$tag", "series": [""", ",", "]}")
      val f = java.nio.file.Paths.get(path)
      val prev =
        if (!dumpTruncated.compareAndSet(false, true) &&
            java.nio.file.Files.exists(f))
          new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
        else ""
      java.nio.file.Files.write(f, (prev + line + "\n").getBytes("UTF-8"))
    }

  test("dropDuplicatesWithinWatermark state plateaus over a 14-batch replay") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(String, Long, java.sql.Timestamp)]
    val df = src.toDF().toDF("event_type", "user_id", "ts")
    val out = Streams.dedupStreamBoundedCore(df, "1 hour")
    // batch h carries 40 keys unique to hour h (plus 10 re-arrivals of
    // the previous hour's keys — suppressed by state, not re-emitted);
    // event time advances one hour per batch, so the 1-hour watermark
    // evicts keys two hours back while each batch adds 40
    val batches = (0 until 14).map { h =>
      val fresh = (0 until 40).map(i => ("click", h * 1000L + i, ts(h, i)))
      val rearrive = (0 until 10).map(i => ("click", (h - 1).max(0) * 1000L + i,
        ts(h, 100 + i)))
      fresh ++ rearrive
    }
    val series = replay(src, out, batches, "state_dedup_sink")
    maybeDump("dedup_bounded", series)
    assertPlateau(series, batches.map(_.size).sum.toLong, "bounded dedup")
  }

  test("stream-stream interval join state plateaus over a 14-batch replay") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(String, Long, Long, java.sql.Timestamp)]
    val df = src.toDF().toDF("event_type", "user_id", "event_id", "ts")
    val out = Streams.clickAttributionStream(df, "1 hour")
    // per hour-batch: 30 clicks then 10 purchases by the same users a
    // few minutes later (each joins the in-range clicks); event time
    // advances hourly, so click/purchase state beyond the 1-hour
    // lateness + 1-hour join range evicts while input grows linearly
    val batches = (0 until 14).map { h =>
      val clicks = (0 until 30).map(i =>
        ("click", (i % 10).toLong, h * 10000L + i, ts(h, 60 + i)))
      val purchases = (0 until 10).map(i =>
        ("purchase", i.toLong, h * 10000L + 500 + i, ts(h, 600 + i)))
      clicks ++ purchases
    }
    val series = replay(src, out, batches, "state_join_sink")
    maybeDump("stream_stream_join", series)
    assertPlateau(series, batches.map(_.size).sum.toLong, "stream-stream join")
  }
}
