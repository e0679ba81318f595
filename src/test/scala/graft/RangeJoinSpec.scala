package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin
import graft.queries.Joins

/** [[graft.operators.RangeJoin]] — the banded rewrite must (a) equal the
  * naive theta join exactly, including boundary and sub-second cases
  * that straddle a band edge, and (b) plan as an equi-join, never a
  * nested loop. */
class RangeJoinSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("banded join equals the naive theta join, boundaries inclusive") {
    import spark.implicits._
    // Points and intervals engineered around the 60 s band edges at
    // :00 — containment that crosses a band boundary, starts/ends
    // exactly ON a boundary, sub-second offsets, and non-matches.
    val points = Seq(
      (1L, ts("2024-01-01 00:00:59.999999")),
      (2L, ts("2024-01-01 00:01:00.0")),
      (3L, ts("2024-01-01 00:01:30.5")),
      (4L, ts("2024-01-01 00:02:00.000001")),
      (5L, ts("2024-01-01 00:05:00.0"))
    ).toDF("pid", "pts")
    val intervals = Seq(
      (10L, ts("2024-01-01 00:00:30.5"), ts("2024-01-01 00:01:30.5")),
      (11L, ts("2024-01-01 00:01:00.0"), ts("2024-01-01 00:02:00.0")),
      (12L, ts("2024-01-01 00:02:00.000001"), ts("2024-01-01 00:03:00.0")),
      (13L, ts("2024-01-01 00:04:00.0"), ts("2024-01-01 00:04:59.999999"))
    ).toDF("iid", "istart", "iend")

    val banded = RangeJoin.pointInInterval(points, col("pts"),
        intervals, col("istart"), col("iend"),
        bandSeconds = 60L, maxLenSeconds = 60L)
      .select(col("pid"), col("iid"))
    val naive = points.join(intervals,
        col("pts") >= col("istart") && col("pts") <= col("iend"))
      .select(col("pid"), col("iid"))

    val b = banded.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(n === Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 10L), (3L, 11L),
      (4L, 12L)), s"fixture drifted: $n")
    assert(b === n)
    // exactly-once: no dedup pass means no pair may appear twice
    assert(banded.count() === b.size)
  }

  test("banded equals naive on generated timelines across band widths") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    def samples[A](g: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7042L + i)))
    val cases = samples(
      for {
        pts <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 7200L * 1000000L))
        ivs <- Gen.nonEmptyListOf(for {
          s <- Gen.chooseNum(0L, 7200L * 1000000L)
          len <- Gen.chooseNum(0L, 60L * 1000000L) // ≤ 60 s, micros
        } yield (s, s + len))
      } yield (pts.distinct, ivs.distinct), 4)
    for (((pts, ivs), ci) <- cases.zipWithIndex) {
      // build timestamps from micros so sub-ms digits survive
      val pointsM = pts.zipWithIndex
        .map { case (t, i) => (i.toLong, Timestamp.from(java.time.Instant.EPOCH.plusNanos(t * 1000))) }
        .toDF("pid", "pts")
      val intervalsM = ivs.zipWithIndex.map { case ((s, e), i) =>
        (i.toLong, Timestamp.from(java.time.Instant.EPOCH.plusNanos(s * 1000)),
          Timestamp.from(java.time.Instant.EPOCH.plusNanos(e * 1000)))
      }.toDF("iid", "istart", "iend")
      for (band <- Seq(60L, 600L)) {
        val banded = RangeJoin.pointInInterval(pointsM, col("pts"),
            intervalsM, col("istart"), col("iend"),
            bandSeconds = band, maxLenSeconds = 60L)
          .select(col("pid"), col("iid"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        val naive = pointsM.join(intervalsM,
            col("pts") >= col("istart") && col("pts") <= col("iend"))
          .select(col("pid"), col("iid"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        assert(banded.sorted.toSeq === naive.sorted.toSeq,
          s"case $ci band $band: banded ${banded.length} vs naive ${naive.length}")
      }
    }
  }

  test("q_range_join plans no nested loop (rank probes, no candidate pairs)") {
    val df = Joins.queries("q_range_join")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "range-count must not plan a nested loop:\n" + p.take(1200))
  }

  // windowedCounts is the density-proof replacement for capped
  // containment COUNTS (r12): two rank probes against one global
  // running event-count — verified here against the naive theta-join
  // count on generated timelines, capped and uncapped, boundaries
  // inclusive on both ends.
  test("windowedCounts equals the naive theta count on generated timelines") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    def samples[A](g: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i =>
        g.apply(Gen.Parameters.default, Seed(0xC0DE + i)))
    val cases = samples(
      for {
        pts <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 3600L * 1000000L))
        evs <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 3600L * 1000000L))
      } yield (pts.distinct, evs), 4)
    for (((pts, evs), ci) <- cases.zipWithIndex) {
      val points = pts.zipWithIndex
        .map { case (t, i) => (i.toLong,
          Timestamp.from(java.time.Instant.EPOCH.plusNanos(t * 1000))) }
        .toDF("pid", "pts")
      val events = evs
        .map(t => Tuple1(
          Timestamp.from(java.time.Instant.EPOCH.plusNanos(t * 1000))))
        .toDF("ets")
      for (cap <- Seq(3L, Long.MaxValue)) {
        val got = RangeJoin.windowedCounts(points, col("pid"), col("pts"),
            events, col("ets"),
            lowOffsetMicros = -300L * 1000000L, highOffsetMicros = 0L,
            cap = cap)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val naive = points.join(events,
            col("ets") >= (col("pts") - expr("INTERVAL 300 SECONDS")) &&
            col("ets") <= col("pts"), "left")
          .groupBy(col("pid")).agg(count(col("ets")).as("n"))
          .collect()
          .map(r => (r.getLong(0), math.min(r.getLong(1), cap))).toMap
        assert(got === naive, s"case $ci cap $cap")
      }
    }
  }

  // The generated-timeline test above cannot hit an exact
  // event-ts == window-endpoint collision (independent 3.6e9-value
  // draws); this fixture pins both ends' inclusivity by hand — an
  // event exactly ON each endpoint counts, 1 µs outside either does
  // not — and would catch a lo/hi probe-tag swap the generator misses.
  test("windowedCounts boundaries are inclusive on both ends, exclusive 1 µs outside") {
    import spark.implicits._
    val p0 = 1000L * 1000000L // point at 1000 s, window [700 s, 1000 s]
    def t(us: Long) = Timestamp.from(java.time.Instant.EPOCH.plusNanos(us * 1000))
    val points = Seq((1L, t(p0))).toDF("pid", "pts")
    val events = Seq(
      t(p0 - 300L * 1000000L),     // exactly on window start: counts
      t(p0),                       // exactly on window end: counts
      t(p0 - 300L * 1000000L - 1), // 1 µs before start: excluded
      t(p0 + 1),                   // 1 µs after end: excluded
      t(p0 - 150L * 1000000L)      // interior: counts
    ).map(Tuple1(_)).toDF("ets")
    val got = RangeJoin.windowedCounts(points, col("pid"), col("pts"),
        events, col("ets"),
        lowOffsetMicros = -300L * 1000000L, highOffsetMicros = 0L)
      .collect()
    assert(got.length == 1 && got.head.getLong(1) == 3L)
  }

  test("windowedCounts raises on a duplicated pointKey instead of mixing probes") {
    import spark.implicits._
    def t(us: Long) = Timestamp.from(java.time.Instant.EPOCH.plusNanos(us * 1000))
    val points = Seq((1L, t(1000L)), (1L, t(2000L))).toDF("pid", "pts")
    val events = Seq(Tuple1(t(1500L))).toDF("ets")
    val e = intercept[Exception] {
      RangeJoin.windowedCounts(points, col("pid"), col("pts"),
        events, col("ets"), -1000L, 0L).collect()
    }
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(t => t.getMessage +: msgs(t.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("not unique")))
  }

  // ADVICE r12: the guard used to be a projected CaseWhen, which column
  // pruning eliminates when a consumer selects only point_key — the
  // misuse then silently emitted duplicate rows. The guard is now a
  // Filter; this pins that it fires even under maximal pruning.
  test("duplicated-pointKey guard survives column pruning (select point_key only)") {
    import spark.implicits._
    def t(us: Long) = Timestamp.from(java.time.Instant.EPOCH.plusNanos(us * 1000))
    val points = Seq((1L, t(1000L)), (1L, t(2000L))).toDF("pid", "pts")
    val events = Seq(Tuple1(t(1500L))).toDF("ets")
    val e = intercept[Exception] {
      RangeJoin.windowedCounts(points, col("pid"), col("pts"),
        events, col("ets"), -1000L, 0L)
        .select("point_key").collect()
    }
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(t => t.getMessage +: msgs(t.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("not unique")))
  }

  // ADVICE r12: null timestamps follow the replaced theta-join's
  // comparison semantics — a null-ts event matches no window, a null-ts
  // point matches nothing (NULL count, not the count of null events),
  // and the duplicate guard still sees null-ts points.
  test("windowedCounts null semantics: null event ts ignored, null point ts -> NULL count") {
    import spark.implicits._
    def t(us: Long) = Timestamp.from(java.time.Instant.EPOCH.plusNanos(us * 1000))
    val points = Seq((1L, Some(t(1000L))), (2L, None), (3L, Some(t(5000L))))
      .toDF("pid", "pts")
    val events = Seq(Some(t(900L)), Some(t(1000L)), None, None, Some(t(4500L)))
      .map(Tuple1(_)).toDF("ets")
    val got = RangeJoin.windowedCounts(points, col("pid"), col("pts"),
        events, col("ets"), -1000L, 0L)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got === Map(1L -> Some(2L), 2L -> None, 3L -> Some(1L)))
    // a duplicated null-ts pointKey is still caught
    val dup = Seq((7L, Option.empty[Timestamp]), (7L, Option.empty[Timestamp]))
      .toDF("pid", "pts")
    val e = intercept[Exception] {
      RangeJoin.windowedCounts(dup, col("pid"), col("pts"),
        events, col("ets"), -1000L, 0L).collect()
    }
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(t => t.getMessage +: msgs(t.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("not unique")))
  }

  test("match cap keeps the first maxMatches per point in matchOrder; a loose cap is a no-op") {
    import spark.implicits._
    // 3 points; point 1 sits inside 5 intervals, point 2 inside 2, point 3 in 0
    val points = Seq(
      (1L, ts("2024-01-01 00:00:30")),
      (2L, ts("2024-01-01 00:03:10")),
      (3L, ts("2024-01-01 00:09:00"))).toDF("pid", "pts")
    val intervals = (0 until 5).map { i =>
      (10L + i, ts(f"2024-01-01 00:00:0$i"), ts(f"2024-01-01 00:01:0$i"))
    } ++ Seq(
      (20L, ts("2024-01-01 00:03:00"), ts("2024-01-01 00:04:00")),
      (21L, ts("2024-01-01 00:03:05"), ts("2024-01-01 00:04:05")))
    val iv = intervals.toDF("iid", "istart", "iend")
    def run(cap: Int) = RangeJoin.pointInInterval(points, col("pts"),
        iv, col("istart"), col("iend"), bandSeconds = 60L, maxLenSeconds = 60L,
        maxMatches = cap, pointKey = Seq(col("pid")),
        matchOrder = Seq(col("istart"), col("iid")))
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // binding cap: the 3 EARLIEST intervals survive for point 1 (matchOrder
    // is istart asc), both for point 2
    assert(run(3) === Set((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L)))
    // loose cap: identical to the uncapped join
    val uncapped = RangeJoin.pointInInterval(points, col("pts"),
        iv, col("istart"), col("iend"), bandSeconds = 60L, maxLenSeconds = 60L)
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(100) === uncapped && uncapped.size === 7)
  }

  test("interval length above the band width is rejected") {
    import spark.implicits._
    val df = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("pid", "pts")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(df, col("pts"), df, col("pts"), col("pts"),
        bandSeconds = 60L, maxLenSeconds = 61L)
    }
  }

  test("interval overlap equals the naive theta join on generated timelines, each pair once") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    def samples[A](g: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(9131L + i)))
    val gen = for {
      ls <- Gen.nonEmptyListOf(for {
        s <- Gen.chooseNum(0L, 7200L * 1000000L)
        len <- Gen.chooseNum(0L, 60L * 1000000L)
      } yield (s, s + len))
      rs <- Gen.nonEmptyListOf(for {
        s <- Gen.chooseNum(0L, 7200L * 1000000L)
        len <- Gen.chooseNum(0L, 60L * 1000000L)
      } yield (s, s + len))
    } yield (ls.distinct, rs.distinct)
    for (((ls, rs), ci) <- samples(gen, 4).zipWithIndex) {
      def frame(ivs: Seq[(Long, Long)], p: String) =
        ivs.zipWithIndex.map { case ((a, b), i) =>
          (i.toLong, Timestamp.from(java.time.Instant.EPOCH.plusNanos(a * 1000)),
            Timestamp.from(java.time.Instant.EPOCH.plusNanos(b * 1000)))
        }.toDF(s"${p}id", s"${p}start", s"${p}end")
      val l = frame(ls, "l")
      val r = frame(rs, "r")
      for (band <- Seq(60L, 600L)) {
        val banded = RangeJoin.intervalOverlap(l, "lstart", "lend",
            r, "rstart", "rend", bandSeconds = band, maxLenSeconds = 60L)
          .select(col("lid"), col("rid"))
          .collect().map(x => (x.getLong(0), x.getLong(1)))
        val naive = l.join(r,
            col("lstart") <= col("rend") && col("rstart") <= col("lend"))
          .select(col("lid"), col("rid"))
          .collect().map(x => (x.getLong(0), x.getLong(1)))
        // exactly-once AND complete: multiset equality against the theta join
        assert(banded.sorted.toSeq === naive.sorted.toSeq,
          s"case $ci band $band: banded ${banded.length} vs naive ${naive.length}")
      }
    }
  }

  test("q_interval_overlap plans a hash/merge equi-join, never a nested loop") {
    val df = Joins.queries("q_interval_overlap")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "banded interval overlap must not plan a nested loop:\n" + p.take(1200))
  }
}
