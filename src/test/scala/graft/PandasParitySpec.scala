package graft

import org.apache.spark.sql.functions._

import graft.queries.{Datetime, GroupBy, Joins, Reshape, Rolling, SeriesExtra}

/** Invariants for the round-6 pandas-parity additions (cumcount/ngroup,
  * cross merge, to_numeric coerce, axis-1 concat) — oracle-independent
  * semantics checks. */
class PandasParitySpec extends SparkSpecBase {

  test("cumcount is 0..n-1 per group; ngroup is a dense 0..k-1 key rank") {
    val df = GroupBy.queries("q_cumcount_ngroup")(spark, sf)
    val per = df.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), min(col("cumcount")).as("mn"),
        max(col("cumcount")).as("mx"), countDistinct(col("cumcount")).as("nd"),
        countDistinct(col("ngroup")).as("ng"))
    // within each group: cumcount is exactly the set {0..n-1}, and the
    // group maps to exactly one ngroup value
    assert(per.filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1 ||
      col("nd") =!= col("n") || col("ng") =!= 1).count() === 0)
    val ngroups = df.select(col("ngroup")).distinct().collect()
      .map(_.getLong(0)).sorted
    assert(ngroups.toSeq === ngroups.indices.map(_.toLong).toSeq)
    // ngroup order follows sorted keys (sort=True)
    val keyed = df.select(col("o_orderpriority"), col("ngroup")).distinct()
      .orderBy(col("o_orderpriority")).collect().map(_.getLong(1))
    assert(keyed.toSeq === keyed.indices.map(_.toLong).toSeq)
  }

  test("cross merge cardinality is the product of the inputs") {
    val n = Joins.queries("q_join_cross")(spark, sf).count()
    val r = Tables(spark, sf, "region").count()
    val na = Tables(spark, sf, "nation").count()
    assert(n === r * na)
  }

  test("to_numeric coerce: numeric branches parse, junk branch nulls") {
    val df = SeriesExtra.queries("q_to_numeric")(spark, sf)
    assert(df.filter(col("c_custkey") % 3 === 2 &&
      col("as_num").isNotNull).count() === 0)
    assert(df.filter(col("c_custkey") % 3 =!= 2 &&
      col("as_num").isNull).count() === 0)
    // the ".5" branch parses to key*10 + 0.5 exactly
    assert(df.filter(col("c_custkey") % 3 === 0 &&
      col("as_num") =!= col("c_custkey") * 10 + 0.5).count() === 0)
  }

  test("ohlc: low <= open/close <= high, every value is a real price") {
    val df = GroupBy.queries("q_groupby_ohlc")(spark, sf)
    assert(df.filter(col("low") > col("open") || col("low") > col("close") ||
      col("high") < col("open") || col("high") < col("close")).count() === 0)
    // open/close are picked from the group, so they are data values
    val joined = df.join(
      Tables(spark, sf, "lineitem").select(col("l_suppkey"),
        col("l_extendedprice").as("open")).distinct(),
      Seq("l_suppkey", "open"), "left_anti")
    assert(joined.count() === 0)
  }

  test("rolling rank: bounded by the window, null until it fills") {
    val df = Rolling.queries("q_rolling_rank")(spark, sf)
    assert(df.filter(col("roll_rank") < 1 || col("roll_rank") > 5)
      .count() === 0)
    // exactly the first 4 rows of each partition (by the window order)
    // are null — order-free check: 4 nulls per suppkey that has ≥ 5
    // rows, n nulls for shorter partitions
    val per = df.groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("roll_rank").isNull, 1L).otherwise(0L)).as("nn"))
    assert(per.filter(col("nn") =!= least(col("n"), lit(4L))).count() === 0)
  }

  test("between_time keeps exactly the 09:00-17:00 band") {
    val df = Datetime.queries("q_between_time")(spark, sf)
    val bad = df.filter(hour(col("ts")) < 9 ||
      (hour(col("ts")) > 17) ||
      (hour(col("ts")) === 17 && (minute(col("ts")) > 0 ||
        second(col("ts")) > 0)))
    assert(bad.count() === 0)
    val direct = Tables(spark, sf, "events").filter(
      pmod(unix_micros(col("ts")), lit(86400000000L))
        .between(lit(9L * 3600000000L), lit(17L * 3600000000L))).count()
    assert(df.count() === direct)
  }

  test("rfm: scores in 1..5, near-even quintiles, rfm composes digits") {
    val df = graft.queries.EventAnalytics.queries("q_rfm")(spark, sf)
    for (c <- Seq("r_score", "f_score", "m_score"))
      assert(df.filter(col(c) < 1 || col(c) > 5).count() === 0, c)
    assert(df.filter(col("rfm") =!=
      col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
      .count() === 0)
    // ⌈5r/n⌉ buckets differ in size by at most 1
    val sizes = df.groupBy(col("f_score")).agg(count(lit(1)).as("n"))
      .collect().map(_.getAs[Long]("n"))
    assert(sizes.max - sizes.min <= 1)
    // one row per user
    assert(df.count() ===
      Tables(spark, sf, "events").select(col("user_id")).distinct().count())
  }

  test("session funnel: consistent with the session universe") {
    val r = graft.queries.EventAnalytics.queries("q_session_funnel")(spark, sf)
      .collect()(0)
    val sessions = graft.queries.StreamsQ.queries("q_sessionize")(spark, sf)
      .count()
    assert(r.getAs[Long]("n_sessions") === sessions)
    assert(r.getAs[Long]("n_converted") <= r.getAs[Long]("n_with_view"))
    val conv = r.getAs[Double]("conversion")
    assert(conv >= 0.0 && conv <= 1.0)
  }

  test("dwell time: gap count = events - users, percentiles ordered") {
    val r = graft.queries.EventAnalytics.queries("q_dwell_time")(spark, sf)
      .collect()(0)
    val ev = Tables(spark, sf, "events")
    val expected = ev.count() - ev.select(col("user_id")).distinct().count()
    assert(r.getAs[Long]("n_gaps") === expected)
    assert(r.getAs[Double]("p50_gap_s") <= r.getAs[Double]("p90_gap_s"))
  }

  test("window funnel: stage counts monotone non-increasing") {
    val r = graft.queries.EventAnalytics.queries("q_window_funnel")(spark, sf)
      .collect()(0)
    val (v, c, p) = (r.getAs[Long]("n_view"), r.getAs[Long]("n_click_30m"),
      r.getAs[Long]("n_purchase_60m"))
    assert(v >= c && c >= p && p >= 0)
    // windowed counts are bounded by the unconditional funnel's stages
    val unconditional = graft.queries.EventAnalytics
      .queries("q_funnel")(spark, sf)
    assert(v <= Tables(spark, sf, "events")
      .select(col("user_id")).distinct().count())
  }

  test("retention curve: rates monotone decreasing in the horizon") {
    val r = graft.queries.EventAnalytics.queries("q_retention_curve")(spark, sf)
      .collect()(0)
    val (d1, d7, d30) = (r.getAs[Double]("d1"), r.getAs[Double]("d7"),
      r.getAs[Double]("d30"))
    assert(d1 >= d7 && d7 >= d30)
    assert(d1 <= 1.0 && d30 >= 0.0)
  }

  test("lorenz: monotone deciles ending at 1.0, below the diagonal") {
    val rows = graft.queries.EventAnalytics.queries("q_lorenz_curve")(spark, sf)
      .collect().sortBy(_.getAs[Int]("decile"))
    val shares = rows.map(_.getAs[Double]("spend_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(math.abs(shares.last - 1.0) < 1e-6)
    // Lorenz curve lies on or below the equality diagonal evaluated at
    // the ACTUAL read-off fraction ⌈n·k/10⌉/n (k/10 itself only bounds
    // it when n divides evenly)
    val n = Tables(spark, sf, "events")
      .select(col("user_id")).distinct().count()
    rows.foreach { r =>
      val k = r.getAs[Int]("decile")
      val frac = math.ceil(n * (k / 10.0)) / n
      assert(r.getAs[Double]("spend_share") <= frac + 1e-6,
        s"decile $k: ${r.getAs[Double]("spend_share")} vs $frac")
    }
  }

  test("ab test: cohorts partition users, z consistent with proportions") {
    val r = graft.queries.EventAnalytics.queries("q_ab_test")(spark, sf)
      .collect()(0)
    val users = Tables(spark, sf, "events")
      .select(col("user_id")).distinct().count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") === users)
    assert(r.getAs[Long]("c_a") <= r.getAs[Long]("n_a"))
    assert(r.getAs[Long]("c_b") <= r.getAs[Long]("n_b"))
    // z sign agrees with the proportion difference
    val z = r.getAs[Double]("z")
    val diff = r.getAs[Double]("p_a") - r.getAs[Double]("p_b")
    assert(z == 0.0 || z.sign == diff.sign)
  }

  test("funnel time: percentiles ordered, mean within range") {
    val r = graft.queries.EventAnalytics.queries("q_funnel_time")(spark, sf)
      .collect()(0)
    assert(r.getAs[Long]("n_converted") > 0)
    assert(r.getAs[Double]("p50_tts_s") <= r.getAs[Double]("p90_tts_s"))
    assert(r.getAs[Double]("mean_tts_s") >= 0.0)
  }

  test("churn: rates in [0,1], active bounded by the user universe") {
    val df = graft.queries.EventAnalytics.queries("q_churn")(spark, sf)
    assert(df.filter(col("churn_rate") < 0 || col("churn_rate") > 1)
      .count() === 0)
    assert(df.filter(col("churned") > col("active")).count() === 0)
    val users = Tables(spark, sf, "events")
      .select(col("user_id")).distinct().count()
    assert(df.filter(col("active") > users).count() === 0)
  }

  test("basket pairs: ordered pairs, support bounded by either type") {
    val df = graft.queries.EventAnalytics.queries("q_basket_pairs")(spark, sf)
    assert(df.filter(col("type_a") >= col("type_b")).count() === 0)
    val perType = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_type")).distinct()
      .groupBy(col("event_type")).agg(count(lit(1)).as("nu"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("nu")).toMap
    df.collect().foreach { r =>
      val cap = math.min(perType(r.getAs[String]("type_a")),
        perType(r.getAs[String]("type_b")))
      assert(r.getAs[Long]("support") <= cap)
    }
  }

  test("heatmap: dow in 1..7, hour in 0..23, counts total the table") {
    val df = graft.queries.EventAnalytics
      .queries("q_weekday_hour_heatmap")(spark, sf)
    assert(df.filter(col("dow") < 1 || col("dow") > 7 ||
      col("hr") < 0 || col("hr") > 23).count() === 0)
    assert(df.agg(sum(col("n"))).collect()(0).getLong(0) ===
      Tables(spark, sf, "events").count())
    // the ISO formula agrees with Spark's own weekday()
    val bad = Tables(spark, sf, "events").select(
      ((expr("unix_micros(ts) div 86400000000") + 3) % 7 + 1).as("f"),
      (weekday(col("ts")) + 1).as("w")).filter(col("f") =!= col("w"))
    assert(bad.count() === 0)
  }

  test("session stats: consistent with the sessionize query") {
    val r = graft.queries.EventAnalytics.queries("q_session_stats")(spark, sf)
      .collect()(0)
    val sessions = graft.queries.StreamsQ.queries("q_sessionize")(spark, sf)
      .count()
    assert(r.getAs[Long]("n_sessions") === sessions)
    assert(r.getAs[Double]("p50_dur_s") <= r.getAs[Double]("p90_dur_s"))
    assert(r.getAs[Double]("mean_dur_s") >= 0.0)
  }

  test("active users: wau7 >= dau, bounded by the user universe") {
    val df = graft.queries.EventAnalytics.queries("q_active_users")(spark, sf)
    assert(df.filter(col("wau7") < col("dau")).count() === 0)
    val users = Tables(spark, sf, "events")
      .select(col("user_id")).distinct().count()
    assert(df.filter(col("wau7") > users).count() === 0)
    // every active day appears exactly once
    assert(df.count() === df.select(col("day")).distinct().count())
  }

  test("pareto abc: cumulative share monotone to 1.0, classes ordered") {
    val rows = graft.queries.EventAnalytics.queries("q_pareto_abc")(spark, sf)
      .collect()
    val shares = rows.map(_.getAs[Double]("cum_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(math.abs(shares.last - 1.0) < 1e-6)
    // classes appear in A..C order along the ranking
    val abc = rows.map(_.getAs[String]("abc"))
    assert(abc.mkString.matches("A*B*C*"))
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("month end: anchor properties of last_day arithmetic") {
    val df = graft.queries.Datetime.queries("q_dt_month_end")(spark, sf)
    assert(df.filter(col("days_to_me") < 0 || col("days_to_me") > 30)
      .count() === 0)
    assert(df.filter((col("is_month_end") === 1) =!=
      (col("days_to_me") === 0)).count() === 0)
    assert(df.filter(month(col("month_end")) =!=
      month(date_add(col("month_end"), -27))).count() === 0)
  }

  test("mad anomalies: counts partition per type, fence is robust") {
    val df = graft.queries.EventAnalytics.queries("q_events_anomaly")(spark, sf)
    val rows = df.collect()
    val total = Tables(spark, sf, "events").count()
    assert(rows.map(_.getAs[Long]("n")).sum === total)
    rows.foreach(r =>
      assert(r.getAs[Long]("n_anomalies") <= r.getAs[Long]("n")))
    // MAD flags a minority: the fence sits at a robust 3-sigma
    assert(rows.map(_.getAs[Long]("n_anomalies")).sum < total / 2)
  }

  test("user paths: segments from the event-type domain, counts bounded") {
    val df = graft.queries.EventAnalytics.queries("q_user_paths")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val known = Set("view", "click", "purchase", "signup", "error")
    rows.foreach { r =>
      val segs = r.getAs[String]("path").split(">")
      assert(segs.nonEmpty && segs.length <= 3 && segs.forall(known))
    }
    val users = Tables(spark, sf, "events")
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum <= users)
    // top-20 is ordered by (count desc, path)
    val ns = rows.map(_.getAs[Long]("n_users"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("2d histogram partitions the table and keeps exact sums") {
    val df = graft.queries.Aggregates.queries("q_histogram_2d")(spark, sf)
    val li = Tables(spark, sf, "lineitem")
    assert(df.agg(sum(col("n"))).collect()(0).getLong(0) === li.count())
    assert(df.filter(col("qty_bin") < 0 || col("qty_bin") > 4).count() === 0)
    val total = df.agg(sum(col("sum_price"))).collect()(0).getDouble(0)
    val direct = li.agg(
      sum(col("l_extendedprice").cast(org.apache.spark.sql.types
        .DecimalType(30, 2))).cast("double")).collect()(0).getDouble(0)
    assert(math.abs(total - direct) < 1e-6)
  }

  test("axis-1 concat: outer length, null padding past the short side") {
    val df = Reshape.queries("q_concat_axis1")(spark, sf)
    val nO = Tables(spark, sf, "orders").count()
    val nC = Tables(spark, sf, "customer").count()
    assert(df.count() === math.max(nO, nC))
    assert(df.filter(col("pos") > math.min(nO, nC) &&
      col("c_acctbal").isNotNull && col("o_totalprice").isNotNull)
      .count() === 0)
    // positions are a contiguous 1..max range
    val r = df.agg(min(col("pos")), max(col("pos")),
      countDistinct(col("pos"))).collect()(0)
    assert(r.getLong(0) === 1L && r.getLong(1) === math.max(nO, nC) &&
      r.getLong(2) === math.max(nO, nC))
  }
}
