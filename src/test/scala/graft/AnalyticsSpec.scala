package graft

import org.apache.spark.sql.functions._

import graft.queries.Analytics

/** Claims of the analytics module the oracle gate can't see:
  * ISO-calendar identities on hand-picked boundary dates, z-score
  * moments, distribution-rank endpoints, and the per-label top-k
  * plan/grouping shape. */
class AnalyticsSpec extends SparkSpecBase {
  import spark.implicits._

  test("isocalendar handles year-boundary weeks per ISO 8601") {
    // Known ISO boundary facts: 2021-01-01 (Fri) is 2020-W53-5;
    // 2024-12-30 (Mon) is 2025-W01-1; 2023-01-01 (Sun) is 2022-W52-7.
    val df = Seq("2021-01-01", "2024-12-30", "2023-01-01", "2024-02-29")
      .toDF("d")
      .select(col("d"), to_timestamp(col("d")).as("ts"))
    val d = to_date(col("ts"))
    val isodow = weekday(d) + 1
    val out = df.select(col("d").cast("string").as("src"),
        year(date_add(d, lit(4) - isodow)).as("iso_year"),
        weekofyear(d).as("iso_week"),
        isodow.as("iso_day"))
      .as[(String, Int, Int, Int)].collect()
      .map { case (k, y, w, dd) => k.take(10) -> ((y, w, dd)) }.toMap
    assert(out("2021-01-01") == ((2020, 53, 5)))
    assert(out("2024-12-30") == ((2025, 1, 1)))
    assert(out("2023-01-01") == ((2022, 52, 7)))
    assert(out("2024-02-29") == ((2024, 9, 4)))
  }

  test("z-scores have ~zero mean and ~unit sample variance") {
    val z = Analytics.queries("q_standardize")(spark, sf)
      .select(col("z")).as[Double].collect()
    val n = z.length.toDouble
    val mean = z.sum / n
    val varS = z.map(v => (v - mean) * (v - mean)).sum / (n - 1)
    assert(math.abs(mean) < 1e-6, s"mean $mean")
    assert(math.abs(varS - 1.0) < 1e-3, s"var $varS")
  }

  test("percent_rank spans [0,1] and cume_dist ends at 1 per segment") {
    val rows = Analytics.queries("q_rank_cume")(spark, sf)
      .select(col("c_mktsegment"), col("pct_rank"), col("cume"))
      .as[(String, Double, Double)].collect()
    val bySeg = rows.groupBy(_._1)
    bySeg.foreach { case (seg, rs) =>
      assert(rs.map(_._2).min == 0.0, s"$seg pct_rank floor")
      assert(rs.map(_._2).max <= 1.0 && rs.map(_._3).max == 1.0, seg)
      assert(rs.forall(r => r._3 > 0.0))
    }
  }

  test("findall count matches an independent sliding count") {
    val got = Analytics.queries("q_str_findall")(spark, sf)
      .filter(col("n_matches") > 0).count()
    // Independent witness: docs whose text contains the literal core.
    val want = Tables(spark, sf, "documents")
      .filter(col("text").contains("agg")).count()
    assert(got == want && got > 0)
  }

  test("emb top-k is exactly 3 per label and plans a group limit") {
    val q = Analytics.queries("q_emb_topk_per_label")(spark, sf)
    val sizes = q.groupBy("label").count().as[(Int, Long)].collect()
    assert(sizes.nonEmpty && sizes.forall(_._2 == 3L))
    assert(q.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
    // The top-1 per label must be the global argmax of cos_sim within
    // that label among the returned rows (ordering sanity).
    val rows = q.as[(Int, Long, Double)].collect()
    rows.groupBy(_._1).values.foreach { rs =>
      assert(rs.map(_._3).toSeq == rs.map(_._3).toSeq.sorted.reverse)
    }
  }
}
