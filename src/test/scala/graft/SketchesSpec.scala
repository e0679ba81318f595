package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.queries.Sketches

/** Properties of the sketch/calendar module beyond the oracle gate:
  * the gate pins fixture results; these pin the CLAIMS (error
  * envelopes, hole-filling on injected gaps, grouping-set algebra,
  * map-side group-limit plan shape) on adversarial inputs the fixture
  * doesn't contain. */
class SketchesSpec extends SparkSpecBase {
  import spark.implicits._

  test("approx_distinct ok-flags hold and exact counts are exact") {
    val rows = Sketches.queries("q_approx_distinct")(spark, sf)
      .as[(String, Long, Boolean)].collect()
    assert(rows.nonEmpty && rows.forall(_._3), "sketch outside 3-sigma envelope")
    val want = Tables(spark, sf, "orders")
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(rows.map(r => r._1 -> r._2).toMap == want)
  }

  test("approx_quantile bracket contains the true median by construction") {
    val (lo, hi, ok) = Sketches.queries("q_approx_quantile")(spark, sf)
      .as[(Double, Double, Boolean)].head()
    assert(ok && lo <= hi)
    // The exact median must itself sit inside the ±(n/1000 + 1) rank
    // bracket — if it doesn't, the bracket math is off, whatever the
    // sketch says.
    val med = Tables(spark, sf, "lineitem")
      .agg(expr("percentile(l_extendedprice, 0.5)")).as[Double].head()
    assert(lo <= med && med <= hi)
  }

  test("cube rows partition into the four grouping sets and totals agree") {
    val rows = Sketches.queries("q_cube")(spark, sf)
      .select(col("gid"), col("n")).as[(Int, Long)].collect()
    val byGid = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val total = Tables(spark, sf, "lineitem").count()
    // Every grouping set (detail, roll up b, roll up a, grand total)
    // re-partitions the same row set.
    assert(byGid.keySet == Set(0, 1, 2, 3))
    assert(byGid.values.toSet == Set(total))
  }

  test("resample gapfill closes injected holes with exact zeros") {
    // 2024-01-01 .. 2024-01-10 with days 3..5 and 8 absent.
    val present = Seq(1, 2, 6, 7, 9, 10)
    val df = present.toDF("d")
      .select(to_timestamp(format_string("2024-01-%02d 12:00:00", col("d")))
        .as("ts"), lit(2.5).as("value"))
    val ev = df.select(to_date(col("ts")).as("day"), col("value"))
    val agg = ev.groupBy(col("day")).agg(count(lit(1)).as("n"),
      sum(round(col("value"), 3)
        .cast(org.apache.spark.sql.types.DecimalType(30, 3)))
        .cast("double").as("sum_value"))
    val spine = ev.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"),
        expr("interval 1 day"))).as("day"))
    val out = spine.join(agg, Seq("day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .orderBy(col("day"))
      .as[(Date, Long, Double)].collect()
    assert(out.length == 10, "spine must cover every calendar day")
    val holes = out.filter(_._2 == 0L).map(_._1.toString)
    assert(holes.toSeq ==
      Seq("2024-01-03", "2024-01-04", "2024-01-05", "2024-01-08"))
    assert(out.filter(_._2 > 0).forall(r => r._3 == 2.5 * r._2))
  }

  test("group sample is exact-n per stratum and plans a group limit") {
    val q = Sketches.queries("q_group_sample")(spark, sf)
    val sizes = q.groupBy("lang").count().as[(String, Long)].collect().toMap
    val avail = Tables(spark, sf, "documents")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(sizes.keySet == avail.keySet)
    sizes.foreach { case (lang, n) =>
      assert(n == math.min(5L, avail(lang)), s"$lang drew $n")
    }
    // Deterministic: two independent plans draw the same sample.
    val again = Sketches.queries("q_group_sample")(spark, sf)
    assert(q.collect().toSeq == again.collect().toSeq)
    // rank-filter ≤ k must plan the map-side WindowGroupLimit so each
    // task forwards at most k rows per group before the shuffle.
    assert(q.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "group sample must plan WindowGroupLimit")
  }
}
