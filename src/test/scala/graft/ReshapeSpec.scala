package graft

import org.apache.spark.sql.functions._

import graft.queries.Reshape

class ReshapeSpec extends SparkSpecBase {
  import spark.implicits._

  test("merge_ordered carries fills across the disjoint date ranges") {
    val out = Reshape.queries("q_merge_ordered")(spark, sf)
      .select(col("day").cast("string"), col("n_orders_ff"), col("sum_value_ff"))
      .as[(String, java.lang.Long, java.lang.Double)].collect()
    assert(out.nonEmpty)
    // Event days (2024) all follow order days (1990s): once both series
    // have started, every later row is fully filled.
    val eventRows = out.filter(_._1.startsWith("2024"))
    assert(eventRows.nonEmpty && eventRows.forall(r => r._2 != null && r._3 != null))
    // The carried order count on every 2024 day equals the LAST order
    // day's count (nothing after the orders tail can change it).
    val lastOrderN = out.filter(_._1 < "2000").last._2
    assert(eventRows.forall(_._2 == lastOrderN))
    // sum_value before the first event day is null (nothing to fill from).
    assert(out.takeWhile(_._1 < "2024").forall(_._3 == null))
  }

  test("combine_first covers every key and prefers self") {
    val o = Tables(spark, sf, "orders")
    val out = Reshape.queries("q_combine_first")(spark, sf)
    assert(out.count() == o.count(), "full outer over a superset key keeps all")
    val byStatus = out.as[(Long, Double, Boolean)].collect()
    val fCount = o.filter(col("o_orderstatus") === "F").count()
    assert(byStatus.count(_._3) == fCount)
    // Fallback rows carry exactly half price.
    val prices = o.select(col("o_orderkey"), col("o_totalprice"),
      col("o_orderstatus")).as[(Long, Double, String)].collect()
      .map(r => r._1 -> r).toMap
    byStatus.foreach { case (k, p, self) =>
      val (_, full, st) = prices(k)
      if (self) assert(st == "F" && p == full)
      else assert(st != "F" && p == full / 2)
    }
  }

  test("nunique_all agrees with per-column distinct counts") {
    val row = Reshape.queries("q_nunique_all")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].head()
    val o = Tables(spark, sf, "orders")
    def u(c: String) = o.select(c).distinct().count()
    assert(row == ((u("o_orderkey"), u("o_custkey"), u("o_orderstatus"),
      u("o_totalprice"), u("o_orderpriority"))))
  }

  test("pivot margins equal the detail sums on both axes") {
    val rows = Reshape.queries("q_pivot_margins")(spark, sf)
      .as[(String, Option[Double], Option[Double], Option[Double], Double)]
      .collect()
    val (detail, margin) = rows.partition(_._1 != "All")
    assert(margin.length == 1 && detail.nonEmpty)
    def tol(a: Double, b: Double) = math.abs(a - b) < 1e-6
    // Margin row = column-wise sum of detail rows (exact decimal sums,
    // so double equality holds to an ulp of the shared decimal total).
    assert(tol(margin.head._5, detail.map(_._5).sum))
    assert(tol(margin.head._2.getOrElse(0.0),
      detail.flatMap(_._2).sum))
    // Row margin = sum across status cells for every row.
    rows.foreach { r =>
      assert(tol(r._5,
        r._2.getOrElse(0.0) + r._3.getOrElse(0.0) + r._4.getOrElse(0.0)))
    }
  }

  test("slice_replace composition matches pandas semantics on edges") {
    // pandas s.str.slice_replace(1, 3, 'XX'): chars [1,3) replaced —
    // strings shorter than the stop still splice (tail is empty).
    val df = Seq("abcdef", "ab", "a", "").toDF("s")
    val got = df.select(concat(substring(col("s"), 1, 1), lit("XX"),
      substring(col("s"), 4, 1000)).as("r")).as[String].collect().toSeq
    assert(got == Seq("aXXdef", "aXX", "aXX", "XX"))
  }
}
