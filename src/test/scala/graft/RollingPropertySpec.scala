package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Rolling-window semantics vs sequential pandas definitions on
  * generated nullable series: the count(col) min_periods gate, the
  * ddof=1 var, and the sliding min/max must match a single-threaded
  * reference for every (window, min_periods) combination — the
  * fixture-driven rolling queries pin one config; this pins the rule. */
class RollingPropertySpec extends SparkSpecBase {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(11L + i)))

  // nullable integer-valued doubles: exact in FP, ~25% nulls
  private val series: Seq[Vector[Option[Double]]] =
    samples(Gen.listOfN(25, Gen.frequency(
      3 -> Gen.chooseNum(-50, 50).map(v => Some(v.toDouble)),
      1 -> Gen.const(None))), 8).map(_.toVector).filter(_.nonEmpty)

  private def df(xs: Vector[Option[Double]]) = {
    val schema = StructType(Seq(
      StructField("k", IntegerType, nullable = false),
      StructField("v", DoubleType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        xs.zipWithIndex.map { case (v, i) => Row(i, v.orNull) }, 3), schema)
  }

  private def frames(xs: Vector[Option[Double]], w: Int) =
    xs.indices.map(i => xs.slice(math.max(0, i - w + 1), i + 1).flatten)

  private def check(w: Int, minp: Int): Unit = {
    for (xs <- series) {
      val win = Window.orderBy(col("k")).rowsBetween(-(w - 1), Window.currentRow)
      val got = df(xs)
        .select(col("k"),
          count(col("v")).over(win).as("n"),
          sum(col("v")).over(win).as("s"),
          min(col("v")).over(win).as("mn"),
          max(col("v")).over(win).as("mx"),
          var_samp(col("v")).over(win).as("vr"))
        .collect().map(r => r.getInt(0) ->
          (r.getLong(1), Option(r.get(2)), Option(r.get(3)), Option(r.get(4)),
            Option(r.get(5)))).toMap
      for ((vals, i) <- frames(xs, w).zipWithIndex) {
        val n = vals.length
        val (gn, gs, gmn, gmx, gvr) = got(i)
        assert(gn == n, s"count at $i")
        val pass = n >= minp // the pandas gate this suite pins
        if (pass && n > 0) {
          assert(gs.contains(vals.sum), s"sum at $i")
          assert(gmn.contains(vals.min), s"min at $i")
          assert(gmx.contains(vals.max), s"max at $i")
          if (n >= 2) {
            val m = vals.sum / n
            val want = vals.map(x => (x - m) * (x - m)).sum / (n - 1)
            val gv = gvr.get.asInstanceOf[Double]
            assert(math.abs(gv - want) <= 1e-9 * math.max(1, math.abs(want)),
              s"var at $i: $gv vs $want")
          }
        }
      }
    }
  }

  test("rolling count/sum/min/max/var match sequential frames, w=3")(check(3, 3))
  test("rolling semantics hold at w=1 (degenerate single-row frames)")(check(1, 1))
  test("rolling semantics hold at w=7 with sparse min_periods")(check(7, 2))

  test("ewm var lag composition matches the sequential adjusted formula") {
    // non-null integer series (the q_ewm_var exactness domain); the
    // sequential reference computes the SAME truncated-adjusted
    // definition independently (per-window weight lists, not a 20-term
    // coalesce chain) — association-free because every term is exact
    val intSeries = samples(Gen.listOfN(30,
      Gen.chooseNum(1, 50).map(_.toDouble)), 6).map(_.toVector)
    for (xs <- intSeries) {
      val w = Window.orderBy(col("k"))
      def lg(k: Int) = if (k == 0) col("v") else lag(col("v"), k).over(w)
      val num = (0 until 20).map(j =>
        coalesce(lg(j), lit(0)) * lit(math.pow(0.5, j))).reduceLeft(_ + _)
      val s2 = (0 until 20).map(j =>
        coalesce(lg(j) * lg(j), lit(0)) * lit(math.pow(0.5, j)))
        .reduceLeft(_ + _)
      val den = (0 until 20).map(j =>
        when(lg(j).isNotNull, lit(math.pow(0.5, j))).otherwise(lit(0.0)))
        .reduceLeft(_ + _)
      val den2 = (0 until 20).map(j =>
        when(lg(j).isNotNull, lit(math.pow(0.25, j))).otherwise(lit(0.0)))
        .reduceLeft(_ + _)
      val m = num / den
      val vb = s2 / den - m * m
      val v = when(den * den > den2, vb * (den * den) / (den * den - den2))
      val got = df(xs.map(Option(_))).select(col("k"), v.as("v"))
        .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
      xs.indices.foreach { i =>
        val win = xs.slice(math.max(0, i - 19), i + 1).reverse // j=0 newest
        val ws = win.indices.map(j => math.pow(0.5, j))
        val d = ws.sum
        val d2 = win.indices.map(j => math.pow(0.25, j)).sum
        val expct = if (d * d > d2) {
          val mm = win.indices.map(j => win(j) * ws(j)).sum / d
          val vv = win.indices.map(j => win(j) * win(j) * ws(j)).sum / d - mm * mm
          Some(vv * (d * d) / (d * d - d2))
        } else None
        (got(i), expct) match {
          case (Some(g), Some(e)) =>
            assert(math.abs(g.asInstanceOf[Double] - e) <=
              1e-12 * math.max(1, math.abs(e)), s"ewm var at $i")
          case (g, e) => assert(g.isEmpty == e.isEmpty, s"null gate at $i")
        }
      }
    }
  }
}
