package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.MergeAsof

/** merge_asof direction contracts against the sequential pandas
  * definition, on arbitrary generated timelines (fixed-seed ScalaCheck
  * sampling, same determinism policy as PropertySpec):
  * backward takes the LARGEST right time ≤ t, forward the SMALLEST
  * right time ≥ t, nearest the closer of the two with ties broken
  * backward. The right-frame value column is the right event time
  * itself, so the matched value identifies the matched row. */
class MergeAsofPropertySpec extends SparkSpecBase {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1042L + i)))

  // (left times, right times) pairs; seconds granularity, overlapping
  // ranges so every direction has both matches and misses.
  private lazy val timelines: Seq[(Seq[Long], Seq[Long])] =
    samples(
      for {
        lt <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 7200L))
        rt <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 7200L))
      } yield (lt.distinct, rt.distinct), 6)

  private def frame(xs: Seq[Long], withV: Boolean): DataFrame = {
    val rows = xs.zipWithIndex.map { case (t, i) =>
      (i.toLong, "k", new Timestamp(t * 1000L), t.toDouble)
    }
    val df = spark.createDataFrame(rows).toDF("id", "key", "t", "v")
    if (withV) df else df.drop("v")
  }

  private def run(
      f: (DataFrame, DataFrame, String, Seq[String], Seq[String]) => DataFrame,
      lt: Seq[Long], rt: Seq[Long]): Map[Long, Option[Double]] =
    f(frame(lt, withV = false), frame(rt, withV = true),
        "t", Seq("key"), Seq("v"))
      .collect().map { r =>
        lt(r.getLong(r.fieldIndex("id")).toInt) ->
          (if (r.isNullAt(r.fieldIndex("v"))) None
           else Some(r.getDouble(r.fieldIndex("v"))))
      }.toMap

  test("backward returns the largest right time <= t on arbitrary timelines") {
    for ((lt, rt) <- timelines) {
      val got = run(MergeAsof.backward(_, _, _, _, _), lt, rt)
      for (t <- lt) {
        val want = rt.filter(_ <= t) match {
          case Seq() => None
          case hits  => Some(hits.max.toDouble)
        }
        assert(got(t) == want, s"t=$t rt=$rt")
      }
    }
  }

  test("forward returns the smallest right time >= t on arbitrary timelines") {
    for ((lt, rt) <- timelines) {
      val got = run(MergeAsof.forward(_, _, _, _, _), lt, rt)
      for (t <- lt) {
        val want = rt.filter(_ >= t) match {
          case Seq() => None
          case hits  => Some(hits.min.toDouble)
        }
        assert(got(t) == want, s"t=$t rt=$rt")
      }
    }
  }

  test("allow_exact_matches=false requires strict inequality in both directions") {
    for ((lt, rt) <- timelines) {
      val gotB = run((l, r, on, by, rc) =>
        MergeAsof.backward(l, r, on, by, rc, allowExactMatches = false), lt, rt)
      val gotF = run((l, r, on, by, rc) =>
        MergeAsof.forward(l, r, on, by, rc, allowExactMatches = false), lt, rt)
      for (t <- lt) {
        val wantB = rt.filter(_ < t).maxOption.map(_.toDouble)
        val wantF = rt.filter(_ > t).minOption.map(_.toDouble)
        assert(gotB(t) == wantB, s"strict backward t=$t rt=$rt")
        assert(gotF(t) == wantF, s"strict forward t=$t rt=$rt")
      }
    }
  }

  test("tolerance nulls too-distant matches but keeps the left row") {
    val tol = Some(expr("INTERVAL 10 MINUTES")) // 600 s
    for ((lt, rt) <- timelines) {
      val gotB = run((l, r, on, by, rc) =>
        MergeAsof.backward(l, r, on, by, rc, tolerance = tol), lt, rt)
      val gotF = run((l, r, on, by, rc) =>
        MergeAsof.forward(l, r, on, by, rc, tolerance = tol), lt, rt)
      for (t <- lt) {
        val wantB = rt.filter(_ <= t).maxOption
          .filter(t - _ <= 600L).map(_.toDouble)
        val wantF = rt.filter(_ >= t).minOption
          .filter(_ - t <= 600L).map(_.toDouble)
        assert(gotB(t) == wantB, s"tol backward t=$t rt=$rt")
        assert(gotF(t) == wantF, s"tol forward t=$t rt=$rt")
      }
      // every left row survives regardless of tolerance
      assert(gotB.size == lt.size && gotF.size == lt.size)
    }
  }

  test("nearest returns the closer match and breaks ties backward") {
    for ((lt, rt) <- timelines) {
      val got = run(MergeAsof.nearest, lt, rt)
      for (t <- lt) {
        val bwd = rt.filter(_ <= t).sorted.lastOption
        val fwd = rt.filter(_ >= t).sorted.headOption
        val want = (bwd, fwd) match {
          case (None, f) => f.map(_.toDouble)
          case (b, None) => b.map(_.toDouble)
          case (Some(b), Some(f)) =>
            // tie (t - b == f - t) resolves backward, pandas semantics
            Some(if (t - b <= f - t) b.toDouble else f.toDouble)
        }
        assert(got(t) == want, s"t=$t rt=$rt")
      }
    }
  }
}
