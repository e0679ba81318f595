package graft

import org.apache.spark.sql.functions._

import graft.functions._

/** pandas NaN/null duality helpers + exact decimal aggregation. */
class FunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  private def nanFrame = Seq(Some(1.5), Some(Double.NaN), None, Some(2.5))
    .toDF("x")

  test("nanToNull turns NaN into null so Spark aggs skip it like pandas") {
    val got = nanFrame.agg(
      avg(nanToNull(col("x"))).as("m"),
      count(nanToNull(col("x"))).as("n")).as[(Double, Long)].head()
    assert(got == ((2.0, 2L)))
  }

  test("isNa is true for both NaN and null") {
    val got = nanFrame.select(isNa(col("x"))).as[Boolean].collect().toSeq
    assert(got == Seq(false, true, true, false))
  }

  test("dsum/dmean are exact on 2-decimal doubles") {
    val df = Seq(0.1, 0.2, 0.3, 0.4).toDF("x")
    val (s, m) = df.agg(dsum(col("x")).as("s"), dmean(col("x")).as("m"))
      .as[(Double, Double)].head()
    assert(s == 1.0 && m == 0.25) // plain double summation would drift
  }

  test("dvarSamp matches the ddof=1 formula exactly") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val v = df.agg(dvarSamp(col("x"))).as[Double].head()
    assert(v == 5.0 / 3.0) // var([1,2,3,4], ddof=1)
  }

  test("floorDiv rounds toward -inf like python //") {
    val got = Seq((-7.0, 2.0), (7.0, 2.0), (-1.0, 3.0))
      .toDF("a", "b")
      .select(floorDiv(col("a"), col("b"))).as[Double].collect().toSeq
    assert(got == Seq(-4.0, 3.0, -1.0))
  }
}
