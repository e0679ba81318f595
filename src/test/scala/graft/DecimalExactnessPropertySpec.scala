package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The TPC-H family's cross-engine exactness rests on one recipe:
  * 2-decimal doubles cast to DECIMAL, multiplied/summed in decimal
  * (exact rational arithmetic), cast to double only at output. The
  * oracle gate checks it against DuckDB on the fixtures; this suite
  * checks it against SEQUENTIAL BigDecimal arithmetic on generated
  * values — independent of both engines, and on value shapes
  * (extremes, many rows, adversarial discounts) the fixtures may never
  * hit. If any intermediate rounded, reordering partials would break
  * these equalities. */
class DecimalExactnessPropertySpec extends SparkSpecBase {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(97L + i)))

  private val schema = StructType(Seq(
    StructField("price", DoubleType, nullable = false),
    StructField("disc", DoubleType, nullable = false)))

  // prices like l_extendedprice (2 decimals, up to 1e7), discounts 0.00-0.99
  private def rows(n: Int, seed: Int): Seq[(Double, Double)] =
    samples(for {
      p <- Gen.chooseNum(0L, 1000000000L)
      d <- Gen.chooseNum(0L, 99L)
    } yield (p / 100.0, d / 100.0), n)

  test("decimal revenue sum equals the sequential BigDecimal reference") {
    for (trial <- 0 until 3) {
      val data = rows(400, trial)
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(data.map { case (p, d) => Row(p, d) }, 7),
        schema)
      val got = df.agg(
          sum(graft.functions.discountedRevenue(col("price"), col("disc")))
            .cast("double"))
        .head().getDouble(0)
      val want = data.map { case (p, d) =>
        BigDecimal(p).setScale(2) * (BigDecimal(1) - BigDecimal(d).setScale(2))
      }.sum.toDouble
      assert(got == want,
        s"trial $trial: spark=$got reference=$want (must be bit-identical)")
    }
  }

  test("dsum round-trips 2-decimal doubles exactly at any partitioning") {
    val data = rows(300, 7).map(_._1)
    val want = data.map(BigDecimal(_).setScale(2)).sum.toDouble
    for (parts <- Seq(1, 3, 97)) {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(data.map(Row(_)), parts),
        StructType(Seq(StructField("v", DoubleType, nullable = false))))
      val got = df.agg(graft.functions.dsum(col("v"))).head().getDouble(0)
      assert(got == want, s"parts=$parts: dsum must be order-independent")
    }
  }

  test("conditional decimal ratio (q8/q14 shape) equals the sequential reference") {
    val data = rows(300, 11)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        data.zipWithIndex.map { case ((p, d), i) => Row(p, d, i % 3 == 0) }, 5),
      schema.add(StructField("flag", BooleanType, nullable = false)))
    val vol = graft.functions.discountedRevenue(col("price"), col("disc"))
    val zero = lit(BigDecimal(0)).cast(DecimalType(30, 2))
    val got = df.agg((sum(when(col("flag"), vol).otherwise(zero)).cast("double") /
        sum(vol).cast("double")))
      .head().getDouble(0)
    def rev(pd: (Double, Double)) =
      BigDecimal(pd._1).setScale(2) * (BigDecimal(1) - BigDecimal(pd._2).setScale(2))
    val num = data.zipWithIndex.collect { case (pd, i) if i % 3 == 0 => rev(pd) }
      .sum.toDouble
    val den = data.map(rev).sum.toDouble
    assert(got == num / den, "the ratio must be ONE IEEE divide of exact doubles")
  }
}
