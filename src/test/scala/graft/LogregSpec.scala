package graft

import org.apache.spark.sql.functions._

import graft.queries.Analytics

/** q_logreg_step against a SEQUENTIAL driver-side replay of the same
  * quantized op sequence — a determinism witness independent of both
  * engines (the DuckDB gate proves Spark == DuckDB; this proves both
  * equal the spec'd arithmetic). */
class LogregSpec extends SparkSpecBase {

  test("two GD steps equal the sequential quantized reference") {
    val rows = Tables(spark, sf, "lineitem")
      .select(
        when(col("l_returnflag") === "R", 1.0).otherwise(0.0).as("y"),
        (col("l_quantity").cast("double") / lit(50.0)).as("x1"),
        col("l_discount").cast("double").as("x2"))
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))

    val lr = 0.5
    def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val n = rows.length
    // step 1 (w = 0 ⇒ p = 1/2): exact sums via BigDecimal like the
    // engines' DECIMAL(30,6) casts
    def d6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val s0 = rows.map { case (y, _, _) => d6(0.5 - y) }.sum
    val s1 = rows.map { case (y, x1, _) => d6((0.5 - y) * x1) }.sum
    val s2 = rows.map { case (y, _, x2) => d6((0.5 - y) * x2) }.sum
    val w0 = q6(-lr * (s0.toDouble / n))
    val w1 = q6(-lr * (s1.toDouble / n))
    val w2 = q6(-lr * (s2.toDouble / n))
    // step 2: quantized predictor, quantized gradient terms
    var g0 = 0L; var g1 = 0L; var g2 = 0L
    for ((y, x1, x2) <- rows) {
      val z = q6(w0 + w1 * x1 + w2 * x2)
      val p = 1.0 / (1.0 + math.exp(-z))
      g0 += math.floor((p - y) * 1e9 + 0.5).toLong
      g1 += math.floor((p - y) * x1 * 1e9 + 0.5).toLong
      g2 += math.floor((p - y) * x2 * 1e9 + 0.5).toLong
    }
    val want = (
      q6(w0 - lr * (g0.toDouble / 1e9 / n)),
      q6(w1 - lr * (g1.toDouble / 1e9 / n)),
      q6(w2 - lr * (g2.toDouble / 1e9 / n)))

    val got = Analytics.queries("q_logreg_step")(spark, sf).collect()(0)
    assert(got.getAs[Long]("n") === n.toLong)
    assert(got.getAs[Double]("w_intercept") === want._1)
    assert(got.getAs[Double]("w_qty") === want._2)
    assert(got.getAs[Double]("w_disc") === want._3)
    // sanity: the data is not degenerate and the step moved the weights
    assert(want._1 != 0.0 && want._2 != 0.0)
  }
}
