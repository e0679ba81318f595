package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Python/pandas scalar semantics vs JVM references on generated
  * values: the python-sign mod/floordiv rewrite (r = a − floor(a/b)·b)
  * must equal math.floorMod/floorDiv on integer-valued inputs, and the
  * value_counts float bucketing (NaN dropped, ±0 merged) must equal a
  * sequential Map built with the same normalization. */
class PandasSemanticsPropertySpec extends SparkSpecBase {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(23L + i)))

  test("python mod/floordiv expression equals floorMod/floorDiv on ints") {
    val cases = samples(for {
      a <- Gen.chooseNum(-200, 200)
      b <- Gen.oneOf((-9 to 9).filter(_ != 0))
    } yield (a, b), 120).distinct
    val schema = StructType(Seq(
      StructField("a", IntegerType, nullable = false),
      StructField("b", IntegerType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(cases.map { case (a, b) => Row(a, b) }, 3),
      schema)
    val a = col("a").cast("double"); val b = col("b").cast("double")
    val got = df.select(col("a"), col("b"),
        (a - floor(a / b) * b).as("pymod"),
        floor(a / b).cast("double").as("pydiv"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    for ((av, bv) <- cases) {
      val (m, d) = got((av, bv))
      assert(m == math.floorMod(av, bv).toDouble, s"$av % $bv")
      assert(d == math.floorDiv(av, bv).toDouble, s"$av // $bv")
    }
  }

  test("value_counts float bucketing: NaN dropped, -0.0 merged into +0.0") {
    val vals: Seq[java.lang.Double] = samples(Gen.listOfN(60, Gen.frequency(
      4 -> Gen.chooseNum(-3, 3).map(v => v.toDouble: java.lang.Double),
      1 -> Gen.const(Double.NaN: java.lang.Double),
      1 -> Gen.const(-0.0: java.lang.Double),
      1 -> Gen.const(0.0: java.lang.Double),
      1 -> Gen.const(null: java.lang.Double))), 4).flatten
    val schema = StructType(Seq(StructField("v", DoubleType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vals.map(Row(_)), 5), schema)
    // the q_value_counts_float pipeline: null+NaN gate, then a float
    // groupBy whose key normalization merges +-0
    val got = df.filter(col("v").isNotNull && !isnan(col("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val want = vals.filter(v => v != null && !v.isNaN)
      .map(v => if (v == 0.0) 0.0 else v.toDouble) // -0.0 == 0.0 in IEEE
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    assert(got == want, s"got=$got want=$want")
    assert(!got.keySet.exists(k => k == 0.0 && (1.0 / k) < 0),
      "a -0.0 key leaked through group-key normalization")
  }

  test("nanvl + isNa treat null and NaN as the same missing value") {
    val vals = Seq[java.lang.Double](1.0, null, Double.NaN, -0.0, 2.5)
    val schema = StructType(Seq(StructField("v", DoubleType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vals.map(Row(_)), 2), schema)
    val n = df.filter(graft.functions.isNa(col("v"))).count()
    assert(n == 2, s"isNa must catch null AND NaN, got $n")
    val cleaned = df.select(graft.functions.nanToNull(col("v")).as("v"))
      .filter(col("v").isNull).count()
    assert(cleaned == 2, s"nanToNull must map NaN to null, got $cleaned")
  }
}
