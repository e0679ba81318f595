package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** GroupBy aggregate and join-shape semantics vs sequential references
  * on generated nullable grouped data — the skipna rules (nulls vanish
  * from sum/mean/var but count(col) vs count(*) differ), ddof=1
  * variance, and inner/left/outer row multisets. */
class GroupByJoinPropertySpec extends SparkSpecBase {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(61L + i)))

  private val frames: Seq[List[(String, Option[Double])]] =
    samples(Gen.listOfN(50, for {
      k <- Gen.oneOf("a", "b", "c", "d")
      // quarters are dyadic — exact doubles, so sums are order-free and
      // the sequential reference compares exactly
      v <- Gen.frequency(
        4 -> Gen.chooseNum(-500, 500).map(x => Some(x / 4.0)),
        1 -> Gen.const(None))
    } yield (k, v)), 5)

  private def mk(xs: List[(String, Option[Double])]) = {
    val schema = StructType(Seq(
      StructField("k", StringType, nullable = false),
      StructField("v", DoubleType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        xs.map { case (k, v) => Row(k, v.orNull) }, 3), schema)
  }

  test("groupby sum/mean/count/min/max/var skip nulls like pandas") {
    for (xs <- frames) {
      val got = mk(xs).groupBy(col("k"))
        .agg(count(col("v")).as("n"), count(lit(1)).as("rows"),
          sum(col("v")).as("s"), avg(col("v")).as("m"),
          min(col("v")).as("mn"), max(col("v")).as("mx"),
          var_samp(col("v")).as("vr"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), Option(r.get(3)), Option(r.get(4)),
            Option(r.get(5)), Option(r.get(6)), Option(r.get(7)))).toMap
      for ((k, grp) <- xs.groupBy(_._1)) {
        val vs = grp.flatMap(_._2)
        val (n, rows, s, m, mn, mx, vr) = got(k)
        assert(n == vs.size && rows == grp.size, k)
        if (vs.nonEmpty) {
          assert(s.map(_.asInstanceOf[Double]).contains(vs.sum), s"sum $k")
          val mean = vs.sum / vs.size
          assert(math.abs(m.get.asInstanceOf[Double] - mean) < 1e-9, s"mean $k")
          assert(mn.map(_.asInstanceOf[Double]).contains(vs.min), s"min $k")
          assert(mx.map(_.asInstanceOf[Double]).contains(vs.max), s"max $k")
          if (vs.size >= 2) {
            val want = vs.map(x => (x - mean) * (x - mean)).sum / (vs.size - 1)
            assert(math.abs(vr.get.asInstanceOf[Double] - want) < 1e-9, s"var $k")
          } else assert(vr.isEmpty, s"var of 1 value must be null, $k")
        } else {
          assert(s.isEmpty && m.isEmpty && mn.isEmpty && mx.isEmpty, s"all-null $k")
        }
      }
    }
  }

  test("groupby first/last over an explicit order match the sorted sequence") {
    for (xs <- frames) {
      val df = mk(xs).withColumn("pos",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("k"), col("v").asc_nulls_last)))
      val got = df.groupBy(col("k"))
        .agg(min_by(col("v"), col("pos")).as("first"),
          max_by(col("v"), col("pos")).as("last"))
        .collect().map(r => r.getString(0) ->
          (Option(r.get(1)), Option(r.get(2)))).toMap
      for ((k, grp) <- xs.groupBy(_._1)) {
        val sortedVs = grp.map(_._2)
          .sortBy(v => (v.isEmpty, v.getOrElse(0.0)))
        assert(got(k)._1.map(_.asInstanceOf[Double]) == sortedVs.head, s"first $k")
        assert(got(k)._2.map(_.asInstanceOf[Double]) == sortedVs.last, s"last $k")
      }
    }
  }

  test("inner/left/outer joins produce the exact row multisets") {
    val pairs = samples(for {
      l <- Gen.listOfN(20, Gen.chooseNum(0L, 8L))
      r <- Gen.listOfN(20, Gen.chooseNum(4L, 12L))
    } yield (l, r), 4)
    val schema = StructType(Seq(StructField("k", LongType, nullable = false)))
    def mkk(xs: Seq[Long]) = spark.createDataFrame(
      spark.sparkContext.parallelize(xs.map(Row(_)), 3), schema)
    for ((ls, rs) <- pairs) {
      val (dl, dr) = (mkk(ls), mkk(rs))
      val lc = ls.groupBy(identity).view.mapValues(_.size).toMap
      val rc = rs.groupBy(identity).view.mapValues(_.size).toMap
      val inner = dl.join(dr, Seq("k")).count()
      assert(inner == lc.map { case (k, n) => n * rc.getOrElse(k, 0) }.sum,
        "inner")
      val left = dl.join(dr, Seq("k"), "left").count()
      assert(left == lc.map { case (k, n) =>
        n * math.max(rc.getOrElse(k, 0), 1) }.sum, "left")
      val outer = dl.join(dr, Seq("k"), "outer").count()
      val rightOnly = rc.filter { case (k, _) => !lc.contains(k) }.values.sum
      assert(outer == left + rightOnly, "outer")
    }
  }
}
