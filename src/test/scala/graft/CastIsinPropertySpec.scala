package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** astype/isin/set-op semantics vs sequential references on generated
  * values: double→long truncation toward zero (numpy astype, not SQL
  * rounding), long→string formatting, isin membership incl. negatives,
  * and union/intersect/except multiset behavior. */
class CastIsinPropertySpec extends SparkSpecBase {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(53L + i)))

  test("double -> long cast truncates toward zero like numpy astype") {
    val vals = (Seq(-2.7, -2.2, -0.9, 0.0, 0.9, 2.2, 2.7) ++
      samples(Gen.chooseNum(-10000, 10000).map(_ / 100.0), 60)).distinct
    val schema = StructType(Seq(StructField("v", DoubleType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vals.map(Row(_)), 3), schema)
    val got = df.select(col("v"), col("v").cast("long").as("l"),
        col("v").cast("string").as("s"))
      .collect().map(r => r.getDouble(0) -> (r.getLong(1), r.getString(2))).toMap
    for (v <- vals) {
      assert(got(v)._1 == v.toLong, s"$v: cast must truncate toward zero")
      assert(got(v)._2.toDouble == v, s"$v: string round-trip")
    }
  }

  test("isin matches set membership for arbitrary probe lists") {
    val probes = samples(Gen.listOfN(8, Gen.chooseNum(-50L, 50L)), 10)
      .map(_.distinct).filter(_.nonEmpty)
    val vals = (-60L to 60L).toList
    val schema = StructType(Seq(StructField("v", LongType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vals.map(Row(_)), 3), schema)
    for (p <- probes) {
      val got = df.filter(col("v").isin(p: _*))
        .collect().map(_.getLong(0)).toSet
      assert(got == vals.filter(p.contains).toSet, s"probes=$p")
    }
  }

  test("union keeps duplicates, intersect/except are distinct set ops") {
    val a = samples(Gen.listOfN(30, Gen.chooseNum(0L, 15L)), 4)
    val b = samples(Gen.listOfN(30, Gen.chooseNum(8L, 25L)), 4)
    val schema = StructType(Seq(StructField("v", LongType, nullable = false)))
    def mk(xs: Seq[Long]) = spark.createDataFrame(
      spark.sparkContext.parallelize(xs.map(Row(_)), 3), schema)
    for ((xa, xb) <- a.zip(b)) {
      val (da, db) = (mk(xa), mk(xb))
      // union == concat: row multiset is the concatenation
      val u = da.union(db).collect().map(_.getLong(0))
        .groupBy(identity).map { case (k, g) => k -> g.size }
      val wantU = (xa ++ xb).groupBy(identity).map { case (k, g) => k -> g.size }
      assert(u == wantU)
      val i = da.intersect(db).collect().map(_.getLong(0)).toSet
      assert(i == xa.toSet.intersect(xb.toSet))
      val e = da.except(db).collect().map(_.getLong(0)).toSet
      assert(e == xa.toSet.diff(xb.toSet))
    }
  }

  test("dropDuplicates keeps exactly one row per key under any partitioning") {
    val xs = samples(Gen.listOfN(60, Gen.chooseNum(0L, 20L)), 3).flatten
    val schema = StructType(Seq(StructField("v", LongType, nullable = false)))
    for (parts <- Seq(1, 7)) {
      val got = spark.createDataFrame(
          spark.sparkContext.parallelize(xs.map(Row(_)), parts), schema)
        .dropDuplicates("v").collect().map(_.getLong(0)).sorted
      assert(got.sameElements(xs.distinct.sorted))
    }
  }
}
