package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salting must change the shuffle shape and NOTHING else: salted
  * results equal their direct counterparts exactly on skewed data. */
class SkewSpec extends SparkSpecBase {

  import spark.implicits._

  // 90% of rows under one key — the hot-spot shape salting exists for.
  private lazy val skewed = (1 to 10000).map { i =>
    val k = if (i % 10 == 0) s"key_${i % 7}" else "heavy"
    (k, i.toLong, (i % 1000) / 100.0)
  }.toDF("k", "id", "v")

  test("salted two-phase aggregation equals the direct groupBy exactly") {
    val direct = skewed.groupBy(col("k"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("v").cast("decimal(30,2)")).cast("double").as("sum_v"))
    val salted = Skew.saltedSumCount(skewed, "k", "v", col("id"), buckets = 8)
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("salted join equals the direct inner join as a row multiset") {
    val dim = Seq(("heavy", "H"), ("key_0", "A"), ("key_3", "B"))
      .toDF("k", "label")
    val direct = skewed.join(dim, Seq("k")).select("k", "id", "v", "label")
    val salted = Skew.saltedJoin(skewed, dim, "k", col("id"), buckets = 8)
      .select("k", "id", "v", "label")
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("the salt actually spreads the heavy key across buckets") {
    val spread = skewed.filter(col("k") === "heavy")
      .select(Skew.saltOf(col("id"), 8).as("s"))
      .distinct().count()
    assert(spread == 8)
  }

  test("salted join drops null keys exactly like the direct inner join") {
    val withNulls = skewed.withColumn("k",
      when(col("id") % 13 === 0, lit(null)).otherwise(col("k")))
    val dim = Seq(("heavy", "H"), ("key_0", "A")).toDF("k", "label")
    val direct = withNulls.join(dim, Seq("k")).select("k", "id", "v", "label")
    val salted = Skew.saltedJoin(withNulls, dim, "k", col("id"), buckets = 8)
      .select("k", "id", "v", "label")
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
    assert(direct.filter(col("k").isNull).count() == 0)
  }

  test("salted join against an empty dim returns zero rows, not an error") {
    val dim = Seq.empty[(String, String)].toDF("k", "label")
    assert(Skew.saltedJoin(skewed, dim, "k", col("id"), buckets = 8).count() == 0)
  }
}
