package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-5 pipeline queries (drop_duplicates,
  * stratified sampling, contamination scan) on sf0.001 — the oracle gate
  * checks exact values; these pin the semantic contracts. */
class PipelineQueriesSpec extends SparkSpecBase {
  import spark.implicits._

  test("drop_duplicates keeps exactly one row per subset key, the min-position one") {
    val got = SparkEntry.queries("q_drop_duplicates")(spark, sf)
    val keys = got.select("o_custkey", "o_orderstatus")
    assert(keys.count() == keys.distinct().count())
    val expected = Tables(spark, sf, "orders")
      .groupBy(col("o_custkey"), col("o_orderstatus"))
      .agg(min(col("o_orderkey")).as("k"))
      .agg(sum(col("k"))).as[Long].head()
    val gotSum = got.agg(sum(col("o_orderkey"))).as[Long].head()
    assert(gotSum == expected)
  }

  test("stratified sample is deterministic and actually downsamples 'en'") {
    val a = SparkEntry.queries("q_stratified_sample")(spark, sf)
      .as[(Long, String)].collect().toSeq
    val b = SparkEntry.queries("q_stratified_sample")(spark, sf)
      .as[(Long, String)].collect().toSeq
    assert(a == b)
    val docs = Tables(spark, sf, "documents")
    val rates = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val kept = a.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    // en keeps ~20%, others ~60% — allow wide slack at tiny sf, but the
    // ordering of the rates must hold
    val enRate = kept.getOrElse("en", 0L).toDouble / rates("en")
    val otherKept = (kept - "en").values.sum.toDouble
    val otherAll = (rates - "en").values.sum.toDouble
    assert(enRate < otherKept / otherAll,
      s"en rate $enRate should be below the others' ${otherKept / otherAll}")
  }

  test("contamination scan covers exactly the test split and bounds the ratio") {
    val got = SparkEntry.queries("q_contamination")(spark, sf)
      .select(col("doc_id"), col("n_shingles"), col("n_hit"))
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (_, n, h) => h >= 0 && h <= n && n > 0 })
    // doc ids must be exactly the test bucket (md5 bucket >= 90)
    val testIds = Tables(spark, sf, "documents")
      .filter(pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8),
        16, 10).cast("long"), lit(100L)) >= 90)
      .select("doc_id").as[Long].collect().toSet
    assert(got.map(_._1).toSet == testIds)
  }
}
