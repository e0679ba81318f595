package graft

import org.apache.spark.sql.functions._

/** The 100 TB co-location story must actually hold: two tables bucketed
  * on the join key sort-merge-join with NO exchange above either scan.
  * This is the layout a production deployment gives the big fact tables
  * (and the signature/index frames Dedup/Similarity materialize). */
class BucketingSpec extends SparkSpecBase {

  test("bucketed-by-key tables join without a shuffle") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables(spark, sf, "lineitem")
      li.select(col("l_suppkey"), col("l_orderkey"), col("l_quantity"))
        .write.mode("overwrite")
        .bucketBy(8, "l_suppkey").sortBy("l_suppkey")
        .saveAsTable("li_qty_b")
      li.select(col("l_suppkey"), col("l_extendedprice"))
        .write.mode("overwrite")
        .bucketBy(8, "l_suppkey").sortBy("l_suppkey")
        .saveAsTable("li_price_b")

      val joined = spark.table("li_qty_b")
        .join(spark.table("li_price_b"), Seq("l_suppkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(400))
      assert(!plan.contains("Exchange"), "bucketed join must not shuffle:\n" +
        plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_qty_b")
      spark.sql("DROP TABLE IF EXISTS li_price_b")
    }
  }

  test("q_join_multi_key_bucketed: aggregates + join ride the buckets, zero pre-sort exchanges") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q_join_multi_key_bucketed")(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      // the ONLY exchange allowed is the final presentation sort's
      // rangepartitioning — both aggregates and the SMJ must reuse the
      // (l_partkey, l_suppkey) bucket partitioning
      val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
      assert(exchanges.size == 1 &&
        exchanges.head.contains("rangepartitioning"),
        s"expected only the orderBy range exchange, got:\n${exchanges.mkString("\n")}")
      assert(plan.contains("SortMergeJoin"), plan.take(600))
      // same answer as the unbucketed twin
      val bucketed = df.collect().toSeq
      val plain = SparkEntry.queries("q_join_multi_key")(spark, sf)
        .collect().toSeq
      assert(bucketed == plain,
        s"bucketed twin diverged: ${bucketed.size} vs ${plain.size} rows")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }
}
