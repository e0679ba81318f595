package graft

import org.apache.spark.sql.functions._

/** Evidence that Spark's OWN skew mitigation engages on this engine's
  * plans when salting is OFF: AQE's OptimizeSkewedJoin must detect the
  * oversized shuffle partition of a hot key and split it at runtime.
  *
  * `operators.Skew` exists for the cases AQE can NOT fix (hash-agg
  * pre-shuffle hot keys, broadcast-infeasible builds); for the plain
  * skewed sort-merge join, the engine deliberately leans on AQE — this
  * spec pins that the lean is real, not assumed. Thresholds are lowered
  * to make a spec-sized hot key (95% of 200k rows) cross the same
  * relative bars a multi-GB hot partition crosses at cluster scale
  * (size > max(threshold, factor × median partition)).
  */
class AqeSkewSpec extends SparkSpecBase {

  private val tuned = Seq(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force sort-merge
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2")

  test("AQE splits a skewed sort-merge join at runtime with salting OFF") {
    val saved = tuned.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption
    }
    try {
      tuned.foreach { case (k, v) => spark.conf.set(k, v) }
      // one hot key holding 95% of the big side — the organic-skew shape
      // (Zipf head) the sf1 generator produces on user_id/custkey
      val big = spark.range(200000).select(
        when(pmod(col("id"), lit(20)) === 0,
          concat(lit("k"), pmod(col("id"), lit(7)).cast("string")))
          .otherwise(lit("heavy")).as("k"),
        col("id").as("v"))
      val dim = spark.range(8).select(
        when(col("id") === 7, lit("heavy"))
          .otherwise(concat(lit("k"), col("id").cast("string"))).as("k"),
        col("id").as("label"))
      // downstream must NOT require the join's hash partitioning — a
      // groupBy on the join key would make OptimizeSkewedJoin decline
      // the split (it refuses to break a required output partitioning);
      // a global aggregate leaves AQE free, which is also the common
      // shape (join feeding a differently-keyed stage)
      val joined = big.join(dim, Seq("k"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("k") === "heavy", 1L).otherwise(0L)).as("n_heavy"))
      val row = joined.collect()(0)
      // correctness unaffected by the split
      assert(row.getLong(0) === 200000L && row.getLong(1) === 190000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "AQE skew-join split did not activate — expected a SortMergeJoin " +
          "marked skew=true in the final adaptive plan:\n" + plan.take(3000))
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("AQE converts a statically-planned sort-merge join to broadcast " +
    "once runtime sizes are known") {
    // The complement of explicit broadcast() hints: at 100 TB the
    // engine cannot know ahead of time that a filtered/aggregated side
    // collapses to sketch size — AQE measures the finished shuffle and
    // re-plans the join as broadcast. Static threshold -1 forbids the
    // planner from EVER choosing broadcast statically, so any
    // BroadcastHashJoin in the final plan is a runtime decision.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "1048576")
    val saved = confs.map { case (k, _) =>
      // flatMap(Option(_)): this conf's unset default is a NULL string,
      // which conf.set rejects on restore — treat it as absent
      k -> scala.util.Try(spark.conf.get(k)).toOption.flatMap(Option(_))
    }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val big = spark.range(200000).select(
        pmod(col("id"), lit(1000)).as("k"), col("id").as("v"))
      // the dim side SHRINKS at runtime: 200k rows aggregate to 1000
      val dim = spark.range(200000)
        .select(pmod(col("id"), lit(1000)).as("k"))
        .groupBy("k").agg(max(lit(1)).as("flag"))
      val joined = big.join(dim, Seq("k"))
        .agg(count(lit(1)).as("n"))
      assert(joined.collect()(0).getLong(0) === 200000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        "AQE did not convert the join to broadcast at runtime:\n" +
          plan.take(3000))
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
