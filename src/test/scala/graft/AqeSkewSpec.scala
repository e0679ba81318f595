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
}
