package graft

import org.apache.spark.sql.functions._

import graft.queries.GroupBy

/** Row-level runtime join pruning — the 100 TB complement of the two
  * pins this engine already carries: DPP (partition-level pruning,
  * q_dpp_join) and AQE's SMJ→BHJ conversion (AqeSkewSpec). Spark 4
  * injects a bloom filter built from a selective join side into the
  * other side's scan (`spark.sql.optimizer.runtime.bloomFilter.enabled`
  * is on by default); it activates when the application side's scan
  * exceeds 10 GiB — i.e. exactly the regime the unhinted dimension
  * joins (BroadcastGateSpec) enter at real scale, where customer/part
  * no longer broadcast and every skipped fact row pays for itself.
  * The spec lowers the size gate to witness the mechanism at fixture
  * scale and pins both the plan shape and answer equality. */
class RuntimeFilterSpec extends SparkSpecBase {

  private val confs = Seq(
    // the fixture scan is KiB-sized; drop the 10 GiB application-side
    // gate so the injection fires here the way it would at 100 TB
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
    // forbid broadcast so the join is the shuffle join the filter
    // exists for (a broadcast build already prunes during the probe)
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  private def withConfs[T](body: => T): T = {
    val saved = confs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption.flatMap(Option(_))
    }
    try { confs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("a selective dim side injects a bloom runtime filter into the fact scan") {
    withConfs {
      val li = Tables(spark, sf, "lineitem")
      val ord = Tables(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("bloom_filter_agg"),
        "the selective side must build the bloom filter:\n" + p.take(1600))
      assert(p.toLowerCase.contains("might_contain"),
        "the fact side must carry the might_contain runtime filter:\n" +
          p.take(1600))
    }
  }

  test("the runtime filter changes the plan, never the answer") {
    def run(): Seq[org.apache.spark.sql.Row] = withConfs {
      GroupBy.queries("q_tpch_q3")(spark, sf).collect().toSeq
    }
    val filtered = run()
    val prev = spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    val plain = try run()
      finally spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", prev)
    assert(filtered == plain, "bloom pruning must be answer-preserving")
  }
}
