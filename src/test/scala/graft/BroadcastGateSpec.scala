package graft

import org.apache.spark.sql.functions._

import graft.queries.GroupBy

/** The dimension-broadcast gate: forced `broadcast()` hints are reserved
  * for dims whose cardinality is FIXED at every scale factor
  * (region = 5, nation = 25). SF-scaling dims (customer/part/supplier —
  * ~15 B customer rows at the 100 TB point) go through
  * [[Tables.dimHint]], which passes them UNHINTED: a forced hint
  * overrides Spark's size checks and OOMs executors once the dim
  * outgrows them. This spec pins both halves of the contract:
  *
  *  - at this SF the scaling dims still broadcast, but as a *decision
  *    from sizes* — statically from the parquet estimate, or (with the
  *    static path forbidden) at runtime by AQE from the measured
  *    shuffle — never from a hint;
  *  - the fixed dims keep their forced hint even when the static
  *    threshold is disabled, because a 25-row table is broadcast-safe
  *    unconditionally.
  */
class BroadcastGateSpec extends SparkSpecBase {

  test("fixedDims is exactly the SF-invariant tables; dimHint hints only those") {
    assert(Tables.fixedDims === Set("region", "nation"),
      "only tables whose size cannot grow with SF may carry a forced hint")
    val df = Tables(spark, sf, "customer")
    // an unhinted pass-through has the identical logical plan
    assert(Tables.dimHint("customer", df).queryExecution.logical ===
      df.queryExecution.logical,
      "SF-scaling dims must pass through dimHint without a hint")
    assert(Tables.dimHint("nation", df).queryExecution.logical !==
      df.queryExecution.logical,
      "fixed dims must come back wrapped in a broadcast hint")
  }

  test("q_tpch_q3's customer broadcast is a runtime AQE decision, not a hint") {
    // Forbid static broadcast entirely; allow AQE's measured conversion.
    // Any BroadcastHashJoin in the FINAL plan is then provably a
    // runtime re-plan from real sizes — the mechanism that replaces the
    // old forced hint and stays safe when customer is 15 B rows.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "1048576")
    val saved = confs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption.flatMap(Option(_))
    }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val df = GroupBy.queries("q_tpch_q3")(spark, sf)
      val initial = df.queryExecution.executedPlan.toString
      assert(!initial.contains("BroadcastHashJoin"),
        "with the static threshold disabled no broadcast may survive " +
          "planning — a forced hint is leaking through dimHint:\n" +
          initial.take(1600))
      val rows = df.collect()
      assert(rows.nonEmpty)
      val fin = df.queryExecution.executedPlan.toString
      assert(fin.contains("BroadcastHashJoin"),
        "AQE did not re-plan the BUILDING-customer join to broadcast " +
          "from the measured shuffle size:\n" + fin.take(3000))
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("fixed dims keep the forced hint when the static threshold is disabled") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val p = GroupBy.queries("q_tpch_q5")(spark, sf)
        .queryExecution.executedPlan.toString
      // region and nation joins stay broadcast (hinted) in the INITIAL
      // plan; the degated customer/supplier joins fall back to shuffle
      // joins until AQE measures them
      val bcast = "BroadcastHashJoin".r.findAllIn(p).size
      assert(bcast >= 2,
        s"region/nation hints must survive threshold=-1 (saw $bcast):\n" +
          p.take(1600))
      assert(p.contains("SortMergeJoin"),
        "scaling dims must NOT be forced to broadcast:\n" + p.take(1600))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
