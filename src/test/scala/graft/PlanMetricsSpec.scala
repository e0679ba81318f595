package graft

import org.apache.spark.sql.functions._

/** Plan-DRIFT gate on executed resource metrics: runs a fixed-plan
  * query family under the spec session, attributes shuffle bytes and
  * task counts per query via [[BenchMetrics.MetricsListener]] (job
  * groups — the same machinery the BENCH_METRICS artifacts use), and
  * fails when any query moves >10% against the committed baseline
  * (`PLAN_METRICS_BASELINE.txt`, recorded under this exact session
  * config: local[4,2], 4 shuffle partitions, sf0.001).
  *
  * Rationale (VERDICT r10 #5): the TPC-H pins assert EXCHANGE COUNTS;
  * this asserts the BYTES AND TASKS those exchanges move — the metric
  * pair r10 demonstrated is exactly reproducible for a fixed plan +
  * fixture + config (0 drift across runs 40 min apart) while
  * wall-clock wobbles ±27%. A regression that keeps the exchange
  * count but fattens an exchange (lost column pruning, a filter no
  * longer pushed below a shuffle, a broadcast silently demoted) trips
  * here and nowhere else in the suite. Spill bytes are deliberately
  * NOT asserted — they depend on memory pressure, not the plan.
  *
  * Regenerate after an INTENDED plan change:
  * `SPARK_GRAFT_REGEN_PLAN_BASELINE=1 sbt "testOnly graft.PlanMetricsSpec"`
  * then commit the rewritten baseline with the plan change itself.
  */
class PlanMetricsSpec extends SparkSpecBase {

  private val baselinePath = java.nio.file.Paths.get("PLAN_METRICS_BASELINE.txt")

  /** Fixed-plan family: deterministic scans, no temp-dir fixtures, no
    * convergence loops — the queries whose physical metrics are pure
    * functions of (plan, fixture, config). */
  private val family = Seq(
    "q_tpch_q1", "q_tpch_q3", "q_tpch_q6", "q_tpch_q9", "q_tpch_q17",
    "q_join_multi_key", "q_groupby_agg", "q_agg_quantile",
    "q_ffill_bfill", "q_corr_matrix")

  test("fixed-plan families hold shuffle bytes and task counts within 10% of baseline") {
    val listener = new BenchMetrics.MetricsListener
    spark.sparkContext.addSparkListener(listener)
    try {
      for (name <- family) {
        spark.sparkContext.setJobGroup(BenchMetrics.GroupPrefix + name,
          s"plan-metrics: $name", interruptOnCancel = false)
        try SparkEntry.queries(name)(spark, sf)
          .write.mode("overwrite").format("noop").save()
        finally spark.sparkContext.clearJobGroup()
      }
      listener.quiesce()
      val current = family.map { name =>
        val a = listener.acc.getOrElse(name, Array.fill(7)(0L))
        name -> (a(0), a(1), a(4)) // read bytes, write bytes, tasks
      }.toMap

      if (sys.env.get("SPARK_GRAFT_REGEN_PLAN_BASELINE").contains("1")) {
        val body = family.map { n =>
          val (r, w, t) = current(n); s"$n $r $w $t"
        }.mkString(
          "# name shuffle_read_b shuffle_write_b tasks — recorded by\n" +
            "# PlanMetricsSpec under local[4,2] / 4 shuffle partitions /\n" +
            "# sf0.001; regenerate via SPARK_GRAFT_REGEN_PLAN_BASELINE=1\n",
          "\n", "\n")
        java.nio.file.Files.write(baselinePath, body.getBytes("UTF-8"))
        info(s"baseline regenerated at $baselinePath")
      } else {
        assert(java.nio.file.Files.exists(baselinePath),
          s"missing $baselinePath — run with SPARK_GRAFT_REGEN_PLAN_BASELINE=1")
        val base = new String(java.nio.file.Files.readAllBytes(baselinePath),
            "UTF-8")
          .linesIterator.filterNot(l => l.startsWith("#") || l.isBlank)
          .map { l =>
            val p = l.trim.split("\\s+")
            p(0) -> (p(1).toLong, p(2).toLong, p(3).toLong)
          }.toMap
        assert(base.keySet == family.toSet,
          s"baseline query set ${base.keySet} != family ${family.toSet} — regenerate")
        // metric-specific floors: shuffle BYTES keep a 64-byte absolute
        // floor (codec/framing noise on near-empty exchanges); TASK
        // counts get a floor of 1 — under local[4]/4 partitions the
        // baselines are tens of tasks, so a 64-task floor would let a
        // partition-count regression double or triple the task count
        // without tripping (ADVICE r11)
        def check(name: String, metric: String, cur: Long, b: Long,
                  floor: Double): Unit =
          assert(math.abs(cur - b) <= math.max(0.10 * b, floor),
            s"$name $metric moved >10%: baseline=$b current=$cur — " +
              "plan drift (or an intended change: regenerate the baseline)")
        for (name <- family) {
          val (br, bw, bt) = base(name)
          val (cr, cw, ct) = current(name)
          check(name, "shuffle_read_b", cr, br, 64.0)
          check(name, "shuffle_write_b", cw, bw, 64.0)
          check(name, "tasks", ct, bt, 1.0)
        }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
