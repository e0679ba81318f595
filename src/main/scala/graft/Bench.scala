package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract). One warm-up pass amortizes
  * scan/codegen setup (the reference's perf harness likewise measures
  * warm medians — `sdc/tests/tests_perf/test_perf_base.py:42-62`). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosConf._1, Tables.nanosConf._2)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Optional args narrow the run to named queries — local iteration
    // only; the driver passes no args and benches the full headline set.
    // Unresolvable names are an ERROR whether they come from args (a
    // typo) or from a stale benchQueries entry — never a silent no-op
    // that benches fewer queries and exits 0.
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.benchQueries
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    // Evaluate via the noop sink, NOT count(): count() lets Catalyst prune
    // every projected column, so a projection-heavy query would bench as
    // a bare scan. noop forces full evaluation of every output column.
    def run(name: String): Boolean =
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save(); true
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
        false
      }
    // Warm-up: JIT + codegen + file-footer caches. Failures logged loudly —
    // a broken query must never silently bench as a no-op — and
    // short-circuit the timed reps (re-running a known-broken query
    // `reps` more times just burns wall-clock and spams the log).
    val warmFailed = names.filterNot(run).toSet
    // SPARK_GRAFT_BENCH_REPS timed repetitions, median reported — the
    // reference perf harness's methodology (median of warm runs,
    // `sdc/tests/tests_perf/test_perf_base.py:42-62`). Default 3: this
    // box shows ±2× single-run noise, and a median-of-3 costs ~1 min of
    // extra wall-clock against stable numbers. A set-but-unparsable
    // value is an explicit error, not a silent fallback.
    val repsEnv = sys.env.get("SPARK_GRAFT_BENCH_REPS")
    val reps = repsEnv match {
      case None => 3
      case Some(v) => v.toIntOption.filter(_ >= 1).getOrElse(
        sys.error(s"SPARK_GRAFT_BENCH_REPS must be a positive int, got '$v'"))
    }
    val results = names.map { name =>
      if (warmFailed(name)) name -> -1.0
      else {
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val ok = run(name)
          if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        }
        val med =
          if (times.contains(-1.0)) -1.0
          else {
            val s = times.sorted
            if (reps % 2 == 1) s(reps / 2)
            else (s(reps / 2 - 1) + s(reps / 2)) / 2.0
          }
        name -> med
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
