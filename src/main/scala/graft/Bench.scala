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
    // Session scrub between queries: r5's full-run median for q_tpch_q1
    // read 6× its isolated cost because 26 other queries' warm-up residue
    // (leaked streaming memory-sink rows on the driver heap, lingering
    // cache entries, deferred GC debt) was charged to whichever query was
    // timed first. Stop stray streams, drop CacheManager entries and
    // memory-sink temp views, and collect garbage so each query is timed
    // against a quiet session — the same state the isolated probe sees.
    def scrub(): Unit = {
      spark.streams.active.foreach(_.stop())
      spark.catalog.clearCache()
      spark.catalog.listTables().filter(_.isTemporary)
        .collect().foreach(t => spark.catalog.dropTempView(t.name))
      System.gc()
    }
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
    // Per-query: scrub, ONE warm-up run (JIT + codegen + file-footer
    // caches — failures logged loudly and short-circuiting the timed
    // reps), then `reps` timed runs with a GC between reps. Warming each
    // query immediately before its own timing — rather than one global
    // warm-up pass over every query — keeps cross-query residue out of
    // the measurement window.
    val results = names.map { name =>
      scrub()
      if (!run(name)) name -> -1.0
      else {
        val times = (1 to reps).map { i =>
          if (i > 1) System.gc()
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
    // 3-decimal rendering keeps the WHOLE line under ~1.8 KB at 70+
    // queries: the driver records only the last 2000 chars of output, and
    // full-precision doubles pushed rounds 7-8 past that, truncating the
    // line's head ("metric"/"value") so the driver's JSON parse failed.
    // Millisecond resolution is far below this box's ±2x run noise.
    def render(decimals: Int): String = {
      def fmt(v: Double): String =
        s"%.${decimals}f".formatLocal(java.util.Locale.ROOT, v)
      val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      // A failed query must poison the headline number, not subtract its
      // -1.0 sentinel from it (which would make a BROKEN round bench
      // faster than a working one).
      val total =
        if (results.exists(_._2 < 0)) -1.0 else results.map(_._2).sum
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    }
    // If the headline set ever grows enough that 3dp overflows the 1.9 KB
    // budget, degrade precision rather than the parse.
    val line = (3 to 1 by -1).iterator.map(render)
      .find(_.length <= 1900).getOrElse(render(1))
    println(line)
    spark.stop()
  }
}
