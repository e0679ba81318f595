package graft

import org.apache.spark.sql.SparkSession

/** Multi-executor failure-model witness (VERDICT r10 missing #2): runs
  * the pinned iterative family under a MULTI-JVM topology
  * (`spark-submit --master local-cluster[2,2,2048]` — separate worker
  * and executor processes, real serialization boundaries, real
  * executor loss) with `spark.graft.reliableCheckpoint=true`, then
  * re-runs one iterative query while an executor JVM is kill -9'd
  * mid-iteration.
  *
  * This is exactly the scenario the [[graft.operators.Pin]] scaladoc
  * documents: localCheckpoint truncates lineage onto non-replicated
  * executor blocks, so under executor loss the job FAILS; the reliable
  * mode checkpoints to a durable directory, so a relaunched executor
  * re-reads partitions instead of hitting lost lineage. Single-JVM
  * local[n] can never exercise that difference — this main provides
  * the executed evidence (results are written to parquet and compared
  * bit-for-bit against the oracle-gated local[4] outputs by
  * tools/multiexec_compare.py → MULTIEXEC_WITNESS.json).
  *
  * Usage (see README failure model):
  *   sbt package
  *   /opt/spark/bin/spark-submit --master 'local-cluster[2,2,2048]' \
  *     --class graft.MultiExecWitness target/scala-2.13/<jar> \
  *     /root/testdata/sf0.01 /tmp/multiexec_out
  */
object MultiExecWitness {

  private val WitnessQueries =
    Seq("q_pagerank_converged", "q_kmeans_converged", "q_dedup_cluster_star")

  /** kill -9 the first executor JVM of THIS application (never the
    * driver: executors are separate CoarseGrainedExecutorBackend
    * processes under local-cluster). The pgrep pattern includes the
    * app id — executor command lines carry `--app-id <id>` — so a
    * concurrent Spark job's executors (a parallel soak/bench run) are
    * never collateral (ADVICE r11). Returns the killed pid, if any. */
  private def killOneExecutor(appId: String): Option[String] = {
    import scala.sys.process._
    val pids = try {
      Seq("pgrep", "-f", s"CoarseGrainedExecutorBackend.*$appId").!!.trim
        .split("\\s+").filter(_.nonEmpty).toSeq
    } catch { case _: Exception => Seq.empty }
    pids.headOption.map { pid =>
      Seq("kill", "-9", pid).!
      pid
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val spark = SparkSession.builder()
      // master comes from spark-submit (local-cluster[2,2,2048])
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosConf._1, Tables.nanosConf._2)
      .config(Tables.aqeMinPartitionConf._1, Tables.aqeMinPartitionConf._2)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config(graft.operators.Pin.FLAG, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(s"$outDir/ckpt")
    require(spark.sparkContext.master.startsWith("local-cluster"),
      s"witness must run under local-cluster, got ${spark.sparkContext.master}")

    // Phase 1: the pinned iterative family, clean multi-JVM run.
    for (name <- WitnessQueries) {
      println(s"[multiexec] running $name")
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }

    // Phase 2: re-run the longest iterative query with an executor
    // killed mid-iteration. The standalone Worker relaunches the
    // executor; failed tasks retry; pinned iterates re-read from the
    // reliable checkpoint dir instead of dying on lost lineage.
    val appId = spark.sparkContext.applicationId
    val killer = new Thread(() => {
      Thread.sleep(4000)
      killOneExecutor(appId) match {
        case Some(pid) => println(s"[multiexec] killed executor pid $pid")
        case None => println("[multiexec] WARNING: no executor found to kill")
      }
    })
    killer.setDaemon(true)
    println("[multiexec] running q_pagerank_converged with executor kill")
    killer.start()
    SparkEntry.queries("q_pagerank_converged")(spark, sfDir)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/q_pagerank_converged_fault")
    killer.join(10000)
    println("[multiexec] done")
    spark.stop()
  }
}
