package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{GlobalOrder, Pin}

/** The two [[graft.operators.Pin]] modes must be bit-identical: the
  * reliable-checkpoint path (cluster fault tolerance) may differ from
  * localCheckpoint only in WHERE blocks live, never in contents or
  * partition identity — every offset composition and loop-severed plan
  * built on a pin depends on that. */
class PinSpec extends SparkSpecBase {

  private def withReliable[A](body: => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set(Pin.FLAG, "true")
    try body
    finally {
      spark.conf.set(Pin.FLAG, "false")
      // checkpoint files are per-run scratch; reclaim them
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("reliable checkpoint preserves partition identity for GlobalOrder") {
    val df = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    def run() = rows(GlobalOrder.withRunningSum(
      GlobalOrder.withRowNumberLong(df, Seq(col("o_orderkey")), "rk"),
      Seq(col("o_orderkey")), col("o_totalprice"), "csum", scale = 2))
    val local = run()
    val reliable = withReliable(run())
    assert(local == reliable)
    assert(local.nonEmpty)
  }

  test("checkpoint-heavy queries are mode-invariant (tpch_q15, span_dedup)") {
    for (q <- Seq("q_tpch_q15", "q_span_dedup")) {
      val local = rows(SparkEntry.queries(q)(spark, sf))
      val reliable = withReliable(rows(SparkEntry.queries(q)(spark, sf)))
      assert(local == reliable, s"$q differs between pin modes")
      assert(local.nonEmpty, s"$q empty")
    }
  }

  test("reliable mode actually writes to the checkpoint dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_probe")
    spark.sparkContext.setCheckpointDir(dir.toString)
    spark.conf.set(Pin.FLAG, "true")
    try {
      Pin(Tables(spark, sf, "nation")).count()
      val wrote = java.nio.file.Files.walk(dir).filter(_.toFile.isFile)
        .count()
      assert(wrote > 0, "no checkpoint files written in reliable mode")
    } finally {
      spark.conf.set(Pin.FLAG, "false")
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    }
  }
}
