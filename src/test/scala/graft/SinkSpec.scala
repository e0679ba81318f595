package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Sink surface (SURVEY §2.1: `tofile`/`to_csv` → `df.write`) plus the
  * scale property that matters on the way back in: a partitioned layout
  * must prune at the scan. */
class SinkSpec extends SparkSpecBase {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_$name").toString

  test("parquet write round-trips exactly") {
    val dir = tmp("pq")
    val out = Tables(spark, sf, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    out.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.exceptAll(out).isEmpty && out.exceptAll(back).isEmpty)
  }

  test("csv write with header round-trips under an explicit schema") {
    val dir = tmp("csv")
    val out = Tables(spark, sf, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    out.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(out.schema).csv(dir)
    assert(back.exceptAll(out).isEmpty && out.exceptAll(back).isEmpty)
  }

  test("hive-partitioned write prunes partitions at read time") {
    val dir = tmp("part")
    Tables(spark, sf, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("o_year") === 1995)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"),
      "partition filter did not reach the scan:\n" + plan.take(500))
    val want = Tables(spark, sf, "orders")
      .filter(year(col("o_orderdate")) === 1995).count()
    assert(pruned.count() == want && want > 0)
  }
}
