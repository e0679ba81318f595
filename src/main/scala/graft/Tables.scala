package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided TPC-H-ish tables (TESTDATA.md).
  *
  * All tables are single parquet files per scale factor. At cluster scale
  * these would be partitioned directories; `spark.read.parquet` handles both
  * transparently, and every query in this engine relies on Catalyst pushing
  * filters/projections into the scan (verified via `.explain` in specs).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Small dimension tables that should always be broadcast in joins. */
  val broadcastable: Set[String] = Set("region", "nation", "supplier", "part", "customer")
}
