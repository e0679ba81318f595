package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

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
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark refuses by
      // default (PARQUET_TYPE_ILLEGAL). Read it as a long and convert to
      // a micros timestamp with integer division — `ts div 1000` stays in
      // long arithmetic (double division would lose precision above 2^53,
      // i.e. for any ns-epoch value). Matches the DuckDB oracle's
      // CAST(ts AS TIMESTAMP) truncation, UTC semantics.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Small dimension tables that should always be broadcast in joins. */
  val broadcastable: Set[String] = Set("region", "nation", "supplier", "part", "customer")
}
