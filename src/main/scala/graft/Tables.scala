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

  /** Sessions that read the events table must be built with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (Bench/Verify and the
    * test harness set it at builder time — a per-table `conf.set` here
    * would silently change how every LATER parquet read in the session
    * treats nanos columns, masking schema problems). */
  val nanosConf: (String, String) = ("spark.sql.legacy.parquet.nanosAsLong", "true")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark refuses by
      // default (PARQUET_TYPE_ILLEGAL). Read it as a long and convert to
      // a micros timestamp with integer division — `ts div 1000` stays in
      // long arithmetic (double division would lose precision above 2^53,
      // i.e. for any ns-epoch value). Matches the DuckDB oracle's
      // CAST(ts AS TIMESTAMP) truncation, UTC semantics. NOTE: IntegralDivide
      // truncates toward zero, which for a hypothetical pre-1970 (negative)
      // ns epoch would differ from floor-based ns→µs conversion; the event
      // stream is post-epoch by construction (TESTDATA.md), matching the
      // oracle's identical truncation either way.
      spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Small dimension tables that should always be broadcast in joins. */
  val broadcastable: Set[String] = Set("region", "nation", "supplier", "part", "customer")
}
