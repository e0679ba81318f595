package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
    if (name == "events") normalizeTs(spark.read.parquet(s"$sfDir/events.parquet"))
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Normalize events.ts to a session-UTC TIMESTAMP regardless of how the
    * file encodes it — the generator has shipped both layouts across
    * rounds, and the engine must read either without regeneration:
    *
    *  - parquet TIMESTAMP(NANOS): Spark refuses it by default
    *    (PARQUET_TYPE_ILLEGAL); with [[nanosConf]] it reads as a LONG of
    *    ns-epoch. Convert with integer division — `ts div 1000` stays in
    *    long arithmetic (double division would lose precision above 2^53,
    *    i.e. for any ns-epoch value), matching the DuckDB oracle's
    *    CAST(ts AS TIMESTAMP) truncation. IntegralDivide truncates toward
    *    zero, which for a hypothetical pre-1970 (negative) ns epoch would
    *    differ from floor-based ns→µs conversion; the event stream is
    *    post-epoch by construction (TESTDATA.md).
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): reads as
    *    TIMESTAMP_NTZ. Cast to TIMESTAMP — the session timezone is pinned
    *    to UTC everywhere (Bench/Verify/specs), so the NTZ wall-clock
    *    value maps to the identical instant and every downstream
    *    expression sees the same TimestampType as the nanos path.
    */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case TimestampType => df
    case other => sys.error(s"unexpected events.ts type: $other")
  }

  /** Small dimension tables that should always be broadcast in joins. */
  val broadcastable: Set[String] = Set("region", "nation", "supplier", "part", "customer")
}
