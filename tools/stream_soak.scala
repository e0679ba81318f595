// sf10 streaming soak: multi-batch AvailableNow replay of the two
// stateful headline streams over the 10M-event organic fixture, with
// the RocksDB state-store provider and per-batch state metrics
// recorded — the at-scale twin of StreamStateBoundSpec's MemoryStream
// plateau witness.
//
// The fixture is staged TIME-ORDERED into N chunk files (range
// repartition on ts, modtimes set ascending so the file source
// processes chunks in event-time order with maxFilesPerTrigger=1) —
// the shape of a production log replay, where the watermark advances
// between batches and dropDuplicatesWithinWatermark actually evicts.
// Ordered chunks also mean no cross-batch late drops, so both stream
// outputs must still equal their batch twins' DuckDB-gated answers:
// the script dumps them parquet for tools/compare.py.
//
// METRIC IDENTITY (the r14 artifact's ambiguous "bytes" column,
// resolved): per batch the series now records, by name,
//   rows        StateOperatorProgress.numRowsTotal — live state rows
//   mem_bytes   memoryUsedBytes; for the RocksDB provider this is
//               RocksDBMetrics.totalMemUsageBytes = memtables + block
//               cache + table-reader memory (a MEMORY number, capped
//               by the block-cache config — NOT on-disk state size)
//   sst_bytes   customMetrics.rocksdbSstFileSize =
//               RocksDBMetrics.totalSSTFilesBytes — the on-disk SST
//               footprint of the store's working dir, the column that
//               answers "does state fill disks"; includes
//               not-yet-compacted obsolete versions (compaction debt),
//               so a plateau here is the strong bound
//   pin_bytes   customMetrics.rocksdbPinnedBlocksMemoryUsage
//   compact_w   customMetrics.rocksdbTotalBytesWrittenByCompaction
//               (cumulative — monotone by definition; growth with a
//               flat sst_bytes means compaction is keeping up)
// The r14 "bytes" column was mem_bytes (totalMemUsageBytes).
//
// Progress is read from q.recentProgress AFTER awaitTermination —
// synchronous and attached to the query — instead of the r14 global
// StreamingQueryListener + fixed sleep, whose async flush could drop
// the final batch from the recorded series.
//
// NOTE the blocks-not-chains style: spark-shell -I feeds the file
// statement-by-statement, so a method chain continued on a fresh line
// would be split into a complete statement plus orphan `.foo` lines.
//
// Run (after sbt -batch compile):
//   SPARK_GRAFT_SF_DIR=/tmp/sf10_real SPARK_GRAFT_OUT=/tmp/r15_stream_sf10 \
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --driver-class-path /root/repo/target/scala-2.13/classes \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.legacy.parquet.nanosAsLong=true \
//     --conf spark.sql.extensions=graft.GraftExtensions \
//     --conf spark.sql.streaming.stateStore.providerClass=org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider \
//     --conf spark.ui.enabled=false \
//     -I tools/stream_soak.scala
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQueryProgress, Trigger}
import org.apache.spark.sql.types.DecimalType

val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10_real")
val outDir = sys.env.getOrElse("SPARK_GRAFT_OUT", "/tmp/r15_stream_sf10")
val nChunks = sys.env.getOrElse("SPARK_GRAFT_CHUNKS", "32").toInt

spark.conf.set("spark.sql.shuffle.partitions", "32")
// recentProgress must retain every batch of the soak (default 100)
spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", (nChunks + 16).toString)
require(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
  .contains("RocksDB"), "soak must run under the RocksDB provider")

// ---- stage: time-ordered chunks ------------------------------------
val staged = s"$outDir/_staged_events"
val ev = graft.Tables(spark, sfDir, "events")
ev.repartitionByRange(nChunks, col("ts")).write.mode("overwrite").parquet(staged)
// part-0000i holds range-bucket i (lowest ts first); set modtimes
// ascending by part index so FileStreamSource's (modtime, path) order
// matches event-time order deterministically
val parts = {
  Files.list(Paths.get(staged)).toArray.map(_.toString).filter(_.endsWith(".parquet")).sorted
}
parts.zipWithIndex.foreach { case (p, i) =>
  Files.setLastModifiedTime(Paths.get(p),
    java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
}
println(s"[soak] staged ${parts.length} time-ordered chunks")

def metricRow(p: StreamingQueryProgress): String = {
  val rows = p.stateOperators.map(_.numRowsTotal).sum
  val mem = p.stateOperators.map(_.memoryUsedBytes).sum
  def custom(k: String): Long = {
    p.stateOperators.map(so => Option(so.customMetrics.get(k)).map(_.longValue).getOrElse(0L)).sum
  }
  s"""{"input":${p.numInputRows},"rows":$rows,"mem_bytes":$mem,""" +
    s""""sst_bytes":${custom("rocksdbSstFileSize")},""" +
    s""""pin_bytes":${custom("rocksdbPinnedBlocksMemoryUsage")},""" +
    s""""compact_w":${custom("rocksdbTotalBytesWrittenByCompaction")}}"""
}

// per-stream progress series, read synchronously off the query handle
var lastSeries: Vector[StreamingQueryProgress] = Vector.empty

def runStream(stream: DataFrame, mode: OutputMode, name: String): DataFrame = {
  val q = stream.writeStream.format("memory").queryName(name).outputMode(mode).trigger(Trigger.AvailableNow()).start()
  q.awaitTermination()
  lastSeries = q.recentProgress.toVector.filter(p => p.numInputRows > 0 || p.stateOperators.nonEmpty)
  spark.table(name)
}

def src(): DataFrame = {
  val schema = spark.read.parquet(staged).schema
  graft.Tables.normalizeTs(
    spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(staged))
}

def dumpSeries(tag: String, fed: Long): String = {
  val s = lastSeries
  val body = s.map(metricRow).mkString(",")
  val rows = s.map(_.stateOperators.map(_.numRowsTotal).sum)
  val ssts = s.map(_.stateOperators.map(so => Option(so.customMetrics.get("rocksdbSstFileSize")).map(_.longValue).getOrElse(0L)).sum)
  println(s"[soak] $tag: ${s.length} batches, " +
    s"peak state ${if (rows.isEmpty) -1L else rows.max} rows, " +
    s"final ${rows.lastOption.getOrElse(-1L)} rows, " +
    s"peak sst ${if (ssts.isEmpty) -1L else ssts.max} B, final sst ${ssts.lastOption.getOrElse(-1L)} B")
  s"""{"op": "$tag", "sf": "$sfDir", "fed_rows": $fed, "provider": "rocksdb", "n_chunks": $nChunks, "series": [$body]}"""
}

val lines = scala.collection.mutable.ArrayBuffer[String]()
val fed = ev.count()

// ---- q_events_stream (windowed agg, Complete output) ---------------
// Complete mode keeps every window in state by design (O(windows
// opened) = 720 h x 5 types, never O(events)); the series documents
// that bound rather than a plateau.
val t0 = System.nanoTime()
val winStream = {
  src().withWatermark("ts", "1 hour").groupBy(window(col("ts"), "1 hour").getField("start").as("win_start"), col("event_type")).agg(count(lit(1)).as("n"), sum(round(col("value"), 3).cast(DecimalType(30, 3))).cast("double").as("sum_value"))
}
val winOut = {
  runStream(winStream, OutputMode.Complete(), "soak_win").orderBy(col("win_start"), col("event_type"))
}
winOut.coalesce(1).write.mode("overwrite").parquet(s"$outDir/q_events_stream")
lines += dumpSeries("events_stream_sf10", fed)
println(f"[soak] events_stream wall ${(System.nanoTime() - t0) / 1e9}%.1f s")

// ---- q_stream_dedup_bounded (watermark-evicted dedup state) --------
val t1 = System.nanoTime()
val dedupStream = {
  src().select(col("event_type"), col("user_id"), col("ts")).withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark("event_type", "user_id")
}
val dedupOut = {
  runStream(dedupStream, OutputMode.Append(), "soak_dedup").select(col("event_type"), col("user_id")).distinct().groupBy(col("event_type")).agg(count(lit(1)).as("n_users")).orderBy(col("event_type"))
}
dedupOut.coalesce(1).write.mode("overwrite").parquet(s"$outDir/q_stream_dedup_bounded")
lines += dumpSeries("dedup_bounded_sf10", fed)
println(f"[soak] dedup_bounded wall ${(System.nanoTime() - t1) / 1e9}%.1f s")

Files.write(Paths.get(s"$outDir/STREAM_STATE_sf10.json"),
  (lines.mkString("\n") + "\n").getBytes("UTF-8"))
println(s"[soak] wrote $outDir/STREAM_STATE_sf10.json")
sys.exit(0)
