// sf10 streaming soak: multi-batch AvailableNow replay of the two
// stateful headline streams over the 10M-event organic fixture, with
// the RocksDB state-store provider and per-batch stateOperators
// (rows/bytes) recorded — the at-scale twin of StreamStateBoundSpec's
// MemoryStream plateau witness.
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
// NOTE the blocks-not-chains style: spark-shell -I feeds the file
// statement-by-statement, so a method chain continued on a fresh line
// would be split into a complete statement plus orphan `.foo` lines.
//
// Run (after sbt -batch compile):
//   SPARK_GRAFT_SF_DIR=/tmp/sf10_real SPARK_GRAFT_OUT=/tmp/r14_stream_sf10 \
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
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.DecimalType

val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10_real")
val outDir = sys.env.getOrElse("SPARK_GRAFT_OUT", "/tmp/r14_stream_sf10")
val nChunks = sys.env.getOrElse("SPARK_GRAFT_CHUNKS", "16").toInt

spark.conf.set("spark.sql.shuffle.partitions", "32")
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

// ---- per-batch state listener --------------------------------------
val series = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
  import org.apache.spark.sql.streaming.StreamingQueryListener._
  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    if (p.numInputRows > 0 || p.stateOperators.nonEmpty) {
      series.synchronized {
        series += ((p.numInputRows,
          p.stateOperators.map(_.numRowsTotal).sum,
          p.stateOperators.map(_.memoryUsedBytes).sum))
      }
    }
  }
}
spark.streams.addListener(listener)

def runStream(stream: DataFrame, mode: OutputMode, name: String): DataFrame = {
  series.synchronized(series.clear())
  val q = stream.writeStream.format("memory").queryName(name).outputMode(mode).trigger(Trigger.AvailableNow()).start()
  q.awaitTermination()
  Thread.sleep(2000) // one listener flush can lag termination
  spark.table(name)
}

def src(): DataFrame = {
  val schema = spark.read.parquet(staged).schema
  graft.Tables.normalizeTs(
    spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(staged))
}

def dumpSeries(tag: String, fed: Long): String = {
  val s = series.synchronized(series.toVector)
  val body = s.map { case (in, r, b) => s"""{"input":$in,"rows":$r,"bytes":$b}""" }.mkString(",")
  println(s"[soak] $tag: ${s.length} batches, " +
    s"peak state ${if (s.isEmpty) -1L else s.map(_._2).max} rows, " +
    s"final ${s.lastOption.map(_._2).getOrElse(-1L)} rows")
  s"""{"op": "$tag", "sf": "$sfDir", "fed_rows": $fed, "provider": "rocksdb", "series": [$body]}"""
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
