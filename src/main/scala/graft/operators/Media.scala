package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * The reference has no media surface (IntelPython/sdc is tabular-only);
  * this is the parity-plus layer a 100 TB training-data pipeline needs.
  * Design rules at scale:
  *   - blobs ride in a `BinaryType` column next to their metadata struct,
  *     so one scan serves both filtering (pushed down on metadata) and
  *     decoding — no second fetch round-trip;
  *   - decoding runs per-partition over an iterator (`mapPartitions`
  *     batch shape — a real decoder amortizes codec/model init across the
  *     partition, exactly like a Pandas-UDF `mapInPandas` batch);
  *   - decoded features are small fixed-width columns; the blob is
  *     dropped as early as possible so shuffles never carry bytes.
  *
  * The byte-decoding step itself is a STUB: this container has no image
  * or audio codecs, so `decodeStub` derives deterministic fake
  * width/height/luma from the blob length. The surrounding plumbing —
  * schema, encoders, partitioning, iterator signature — is the real
  * production shape; swap `decodeStub` for a codec call.
  */
object Media {

  /** Input: one media blob + metadata (the real decode batch row). */
  case class MediaIn(doc_id: Long, bytes: Array[Byte], mime: String)

  /** Decoded image metadata (what a real codec would return). */
  case class MediaMeta(doc_id: Long, width: Int, height: Int,
                       mean_luma: Int, n_bytes: Long)

  /** STUB decoder — deterministic fake in lieu of an image codec.
    * Real implementation: ImageIO/ffmpeg per batch. The fake must stay
    * a pure function of (bytes.length) so the DuckDB oracle can verify
    * the pipeline end-to-end. */
  private[graft] def decodeStub(m: MediaIn): MediaMeta = {
    val n = m.bytes.length.toLong
    MediaMeta(m.doc_id,
      width = (64 + n % 512).toInt,
      height = (64 + (n * 7) % 512).toInt,
      mean_luma = (n % 256).toInt,
      n_bytes = n)
  }

  /** documents → media table: blob column + typed metadata struct.
    * (Here the "image" bytes are the UTF-8 text bytes — a deterministic
    * stand-in blob; schema and plumbing are what matter.) */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      col("text").cast("binary").as("bytes"),
      struct(lit("image/fake").as("mime"),
        length(col("text").cast("binary")).as("n_bytes"),
        col("lang").as("lang")).as("meta"))

  /** Decode stage: per-partition batch iteration, blob dropped on exit. */
  def decode(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("bytes"), col("meta.mime").as("mime"))
      .as[MediaIn]
      .mapPartitions { batch =>
        // real decoder: init codec once here, then decode each record
        batch.map(decodeStub)
      }
  }

  /** Resize stage: pure metadata arithmetic on decoded frames —
    * stays in whole-stage codegen, no re-decode. */
  def resize(decoded: DataFrame, maxDim: Int): DataFrame = {
    val scale = greatest(col("width"), col("height")).cast("double") / maxDim
    val factor = when(scale > 1.0, scale).otherwise(lit(1.0))
    decoded
      .withColumn("out_w", floor(col("width") / factor).cast("int"))
      .withColumn("out_h", floor(col("height") / factor).cast("int"))
  }

  /** ceil(n_bytes / unit) chunk count in BIGINT arithmetic — the ONE
    * chunking formula frame sampling and audio chunking share. An
    * exact-multiple blob gets no empty trailing chunk; a 0-byte blob
    * gets 0 chunks (callers filter those rows out before exploding —
    * Spark's `sequence(0, -1)` errors rather than yielding empty). */
  private def chunkCount(unit: Long): Column =
    expr(s"(cast(meta.n_bytes as bigint) + ${unit - 1}) div $unit")

  /** Frame-sample stage for "video" blobs: one row per sampled frame
    * index. posexplode of a sequence is a generator — rows multiply
    * inside the stage with no shuffle. */
  def frameSample(media: DataFrame, bytesPerFrame: Long, step: Int): DataFrame =
    media
      .withColumn("n_frames", chunkCount(bytesPerFrame))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(step.toLong)))
          .as("frame_idx"))

  /** "Audio" pipeline shape: fixed-duration chunking + a per-chunk
    * feature (RMS-energy STUB — a pure function of (blob length,
    * chunk index) in lieu of a PCM decoder, so the oracle can replay
    * it; a real implementation decodes the chunk's samples here).
    * Generator + projection: rows multiply in-stage, features are
    * small fixed-width columns, the blob never crosses a shuffle. */
  def audioChunks(media: DataFrame, bytesPerChunk: Long): DataFrame =
    media
      .withColumn("n_chunks", chunkCount(bytesPerChunk))
      .filter(col("n_chunks") > 0)
      .select(col("doc_id"),
        col("meta.n_bytes").cast("long").as("n_bytes"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .withColumn("energy",
        pmod(col("n_bytes") * 31 + col("chunk_idx") * 17, lit(1000L))
          .cast("double") / 1000.0)
}
