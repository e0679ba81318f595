package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Media

/** Multimodal-column queries over the documents table (see
  * `graft.operators.Media` for the design).
  *
  * All pipelines are oracle-checked. The text-blob pipelines use the
  * byte-length stub decoder, which DuckDB reproduces with
  * `octet_length(encode(text))` (UTF-8 byte length on both engines).
  * `q_media_decode_real` exercises the REAL `javax.imageio` codec:
  * each executor encodes a striped grayscale PNG whose geometry and
  * stripe levels are closed forms in doc_id, decodes the actual bytes
  * back, and integrates pixel luma — PNG is lossless, so DuckDB
  * predicts the codec's output arithmetically without decoding anything.
  */
object Multimodal {

  private val fixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Striped-PNG FILES on disk (img_<id>.png, the same closed-form
    * geometry as [[Media.syntheticImages]]) — the ingest fixture for the
    * binaryFile source, one file per staged doc_id. Driver-side loop:
    * bounded-file fixture prep, same class as the CSV fixtures; a
    * production corpus would already BE on shared storage.
    *
    * The staged ids are the first min(200, count) doc_ids ACTUALLY in
    * the documents table (not an assumed 0..199 range), so the query and
    * its oracle agree on any fixture keying. The directory is a fresh
    * `TempDirs.create` per JVM (shutdown-hook cleaned) — a fixed path
    * shared across JVMs could leak stale files from an older id range
    * or a concurrent writer into the glob read — and the cache key
    * carries the documents fixture's FS fingerprint, so regenerating
    * the fixture inside a long-lived JVM re-stages instead of serving
    * the old id range (ADVICE r10). */
  private def imageFiles(s: org.apache.spark.sql.SparkSession,
                         dir: String): String = {
    val fp = graft.TempDirs.fingerprint(s"$dir/documents.parquet")
    fixtures.computeIfAbsent(s"imgfiles:$dir:$fp", { _ =>
      val ids = Tables(s, dir, "documents")
        .select(col("doc_id")).orderBy(col("doc_id")).limit(200)
        .collect().map(_.getLong(0))
      val tmp = graft.TempDirs.create("graft_imgfiles_").toString
      for (id <- ids) {
        val (w, h, g) = Media.stripeParams(id)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(tmp, s"img_$id.png"),
          Media.encodeGrayPng(w, h, g, g + 40))
      }
      tmp
    })
  }

  val queries: Map[String, Q] = Map(
    // The multimodal INGEST entry point the other media queries skip:
    // image files on shared storage read through Spark's binaryFile
    // source (one row per file: path + content + size — listed and
    // split distributively, no driver byte funnel), ids parsed from
    // the path, bytes decoded by the real javax.imageio codec on
    // executors. At 100 TB this is the first stage of every image
    // pipeline; binaryFile also feeds readStream for incremental
    // arrival. Oracle: the same closed forms as q_media_decode_real,
    // restricted to the staged id range.
    "q_media_ingest_files" -> ((s, dir) => {
      val files = s.read.format("binaryFile")
        .load(imageFiles(s, dir) + "/*.png")
      val media = files.select(
        regexp_extract(col("path"), "img_(\\d+)\\.png$", 1)
          .cast("long").as("doc_id"),
        col("content").as("bytes"),
        struct(lit("image/png").as("mime"),
          length(col("content")).cast("long").as("n_bytes")).as("meta"))
      Media.decode(s, media).toDF()
        .select(col("doc_id"), col("width"), col("height"),
          col("mean_luma"))
        .orderBy(col("doc_id"))
    }),
    // decode: binary blob + metadata → per-image features via
    // mapPartitions batch decode, then resize to a 256 bounding box
    "q_media_decode" -> ((s, dir) => {
      val media = Media.mediaTable(Tables(s, dir, "documents"))
      val decoded = Media.decode(s, media).toDF()
      Media.resize(decoded, 256)
        .select(col("doc_id"), col("width"), col("height"),
          col("mean_luma"), col("n_bytes"), col("out_w"), col("out_h"))
        .orderBy(col("doc_id"))
    }),

    // REAL codec round trip: per-partition PNG encode (geometry/stripes
    // derived from doc_id) → javax.imageio decode → pixel-luma features;
    // the oracle replays the closed forms. Bytes never cross a shuffle.
    "q_media_decode_real" -> ((s, dir) => {
      val ids = Tables(s, dir, "documents").select(col("doc_id"))
      val media = Media.syntheticImages(s, ids)
      Media.decode(s, media).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("mean_luma"))
        .orderBy(col("doc_id"))
    }),

    // frame-sample: every 2nd synthetic frame per 1000-byte "video" chunk
    "q_media_frames" -> ((s, dir) => {
      val media = Media.mediaTable(Tables(s, dir, "documents"))
      Media.frameSample(media, bytesPerFrame = 1000L, step = 2)
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // REAL thumbnail round trip: encode the striped PNGs, decode +
    // nearest-neighbor downscale by 2, integrate luma over the
    // RESAMPLED pixels — factor 2 keeps only even source rows, so the
    // thumbnail's mean luma is exactly the even-stripe level g1.
    "q_media_thumbnail_real" -> ((s, dir) => {
      val ids = Tables(s, dir, "documents").select(col("doc_id"))
      val media = Media.syntheticImages(s, ids)
      Media.thumbnails(s, media, factor = 2).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("mean_luma"))
        .orderBy(col("doc_id"))
    }),

    // REAL COLOR thumbnail round trip: striped RGB PNGs → decode →
    // nearest-neighbor ÷2 (keeps even rows only, where every pixel is
    // (3id, 5id, 7id) mod 256) → Rec.601 integer luma over the
    // resampled pixels. All kept pixels are identical, so the
    // truncating mean equals the per-pixel Rec.601 fold exactly — the
    // closed form the oracle replays. This is the path a real RGB-JPEG
    // web corpus takes (multi-band fold + resample), on lossless bytes.
    "q_media_thumbnail_color" -> ((s, dir) => {
      val ids = Tables(s, dir, "documents").select(col("doc_id"))
      val media = Media.syntheticColorImages(s, ids)
      Media.thumbnails(s, media, factor = 2).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("mean_luma"))
        .orderBy(col("doc_id"))
    }),

    // REAL LOSSY path: uniform grayscale JPEGs → real JPEG decode →
    // tolerance verdict. JPEG is not bit-exact, so the QUERY asserts
    // the tolerance (|decoded mean − encoded level| ≤ 3) and emits the
    // boolean — exact and hash-checkable even though pixels are not. A
    // broken codec path (wrong level, wrong dims, luma drift past the
    // quantization budget) flips verdicts and fails the hash.
    "q_media_jpeg_real" -> ((s, dir) => {
      val ids = Tables(s, dir, "documents").select(col("doc_id"))
      val media = Media.syntheticJpegs(s, ids)
      Media.decode(s, media).toDF()
        .select(col("doc_id"), col("width"), col("height"),
          (abs(col("mean_luma") - (lit(8) + pmod(col("doc_id") * 11, lit(240))))
            <= 3).as("within_tol"))
        .orderBy(col("doc_id"))
    }),

    // REAL WAV round trip: per-partition PCM encode (square wave, amp
    // and length closed forms in doc_id) → javax.sound.sampled decode →
    // per-800-sample-chunk RMS; |sample| is constant so RMS == amp.
    "q_media_audio_real" -> ((s, dir) => {
      val ids = Tables(s, dir, "documents").select(col("doc_id"))
      val media = Media.syntheticAudio(s, ids)
      Media.decodeAudio(s, media, chunkSamples = 800).toDF()
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // audio: 4000-byte chunks + per-chunk energy (stubbed feature)
    "q_media_audio" -> ((s, dir) => {
      val media = Media.mediaTable(Tables(s, dir, "documents"))
      Media.audioChunks(media, bytesPerChunk = 4000L)
        .orderBy(col("doc_id"), col("chunk_idx"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_media_decode" ->
      """WITH b AS (SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n FROM documents),
        |d AS (SELECT doc_id,
        |  CAST(64 + n % 512 AS INT) AS width,
        |  CAST(64 + (n * 7) % 512 AS INT) AS height,
        |  CAST(n % 256 AS INT) AS mean_luma, n AS n_bytes FROM b)
        |SELECT doc_id, width, height, mean_luma, n_bytes,
        |  CAST(FLOOR(width / (CASE WHEN GREATEST(width, height) / 256.0 > 1.0
        |    THEN GREATEST(width, height) / 256.0 ELSE 1.0 END)) AS INT) AS out_w,
        |  CAST(FLOOR(height / (CASE WHEN GREATEST(width, height) / 256.0 > 1.0
        |    THEN GREATEST(width, height) / 256.0 ELSE 1.0 END)) AS INT) AS out_h
        |FROM d ORDER BY doc_id""".stripMargin,

    // what the real codec MUST read back from the lossless PNGs
    "q_media_decode_real" ->
      """SELECT doc_id,
        |  CAST(8 + doc_id % 16 AS INT) AS width,
        |  CAST(8 + 2 * (doc_id % 8) AS INT) AS height,
        |  CAST((doc_id * 7) % 200 + 20 AS INT) AS mean_luma
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the staged set mirrors imageFiles: the first min(200, count)
    // doc_ids actually present, not an assumed contiguous range
    "q_media_ingest_files" ->
      """SELECT doc_id,
        |  CAST(8 + doc_id % 16 AS INT) AS width,
        |  CAST(8 + 2 * (doc_id % 8) AS INT) AS height,
        |  CAST((doc_id * 7) % 200 + 20 AS INT) AS mean_luma
        |FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 200) d
        |ORDER BY doc_id""".stripMargin,

    "q_media_frames" ->
      """WITH b AS (SELECT doc_id,
        |  (CAST(octet_length(encode(text)) AS BIGINT) + 999) // 1000 AS n_frames
        |FROM documents)
        |SELECT doc_id, CAST(unnest(generate_series(0, n_frames - 1, 2)) AS BIGINT)
        |  AS frame_idx
        |FROM b WHERE n_frames > 0 ORDER BY doc_id, frame_idx""".stripMargin,

    // nearest-neighbor ÷2 of the striped PNG: floor-halved dims, luma
    // exactly the even-stripe level
    "q_media_thumbnail_real" ->
      """SELECT doc_id,
        |  CAST((8 + doc_id % 16) // 2 AS INT) AS width,
        |  CAST((8 + 2 * (doc_id % 8)) // 2 AS INT) AS height,
        |  CAST((doc_id * 7) % 200 AS INT) AS mean_luma
        |FROM documents ORDER BY doc_id""".stripMargin,

    // ÷2 color thumbnail: even rows survive, all pixels (3id,5id,7id)
    // mod 256 — mean luma is exactly the per-pixel Rec.601 fold
    "q_media_thumbnail_color" ->
      """SELECT doc_id,
        |  CAST((8 + doc_id % 16) // 2 AS INT) AS width,
        |  CAST((8 + 2 * (doc_id % 8)) // 2 AS INT) AS height,
        |  CAST((299 * ((doc_id * 3) % 256) + 587 * ((doc_id * 5) % 256)
        |    + 114 * ((doc_id * 7) % 256)) // 1000 AS INT) AS mean_luma
        |FROM documents ORDER BY doc_id""".stripMargin,

    // lossy JPEG: dims are exact; the tolerance verdict must be TRUE
    // for every row — a codec/luma failure flips it and the hash
    "q_media_jpeg_real" ->
      """SELECT doc_id,
        |  CAST(8 + doc_id % 16 AS INT) AS width,
        |  CAST(8 + 2 * (doc_id % 8) AS INT) AS height,
        |  TRUE AS within_tol
        |FROM documents ORDER BY doc_id""".stripMargin,

    // what the real WAV decode MUST read back from the square wave
    "q_media_audio_real" ->
      """WITH p AS (SELECT doc_id,
        |    2 + doc_id % 4 AS n_chunks,
        |    1000 + (doc_id % 16) * 500 AS amp
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(unnest(generate_series(0, n_chunks - 1)) AS INT) AS chunk_idx,
        |  CAST(800 AS INT) AS n_samples,
        |  CAST(amp AS BIGINT) AS rms
        |FROM p ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_media_audio" ->
      """WITH b AS (SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  (CAST(octet_length(encode(text)) AS BIGINT) + 3999) // 4000 AS n_chunks
        |FROM documents),
        |c AS (SELECT doc_id, n_bytes,
        |  CAST(unnest(generate_series(0, n_chunks - 1)) AS BIGINT) AS chunk_idx
        |FROM b WHERE n_chunks > 0)
        |SELECT doc_id, n_bytes, chunk_idx,
        |  CAST((n_bytes * 31 + chunk_idx * 17) % 1000 AS DOUBLE) / 1000.0
        |    AS energy
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin
  )
}
