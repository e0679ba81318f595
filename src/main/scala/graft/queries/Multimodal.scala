package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Media

/** Multimodal-column queries over the documents table (see
  * `graft.operators.Media` for the design and the decode-stub caveat).
  *
  * All three pipelines are oracle-checked: the stub decoder is a pure
  * function of the blob's byte length, which DuckDB reproduces with
  * `octet_length(encode(text))` (UTF-8 byte length on both engines).
  */
object Multimodal {

  val queries: Map[String, Q] = Map(
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

    // frame-sample: every 2nd synthetic frame per 1000-byte "video" chunk
    "q_media_frames" -> ((s, dir) => {
      val media = Media.mediaTable(Tables(s, dir, "documents"))
      Media.frameSample(media, bytesPerFrame = 1000L, step = 2)
        .orderBy(col("doc_id"), col("frame_idx"))
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

    "q_media_frames" ->
      """WITH b AS (SELECT doc_id,
        |  (CAST(octet_length(encode(text)) AS BIGINT) + 999) // 1000 AS n_frames
        |FROM documents)
        |SELECT doc_id, CAST(unnest(generate_series(0, n_frames - 1, 2)) AS BIGINT)
        |  AS frame_idx
        |FROM b WHERE n_frames > 0 ORDER BY doc_id, frame_idx""".stripMargin,

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
