package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions._
import graft.operators.{Dedup, Similarity, TextOps}

/** LLM-training-data pipeline operators (parity-plus; BASELINE.json north
  * star): dedup, similarity search, text analysis, plus the CSV source
  * path (SURVEY §2.1) and a batch-equivalent of the streaming window agg.
  *
  * Oracle-checked where DuckDB can express the op; signature-based ops
  * (MinHash/SimHash use Spark's xxhash64) get rows-only checks.
  */
object Extras {

  val queries: Map[String, Q] = Map(
    // ——— text analysis over documents ———
    "q_text_stats" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      d.select(col("doc_id"),
          length(col("text")).as("n_char"),
          TextOps.tokenCount(col("text")).as("n_tok"),
          round(TextOps.meanTokenLen(col("text")), 6).as("mean_tok_len"),
          round(TextOps.stopwordRatio(col("text")), 6).as("stop_ratio"))
        .orderBy(col("doc_id"))
    }),

    "q_text_quality" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), TextOps.qualityScore(col("text")).as("quality"))
        .groupBy(col("quality")).agg(count(lit(1)).as("n"))
        .orderBy(col("quality"))
    }),

    // language-ID heuristic — validated against the lang label column
    "q_lang_id" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("lang"), TextOps.langId(col("text")).as("pred"))
        .groupBy(col("lang"), col("pred")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("pred"))
    }),

    // document fingerprint (normalize + md5) — exact dedup key
    "q_fingerprint" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),

    // ——— dedup ———
    "q_dedup_exact" -> ((s, dir) => {
      Dedup.exact(Tables(s, dir, "documents"), "doc_id", "text")
        .select(col("content_md5"), col("keep_id"), col("n_dups"))
        .orderBy(col("keep_id"))
    }),

    // MinHash-LSH near-dup pairs (signature-based → rows-only check)
    "q_dedup_minhash" -> ((s, dir) => {
      Dedup.minhashPairs(Tables(s, dir, "documents"), "doc_id", "text",
          k = 16, bands = 4, threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // SimHash signatures (rows-only)
    "q_simhash" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), Dedup.simhash64(col("text")).as("simhash"))
        .orderBy(col("doc_id"))
    }),

    // blocked n-gram Jaccard near-dup pairs (oracle-able in SQL)
    "q_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(Tables(s, dir, "documents"), "doc_id", "text",
          "lang", w = 3, threshold = 0.2)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ——— similarity search ———
    // brute-force cosine top-k against a fixed deterministic query vector
    "q_ann_brute" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val query = embQuery(s, dir)
      // Order by the UNROUNDED similarity (same as the oracle's ORDER BY
      // cs DESC) and round only in the output projection — ordering by the
      // rounded value could permute 6-decimal ties differently.
      Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 20)
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .select(col("vec_id"), round(col("cos_sim"), 6).as("cos_sim"))
    }),

    // LSH-bucketed ANN (scale path; rows-only — recall-dependent).
    // buildIndex materializes the signature column the way a 100 TB
    // deployment would persist it (bucketed by __sig); queryIndex then
    // only Hamming-filters + exact-scores survivors.
    "q_ann_lsh" -> ((s, dir) => {
      val index = Similarity.buildIndex(Tables(s, dir, "embeddings"),
        "vec_id", "embedding", dim = 64, planes = 12)
      Similarity.queryIndex(index, "vec_id", "embedding", embQuery(s, dir),
          k = 20, planes = 12, maxHammingDist = 4)
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .select(col("vec_id"), round(col("cos_sim"), 6).as("cos_sim"))
    }),

    // embedding-cosine near-dup pairs in LSH buckets (rows-only —
    // bucket recall is probabilistic by design; the synthetic embeddings
    // are near-orthogonal, so the threshold is low to keep the candidate
    // set non-empty)
    "q_emb_neardup" -> ((s, dir) => {
      Similarity.cosineNearDupPairs(Tables(s, dir, "embeddings"),
          "vec_id", "embedding", dim = 64, planes = 6, threshold = 0.30)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ——— streaming shape (batch-equivalent of the windowed agg) ———
    "q_events_window" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").getField("start").as("win_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value"), 3).cast(DecimalType(30, 3)))
            .cast("double").as("sum_value"))
        .orderBy(col("win_start"), col("event_type"))
    })
  )

  /** Deterministic ANN query vector: all-0.1 in 64 dims (data-independent,
    * so the oracle can hardcode the same constant). */
  private def embQuery(s: org.apache.spark.sql.SparkSession, dir: String): Seq[Double] =
    Seq.fill(64)(0.1)

  private val dot64 = "list_dot_product(CAST(embedding AS DOUBLE[]), qv)"

  val oracle: Map[String, String] = Map(
    "q_text_stats" ->
      """SELECT doc_id,
        |  LENGTH(text) AS n_char,
        |  CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
        |    ELSE CAST(len(regexp_split_to_array(TRIM(text), '\s+')) AS INT)
        |  END AS n_tok,
        |  ROUND(CAST(list_sum(list_transform(
        |      regexp_split_to_array(TRIM(text), '\s+'), x -> LENGTH(x))) AS DOUBLE)
        |    / GREATEST(len(regexp_split_to_array(TRIM(text), '\s+')), 1), 6)
        |    AS mean_tok_len,
        |  ROUND(CAST(len(list_filter(regexp_split_to_array(TRIM(LOWER(text)), '\s+'),
        |      x -> x IN ('the','a','an','and','or','of','to','in','is','it',
        |                 'that','for','on','with','as','was','at','by','be')))
        |      AS DOUBLE)
        |    / GREATEST(len(regexp_split_to_array(TRIM(LOWER(text)), '\s+')), 1), 6)
        |    AS stop_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_quality" ->
      """WITH q AS (SELECT doc_id,
        |  ((CASE WHEN LENGTH(text) BETWEEN 50 AND 5000 THEN 1.0 ELSE 0.0 END)
        |   + (CASE WHEN
        |        CAST(len(list_filter(regexp_split_to_array(TRIM(LOWER(text)), '\s+'),
        |          x -> x IN ('the','a','an','and','or','of','to','in','is','it',
        |                     'that','for','on','with','as','was','at','by','be')))
        |          AS DOUBLE)
        |        / GREATEST(len(regexp_split_to_array(TRIM(LOWER(text)), '\s+')), 1)
        |        > 0.05 THEN 1.0 ELSE 0.0 END)
        |   + (CASE WHEN
        |        CAST(LENGTH(text) -
        |          LENGTH(regexp_replace(text, '[.,!?;:''"()\[\]-]', '', 'g'))
        |          AS DOUBLE) / GREATEST(LENGTH(text), 1)
        |        < 0.2 THEN 1.0 ELSE 0.0 END)) / 3.0 AS quality
        |FROM documents)
        |SELECT quality, COUNT(*) AS n FROM q GROUP BY quality
        |ORDER BY quality""".stripMargin,

    "q_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(TRIM(
        |    regexp_replace(LOWER(text), '[^a-z0-9\s]', '', 'g')), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(text) AS content_md5, MIN(doc_id) AS keep_id,
        |  COUNT(*) AS n_dups
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,

    "q_ann_brute" ->
      s"""WITH q AS (SELECT [0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1,
        |  0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1,
        |  0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1,
        |  0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1,
        |  0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1,
        |  0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1,
        |  0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1,
        |  0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1]::DOUBLE[] AS qv),
        |sims AS (SELECT vec_id,
        |  $dot64 /
        |  (sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x)))
        |   * sqrt(list_sum(list_transform(qv, x -> x*x)))) AS cs
        |FROM embeddings, q)
        |SELECT vec_id, ROUND(cs, 6) AS cos_sim FROM sims
        |ORDER BY cs DESC, vec_id LIMIT 20""".stripMargin,

    "q_events_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS win_start,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(value, 3) AS DECIMAL(30,3))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin
  )
}
