package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The operator inventory (SURVEY §2) is split across modules under
  * `graft.queries`; EVERY query has a DuckDB oracle — including the
  * signature-based ops (MinHash/SimHash/hyperplane LSH), which are
  * built on md5-derived hashes and exact-FP-order folds precisely so
  * both engines compute bit-identical signatures.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape: scan → filter → groupBy → multi-agg → sort
    * (reference lifecycle E2, SURVEY §3). */
  def entry(spark: SparkSession): DataFrame =
    GroupBy.queries("q_tpch_q1")(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(Map[String, Q], Map[String, String])] = Seq(
    (Projection.queries, Projection.oracle),
    (Aggregates.queries, Aggregates.oracle),
    (GroupBy.queries, GroupBy.oracle),
    (Joins.queries, Joins.oracle),
    (Rolling.queries, Rolling.oracle),
    (Apply.queries, Apply.oracle),
    (Strings.queries, Strings.oracle),
    (Datetime.queries, Datetime.oracle),
    (NullOps.queries, NullOps.oracle),
    (Sources.queries, Sources.oracle),
    (IndexOps.queries, IndexOps.oracle),
    (StreamsQ.queries, StreamsQ.oracle),
    (Multimodal.queries, Multimodal.oracle),
    (SeriesExtra.queries, SeriesExtra.oracle),
    (Sketches.queries, Sketches.oracle),
    (Analytics.queries, Analytics.oracle),
    (Reshape.queries, Reshape.oracle),
    (SearchOps.queries, SearchOps.oracle),
    (EventAnalytics.queries, EventAnalytics.oracle),
    (TrainPrep.queries, TrainPrep.oracle),
    (Quality.queries, Quality.oracle),
    (Extras.queries, Extras.oracle))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables (complete — no rows-only fallbacks). */
  def oracleSql: Map[String, String] =
    modules.iterator.flatMap(_._2).toMap

  /** Headline queries benchmarked by Bench (one per subsystem). */
  val benchQueries: Seq[String] = Seq(
    "q_tpch_q1", "q_tpch_q3", "q_tpch_q5", "q_tpch_q6", "q_tpch_q18",
    "q_tpch_q13", "q_tpch_q17", "q_tpch_q21", "q_tpch_q9",
    "q_bucketed_join",
    "q_agg_quantile", "q_groupby_agg", "q_join_inner", "q_join_multi_key",
    "q_merge_asof", "q_range_join", "q_rolling_basic", "q_rolling_skew_kurt",
    "q_sort_values", "q_value_counts", "q_str_classify",
    "q_dt_trunc_month", "q_dedup_exact", "q_dedup_minhash",
    "q_simhash_pairs", "q_incremental_dedup", "q_kmeans", "q_ffill_bfill",
    "q_ann_brute", "q_ann_ivf", "q_salted_agg", "q_text_stats",
    "q_tfidf", "q_ngram_counts", "q_corpus_clean", "q_contamination",
    "q_contamination_bloom",
    "q_apply_lambda", "q_cumsum",
    "q_bm25", "q_str_fuzzy", "q_interval_overlap", "q_zorder_layout",
    "q_corr_matrix",
    "q_cube", "q_approx_quantile", "q_standardize", "q_emb_topk_per_label",
    "q_vocab_coverage", "q_winsorize", "q_oov_rate", "q_rfm",
    "q_active_users", "q_char_entropy",
    "q_media_decode", "q_media_decode_real", "q_emb_neardup",
    "q_emb_quantize", "q_logreg_step", "q_naive_bayes", "q_pagerank",
    "q_triangle_count", "q_assoc_rules", "q_pca_power", "q_count_min",
    "q_events_stream", "q_sessionize",
    // round 8: convergence-gated iteration, the color/JPEG codec paths,
    // and the LSH bucket observability readout
    "q_pagerank_converged", "q_media_thumbnail_color", "q_media_jpeg_real",
    "q_minhash_bucket_stats",
    // round-8 continuation: the kmeans convergence gate
    "q_kmeans_converged",
    // round 9: runtime partition pruning, VARIANT extraction, the
    // keep-best dedup resolution policy, the survival/drift tier, and
    // the grouped-apply seam
    "q_dpp_join", "q_variant_extract", "q_dedup_keep_best",
    "q_survival_km", "q_groupby_apply", "q_js_divergence",
    // round 10: embedding-centroid drift and the banding-vs-blocking
    // recall readout (both capped generators in one plan)
    "q_emb_drift", "q_minhash_recall",
    // round 11: the high-recall union candidate stage the production
    // dedup queries now run, its provenance-flag recall readout, and
    // the linear sorted-neighborhood strategy the sf10 soak motivated
    "q_dedup_union", "q_union_recall", "q_dedup_sorted",
    "q_dedup_minhash_sorted", "q_chain_recall",
    // round 15: the chain dial exercised at a non-default (12x4)
    // config — the 2M-doc-decade operating point — the zero-exchange
    // bucketed twin of the fleet's r14 spill outlier, and the
    // sidecar-driven incremental ingest pair (near-dup text, ANN
    // embeddings — both classify a new batch against a persisted
    // corpus sidecar without recomputing the corpus)
    "q_dedup_chain_sized", "q_join_multi_key_bucketed",
    "q_incremental_neardup", "q_incremental_ann", "q_filter_funnel")
}
