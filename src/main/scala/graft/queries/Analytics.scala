package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.Similarity

/** Analytic-surface fills: distribution ranks, feature scaling, ISO
  * calendar fields, regex findall, and the per-label embedding top-k —
  * each the everyday analyst/ML-pipeline op a user of the reference
  * expects next to the core inventory (parity-plus where the reference
  * stops at rank/dt.year — `sdc/datatypes/hpat_pandas_series_functions
  * .py:2100` rank family, `sdc/hiframes/` dt fields).
  */
object Analytics {

  val queries: Map[String, Q] = Map(

    // percent_rank / cume_dist — the distribution twins of the rank
    // family (q_rank_analytics/q_rank_pandas cover rank/dense/ntile).
    // Both are exact ratios of small integers — (rank−1)/(n−1) and
    // rank/n as one IEEE divide — so no output rounding is needed.
    // One segment-keyed shuffle, window rides it.
    "q_rank_cume" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"))
      Tables(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy(col("c_mktsegment"), col("c_acctbal"), col("c_custkey"))
    }),

    // z-score standardization (the sklearn StandardScaler shape the
    // reference's ML examples feed): ONE exact-power-sum aggregate
    // (decimal sums — the dvarSamp recipe), broadcast to a projection
    // pass. Both engines see the same (s1, s2, n) doubles, so
    // (x − mean)/std is the identical IEEE sequence; the output is
    // quantized floor(z·1e6 + 0.5)/1e6 on BOTH sides (a quotient is
    // cancellation-prone — the round()/ROUND() pair differs on
    // half-boundaries, the floor sequence cannot).
    "q_standardize" -> ((s, dir) => {
      val x = col("o_totalprice")
      val stats = Tables(s, dir, "orders").agg(
        count(x).cast("double").as("__n"),
        sum(x.cast(DecimalType(30, 2))).cast("double").as("__s1"),
        sum((x * x).cast(DecimalType(32, 4))).cast("double").as("__s2"))
      Tables(s, dir, "orders")
        .crossJoin(broadcast(stats))
        .select(col("o_orderkey"),
          (floor(((x - col("__s1") / col("__n")) /
            sqrt((col("__s2") - col("__s1") * col("__s1") / col("__n")) /
              (col("__n") - 1.0))) * 1e6 + 0.5) / 1e6).as("z"))
        .orderBy(col("o_orderkey"))
    }),

    // pandas Series.dt.isocalendar() — ISO year / week / weekday.
    // iso_day = weekday()+1 (Mon=1); iso_week = weekofyear (ISO in
    // both engines); iso_year via the Thursday rule (year of d + (4 −
    // isodow) days) — pure date arithmetic, so the semantics are
    // pinned by construction instead of trusting two engines' ISOYEAR
    // to agree. Pure projection, stays in whole-stage codegen.
    "q_dt_isocalendar" -> ((s, dir) => {
      val d = to_date(col("ts"))
      val isodow = weekday(d) + 1
      Tables(s, dir, "events")
        .select(col("event_id"),
          year(date_add(d, (lit(4) - isodow))).as("iso_year"),
          weekofyear(d).as("iso_week"),
          isodow.as("iso_day"))
        .orderBy(col("event_id"))
    }),

    // Series.str.findall: all matches of a pattern per row — count and
    // first match (null when none, on both engines). The pattern has a
    // mandatory literal core, so no empty-match anchoring ambiguity
    // between regex engines. Pure projection.
    "q_str_findall" -> ((s, dir) => {
      val pat = "[a-z]*agg[a-z]*"
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit(pat), lit(0)))
            .as("n_matches"),
          try_element_at(regexp_extract_all(col("text"), lit(pat), lit(0)),
            lit(1)).as("first_match"))
        .orderBy(col("doc_id"))
    }),

    // Per-label top-3 most-central vectors: label centroid (the
    // q_emb_centroids quantize-exact math, rebuilt to an ordered array
    // on the k-row frame), AQE-broadcast back, cosine via the ordered
    // graft_dot fold, rank-filter ≤ 3 planning the map-side
    // WindowGroupLimit. The semantic-dedup "pick cluster
    // representatives" shape: one label shuffle for the centroid, one
    // broadcast projection, top-k never funnels.
    "q_emb_topk_per_label" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val cents = emb
        .select(col("label"), posexplode(col("embedding")))
        .select(col("label"), col("pos"),
          floor(col("col").cast("double") * lit(1e6) + lit(0.5))
            .cast("long").as("q"))
        .groupBy(col("label"), col("pos"))
        .agg(count(col("q")).as("n"), sum(col("q")).as("sq"))
        .withColumn("c", col("sq").cast("double") / (col("n") * lit(1e6)))
        .groupBy(col("label"))
        // k rows — the sort_array/getField rebuild is driver-scale work
        .agg(sort_array(collect_list(struct(col("pos"), col("c")))).as("pc"))
        .select(col("label"), col("pc").getField("c").as("cv"))
      val w = Window.partitionBy(col("label"))
        .orderBy(col("cs").desc, col("vec_id"))
      emb.join(broadcast(cents), Seq("label"))
        .withColumn("cs",
          Similarity.cosinePair(col("embedding"), col("cv"), 64))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 3)
        .select(col("label"), col("vec_id"),
          round(col("cs"), 6).as("cos_sim"))
        .orderBy(col("label"), col("cos_sim").desc, col("vec_id"))
    }))

  val oracle: Map[String, String] = Map(

    "q_rank_cume" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal)
        |ORDER BY c_mktsegment, c_acctbal, c_custkey""".stripMargin,

    "q_standardize" ->
      """WITH s AS (SELECT
        |    CAST(COUNT(o_totalprice) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(o_totalprice*o_totalprice AS DECIMAL(32,4))) AS DOUBLE) AS s2
        |  FROM orders)
        |SELECT o_orderkey,
        |  FLOOR(((o_totalprice - s1/n) / SQRT((s2 - s1*s1/n)/(n - 1.0)))
        |        * 1e6 + 0.5) / 1e6 AS z
        |FROM orders, s ORDER BY o_orderkey""".stripMargin,

    "q_dt_isocalendar" ->
      """SELECT event_id,
        |  CAST(year(CAST(ts AS DATE) + CAST(4 - isodow(CAST(ts AS DATE)) AS INT)) AS INT) AS iso_year,
        |  CAST(weekofyear(CAST(ts AS DATE)) AS INT) AS iso_week,
        |  CAST(isodow(CAST(ts AS DATE)) AS INT) AS iso_day
        |FROM events ORDER BY event_id""".stripMargin,

    "q_str_findall" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-z]*agg[a-z]*')) AS INT)
        |    AS n_matches,
        |  regexp_extract_all(text, '[a-z]*agg[a-z]*')[1] AS first_match
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_emb_topk_per_label" ->
      """WITH cent AS (
        |  SELECT label, i - 1 AS pos,
        |    CAST(SUM(CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
        |      / (COUNT(FLOOR(CAST(embedding[i] AS DOUBLE) * 1e6 + 0.5)) * 1e6) AS c
        |  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) s
        |  GROUP BY label, i),
        |cv AS (SELECT label, list(c ORDER BY pos) AS cv FROM cent GROUP BY label),
        |scored AS (
        |  SELECT e.label, e.vec_id,
        |    list_dot_product(CAST(e.embedding AS DOUBLE[]), cv.cv)
        |      / (SQRT(list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |                               CAST(e.embedding AS DOUBLE[])))
        |         * SQRT(list_dot_product(cv.cv, cv.cv))) AS cs
        |  FROM embeddings e JOIN cv USING(label))
        |SELECT label, vec_id, ROUND(cs, 6) AS cos_sim FROM scored
        |QUALIFY row_number() OVER (PARTITION BY label ORDER BY cs DESC, vec_id) <= 3
        |ORDER BY label, cos_sim DESC, vec_id""".stripMargin)
}
