package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Parallelism, TextOps}
import graft.operators.Pin.PinOps

/** Corpus-retrieval and data-layout operators: BM25 ranking, inverted
  * posting lists, a per-source duplicate-rate report, and Z-order
  * clustering keys. These are the retrieval/layout half of a training-
  * data platform — the reference stops at string kernels (`sdc/
  * datatypes/hpat_pandas_series_functions.py` §2.9); ranking an
  * ingested corpus and laying it out for scan pruning are what the
  * same users run next, so they are first-class here (parity-plus).
  */
object SearchOps {

  /** The fixed query-term set BM25 scores against (the fixture corpus
    * draws from a ~30-word synthetic vocabulary; these three are mid-
    * frequency so scores spread). */
  val bm25Terms: Seq[String] = Seq("spark", "window", "query")
  val bm25K1 = 1.2
  val bm25B = 0.75

  /** Posting lists are emitted for an explicit vocabulary and capped —
    * an UNCAPPED posting list for a stopword-frequency term is an
    * unbounded row at 100 TB. */
  val indexTerms: Seq[String] = Seq("spark", "stream", "vector", "window")
  val postingCap = 12

  val queries: Map[String, Q] = Map(

    // ——— BM25 top-k retrieval ———
    // score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    // Robertson idf = ln(1 + (N−df+0.5)/(df+0.5)).
    //
    // Scale shape: ONE tokenize+explode pass builds the full
    // (doc, term, tf) frame — dl (ALL tokens per doc) forces that pass
    // anyway, so it is materialized once (the TF-checkpoint pattern;
    // without it Catalyst plans the regex scan once per consumer —
    // measured 4 document scans in the naive spelling). Everything
    // downstream runs on the compact TF frame: dl is a doc-keyed agg,
    // the query-term filter cuts it to |q|·|D| rows before the scoring
    // join, corpus stats (N, avgdl, per-term df) are tiny broadcast
    // aggregates, and the top-k is TakeOrderedAndProject (no global
    // sort materializes).
    //
    // Determinism: tf/df/dl/N are exact integers; both engines compute
    // the identical double expression from them, and the top-k orders
    // by the 6-dp ROUNDED score with doc_id tie-break.
    "q_bm25" -> ((s, dir) => {
      val docs = Parallelism.fanOut(Tables(s, dir, "documents"))
      val tfAll = docs
        .select(col("doc_id"), explode(TextOps.normWords(col("text"))).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .pinned
      val dl = tfAll.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      val qtf = tfAll.filter(col("term").isin(bm25Terms: _*))
      val dfreq = qtf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val corpus = dl.agg(count(lit(1)).cast("double").as("n"),
        avg(col("dl")).as("avgdl"))
      val scored = qtf
        .join(broadcast(dfreq), Seq("term"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(corpus))
        .withColumn("contrib",
          log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
            (col("tf") * lit(bm25K1 + 1.0)) /
            (col("tf") + lit(bm25K1) *
              (lit(1.0 - bm25B) + lit(bm25B) * col("dl") / col("avgdl"))))
      scored.groupBy(col("doc_id"))
        .agg(round(sum(col("contrib")), 6).as("bm25"),
          count(lit(1)).cast("int").as("n_terms_hit"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(20)
    }),

    // ——— inverted index (capped posting lists) ———
    // term → df + the first `postingCap` doc ids. distinct (term, doc)
    // rides the same hash shuffle the df count needs; the posting cap
    // is enforced INSIDE the aggregation (slice over sort_array), so a
    // hot term costs one bounded array, not an unbounded collect_list
    // row. At 100 TB the same plan holds with the postings bucketed by
    // term — the output is a bounded-width index segment per term.
    "q_inverted_index" -> ((s, dir) => {
      val docs = Parallelism.fanOut(Tables(s, dir, "documents"))
      docs
        .select(col("doc_id"), explode(TextOps.normWords(col("text"))).as("term"))
        .filter(col("term").isin(indexTerms: _*))
        .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
        .groupBy(col("term"))
        .agg(count(lit(1)).as("df"),
          sum(col("tf")).as("cf"),
          array_join(slice(sort_array(collect_list(col("doc_id"))), 1, postingCap)
            .cast("array<string>"), ",").as("postings_head"))
        .orderBy(col("term"))
    }),

    // ——— per-source duplicate-rate report ———
    // The corpus-health dashboard query every ingestion pipeline runs:
    // per source, how much of the haul is redundant under the
    // normalized fingerprint. COUNT(DISTINCT md5) plans as a two-phase
    // partial-distinct aggregate (no row explosion); the rate is an
    // exact small-int ratio rounded identically on both engines.
    "q_dup_rate_by_source" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("source"), TextOps.fingerprint(col("text")).as("fp"),
          col("n_chars"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("fp")).as("n_unique"),
          round((count(lit(1)) - countDistinct(col("fp")))
            .cast("double") / count(lit(1)), 6).as("dup_rate"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("source"))
    }),

    // ——— blocked fuzzy matching (edit distance) ———
    // Entity-resolution / catalog-dedup shape: exact Levenshtein is
    // quadratic over ROWS, so collapse to DISTINCT names per
    // (brand, type) block FIRST — the contamination-scan pre-collapse
    // move — and run the quadratic over name GROUPS weighted by their
    // multiplicities: n_exact = Σ C(m, 2) per identical-name group,
    // n_near = Σ m_a·m_b over distinct-name pairs at d ∈ [1, 2]. The
    // answer equals the uncapped row-pair count at EVERY scale while
    // the join is bounded by the name space, not the corpus (sf10:
    // 13.5k-row blocks but only ≤256 distinct names — the r14 row-cap
    // spelling tombstoned every sf10 block and gated vacuously on
    // 0 = 0). The distinct-name cap stays as the degenerate-input
    // straggler guard (same role as the minhash bucket cap); it binds
    // nowhere on the fixtures.
    "q_str_fuzzy" -> ((s, dir) => {
      val cap = 1000 // DISTINCT names per block, not rows
      val names = Tables(s, dir, "part")
        .groupBy(col("p_brand"), col("p_type"), col("p_name"))
        .agg(count(lit(1)).as("m"))
      val wc = Window.partitionBy(col("p_brand"), col("p_type"))
      // three consumers (exact agg + both join branches) and the frame
      // is name-space-sized (≤ blocks × distinct names — 38k rows at
      // sf10), so pin it: Catalyst has no common-subtree reuse, and
      // unpinned the scan+agg+window subtree plans (and runs) thrice
      val capped = names.withColumn("__bn", count(lit(1)).over(wc))
        .filter(col("__bn") <= cap).drop("__bn")
        .pinned
      val ex = capped.groupBy(col("p_brand"))
        .agg(sum(expr("(m * (m - 1)) div 2")).as("n_exact"))
      val a = capped.select(col("p_brand"), col("p_type"),
        col("p_name").as("name_a"), col("m").as("m_a"))
      val b = capped.select(col("p_brand").as("__b2"), col("p_type").as("__t2"),
        col("p_name").as("name_b"), col("m").as("m_b"))
      val nr = a.join(b, col("p_brand") === col("__b2") &&
          col("p_type") === col("__t2") && col("name_a") < col("name_b") &&
          levenshtein(col("name_a"), col("name_b")).between(1, 2))
        .groupBy(col("p_brand"))
        .agg(sum(col("m_a") * col("m_b")).as("n_near"))
      ex.join(nr, Seq("p_brand"), "outer")
        .select(col("p_brand"),
          coalesce(col("n_exact"), lit(0L)).as("n_exact"),
          coalesce(col("n_near"), lit(0L)).as("n_near"))
        .filter(col("n_exact") + col("n_near") > 0)
        .orderBy(col("p_brand"))
    }),

    // ——— Z-order clustering key ———
    // The lakehouse layout primitive: interleave the low 16 bits of
    // two scan-predicate columns (custkey, days-since-epoch of
    // orderdate) so a range-partitioned write on z clusters BOTH
    // dimensions — min/max pruning then serves either predicate. The
    // interleave is a pure 32-term shift-OR expression (whole-stage
    // codegen, one projection); at 100 TB this is the sort key of the
    // layout write, here surfaced as the top-32 rows by z for the
    // oracle. repartitionByRange(z) + sortWithinPartitions(z) is the
    // production write path (the same machinery q_sink_partitioned
    // exercises for hive-style partitioning).
    "q_zorder_layout" -> ((s, dir) => {
      val x = col("o_custkey").cast("long")
      val y = datediff(col("o_orderdate"), to_date(lit("1990-01-01"))).cast("long")
      val z = (0 until 16).map { i =>
        (shiftleft(shiftrightunsigned(x, i) % 2, 2 * i) +
          shiftleft(shiftrightunsigned(y, i) % 2, 2 * i + 1))
      }.reduce(_ + _)
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          z.as("zval"))
        .orderBy(col("zval"), col("o_orderkey"))
        .limit(32)
    })
  )

  val oracle: Map[String, String] = Map(

    "q_bm25" -> s"""WITH toks AS (
      |  SELECT doc_id, w AS term FROM (
      |    SELECT doc_id, unnest(regexp_split_to_array(
      |      trim(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g')),
      |      '\\s+')) AS w
      |    FROM documents) t WHERE length(w) > 0),
      |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
      |qtf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
      |  WHERE term IN (${bm25Terms.map("'" + _ + "'").mkString(",")})
      |  GROUP BY 1, 2),
      |dfreq AS (SELECT term, COUNT(*) AS df FROM qtf GROUP BY 1),
      |corpus AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM dl),
      |contrib AS (SELECT q.doc_id,
      |  ln(1.0 + (n - df + 0.5) / (df + 0.5)) *
      |    (tf * ${bm25K1 + 1.0}) /
      |    (tf + $bm25K1 * (${1.0 - bm25B} + $bm25B * dl.dl / avgdl)) AS c
      |  FROM qtf q JOIN dfreq USING (term) JOIN dl ON dl.doc_id = q.doc_id,
      |       corpus)
      |SELECT doc_id, ROUND(SUM(c), 6) AS bm25,
      |  CAST(COUNT(*) AS INT) AS n_terms_hit
      |FROM contrib GROUP BY doc_id
      |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,

    "q_inverted_index" -> s"""WITH toks AS (
      |  SELECT doc_id, w AS term FROM (
      |    SELECT doc_id, unnest(regexp_split_to_array(
      |      trim(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g')),
      |      '\\s+')) AS w
      |    FROM documents) t
      |  WHERE w IN (${indexTerms.map("'" + _ + "'").mkString(",")})),
      |tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2)
      |SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf,
      |  array_to_string(list_sort(list(doc_id))[1:$postingCap], ',')
      |    AS postings_head
      |FROM tf GROUP BY term ORDER BY term""".stripMargin,

    "q_dup_rate_by_source" ->
      """WITH fp AS (SELECT source, n_chars,
        |  md5(regexp_replace(trim(
        |    regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
        |    ' '||chr(9)||chr(10)||chr(13)||chr(12)||chr(11)),
        |    '\s+', ' ', 'g')) AS fp
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        |  COUNT(DISTINCT fp) AS n_unique,
        |  ROUND(CAST(COUNT(*) - COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*), 6)
        |    AS dup_rate,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM fp GROUP BY source ORDER BY source""".stripMargin,

    "q_str_fuzzy" ->
      """WITH names AS (SELECT p_brand, p_type, p_name, COUNT(*) AS m
        |  FROM part GROUP BY 1, 2, 3),
        |capped AS (SELECT * FROM names
        |  QUALIFY COUNT(*) OVER (PARTITION BY p_brand, p_type) <= 1000),
        |ex AS (SELECT p_brand, SUM(m * (m - 1) // 2) AS n_exact
        |  FROM capped GROUP BY 1),
        |nr AS (SELECT a.p_brand, SUM(a.m * b.m) AS n_near
        |  FROM capped a JOIN capped b
        |    ON a.p_brand = b.p_brand AND a.p_type = b.p_type
        |   AND a.p_name < b.p_name
        |   AND levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 2
        |  GROUP BY 1)
        |SELECT p_brand, CAST(COALESCE(n_exact, 0) AS BIGINT) AS n_exact,
        |  CAST(COALESCE(n_near, 0) AS BIGINT) AS n_near
        |FROM ex FULL OUTER JOIN nr USING (p_brand)
        |WHERE COALESCE(n_exact, 0) + COALESCE(n_near, 0) > 0
        |ORDER BY p_brand""".stripMargin,

    "q_zorder_layout" -> {
      val terms = (0 until 16).map { i =>
        s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})"
      }.mkString(" + ")
      s"""WITH base AS (SELECT o_orderkey, o_custkey, o_orderdate,
        |  CAST(o_custkey AS BIGINT) AS x,
        |  CAST(datediff('day', DATE '1990-01-01', o_orderdate) AS BIGINT) AS y
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderdate, $terms AS zval
        |FROM base ORDER BY zval, o_orderkey LIMIT 32""".stripMargin
    }
  )
}
