package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.md5Bucket
import graft.operators.{GlobalOrder, Parallelism, TextOps}
import graft.operators.Pin.PinOps

/** Sketch/approximation scale paths and calendar machinery.
  *
  * At 100 TB the exact operators stay the correctness reference, but a
  * user switching from the reference engine ALSO needs the sketch tier:
  * `nunique` over a billion keys wants HLL (fixed 2^p registers per
  * group, one map-side-combining pass — no distinct shuffle of the key
  * universe), and `quantile` wants a mergeable rank sketch whose error
  * is a RANK guarantee, not a value guarantee. Both are probabilistic,
  * so the oracle contract here is deliberate: the query emits the EXACT
  * answer (which DuckDB reproduces bit-for-bit) alongside a boolean
  * asserting the sketch landed inside its published error envelope —
  * the gate then pins both the exact path and the sketch's integration,
  * and a sketch regression (wrong rsd plumbing, wrong merge) flips the
  * boolean and fails the hash.
  *
  * Reference anchors: `nunique`/`quantile` at
  * `sdc/datatypes/hpat_pandas_series_functions.py:2287,:2880` (exact
  * only — the reference has no sketch tier; parity-plus).
  */
object Sketches {

  val queries: Map[String, Q] = Map(

    // HLL++ distinct-count sketch vs the exact count, per group.
    // approx_count_distinct(rsd=0.05) keeps 2^14 byte-sized registers
    // per group — at 100 TB the shuffle carries one 16 KB sketch per
    // (group × map task) instead of every distinct key, and partials
    // merge associatively. `ok` asserts |approx − exact| ≤ 15% (3σ of
    // the configured rsd); the HLL hash (xxhash64 of the key) is a pure
    // function of the data, so the flag is deterministic per fixture —
    // verified true at sf0.01 AND sf0.1.
    "q_approx_distinct" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("exact_n"),
          approx_count_distinct(col("o_custkey"), 0.05).as("__approx"))
        .select(col("o_orderpriority"), col("exact_n"),
          (abs(col("__approx") - col("exact_n")).cast("double") <=
            col("exact_n").cast("double") * 0.15).as("ok"))
        .orderBy(col("o_orderpriority"))
    }),

    // approx_percentile (Greenwald-Khanna style mergeable rank sketch)
    // vs an exact rank bracket. accuracy=1000 publishes a RANK error of
    // n/1000, so the sketch's median must lie between the exact values
    // at ranks ceil(n/2) ∓ (ceil(n/1000) + 1) — both bracket values are
    // computed by the sort-based two-pass rank machinery (nothing
    // funnels to one partition; a TakeOrdered "limit n/2" would collect
    // half the table to the driver) and reproduced exactly by DuckDB's
    // row_number rank-select, making lo/hi hash-comparable doubles and
    // `ok` a deterministic guarantee, not a coin flip.
    "q_approx_quantile" -> ((s, dir) => {
      val acc = 1000
      val vals = Tables(s, dir, "lineitem")
        .select(col("l_extendedprice").as("__v"))
        .filter(col("__v").isNotNull)
      val ranked = GlobalOrder.withRowNumberLong(vals, Seq(col("__v")), "__rn")
      val summary = ranked.agg(
        max(col("__rn")).as("__n"),
        expr(s"approx_percentile(__v, 0.5, $acc)").as("__approx"))
      val eps = ceil(col("__n").cast("double") / acc).cast("long") + 1
      val mid = ceil(col("__n").cast("double") / 2).cast("long")
      ranked.crossJoin(broadcast(summary))
        .agg(
          sum(when(col("__rn") === greatest(mid - eps, lit(1L)), col("__v")))
            .as("lo"),
          sum(when(col("__rn") === least(mid + eps, col("__n")), col("__v")))
            .as("hi"),
          max(col("__approx")).as("__a"))
        .select(col("lo"), col("hi"),
          (col("__a") >= col("lo") && col("__a") <= col("hi")).as("ok"))
    }),

    // CUBE grouping sets — all four (flag × status) marginals in ONE
    // pass (Spark expands grouping sets before the partial aggregate,
    // so map-side combine still applies and the shuffle carries ≤4×
    // the group cardinality, not 4× the data). Complements q_rollup;
    // gid bit order (first column = high bit) agrees between Spark's
    // grouping_id() and DuckDB's GROUPING(a, b).
    "q_cube" -> ((s, dir) => {
      // fanOut (r15): cube's Expand multiplies every row ×4 BEFORE the
      // partial agg — per-row work that ran single-core on the one
      // small-SF scan split (7 tasks / 1.4 s). No-op at scale; exact
      // decimal sums are order-free, result identical.
      graft.operators.Parallelism.fanOut(Tables(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_linestatus"),
            col("l_quantity")))
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(30, 2))).cast("double")
            .as("sum_qty"),
          grouping_id().cast("int").as("gid"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // pandas resample('1D').agg + asfreq zero-fill: daily aggregate
    // with EVERY calendar day present, holes filled with 0. The
    // calendar spine derives from the 1-row min/max aggregate
    // (sequence + explode — never a driver-side range), so the base
    // table is touched by exactly one day-keyed aggregate; the
    // spine-to-agg join is between two already-aggregated frames
    // (days × 1), broadcast-sized at any corpus scale.
    "q_resample_gapfill" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(to_date(col("ts")).as("day"), col("value"))
      val agg = ev.groupBy(col("day")).agg(
        count(lit(1)).as("n"),
        sum(round(col("value"), 3).cast(DecimalType(30, 3))).cast("double")
          .as("sum_value"))
      val spine = ev.agg(min(col("day")).as("__mn"), max(col("day")).as("__mx"))
        .select(explode(sequence(col("__mn"), col("__mx"),
          expr("interval 1 day"))).as("day"))
      spine.join(agg, Seq("day"), "left")
        .select(col("day"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
        .orderBy(col("day"))
    }),

    // Per-group exact-n deterministic sample (stratified "n per
    // stratum", the fixed-size twin of q_stratified_sample's keep-rate
    // draw): salted-md5 order within each language, row_number ≤ n.
    // The rank filter plans Spark's map-side WindowGroupLimit, so each
    // map task forwards at most n rows per group before the shuffle —
    // a 5-language key is no funnel at 100 TB. Deterministic under any
    // partitioning/retry (hash order is a pure function of doc_id).
    "q_group_sample" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(concat(lit("gs1|"), col("doc_id"))), col("doc_id"))
      Tables(s, dir, "documents")
        .select(col("lang"), col("doc_id"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 5)
        .select(col("lang"), col("doc_id"))
        .orderBy(col("lang"), col("doc_id"))
    }),

    // Count-Min sketch heavy-hitter readout with EXACT cross-engine
    // parity — unlike HLL/rank sketches (envelope-gated above), CMS
    // cells are pure functions of md5-derived bucket hashes, so the
    // oracle replays the SKETCH itself bit-for-bit, not just the exact
    // counts. d=4 rows × w=1024 buckets: one token pass fans each token
    // to its 4 (row, bucket) cells in-stage (partial agg collapses to
    // ≤4096 cells per partition before the shuffle — the fixed-size
    // property that makes CMS the streaming/mergeable counter); the
    // estimate for each exact top-10 token is the min over its 4 cells,
    // and `over_ok` pins the CMS ≥-truth guarantee as data.
    "q_count_min" -> ((s, dir) => {
      def cellsOf(w: org.apache.spark.sql.Column) =
        explode(array((0 until 4).map(i => struct(lit(i).as("r"),
          md5Bucket(w, 1024L, salt = s"cms$i:").as("bucket"))): _*))
      def toks = Parallelism.fanOut(Tables(s, dir, "documents"))
        .select(explode(TextOps.normWords(col("text"))).as("w"))
      val cells = toks.select(cellsOf(col("w")).as("rb"))
        .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
        .agg(count(lit(1)).as("cell"))
        .pinned // ≤4096 rows; broadcast into the probe join
      val top = toks.groupBy(col("w")).agg(count(lit(1)).as("exact"))
        .orderBy(col("exact").desc, col("w")).limit(10)
      top.select(col("w"), col("exact"), cellsOf(col("w")).as("rb"))
        .select(col("w"), col("exact"), col("rb.r").as("r"),
          col("rb.bucket").as("bucket"))
        .join(broadcast(cells), Seq("r", "bucket"))
        .groupBy(col("w"), col("exact"))
        .agg(min(col("cell")).as("cms_est"))
        .withColumn("over_ok", col("cms_est") >= col("exact"))
        .orderBy(col("exact").desc, col("w"))
    }))

  val oracle: Map[String, String] = Map(

    "q_approx_distinct" ->
      """SELECT o_orderpriority,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_n,
        |  TRUE AS ok
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_approx_quantile" ->
      """WITH s AS (SELECT l_extendedprice AS v FROM lineitem
        |           WHERE l_extendedprice IS NOT NULL),
        |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM s),
        |n AS (SELECT COUNT(*) AS c,
        |             CAST(CEIL(COUNT(*) / 1000.0) AS BIGINT) + 1 AS eps,
        |             CAST(CEIL(COUNT(*) / 2.0) AS BIGINT) AS mid FROM s)
        |SELECT
        |  (SELECT v FROM r, n WHERE rn = GREATEST(mid - eps, 1)) AS lo,
        |  (SELECT v FROM r, n WHERE rn = LEAST(mid + eps, c)) AS hi,
        |  TRUE AS ok""".stripMargin,

    "q_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_resample_gapfill" ->
      """WITH ev AS (SELECT CAST(ts AS DATE) AS day, value FROM events),
        |bounds AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM ev),
        |days AS (SELECT UNNEST(generate_series(mn, mx, INTERVAL 1 DAY))::DATE AS day
        |         FROM bounds),
        |agg AS (SELECT day, COUNT(*) AS n,
        |          CAST(SUM(CAST(ROUND(value, 3) AS DECIMAL(30,3))) AS DOUBLE)
        |            AS sum_value
        |        FROM ev GROUP BY day)
        |SELECT d.day,
        |  CAST(COALESCE(a.n, 0) AS BIGINT) AS n,
        |  COALESCE(a.sum_value, 0.0) AS sum_value
        |FROM days d LEFT JOIN agg a USING(day) ORDER BY d.day""".stripMargin,

    "q_group_sample" ->
      """SELECT lang, doc_id FROM documents
        |QUALIFY row_number() OVER (
        |  PARTITION BY lang
        |  ORDER BY md5('gs1|' || CAST(doc_id AS VARCHAR)), doc_id) <= 5
        |ORDER BY lang, doc_id""".stripMargin,

    // the same d×w cell table and min-over-cells probe, cell hashes
    // replayed from the identical md5 fold
    "q_count_min" -> {
      val bucket = Extras.hex8("'cms' || CAST(r AS VARCHAR) || ':' || w")
      s"""WITH tok AS (
        |  SELECT unnest(regexp_split_to_array(
        |    TRIM(regexp_replace(LOWER(text), '[^a-z0-9\\s]', ' ', 'g'),
        |         ' '||chr(9)||chr(10)||chr(13)||chr(12)||chr(11)),
        |    '\\s+')) AS w
        |  FROM documents),
        |cells AS (SELECT r, CAST($bucket % 1024 AS BIGINT) AS bucket,
        |    COUNT(*) AS cell
        |  FROM tok, (SELECT unnest([0, 1, 2, 3]) AS r)
        |  GROUP BY 1, 2),
        |top AS (SELECT w, COUNT(*) AS exact FROM tok GROUP BY w
        |  ORDER BY exact DESC, w LIMIT 10),
        |probes AS (SELECT w, exact, r,
        |    CAST($bucket % 1024 AS BIGINT) AS bucket
        |  FROM top, (SELECT unnest([0, 1, 2, 3]) AS r))
        |SELECT p.w, p.exact, CAST(MIN(c.cell) AS BIGINT) AS cms_est,
        |  MIN(c.cell) >= p.exact AS over_ok
        |FROM probes p JOIN cells c ON c.r = p.r AND c.bucket = p.bucket
        |GROUP BY p.w, p.exact ORDER BY p.exact DESC, p.w""".stripMargin
    })
}
