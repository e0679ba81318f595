package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Pin.PinOps

/** Join-based graph analytics over co-occurrence graphs (parity-plus:
  * the reference has no graph surface; a warehouse running on the same
  * star schema does — recommendations, importance, community density).
  *
  * Scale rules, uniformly applied:
  *   - edges come from a self-join keyed on the CO-OCCURRENCE key
  *     (order, session, document), so fan-out is bounded by basket
  *     size, never |items|²;
  *   - every iteration/closure is an equi-join + hash aggregate — no
  *     adjacency list is ever collected or held per-task;
  *   - rank/count state is quantized longs (exact, order-free sums),
  *     so results are bit-stable under any partitioning or retry.
  */
object Graphs {

  /** Undirected co-occurrence pairs (a < b) of `itemCol` values sharing
    * a `keyCol` value, kept when the pair co-occurs ≥ `minCount` times.
    * Pair multiplicity is the product of the two items' in-basket row
    * multiplicities, exactly as the key-self-join this replaces
    * produced (r14 restructure — same DuckDB oracles, no self-join):
    *
    *  - the window cap stays (it streams; a collect-first spelling
    *    would buffer a hot key's whole basket in one agg buffer);
    *  - the capped rows collect per key into a SORTED array on the
    *    window's own partitioning (groupBy keyCol reuses the exchange,
    *    ≤ maxBasket elements per buffer by construction);
    *  - pairs explode IN-basket — element i with every later element
    *    of the sorted array (equal values filtered: the self-join's
    *    `__i < __j` was a VALUE comparison), so the quadratic term
    *    never crosses the join machinery: measured at sf10 under
    *    6 GiB executors, q_pagerank's pair stage dropped ~46 GB of
    *    self-join sort/shuffle spill to the window sort's ~2 GB;
    *  - the explicit repartition on the pair key before the count is
    *    the q_assoc_rules move: pair keys are mostly unique, so a
    *    map-side partial over the raw explode builds a huge hash map
    *    for near-zero reduction — pre-partitioned, the explode
    *    streams to the wire and the post-exchange agg is bounded.
    *
    * `maxBasket` bounds the basket² term the way every other
    * quadratic-risk family here does (minhash bucket cap, RangeJoin
    * maxMatches, fuzzy block cap): each key keeps its first `maxBasket`
    * rows by item order — a row_number gate riding the key shuffle
    * itself, selected BEFORE anything quadratic. On a 100 TB event log
    * one hot session (the organic-sf1 soak's hottest user already holds
    * 2.1% of events) would otherwise square. The truncation is
    * deterministic and oracle-mirrorable: the kept rows are the
    * item-ordered head, and ties among equal (key, item) rows are
    * indistinguishable two-column tuples, so either pick yields the
    * same multiset. Order baskets are schema-bounded far below the
    * default, so the TPC-H graph queries are cap-unaffected at every
    * tested SF — the gate exists for open-ended keys (sessions, users,
    * documents).
    *
    * API CHANGE (r10): `maxBasket = 64` became the DEFAULT — before
    * r10 the operator had no cap. Library callers with baskets larger
    * than 64 items now get pairs only from each basket's item-ordered
    * 64-row head; pass a larger `maxBasket` if the tail pairs matter.
    * NOTE (r15): since the r14 in-basket restructure, each kept basket
    * buffers in ONE collect_list agg buffer and explodes O(basket²)
    * pairs from one row — so a very large `maxBasket` (Int.MaxValue,
    * the pre-r10 escape hatch) now concentrates a hot key's whole
    * basket in a single buffer/row where the old self-join streamed
    * it. If you genuinely need uncapped pairs on open-ended keys,
    * prefer the self-join spelling (pre-r14 history of this file) over
    * a huge cap here; for schema-bounded baskets (orders, carts) any
    * cap ≥ the real max is free. */
  def coOccurrencePairs(df: DataFrame, keyCol: String, itemCol: String,
                        minCount: Long = 2L,
                        maxBasket: Int = 64): DataFrame = {
    require(maxBasket >= 2, s"maxBasket must be >= 2, got $maxBasket")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__k")).orderBy(col("__i"))
    val base = df.select(col(keyCol).as("__k"), col(itemCol).as("__i"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxBasket)
    // groupBy __k reuses the window's hash partitioning — no exchange;
    // the window already emits rows item-sorted per key, but sort_array
    // re-asserts it so the pairing order never depends on that
    // implementation detail. Buffers are ≤ maxBasket by the cap above.
    val baskets = base
      .groupBy(col("__k"))
      .agg(sort_array(collect_list(col("__i"))).as("__items"))
      .select(col("__items"))
    baskets
      .select(col("__items"), posexplode(col("__items")))
      .select(col("col").as("a"),
        explode(slice(col("__items"), col("pos") + lit(2), lit(maxBasket)))
          .as("b"))
      .filter(col("a") =!= col("b"))
      // column-only repartition (r15): the pre-partition-before-count
      // move stays (mostly-unique pair keys make map-side partials
      // useless), but the partition COUNT is now sized by AQE from the
      // measured exploded-pair bytes instead of the old fixed
      // 4×shuffle.partitions constant — fewer empty tasks at small
      // inputs, the same large fan-out at scale (guide §2:
      // scale-adaptive partitioning, not a constant).
      .repartition(col("a"), col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("w")).filter(col("w") >= minCount)
      .select(col("a"), col("b"))
  }

  /** Shared PageRank machinery: (pinned src-partitioned edge frame,
    * pinned initial rank frame (node, prq, deg)) — both loop variants
    * iterate over the same frames, so a fix to the setup cannot desync
    * them. */
  private def prSetup(pairs: DataFrame): (DataFrame, DataFrame) = {
    // r15 shape changes, both scale-motivated:
    //  - edges pin BEHIND an explicit hash repartition on `src` (fixed
    //    partition count, so AQE cannot coalesce it away): every
    //    iteration's (edges JOIN ranks) join finds the |E|-sized side
    //    already partitioned on the join key and re-shuffles only the
    //    |V|-sized rank frame — the edge list crosses the wire ONCE
    //    per query instead of once per iteration (guide: two
    //    operations keyed the same way share one exchange);
    //  - the degree column rides the RANK frame (deg is constant
    //    across iterations), so the old per-iteration (contrib JOIN
    //    deg) lookup disappears entirely.
    val n = pairs.sparkSession.sessionState.conf.numShufflePartitions
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      .repartition(n, col("src"))
      .pinned // consumed by deg + every iteration join
    val pr0 = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), lit(1000000000L).as("prq"), col("deg"))
      .pinned
    (edges, pr0)
  }

  /** One power-iteration step at damping 0.85 on 1e-9-quantized integer
    * rank mass (contribution = rank div degree — exact; inflow sums
    * exact; the one damping multiply is a single double op). Returns
    * the next (node, prq, deg[, __delta]) frame — __delta = |Δprq| per
    * node — pinned to sever the iteration chain (q_kmeans precedent).
    * Shared
    * by [[pageRank]] and [[pageRankConverged]]; the delta rides the
    * step's own left join against the previous ranks (pr covers the
    * node set, so joining pr instead of a bare node list is
    * row-equivalent) — the convergence gate then needs ONE tiny
    * aggregate over the pinned frame, not its own join. */
  private def prStep(edges: DataFrame, pr: DataFrame,
                     trackDelta: Boolean): DataFrame = {
    val contrib = edges
      .join(pr.select(col("node").as("src"), col("prq"), col("deg")),
        Seq("src"))
      .select(col("dst").as("node"), expr("prq div deg").as("c"))
      .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
    val next = pr.select(col("node"), col("deg"), col("prq").as("__prev"))
      .join(contrib, Seq("node"), "left")
      .select(col("node"), (lit(150000000L) +
        floor(lit(0.85) * coalesce(col("inflow"), lit(0L)).cast("double")
          + 0.5).cast("long")).as("prq"), col("deg"), col("__prev"))
    // the fixed-iteration path has no gate, so it doesn't pay for
    // materializing a per-node delta it never reads
    val out =
      if (trackDelta) next.select(col("node"), col("prq"), col("deg"),
        abs(col("prq") - col("__prev")).as("__delta"))
      else next.select(col("node"), col("prq"), col("deg"))
    out.pinned
  }

  /** PageRank over undirected (a, b) pairs: `iters` fixed join-based
    * power iterations (see [[prStep]] for the quantized arithmetic).
    * Returns (node, prq) — prq/1e9 is the rank. */
  def pageRank(pairs: DataFrame, iters: Int = 3): DataFrame = {
    val (edges, pr0) = prSetup(pairs)
    var pr = pr0
    for (_ <- 1 to iters) pr = prStep(edges, pr, trackDelta = false)
    pr.select(col("node"), col("prq"))
  }

  /** PageRank iterated to CONVERGENCE — the loop shape a real training
    * job runs, vs [[pageRank]]'s fixed unroll. Same quantized-integer
    * power iteration; after each round the gate compares the relative
    * L1 rank movement (Σ|Δprq| / Σprq, both exact integer sums) against
    * `epsMilli`/1000 and stops early, bounded by `maxIters`.
    *
    * The stopping decision is bit-deterministic: both sums are exact
    * longs under any partitioning, and the comparison is integer
    * cross-multiplication (BigInt here, HUGEINT in the oracle) — so an
    * unrolled replay reaches the identical iteration count, which is
    * what makes a convergence-gated loop oracle-checkable at all.
    *
    * The per-round (l1, mass) pair is the ONE driver round-trip — loop
    * CONTROL on a 1-row aggregate, the same metadata-sized exception
    * the IVF probe list documents; rank frames never leave executors.
    *
    * Executor loss mid-loop: every iterate is pinned via [[Pin]]. In
    * the default localCheckpoint mode a lost executor loses pinned
    * blocks and the job fails (Spark cannot recompute a truncated
    * lineage) — rerun the query. With `spark.graft.reliableCheckpoint`
    * =true each iterate is a reliable checkpoint: surviving executors
    * re-read it from the checkpoint FS and the loop resumes the SAME
    * iteration sequence, so the gate fires at the same k with the same
    * bits — convergence state is never silently re-randomized.
    *
    * @return (final ranks (node, prq), iterations run) — `k` is
    *         `maxIters` when the gate never fired.
    */
  def pageRankConverged(pairs: DataFrame, epsMilli: Long,
                        maxIters: Int): (DataFrame, Int) = {
    require(epsMilli > 0 && maxIters > 0, s"bad gate ($epsMilli, $maxIters)")
    val (edges, pr0) = prSetup(pairs)
    var pr = pr0
    var k = 0
    var converged = false
    while (k < maxIters && !converged) {
      val next = prStep(edges, pr, trackDelta = true)
      // The step already carries |Δprq| per node, so the gate is one
      // aggregate over the pinned iterate — no extra join or shuffle.
      val row = next
        .agg(sum(col("__delta")).as("l1"), sum(col("prq")).as("mass"))
        .head
      // Empty graph → the gate sums aggregate zero rows to NULL; fail
      // with the actual cause, not an opaque NPE from getLong.
      require(!row.isNullAt(0) && !row.isNullAt(1),
        "pageRankConverged: empty edge set — pairs has no rows")
      pr = next
      k += 1
      converged =
        BigInt(row.getLong(0)) * 1000 < BigInt(epsMilli) * row.getLong(1)
    }
    (pr.select(col("node"), col("prq")), k)
  }

  /** Triangle count + wedge count over undirected (a, b) pairs via
    * degree-ordered orientation (each edge oriented from its
    * (degree, id)-smaller endpoint — hubs fan out O(√E) wedges, the
    * Suri–Vassilvitskii MR-triangle trick), wedges closed with one
    * semi-join. Returns 1 row (n_nodes, n_edges, n_wedges,
    * n_triangles). */
  def triangleStats(pairs0: DataFrame): DataFrame = {
    val pairs = pairs0.pinned // degrees + orientation + closing probe
    val deg = pairs.select(col("a").as("node"))
      .union(pairs.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .pinned
    val ordered = pairs
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("src"), col("b").as("dst")))
          .otherwise(struct(col("b").as("src"), col("a").as("dst")))
          .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .pinned // wedge join reads it twice
    val wedges = ordered.select(col("src"), col("dst").as("m"))
      .join(ordered.select(col("src").as("m"), col("dst")), Seq("m"))
      .select(col("src"), col("dst"))
    val undirected = pairs.select(col("a").as("u"), col("b").as("v"))
      .union(pairs.select(col("b").as("u"), col("a").as("v")))
    val tri = wedges.join(undirected,
        col("src") === col("u") && col("dst") === col("v"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    pairs.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(deg.agg(count(lit(1)).as("n_nodes"),
        sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))))
      .crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"))
  }
}
