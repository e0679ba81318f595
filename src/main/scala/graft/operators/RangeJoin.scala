package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded point-in-interval (range) join.
  *
  * The reference's merge_asof covers "latest row at or before" — but a
  * training-data pipeline also needs the containment join ("every
  * interval covering this point": attribution windows, maintenance
  * windows, session concurrency), and there is NO equi-key: Spark plans
  * a bare `p.ts BETWEEN i.start AND i.end` predicate as
  * BroadcastNestedLoopJoin — |P|·|I| comparisons, the classic
  * 100 TB killer.
  *
  * The fix is the textbook banding rewrite (the standard interval-join
  * optimization in the database literature): quantize time into
  * fixed-width bands, tag every point with its ONE band, replicate every
  * interval into the (at most two, for length ≤ band width) bands it can
  * reach, equi-join on the band, and apply the exact BETWEEN as a
  * post-filter. The join becomes an ordinary shuffled equi-join:
  * partition-able, AQE-skew-splittable, broadcastable when one side is
  * small — and each qualifying pair meets in EXACTLY one band (the
  * point's), so no dedup pass is needed.
  *
  * Correctness of the 2-band cover, including sub-second truncation:
  * `band(x) = floor(unix_seconds(x) / W)` truncates micros to seconds;
  * truncation is monotone, so start ≤ p ≤ end with
  * `end − start ≤ W seconds` gives
  * `sec(start) ≤ sec(p) ≤ sec(end) ≤ sec(start) + W`, hence
  * `band(p) ∈ {band(start), band(start) + 1}`.
  *
  * Intervals longer than `bandSeconds` would need more replicas than the
  * two this builds (an explode over the covered-band range); the guard
  * makes the caller choose the band width consciously — at scale it is
  * the replication-factor dial: wider bands = fewer replicas but more
  * false candidates through the exact filter.
  */
object RangeJoin {

  private val BAND = "__rj_band"

  /** Inner point-in-interval join: rows of `points` paired with every row
    * of `intervals` whose `[start, end]` (inclusive) contains `pTs`.
    * Output carries all columns of both inputs (caller pre-aliases name
    * collisions), band column dropped.
    *
    * @param maxLenSeconds caller-asserted upper bound on interval length;
    *                      must be ≤ bandSeconds for the 2-band cover.
    * @param maxMatches    optional per-point cap on emitted matches — the
    *                      same output-density discipline the dedup family
    *                      applies to its buckets. Without a cap the output
    *                      is |matches|, which grows with the SQUARE of
    *                      event density in a band (both sides of the join
    *                      densify together): correct, but linear-or-worse
    *                      at soak scale when the caller only needs a
    *                      bounded sample per point. With a cap, a
    *                      row_number gate keeps the first `maxMatches`
    *                      matches per point in `matchOrder`. All matches
    *                      of one point meet in the point's single band, so
    *                      the gate's window partitions by (band, pointKey)
    *                      — grouping is already band-local and the window
    *                      shuffle is over the POST-FILTER pairs only.
    * @param pointKey      unique key of `points` (required with a cap).
    * @param matchOrder    deterministic preference order over the interval
    *                      side (required with a cap); must be a total
    *                      order per point for a deterministic row choice —
    *                      with ties, WHICH rows survive is arbitrary but
    *                      the survivor COUNT min(n, cap) is not.
    */
  def pointInInterval(points: DataFrame, pTs: Column,
                      intervals: DataFrame, iStart: Column, iEnd: Column,
                      bandSeconds: Long, maxLenSeconds: Long,
                      maxMatches: Int = Int.MaxValue,
                      pointKey: Seq[Column] = Nil,
                      matchOrder: Seq[Column] = Nil): DataFrame = {
    require(bandSeconds > 0, s"bandSeconds must be positive: $bandSeconds")
    require(maxLenSeconds <= bandSeconds,
      s"interval length bound $maxLenSeconds exceeds band width " +
        s"$bandSeconds — the 2-replica cover would miss matches")
    require(maxMatches > 0, s"maxMatches must be positive: $maxMatches")
    require(maxMatches == Int.MaxValue ||
      (pointKey.nonEmpty && matchOrder.nonEmpty),
      "a match cap needs pointKey and matchOrder for the row_number gate; " +
        "matchOrder must be a TOTAL order per point (append a unique " +
        "interval id as its last column, as q_range_join does with vid) — " +
        "under a partial order the surviving SET is run-dependent and " +
        "breaks hash determinism downstream")
    val p = points.withColumn(BAND, floor(unix_timestamp(pTs) / bandSeconds))
    val b0 = floor(unix_timestamp(iStart) / bandSeconds)
    // Two replicas per interval, built relationally (union of two
    // projections) rather than explode(sequence(...)) — stays in
    // whole-stage codegen and keeps the replication factor visible in
    // the plan.
    val i = intervals.withColumn(BAND, b0)
      .unionByName(intervals.withColumn(BAND, b0 + 1))
    val joined = p.join(i, p(BAND) === i(BAND) && pTs.between(iStart, iEnd))
    if (maxMatches == Int.MaxValue) joined.drop(BAND)
    else {
      val rn = "__rj_rn"
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(p(BAND) +: pointKey: _*).orderBy(matchOrder: _*)
      joined.withColumn(rn, row_number().over(w))
        .filter(col(rn) <= maxMatches)
        .drop(rn, BAND)
    }
  }

  /** Interval×interval overlap join (inclusive endpoints): pairs where
    * `[lStart, lEnd]` and `[rStart, rEnd]` intersect — session
    * concurrency, attribution-vs-outage audits, any two timelines.
    *
    * Same banding rewrite, both sides replicated to their ≤2 reachable
    * bands — but now a qualifying pair could meet in TWO bands, so the
    * dedup is the standard overlap-start rule: the pair is emitted only
    * in `band(max(lStart, rStart))`, the band where the overlap begins.
    * That band is always in both replica sets: `max(lStart, rStart) ≤
    * min(lEnd, rEnd) ≤ either start + maxLen`, and truncation is
    * monotone (the [[pointInInterval]] argument applied twice). So each
    * overlapping pair meets exactly once and the rewrite stays an
    * ordinary shuffled equi-join on (band, equi keys) — no distinct
    * pass, no nested loop.
    *
    * Column names must be disjoint across the two inputs (pre-alias);
    * `equi` lists (leftCol, rightCol) equality pairs (e.g. the user
    * key) that ride the hash-join key alongside the band.
    */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
                      right: DataFrame, rStart: String, rEnd: String,
                      bandSeconds: Long, maxLenSeconds: Long,
                      equi: Seq[(String, String)] = Nil): DataFrame = {
    require(bandSeconds > 0, s"bandSeconds must be positive: $bandSeconds")
    require(maxLenSeconds <= bandSeconds,
      s"interval length bound $maxLenSeconds exceeds band width " +
        s"$bandSeconds — the 2-replica cover would miss overlaps")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "interval frames must have disjoint column names — pre-alias")
    val lBand = BAND + "_l"
    val rBand = BAND + "_r"
    val l = {
      val b0 = floor(unix_timestamp(col(lStart)) / bandSeconds)
      left.withColumn(lBand, b0).unionByName(left.withColumn(lBand, b0 + 1))
    }
    val r = {
      val b0 = floor(unix_timestamp(col(rStart)) / bandSeconds)
      right.withColumn(rBand, b0).unionByName(right.withColumn(rBand, b0 + 1))
    }
    val overlapStartBand =
      floor(unix_timestamp(greatest(col(lStart), col(rStart))) / bandSeconds)
    val cond = (col(lBand) === col(rBand)) +: equi.map { case (a, b) =>
        col(a) === col(b) } :+
      (col(lStart) <= col(rEnd)) :+ (col(rStart) <= col(lEnd)) :+
      (col(lBand) === overlapStartBand)
    l.join(r, cond.reduce(_ && _)).drop(lBand, rBand)
  }

  /** Capped windowed COUNT over another timeline — per point, the number
    * of events with `eTs ∈ [pTs + lowOffsetMicros, pTs + highOffsetMicros]`
    * (inclusive both ends), capped at `cap` — WITHOUT materializing a
    * single candidate pair.
    *
    * The output count column is NULLABLE: a null-ts point gets a NULL
    * count (not 0 — see the in-body comment on the deliberate deviation
    * from left-join COUNT semantics). Consumers aggregating the count
    * must `coalesce(count, 0)` if they want null-ts points counted as
    * zeros.
    *
    * Why this exists (r12 full-board sf10 soak): the banded
    * [[pointInInterval]] is density-QUADRATIC before its per-point cap —
    * bands quantize a FIXED time axis, so 10× data in the same time span
    * puts 10× rows of BOTH sides into every band and the equi-join does
    * ~100× work; the row_number cap gates the OUTPUT but not the join.
    * Measured on q_range_join: 42× wall for 10× data with ~35 GB spill —
    * the time-banded twin of the fixed-cardinality blocked-dedup defect.
    *
    * The rank-probe rewrite: qualifying events for a point form a
    * CONTIGUOUS run of the event timeline (the window is an interval in
    * eTs), so a count needs only the run's two endpoints, not its
    * members. Union three row kinds — lo-probes at the window start
    * (tag 0), events (tag 1, indicator 1), hi-probes at the window end
    * (tag 2) — and take ONE [[GlobalOrder.withRunningSum]] of the
    * indicator over (t, tag): the tag order makes the lo-probe's running
    * count exclude equal-t events (window-start inclusivity) and the
    * hi-probe's include them (window-end inclusivity), so
    * `count = hi − lo` exactly, and the output is `least(count, cap)`.
    * Work is O((|P| + |E|) log) — one range shuffle and a hash agg,
    * independent of event density; probes carry indicator 0, so tie
    * order among them cannot perturb the sums. This is the same
    * density-proof total-order machinery the dedup family's
    * minhash-sorted chains run on.
    *
    * `pointKey` must be unique per point (it is the group-by key). */
  def windowedCounts(points: DataFrame, pointKey: Column, pTs: Column,
                     events: DataFrame, eTs: Column,
                     lowOffsetMicros: Long, highOffsetMicros: Long,
                     cap: Long = Long.MaxValue, parts: Int = 0,
                     countName: String = "n_in_range"): DataFrame = {
    require(lowOffsetMicros <= highOffsetMicros,
      s"window is empty: [$lowOffsetMicros, $highOffsetMicros]")
    require(cap > 0, s"cap must be positive: $cap")
    val keyed = points.select(pointKey.as("__wc_k"),
      unix_micros(pTs).as("__wc_pt"))
    val keyType = keyed.schema("__wc_k").dataType
    // Null timestamps: a null-ts EVENT falls inside no window (dropped
    // at the scan — same as the theta-join, where NULL comparisons are
    // never true), and a null-ts POINT still gets an output row, with a
    // NULL count. The NULL count is a DELIBERATE DEVIATION from
    // left-join COUNT semantics (a zeros-kept left theta-join — and the
    // pandas masking convention, where NaT comparisons are False —
    // would emit 0): "this point's window is undefined" and "this
    // point's window is empty" are different facts, and NULL keeps them
    // distinguishable downstream. Consequence for consumers: SUM/AVG
    // over the count column skips null-ts points instead of counting
    // them as zeros — coalesce(count, 0) at the call site to get
    // left-join behavior. Pinned by RangeJoinSpec. Its probes ride the same union at a
    // sentinel t that sorts before every real event (hi − lo = 0 there,
    // then overridden to NULL by the flag), so the duplicate-pointKey
    // guard still sees every point exactly once — nulls don't get to
    // sort "somewhere" among null events and absorb their count.
    def probe(offset: Long, tag: Int) = keyed.select(col("__wc_k"),
      when(col("__wc_pt").isNotNull, col("__wc_pt") + lit(offset))
        .otherwise(lit(Long.MinValue)).as("__wc_t"),
      lit(tag).as("__wc_tag"), lit(0L).as("__wc_v"),
      col("__wc_pt").isNull.as("__wc_nullts"))
    val ev = events.filter(eTs.isNotNull)
      .select(lit(null).cast(keyType).as("__wc_k"),
        unix_micros(eTs).as("__wc_t"), lit(1).as("__wc_tag"),
        lit(1L).as("__wc_v"), lit(false).as("__wc_nullts"))
    val unioned = probe(lowOffsetMicros, 0)
      .unionByName(ev).unionByName(probe(highOffsetMicros, 2))
    val run = GlobalOrder.withRunningSum(unioned,
      Seq(col("__wc_t"), col("__wc_tag")), col("__wc_v"), "__wc_c",
      scale = 0, parts = parts)
    run.filter(col("__wc_tag") =!= 1)
      .groupBy(col("__wc_k").as("point_key"))
      .agg(
        least(
          (max(when(col("__wc_tag") === 2, col("__wc_c"))) -
           max(when(col("__wc_tag") === 0, col("__wc_c")))).cast("long"),
          lit(cap)).as(countName),
        count(when(col("__wc_tag") === 0, lit(1))).as("__wc_n0"),
        max(col("__wc_nullts")).as("__wc_nullts"))
      // Loud misuse guard (matches pointInInterval's require() style,
      // but the uniqueness fact is distributed, so it must be a
      // runtime check): a duplicated pointKey would silently mix one
      // point's hi probe with the OTHER's lo probe and report the
      // count over the spanning window. Expressed as a FILTER, not a
      // projected CaseWhen: a projection is column-prunable — a
      // consumer selecting only point_key would silently lose the
      // check — while a Filter survives pruning. assert_true returns
      // NULL on the honest path, so the predicate keeps every valid
      // row at zero cost and throws only on violation.
      .filter(assert_true(col("__wc_n0") === 1, format_string(
        "windowedCounts: pointKey %s is not unique (%s probe rows)",
        col("point_key"), col("__wc_n0"))).isNull)
      .select(col("point_key"),
        when(!col("__wc_nullts"), col(countName)).as(countName))
  }
}
