package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions._
import graft.operators.GlobalOrder
import graft.operators.Pin.PinOps

/** Event-analytics tier: CDC latest-wins upsert, SCD2 history
  * construction, funnel conversion, cohort retention, and Markov
  * transition counts — the warehouse queries an events table exists to
  * answer, and the mutation patterns (upsert, slowly-changing
  * dimensions) a lakehouse write path is built from. All windows
  * partition on user_id (high-cardinality — no reducer funnel); every
  * output is exact integers/timestamps or rounded doubles.
  */
object EventAnalytics {

  /** Per-user lifetime rows shared by the survival tier (q_survival_km,
    * q_logrank): (user_id, dur, ch) — lifetime in days and the churn
    * flag. Churn policy lives HERE, once: no activity in the final
    * corpus day (1-day inactivity window; the 30-day fixture's users
    * idle at most 2 days, so this cutoff keeps both the event and the
    * censoring path load-bearing — change it in the oracles too). The
    * user agg is pinned: both queries consume it at least twice
    * (totals + the per-duration agg), and the pin keeps the events
    * scan single-pass. */
  private def userLifetimes(s: org.apache.spark.sql.SparkSession,
                            dir: String): org.apache.spark.sql.DataFrame = {
    val day = expr("unix_micros(ts) div 86400000000")
    val spans = Tables(s, dir, "events")
      .select(col("user_id"), day.as("__d"))
      .groupBy(col("user_id"))
      .agg(min(col("__d")).as("fd"), max(col("__d")).as("ld"))
      .pinned
    val stats = spans.agg(max(col("ld")).as("horizon"))
    spans.crossJoin(broadcast(stats))
      .select(col("user_id"), (col("ld") - col("fd")).as("dur"),
        when(col("ld") < col("horizon"), 1L).otherwise(0L).as("ch"))
  }

  val queries: Map[String, Q] = Map(

    // RFM user scoring (the classic CRM segmentation): recency = days
    // from the user's last event to the corpus max (a deterministic
    // anchor — never wall-clock), frequency = event count, monetary =
    // exact decimal value sum. Quintile scores come from the two-pass
    // global row number over the per-USER frame (|users| ≪ |events|;
    // never a single-partition ntile) with the closed-form qcut bucket
    // ⌈5r/n⌉ spelled in integer division so both engines cut
    // identically; (metric, user_id) is a total order so ties are
    // deterministic. One events shuffle (the user agg); the three rank
    // passes run on the small user frame, which is checkpointed once.
    "q_rfm" -> ((s, dir) => {
      val base0 = Tables(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(max(unix_micros(col("ts"))).as("__last_us"),
          count(lit(1)).as("frequency"),
          sum(round(col("value"), 3).cast(DecimalType(30, 3))).cast("double")
            .as("monetary"))
      val base = base0.crossJoin(
          broadcast(base0.agg(max(col("__last_us")).as("__max_us"))))
        .withColumn("recency_days",
          expr("(__max_us - __last_us) div 86400000000"))
        .select(col("user_id"), col("recency_days"), col("frequency"),
          col("monetary"))
        .pinned // feeds the melted rank pass + the result
      // MELTED rank (r15, the chain-candidate move): the three metric
      // rank passes ride ONE range shuffle — unpivot to (metric, value,
      // user), rank over that total order, and recover each metric's
      // rank as global_rn − metric·n (every user contributes exactly
      // one row per metric, so each metric's block is contiguous with
      // exactly n rows). Values melt as doubles: recency/frequency are
      // day/event counts far below 2^53, so the cast is exact and
      // order-preserving, and ties still break on user_id as before.
      // The three score joins collapse into one pivoted aggregate.
      val melted = base.select(col("user_id"), posexplode(array(
          col("recency_days").cast("double"),
          col("frequency").cast("double"), col("monetary"))))
        .select(col("pos").as("__metric"), col("col").as("__m"),
          col("user_id"))
      val ranked = GlobalOrder.withRowNumberLong(melted,
        Seq(col("__metric"), col("__m"), col("user_id")), "__gr")
      val scores = ranked.crossJoin(
          broadcast(base.agg(count(lit(1)).as("__n"))))
        .withColumn("__r", col("__gr") - col("__metric") * col("__n"))
        // bucket = ⌈5r/n⌉ in integer arithmetic; inverted for recency
        // (most recent = highest score)
        .withColumn("__b", expr("(5 * __r - 1) div __n + 1"))
        .groupBy(col("user_id"))
        .agg(
          max(when(col("__metric") === 0, lit(6L) - col("__b")))
            .as("r_score"),
          max(when(col("__metric") === 1, col("__b"))).as("f_score"),
          max(when(col("__metric") === 2, col("__b"))).as("m_score"))
      base.join(scores, Seq("user_id"))
        .withColumn("rfm",
          col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
        .orderBy(col("user_id"))
    }),

    // Within-session conversion (the funnel variant bounded by the
    // session, not a fixed clock window): sessions from the pinned
    // 30-minute gap rule, a session converts when its first purchase
    // follows its first view. One session pass + one (user, session)
    // aggregate with two conditional mins — same shuffle as the
    // sessionize family; the report is a 1-row ratio of exact counts.
    "q_session_funnel" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val sess = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("__prev", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("__new",
          when(col("__prev").isNull ||
            unix_micros(col("ts")) - col("__prev") > 1800000000L, 1)
            .otherwise(0))
        .withColumn("__sid", sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("__sid"))
        .agg(min(when(col("event_type") === "view",
          unix_micros(col("ts")))).as("__tv"),
          min(when(col("event_type") === "purchase",
            unix_micros(col("ts")))).as("__tp"))
      sess.agg(count(lit(1)).as("n_sessions"),
          sum(when(col("__tv").isNotNull, 1L).otherwise(0L))
            .as("n_with_view"),
          sum(when(col("__tv").isNotNull && col("__tp").isNotNull &&
            col("__tp") > col("__tv"), 1L).otherwise(0L)).as("n_converted"))
        .withColumn("conversion",
          round(col("n_converted").cast("double") /
            col("n_with_view").cast("double"), 6))
    }),

    // Inter-event dwell-time distribution (the engagement metric):
    // per-user consecutive gaps in seconds from ONE lag pass over the
    // user-keyed shuffle, then count / exact mean / nearest-rank
    // p50/p90 over the gap frame.
    "q_dwell_time" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val gaps = Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("__prev", lag(unix_micros(col("ts")), 1).over(w))
        .filter(col("__prev").isNotNull)
        .select(expr("(unix_micros(ts) - __prev) div 1000000").as("gap_s"))
        .pinned // feeds the scalar agg AND the rank picks
      val stats = gaps.agg(count(lit(1)).as("n_gaps"),
        round(sum(col("gap_s")).cast("double") / count(lit(1)), 6)
          .as("mean_gap_s"))
      val picks = GlobalOrder.nearestRankPicks(gaps,
        col("gap_s").cast("double"), Seq(("p50_gap_s", 0.5), ("p90_gap_s", 0.9)))
      stats.crossJoin(broadcast(picks))
    }),

    // Day-over-day spike ranking (the monitoring query behind volume
    // alerts): daily decimal-exact totals, lag diff over the day
    // series, top-10 absolute changes via a bounded TakeOrdered. The
    // unpartitioned window runs over the CALENDAR-sized daily frame —
    // one row per day, never per event — so the single-partition sort
    // is a few hundred rows at any corpus size.
    "q_value_spikes" -> ((s, dir) => {
      val w = Window.orderBy(col("day"))
      Tables(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(sum(round(col("value"), 3).cast(DecimalType(30, 3)))
          .cast("double").as("total"))
        .withColumn("prev", lag(col("total"), 1).over(w))
        .filter(col("prev").isNotNull)
        .withColumn("delta", round(col("total") - col("prev"), 6))
        .select(col("day"), col("total"), col("prev"), col("delta"))
        .orderBy(abs(col("delta")).desc, col("day"))
        .limit(10)
    }),

    // Time-constrained funnel (the product semantic q_funnel's
    // unconditional version misses): first view → first click within
    // 30 min of it → first purchase within 60 min of that click, per
    // user. Three conditional-min aggregates chained on the user key:
    // stage k+1's candidate events are gated by stage k's timestamp,
    // so each stage is one groupBy over the SAME user-keyed shuffle —
    // Spark plans the three as a single exchange. Counts are exact.
    "q_window_funnel" -> ((s, dir) => {
      val us = unix_micros(col("ts"))
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"), us.as("__us"))
        .pinned // three stage passes over one frame
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("__us")).as("__tv"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, Seq("user_id"))
        .filter(col("__us") > col("__tv") &&
          col("__us") - col("__tv") <= 1800000000L)
        .groupBy(col("user_id")).agg(min(col("__us")).as("__tc"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id"))
        .filter(col("__us") > col("__tc") &&
          col("__us") - col("__tc") <= 3600000000L)
        .groupBy(col("user_id")).agg(min(col("__us")).as("__tp"))
      v.agg(count(lit(1)).as("n_view")).crossJoin(
          c.agg(count(lit(1)).as("n_click_30m")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase_60m")))
    }),

    // Retention curve summary: the fraction of users still active ≥1,
    // ≥7, and ≥30 days after their first activity — the D1/D7/D30
    // headline the cohort matrix (q_retention) details. One user agg
    // (first/last epoch-day), three conditional counts, exact ratios.
    "q_retention_curve" -> ((s, dir) => {
      val day = expr("unix_micros(ts) div 86400000000")
      val span = Tables(s, dir, "events")
        .select(col("user_id"), day.as("__d"))
        .groupBy(col("user_id"))
        .agg((max(col("__d")) - min(col("__d"))).as("__span"))
      def rate(k: Int) = round(
        sum(when(col("__span") >= k, 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double"), 6)
      span.agg(count(lit(1)).as("n_users"), rate(1).as("d1"),
        rate(7).as("d7"), rate(30).as("d30"))
    }),

    // Kaplan–Meier survival over user lifetimes (parity-plus: the
    // product-analytics companion of q_retention_curve/q_churn — the
    // estimator handles CENSORING, which plain retention rates cannot:
    // users still active at the corpus horizon aren't churn events,
    // they just leave the risk set). Lifetime = last−first active day;
    // churn = no activity in the final
    // corpus day (the inactivity window is a parameter; 1 day here
    // because the 30-day fixture's users idle at most 2 days — this
    // cutoff makes BOTH estimator paths load-bearing: 17/156 churn
    // events at sf0.01/sf0.1 drive the likelihood term, the active
    // majority exercises censoring). Scale shape: one
    // user-keyed agg, then everything runs on the per-duration frame
    // (calendar-sized); prefix sums via GlobalOrder's two-pass recipe —
    // no global single-partition window. Determinism: the survival
    // product runs in log space — each factor ln((n−d)/n) is a libm
    // call on a bit-identical double quantized to a 1e-9 long BEFORE
    // the order-free integer prefix sum, one exp at output, 1e-6
    // floor-quantized (the q_logreg_step recipe). A duration whose
    // events empty the risk set sends survival to exactly 0 from that
    // point on (cum_z gate) — ln(0) never evaluates.
    "q_survival_km" -> ((s, dir) => {
      val lf = userLifetimes(s, dir)
      val totals = lf.agg(count(lit(1)).as("n_users"))
      val perDur = lf
        .groupBy(col("dur").as("dur_days"))
        .agg(count(lit(1)).as("n_d"), sum(col("ch")).as("n_events"))
        .crossJoin(broadcast(totals))
      val withN = GlobalOrder.withRunningSum(perDur,
        Seq(col("dur_days")), col("n_d"), "cum_n", scale = 0)
      val risk = withN.select(col("dur_days"), col("n_events"),
        (col("n_users") - col("cum_n") + col("n_d")).cast("long")
          .as("n_risk"))
      val terms = risk.select(col("dur_days"), col("n_risk"), col("n_events"),
        when(col("n_events") < col("n_risk"),
          floor(log((col("n_risk") - col("n_events")).cast("double") /
            col("n_risk").cast("double")) * 1e9 + 0.5).cast("long"))
          .otherwise(lit(0L)).as("lnq"),
        when(col("n_events") === col("n_risk"), 1L).otherwise(0L).as("z"))
      val cum = GlobalOrder.withRunningSum(
        GlobalOrder.withRunningSum(terms,
          Seq(col("dur_days")), col("lnq"), "cum_ln", scale = 0),
        Seq(col("dur_days")), col("z"), "cum_z", scale = 0)
      cum.select(col("dur_days"), col("n_risk"), col("n_events"),
          when(col("cum_z") > 0, lit(0.0)).otherwise(
            floor(exp(col("cum_ln") / 1e9) * 1e6 + 0.5) / 1e6)
            .as("survival"))
        .orderBy(col("dur_days"))
    }),

    // Logrank test — the significance companion of q_survival_km (and
    // the survival-analysis twin of q_ab_test's proportion z): do two
    // user cohorts (deterministic md5 split) draw from the same
    // survival curve? At each event time the observed cohort-A events
    // are compared with the hypergeometric expectation d·n_A/n and
    // variance d·(n_A/n)(1−n_A/n)(n−d)/(n−1); z = (O−E)/√V. Every
    // per-time term is a fixed-order IEEE expression over exact-int
    // doubles quantized to a 1e-9 long BEFORE the order-free sums
    // (the q_psi recipe); the oracle replays the identical op
    // sequence. Same calendar-sized per-duration frame and two-pass
    // prefix sums as q_survival_km.
    "q_logrank" -> ((s, dir) => {
      val users = userLifetimes(s, dir)
        .select(col("dur"), col("ch"),
          when(md5Bucket(col("user_id"), 2L, salt = "lr:") === 0, 1L)
            .otherwise(0L).as("ga"))
      val totals = users.agg(count(lit(1)).as("n_tot"),
        sum(col("ga")).as("n_tot_a"))
      val perDur = users.groupBy(col("dur"))
        .agg(count(lit(1)).as("n_d"), sum(col("ga")).as("n_d_a"),
          sum(col("ch")).as("ev"), sum(col("ch") * col("ga")).as("ev_a"))
      val cum = GlobalOrder.withRunningSum(
        GlobalOrder.withRunningSum(perDur,
          Seq(col("dur")), col("n_d"), "cum_n", scale = 0),
        Seq(col("dur")), col("n_d_a"), "cum_a", scale = 0)
      val risk = cum.crossJoin(broadcast(totals)).select(
        col("ev"), col("ev_a"),
        (col("n_tot") - col("cum_n") + col("n_d")).cast("long").as("nr"),
        (col("n_tot_a") - col("cum_a") + col("n_d_a")).cast("long")
          .as("nra"))
      val fa = col("nra").cast("double") / col("nr").cast("double")
      val terms = risk.filter(col("ev") > 0).select(
        col("ev_a"),
        floor(col("ev").cast("double") * col("nra").cast("double")
          / col("nr").cast("double") * 1e9 + 0.5).cast("long").as("eq"),
        when(col("nr") > 1,
          floor(col("ev").cast("double") * fa * (lit(1.0) - fa) *
            ((col("nr") - col("ev")).cast("double") /
              (col("nr") - 1).cast("double")) * 1e9 + 0.5).cast("long"))
          .otherwise(0L).as("vq"))
      terms.agg(sum(col("ev_a")).as("o_a"), sum(col("eq")).as("eqs"),
          sum(col("vq")).as("vqs"))
        .crossJoin(broadcast(totals))
        .select(col("n_tot").as("n_users"), col("n_tot_a").as("n_a"),
          col("o_a"),
          (floor(col("eqs").cast("double") / 1e9 * 1e6 + 0.5) / 1e6)
            .as("e_a"),
          (floor(col("vqs").cast("double") / 1e9 * 1e6 + 0.5) / 1e6)
            .as("var_lr"),
          when(col("vqs") > 0,
            floor((col("o_a").cast("double") -
                col("eqs").cast("double") / 1e9) /
              sqrt(col("vqs").cast("double") / 1e9) * 1e6 + 0.5) / 1e6)
            .otherwise(lit(0.0)).as("z_lr"))
    }),

    // Lorenz curve (the curve the Gini coefficient summarizes):
    // cumulative share of spend held by the bottom-x% of users, at
    // deciles. Same exact milli-long user totals and two-pass ranking
    // as q_gini; the decile read-off picks the cumulative sum at rank
    // ⌈n·k/10⌉ — every number an exact long until the one rounded
    // division per decile.
    "q_lorenz_curve" -> ((s, dir) => {
      val totals = Tables(s, dir, "events")
        .groupBy(col("user_id"))
        .agg((sum(round(col("value"), 3).cast(DecimalType(30, 3))) * 1000)
          .cast("long").as("m"))
      val ranked = GlobalOrder.withRunningSum(
          GlobalOrder.withRowNumberLong(totals,
            Seq(col("m"), col("user_id")), "i"),
          Seq(col("m"), col("user_id")), col("m"), "cm", scale = 0)
        .pinned // feeds the totals AND the decile picks
      val t = ranked.agg(max(col("i")).as("__n"),
        sum(col("m")).as("__s"))
      val withT = ranked.crossJoin(broadcast(t))
      val picks = (1 to 10).map { k =>
        sum(when(col("i") ===
          ceil(col("__n").cast("double") * (k / 10.0)).cast("long"),
          col("cm"))).as(s"__c$k")
      }
      val aggs = Seq(max(col("__n")).as("__nn"),
        max(col("__s")).as("__ss")) ++ picks
      withT.agg(aggs.head, aggs.tail: _*)
        .select(explode(array((1 to 10).map { k =>
          struct(lit(k).as("decile"),
            round(col(s"__c$k") / col("__ss").cast("double"), 6)
              .as("spend_share"))
        }: _*)).as("r"))
        .select(col("r.decile"), col("r.spend_share"))
        .orderBy(col("decile"))
    }),

    // Cohort LTV curves (the growth metric q_retention's activity
    // matrix stops short of): users cohorted by first-event epoch-week,
    // per-(cohort, week-offset) revenue in exact decimals, CUMULATIVE
    // along the offset axis — lifetime value per cohort member at each
    // age. One events shuffle for the user-week revenue, a user_id
    // equi-join against the |users|-sized cohort frame (shuffle hash
    // join — the frame is data-sized, so it is deliberately NOT
    // broadcast), and the cumulative window runs over the
    // (cohorts × offsets) frame — calendar-sized, never per-event. The
    // cumulative sum stays decimal (exact), so ltv is one rounded
    // division per row.
    "q_cohort_ltv" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val week = expr("unix_micros(ts) div 604800000000")
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), week.as("wk"),
          round(col("value"), 3).cast(DecimalType(30, 3)).as("v"))
      val cohort = ev.groupBy(col("user_id"))
        .agg(min(col("wk")).as("cw"))
      val sizes = cohort.groupBy(col("cw")).agg(count(lit(1)).as("n_users"))
      val rev = ev.join(cohort, Seq("user_id"))
        .groupBy(col("cw"), (col("wk") - col("cw")).as("week_offset"))
        .agg(sum(col("v")).as("r"))
      val w = Window.partitionBy(col("cw")).orderBy(col("week_offset"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rev.withColumn("cum", sum(col("r")).over(w))
        .join(broadcast(sizes), Seq("cw"))
        .select(col("cw").as("cohort_week"), col("week_offset"), col("n_users"),
          round(col("cum").cast("double"), 3).as("cum_revenue"),
          round(col("cum").cast("double") / col("n_users").cast("double"), 6)
            .as("ltv_per_user"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    // Snapshot diff (the table-versioning / CDC-reconciliation
    // primitive: "what changed between yesterday's and today's load"):
    // v2 is a deterministic mutation of orders (≈5% deleted, ≈5%
    // price-updated, ≈4% inserted under shifted keys — all md5-bucket
    // coins, so both engines build the identical v2), then ONE full
    // outer join on the key classifies every row as inserted / deleted
    // / updated / unchanged. Output: counts per class + the exact
    // decimal net price delta of updates. At scale this is the one
    // key-partitioned join any snapshot reconciler runs; nothing
    // collects.
    "q_snapshot_diff" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val v1 = Tables(s, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
      val maxK = v1.agg(max(col("k")).as("__mk"))
      val v2 = v1
        .filter(md5Bucket(col("k"), 20L, salt = "del:") =!= 0)
        .withColumn("p", when(md5Bucket(col("k"), 20L, salt = "upd:") === 0,
          col("p") + 1.0).otherwise(col("p")))
        .unionByName(v1.filter(md5Bucket(col("k"), 25L, salt = "ins:") === 0)
          .crossJoin(broadcast(maxK))
          .select((col("k") + col("__mk")).as("k"), col("p")))
      val joined = v1.select(col("k"), col("p").as("p1"))
        .join(v2.select(col("k"), col("p").as("p2")), Seq("k"), "full_outer")
        .withColumn("change",
          when(col("p1").isNull, "inserted")
            .when(col("p2").isNull, "deleted")
            .when(col("p1") =!= col("p2"), "updated")
            .otherwise("unchanged"))
      joined.groupBy(col("change"))
        .agg(count(lit(1)).as("n"),
          coalesce(sum((col("p2") - col("p1")).cast(DecimalType(30, 2))),
            lit(BigDecimal(0))).cast("double").as("net_delta"))
        .orderBy(col("change"))
    }),

    // Deterministic A/B test readout: users hash-split 50/50 (salted
    // md5 — the assignment IS the experiment system's), metric =
    // "purchase share above the uniform 1/5" (every fixture user
    // purchases at least once, so raw conversion is degenerate at
    // 100%; the share metric has real variance). Effect read out as
    // the two-proportion z statistic: exact integer numerators and
    // denominators feed one deterministic double sequence, rounded —
    // the gate pins the whole stats pipeline, not just the counts.
    "q_ab_test" -> ((s, dir) => {
      val users = Tables(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(when(
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) * 5 >
            count(lit(1)), 1L).otherwise(0L).as("converted"))
        .withColumn("grp",
          when(md5Bucket(col("user_id"), 2L, salt = "ab:") === 0, "A")
            .otherwise("B"))
      users.groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("converted")).as("conv"))
        .agg(
          sum(when(col("grp") === "A", col("n"))).as("n_a"),
          sum(when(col("grp") === "A", col("conv"))).as("c_a"),
          sum(when(col("grp") === "B", col("n"))).as("n_b"),
          sum(when(col("grp") === "B", col("conv"))).as("c_b"))
        .select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
          round(col("c_a").cast("double") / col("n_a").cast("double"), 6)
            .as("p_a"),
          round(col("c_b").cast("double") / col("n_b").cast("double"), 6)
            .as("p_b"),
          // null-gate: the pooled variance is 0 when every user (or no
          // user) converts — both engines emit null there instead of
          // each one's own divide-by-zero convention (exact integer
          // predicate, so the gate itself can't float-drift).
          when(col("c_a") + col("c_b") > 0 &&
            col("c_a") + col("c_b") < col("n_a") + col("n_b"),
            round(
              (col("c_a").cast("double") / col("n_a").cast("double") -
                col("c_b").cast("double") / col("n_b").cast("double")) /
                sqrt(((col("c_a") + col("c_b")).cast("double") /
                  (col("n_a") + col("n_b")).cast("double")) *
                  (lit(1.0) - (col("c_a") + col("c_b")).cast("double") /
                    (col("n_a") + col("n_b")).cast("double")) *
                  (lit(1.0) / col("n_a").cast("double") +
                    lit(1.0) / col("n_b").cast("double"))), 6)).as("z"))
    }),

    // Time-to-convert distribution: for users whose first view
    // precedes their first purchase, seconds between the two firsts —
    // count, exact mean, nearest-rank p50/p90 (data values, the
    // q_winsorize argument). Two conditional min aggregates per user
    // (one events shuffle), then the rank pass over |converters| rows.
    "q_funnel_time" -> ((s, dir) => {
      val firsts = Tables(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view",
          unix_micros(col("ts")))).as("__v"),
          min(when(col("event_type") === "purchase",
            unix_micros(col("ts")))).as("__p"))
        .filter(col("__v").isNotNull && col("__p").isNotNull &&
          col("__p") > col("__v"))
        .select(expr("(__p - __v) div 1000000").as("tts"))
        .pinned // feeds the scalar agg AND the rank picks
      val stats = firsts.agg(count(lit(1)).as("n_converted"),
        round(sum(col("tts")).cast("double") / count(lit(1)), 6)
          .as("mean_tts_s"))
      val picks = GlobalOrder.nearestRankPicks(firsts,
        col("tts").cast("double"), Seq(("p50_tts_s", 0.5), ("p90_tts_s", 0.9)))
      stats.crossJoin(broadcast(picks))
    }),

    // Gini coefficient of user spend concentration (the inequality
    // metric behind "the top 1% of users drive X% of value"). User
    // totals are quantized to exact milli-unit LONGS, ranked ascending
    // by (total, user_id) via the two-pass row number over the USER
    // frame, and Gini = (2·Σ i·mᵢ − (n+1)·Σ mᵢ) / (n·Σ mᵢ) — every
    // term an exact long (Σ i·mᵢ stays under 2⁶³ far past this scale),
    // one rounded division at the end. Fully deterministic.
    "q_gini" -> ((s, dir) => {
      val totals = Tables(s, dir, "events")
        .groupBy(col("user_id"))
        .agg((sum(round(col("value"), 3).cast(DecimalType(30, 3))) * 1000)
          .cast("long").as("m"))
      val ranked = GlobalOrder.withRowNumberLong(totals,
        Seq(col("m"), col("user_id")), "i")
      ranked.agg(count(lit(1)).as("__n"), sum(col("m")).as("__s0"),
          sum(col("i") * col("m")).as("__s1"))
        .select(col("__n").as("n_users"),
          round((lit(2L) * col("__s1") - (col("__n") + 1) * col("__s0"))
            .cast("double") /
            (col("__n") * col("__s0")).cast("double"), 6).as("gini"))
    }),

    // Two-sample Kolmogorov–Smirnov statistic (distribution-drift
    // detection between cohorts — here click vs view values):
    // D = max |F_a(v) − F_b(v)| evaluated on the DISTINCT-VALUE frame:
    // per-value group counts from one hash agg, cumulative counts via
    // the two-pass integer prefix sum over value order (the frame is
    // |distinct values| ≪ |events|), and the max of |ca·nb − cb·na|
    // in EXACT long arithmetic — the one division happens once at the
    // end, so the statistic is deterministic to the last bit before
    // its final rounding. Ties are handled exactly: the CDF is
    // evaluated after each full value group (per-value aggregation
    // guarantees it).
    "q_ks_test" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
        .filter(col("event_type").isin("click", "view"))
        .select(col("event_type"), col("value"))
      val perValue = ev.groupBy(col("value"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("__ca"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("__cb"))
      val cum = GlobalOrder.withRunningSum(
          GlobalOrder.withRunningSum(perValue, Seq(col("value")),
            col("__ca"), "__cca", scale = 0),
          Seq(col("value")), col("__cb"), "__ccb", scale = 0)
        .pinned // feeds the totals AND the max pass
      val totals = cum.agg(sum(col("__ca")).as("n_a"),
        sum(col("__cb")).as("n_b"))
      cum.crossJoin(broadcast(totals))
        .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
          max(abs(col("__cca") * col("n_b") - col("__ccb") * col("n_a")))
            .as("__num"))
        .select(col("n_a"), col("n_b"),
          round(col("__num") / (col("n_a") * col("n_b")).cast("double"), 6)
            .as("d_stat"))
    }),

    // Week-over-week churn: users active in week W but absent in W+1,
    // as a per-week rate. The (user, week) frame is deduplicated once
    // (|users|·|weeks| rows max), the absence test is a left join onto
    // the same frame shifted one week — no per-week rescan of events.
    // The final week has no W+1 and is excluded (churn undefined).
    // Weeks are epoch-day integer division (day div 7) — pure long
    // arithmetic, no ISO-week edge cases.
    "q_churn" -> ((s, dir) => {
      val uw = Tables(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000 div 7").as("week"))
        .distinct()
        .pinned // feeds both join sides + the max-week agg
      val nxt = uw.select(col("user_id"), (col("week") - 1).as("week"),
        lit(1).as("__next"))
      val maxW = uw.agg(max(col("week")).as("__maxw"))
      uw.join(nxt, Seq("user_id", "week"), "left")
        .crossJoin(broadcast(maxW))
        .filter(col("week") < col("__maxw"))
        .groupBy(col("week"))
        .agg(count(lit(1)).as("active"),
          sum(when(col("__next").isNull, 1L).otherwise(0L)).as("churned"))
        .withColumn("churn_rate",
          round(col("churned").cast("double") / col("active").cast("double"), 6))
        .orderBy(col("week"))
    }),

    // Market-basket co-occurrence (the frequent-itemset first pass):
    // per-user DISTINCT event types, then type pairs within each user
    // and their support counts. The per-user set is bounded by the
    // type universe (5 here; catalogs in the thousands at most), so
    // the within-user self-join is linear in users times a small
    // constant — never |events|². Support = distinct users, exact.
    "q_basket_pairs" -> ((s, dir) => {
      val ut = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type")).distinct()
        .pinned // both sides of the pair join
      ut.select(col("user_id"), col("event_type").as("type_a"))
        .join(ut.select(col("user_id"), col("event_type").as("type_b")),
          Seq("user_id"))
        .filter(col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("support"))
        .orderBy(col("type_a"), col("type_b"))
    }),

    // Activity heatmap feed: events by (ISO weekday, hour) — two
    // integer field extracts, one hash agg. dayofweek spelling: both
    // engines emit ISO Monday=1 via the explicit formula on epoch days
    // (Thursday rule anchor: 1970-01-01 was a Thursday = ISO 4).
    "q_weekday_hour_heatmap" -> ((s, dir) => {
      val epochDay = expr("unix_micros(ts) div 86400000000")
      Tables(s, dir, "events")
        .select(((epochDay + 3) % 7 + 1).as("dow"), hour(col("ts")).as("hr"),
          col("value"))
        .groupBy(col("dow"), col("hr"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value"), 3).cast(DecimalType(30, 3))).cast("double")
            .as("sum_value"))
        .orderBy(col("dow"), col("hr"))
    }),

    // Session-duration distribution: sessions re-derived by the same
    // 30-minute gap/cumsum rule the sessionize family pins, then
    // count / mean / p50 / p90 of duration-in-seconds. Durations are
    // exact longs (epoch-microsecond diffs), the mean is an exact
    // long-sum division, and the percentiles are NEAREST-RANK picks
    // (data values — bit-exact at any n, the q_winsorize argument), so
    // every output survives the cross-engine hash. Only (user, ts,
    // event_id) enters the session shuffle; the percentile pass runs
    // over |sessions| rows.
    "q_session_stats" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val sessions = Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("__prev", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("__new",
          when(col("__prev").isNull ||
            unix_micros(col("ts")) - col("__prev") > 1800000000L, 1)
            .otherwise(0))
        .withColumn("__sid", sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("__sid"))
        .agg((max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
          .as("__us"))
        // integer seconds (`div`, not `/` — Column./ is double division)
        .select(col("user_id"), col("__sid"),
          expr("__us div 1000000").as("dur_s"))
        .pinned // feeds the scalar agg AND the rank picks
      val stats = sessions.agg(count(lit(1)).as("n_sessions"),
        round(sum(col("dur_s")).cast("double") / count(lit(1)), 6)
          .as("mean_dur_s"))
      val picks = GlobalOrder.nearestRankPicks(sessions,
        col("dur_s").cast("double"), Seq(("p50_dur_s", 0.5), ("p90_dur_s", 0.9)))
      stats.crossJoin(broadcast(picks))
    }),

    // Active-user curve: daily actives AND trailing-7-day actives per
    // day, via the scale rewrite for windowed COUNT DISTINCT — each
    // distinct (user, day) contributes itself to the 7 daily windows it
    // falls in (a ×7 explode of the DEDUPLICATED user-day frame, not of
    // events), then one hash agg per target day counts distinct users.
    // No per-day rescan, no distinct-over-window operator, exact.
    "q_active_users" -> ((s, dir) => {
      val userDays = Tables(s, dir, "events")
        .select(col("user_id"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .distinct()
        .pinned // feeds the DAU agg AND the window explode
      val dau = userDays.groupBy(col("day"))
        .agg(count(lit(1)).as("dau"))
      val w7 = userDays
        .select(col("user_id"),
          explode(sequence(lit(0), lit(6))).as("__o"), col("day"))
        .select(col("user_id"), date_add(col("day"), col("__o")).as("day"))
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("wau7"))
      // trailing windows extend past the last observed day — keep only
      // days that actually occur (pandas .rolling on the day index)
      dau.join(w7, Seq("day")).orderBy(col("day"))
    }),

    // Pareto / ABC contribution analysis: revenue by brand, ranked
    // descending, cumulative share, class A (top brands to 70% of
    // revenue), B (to 90%), C (tail) — the inventory-policy query
    // every BI layer ships. The expensive part (the lineitem×part
    // join + brand agg) is one broadcast-joined hash aggregate; the
    // cumulative share then runs over the AGGREGATED frame (|brands| ≪
    // |lineitem|) via the two-pass exact-decimal prefix sum — no
    // single-partition window even for a million-key dimension. Shares
    // are rounded ratios of exact decimal sums, so the A/B/C cut
    // compares identical doubles on both engines.
    "q_pareto_abc" -> ((s, dir) => {
      val rev = Tables(s, dir, "lineitem")
        .join(Tables.dimHint("part", Tables(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(graft.functions.dsum(col("l_extendedprice")).as("revenue"))
        .pinned // feeds the prefix pass AND the total
      val tot = rev.agg(
        sum(col("revenue").cast(DecimalType(30, 2))).cast("double")
          .as("__tot"))
      GlobalOrder.withRunningSum(rev,
          Seq(col("revenue").desc, col("p_brand")), col("revenue"), "__cum")
        .crossJoin(broadcast(tot))
        .withColumn("cum_share", round(col("__cum") / col("__tot"), 6))
        .select(col("p_brand"), col("revenue"), col("cum_share"),
          when(col("cum_share") <= 0.70, "A")
            .when(col("cum_share") <= 0.90, "B").otherwise("C").as("abc"))
        .orderBy(col("revenue").desc, col("p_brand"))
    }),

    // Robust anomaly detection by MAD (median absolute deviation):
    // med = exact median of value, MAD = exact median of |value − med|,
    // anomaly ⟺ |value − med| > 3 · 1.4826 · MAD (the normal-consistent
    // robust z-score rule — unlike mean/σ, one corrupt batch cannot
    // drag the fence). Two exact quantile passes over a single double
    // column (the two-pass global-rank machinery — nothing exceeds one
    // partition), fences broadcast back, ONE classify aggregate per
    // event_type. Determinism discipline: the median is rounded to
    // 6 dp BEFORE deviations are formed and the threshold is rounded
    // before comparing — each rounding collapses the quantile lerp's
    // cross-engine last-ulp freedom (measured; see q_winsorize) so the
    // deviation RANKS and the classification see identical doubles.
    // The deviation frame is rebuilt for the classify rather than
    // checkpointed: it is scan + broadcast join, fully pipelined.
    "q_events_anomaly" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("event_type"), col("value"))
      val med = GlobalOrder.exactQuantiles(ev, col("value"),
          Seq(("__m", 0.5)))
        .select(round(col("__m"), 6).as("med"))
      def dev = ev.crossJoin(broadcast(med))
        .withColumn("__ad", abs(col("value") - col("med")))
      val thr = GlobalOrder.exactQuantiles(dev, col("__ad"),
          Seq(("__mad", 0.5)))
        .select(round(lit(3.0) * lit(1.4826) * col("__mad"), 6).as("thr"))
      dev.crossJoin(broadcast(thr))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("__ad") > col("thr"), 1L).otherwise(0L))
            .as("n_anomalies"))
        .orderBy(col("event_type"))
    }),

    // User path mining: each user's FIRST three events (by the
    // (ts, event_id) total order) concatenated into a path, then path
    // frequencies with a bounded top-20 — the onboarding-funnel
    // discovery query (q_funnel checks ONE hypothesized path; this
    // surfaces which paths exist). The per-user head is a rank filter
    // (map-side WindowGroupLimit: ≤3 rows per user cross the shuffle);
    // path assembly is three conditional max aggregates + concat_ws —
    // pure codegen, no collect_list/transform lambda — and the final
    // count is path-keyed with map-side partials. concat_ws skips
    // nulls on both engines, so users with fewer than 3 events yield
    // the naturally shorter path.
    "q_user_paths" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= 3)
        .groupBy(col("user_id"))
        .agg(max(when(col("__rk") === 1, col("event_type"))).as("__e1"),
          max(when(col("__rk") === 2, col("event_type"))).as("__e2"),
          max(when(col("__rk") === 3, col("event_type"))).as("__e3"))
        .select(concat_ws(">", col("__e1"), col("__e2"), col("__e3"))
          .as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path"))
        .limit(20)
    }),

    // CDC latest-wins upsert: the MERGE "take the newest version per
    // key" resolution, as one map-side rank-1 filter (WindowGroupLimit
    // — one survivor per key per mapper crosses the shuffle). The
    // deterministic version order is (ts, event_id): event_id is the
    // unique change sequence, so replays/retries resolve identically.
    "q_upsert_latest" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables(s, dir, "events")
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"),
          round(col("value"), 6).as("value"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // SCD2 history: each change row becomes an effective-dated version
    // [valid_from, valid_to) with valid_to = next change's ts (null =
    // current). One lead() over the per-key change order — the window
    // rides a user_id shuffle; nothing global. This is the batch
    // construction of a slowly-changing dimension from a change log.
    "q_scd2" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts").as("valid_from"),
          round(col("value"), 6).as("value"))
        .withColumn("valid_to",
          lead(col("valid_from"), 1).over(Window.partitionBy(col("user_id"))
            .orderBy(col("valid_from"), col("event_id"))))
        .withColumn("is_current", col("valid_to").isNull)
        .orderBy(col("user_id"), col("valid_from"), col("event_id"))
    }),

    // Funnel conversion view→click→purchase: stage k's entry time is
    // the user's FIRST stage-k event at-or-after their stage-(k−1)
    // entry. Each stage is one filtered agg + one user-keyed join —
    // three key-appropriate shuffles, no window over the raw stream,
    // conditional semantics exact under any partitioning. Output is
    // the 1-row funnel report.
    "q_funnel" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      def stage(etype: String) = ev.filter(col("event_type") === etype)
      val v = stage("view").groupBy(col("user_id"))
        .agg(min(col("ts")).as("t_view"))
      val c = stage("click").join(v, "user_id")
        .filter(col("ts") >= col("t_view"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
      val p = stage("purchase").join(c, "user_id")
        .filter(col("ts") >= col("t_click"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .agg(count(col("t_view")).as("n_view"),
          count(col("t_click")).as("n_click"),
          count(col("t_purchase")).as("n_purchase"))
    }),

    // Cohort retention: cohort = the user's first-activity week,
    // cell (cohort_week, week_offset) = distinct users from that
    // cohort active offset weeks later. Two hash aggs (first-week per
    // user; distinct (user, week)) joined on user — the join key IS
    // the agg key, so one user shuffle serves both sides; the matrix
    // agg is over the tiny (cohort, offset) domain.
    "q_retention" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      val weeks = ev.distinct()
      val cohort = weeks.groupBy(col("user_id"))
        .agg(min(col("wk")).as("cohort_wk"))
      weeks.join(cohort, "user_id")
        .select(col("cohort_wk").cast("date").as("cohort_week"),
          floor(datediff(col("wk"), col("cohort_wk")) / 7).cast("int")
            .as("week_offset"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    // Markov transition counts: (previous event_type → event_type)
    // frequencies over each user's timeline — the session-mining
    // primitive behind next-action models. One lag() riding the
    // user_id shuffle, then a hash agg on the tiny transition domain.
    "q_transition_counts" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("prev_type"), col("event_type"))
    })
  )

  val oracle: Map[String, String] = Map(

    // same gap/cumsum session CTEs; conversion = first purchase after
    // first view inside the session
    "q_session_funnel" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |    CAST(ts AS TIMESTAMP) AS ts FROM events),
        |g AS (SELECT user_id, event_type, event_id, ts,
        |    CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) IS NULL
        |         OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, event_type, ts,
        |    SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g),
        |d AS (SELECT user_id, sid,
        |    MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS tv,
        |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
        |      AS tp
        |  FROM s GROUP BY user_id, sid)
        |SELECT COUNT(*) AS n_sessions,
        |  CAST(SUM(CASE WHEN tv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_with_view,
        |  CAST(SUM(CASE WHEN tv IS NOT NULL AND tp IS NOT NULL AND tp > tv
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
        |  ROUND(CAST(SUM(CASE WHEN tv IS NOT NULL AND tp IS NOT NULL
        |      AND tp > tv THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(CASE WHEN tv IS NOT NULL THEN 1 ELSE 0 END)
        |      AS DOUBLE), 6) AS conversion
        |FROM d""".stripMargin,

    "q_dwell_time" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |g AS (SELECT (epoch_us(ts) - epoch_us(LAG(ts) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id))) // 1000000
        |    AS gap_s
        |  FROM e),
        |d AS (SELECT gap_s FROM g WHERE gap_s IS NOT NULL),
        |r AS (SELECT CAST(gap_s AS DOUBLE) AS v,
        |    ROW_NUMBER() OVER (ORDER BY CAST(gap_s AS DOUBLE)) AS rn FROM d),
        |n AS (SELECT MAX(rn) AS n FROM r),
        |st AS (SELECT COUNT(*) AS n_gaps,
        |    ROUND(CAST(SUM(gap_s) AS DOUBLE) / COUNT(*), 6) AS mean_gap_s
        |  FROM d),
        |p AS (SELECT
        |    SUM(CASE WHEN rn = GREATEST(
        |      CAST(CEIL(CAST(n AS DOUBLE) * 0.5) AS BIGINT), 1) THEN v END)
        |      AS p50_gap_s,
        |    SUM(CASE WHEN rn = GREATEST(
        |      CAST(CEIL(CAST(n AS DOUBLE) * 0.9) AS BIGINT), 1) THEN v END)
        |      AS p90_gap_s
        |  FROM r, n)
        |SELECT n_gaps, mean_gap_s, p50_gap_s, p90_gap_s FROM st, p""".stripMargin,

    "q_value_spikes" ->
      """WITH d AS (SELECT
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
        |    CAST(SUM(CAST(ROUND(value, 3) AS DECIMAL(30,3))) AS DOUBLE)
        |      AS total
        |  FROM events GROUP BY 1),
        |l AS (SELECT day, total,
        |    LAG(total) OVER (ORDER BY day) AS prev FROM d)
        |SELECT day, total, prev, ROUND(total - prev, 6) AS delta
        |FROM l WHERE prev IS NOT NULL
        |ORDER BY ABS(ROUND(total - prev, 6)) DESC, day LIMIT 10""".stripMargin,

    "q_window_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |v AS (SELECT user_id, MIN(us) AS tv FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(us) AS tc FROM e JOIN v USING (user_id)
        |  WHERE event_type = 'click' AND us > tv AND us - tv <= 1800000000
        |  GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(us) AS tp FROM e JOIN c USING (user_id)
        |  WHERE event_type = 'purchase' AND us > tc
        |    AND us - tc <= 3600000000
        |  GROUP BY e.user_id)
        |SELECT (SELECT COUNT(*) FROM v) AS n_view,
        |  (SELECT COUNT(*) FROM c) AS n_click_30m,
        |  (SELECT COUNT(*) FROM p) AS n_purchase_60m""".stripMargin,

    "q_logrank" ->
      s"""WITH sp AS (SELECT user_id,
        |    MIN(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) AS fd,
        |    MAX(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) AS ld
        |  FROM events GROUP BY user_id),
        |st AS (SELECT MAX(ld) AS horizon FROM sp),
        |u AS (SELECT ld - fd AS dur,
        |    CASE WHEN ld < horizon THEN 1 ELSE 0 END AS ch,
        |    CASE WHEN ${Extras.hex8("'lr:' || user_id::VARCHAR")} % 2 = 0
        |      THEN 1 ELSE 0 END AS ga
        |  FROM sp, st),
        |tot AS (SELECT COUNT(*) AS n_tot, SUM(ga) AS n_tot_a FROM u),
        |pd AS (SELECT dur, COUNT(*) AS n_d, SUM(ga) AS n_d_a,
        |    SUM(ch) AS ev, SUM(ch * ga) AS ev_a
        |  FROM u GROUP BY dur),
        |r AS (SELECT ev, ev_a,
        |    (SELECT n_tot FROM tot) - SUM(n_d) OVER w + n_d AS nr,
        |    (SELECT n_tot_a FROM tot) - SUM(n_d_a) OVER w + n_d_a AS nra
        |  FROM pd WINDOW w AS (ORDER BY dur ROWS UNBOUNDED PRECEDING)),
        |t AS (SELECT ev_a,
        |    CAST(FLOOR(CAST(ev AS DOUBLE) * CAST(nra AS DOUBLE)
        |      / CAST(nr AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS eq,
        |    CASE WHEN nr > 1 THEN CAST(FLOOR(CAST(ev AS DOUBLE)
        |      * (CAST(nra AS DOUBLE) / CAST(nr AS DOUBLE))
        |      * (1.0 - CAST(nra AS DOUBLE) / CAST(nr AS DOUBLE))
        |      * (CAST(nr - ev AS DOUBLE) / CAST(nr - 1 AS DOUBLE))
        |      * 1e9 + 0.5) AS BIGINT) ELSE 0 END AS vq
        |  FROM r WHERE ev > 0),
        |ag AS (SELECT CAST(SUM(ev_a) AS BIGINT) AS o_a,
        |    CAST(SUM(eq) AS BIGINT) AS eqs,
        |    CAST(SUM(vq) AS BIGINT) AS vqs FROM t)
        |SELECT (SELECT n_tot FROM tot) AS n_users,
        |  CAST((SELECT n_tot_a FROM tot) AS BIGINT) AS n_a, o_a,
        |  FLOOR(CAST(eqs AS DOUBLE) / 1e9 * 1e6 + 0.5) / 1e6 AS e_a,
        |  FLOOR(CAST(vqs AS DOUBLE) / 1e9 * 1e6 + 0.5) / 1e6 AS var_lr,
        |  CASE WHEN vqs > 0 THEN
        |    FLOOR((CAST(o_a AS DOUBLE) - CAST(eqs AS DOUBLE) / 1e9)
        |      / sqrt(CAST(vqs AS DOUBLE) / 1e9) * 1e6 + 0.5) / 1e6
        |  ELSE 0.0 END AS z_lr
        |FROM ag""".stripMargin,

    "q_survival_km" ->
      """WITH sp AS (SELECT user_id,
        |    MIN(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) AS fd,
        |    MAX(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) AS ld
        |  FROM events GROUP BY user_id),
        |st AS (SELECT COUNT(*) AS n_users, MAX(ld) AS horizon FROM sp),
        |f AS (SELECT ld - fd AS dur_days,
        |    CASE WHEN ld < horizon THEN 1 ELSE 0 END AS ch
        |  FROM sp, st),
        |pd AS (SELECT dur_days, COUNT(*) AS n_d, SUM(ch) AS n_events
        |  FROM f GROUP BY dur_days),
        |r AS (SELECT dur_days, n_events,
        |    (SELECT n_users FROM st) - SUM(n_d) OVER w + n_d AS n_risk
        |  FROM pd
        |  WINDOW w AS (ORDER BY dur_days ROWS UNBOUNDED PRECEDING)),
        |t AS (SELECT dur_days, CAST(n_risk AS BIGINT) AS n_risk,
        |    CAST(n_events AS BIGINT) AS n_events,
        |    CASE WHEN n_events < n_risk THEN
        |      CAST(FLOOR(ln(CAST(n_risk - n_events AS DOUBLE)
        |        / CAST(n_risk AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
        |    ELSE 0 END AS lnq,
        |    CASE WHEN n_events = n_risk THEN 1 ELSE 0 END AS z
        |  FROM r),
        |c AS (SELECT dur_days, n_risk, n_events,
        |    SUM(lnq) OVER w AS cum_ln, SUM(z) OVER w AS cum_z
        |  FROM t WINDOW w AS (ORDER BY dur_days ROWS UNBOUNDED PRECEDING))
        |SELECT dur_days, n_risk, n_events,
        |  CASE WHEN cum_z > 0 THEN 0.0
        |       ELSE FLOOR(exp(CAST(cum_ln AS DOUBLE) / 1e9) * 1e6 + 0.5)
        |         / 1e6 END AS survival
        |FROM c ORDER BY dur_days""".stripMargin,

    "q_retention_curve" ->
      """WITH s AS (SELECT user_id,
        |    MAX(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000)
        |      - MIN(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) AS span
        |  FROM events GROUP BY user_id)
        |SELECT COUNT(*) AS n_users,
        |  ROUND(CAST(SUM(CASE WHEN span >= 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS d1,
        |  ROUND(CAST(SUM(CASE WHEN span >= 7 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS d7,
        |  ROUND(CAST(SUM(CASE WHEN span >= 30 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS d30
        |FROM s""".stripMargin,

    // same milli-long ranking; decile read-off at rank ⌈n·k/10⌉
    "q_lorenz_curve" -> {
      val decile = (1 to 10).map { k =>
        s"""SELECT $k AS decile, ROUND(
           |  (SELECT CAST(cm AS DOUBLE) FROM r, a
           |   WHERE i = CAST(CEIL(CAST(n AS DOUBLE) * ${k / 10.0}) AS BIGINT))
           |  / (SELECT CAST(s AS DOUBLE) FROM a), 6) AS spend_share"""
          .stripMargin
      }.mkString("", "\nUNION ALL\n", "")
      s"""WITH m AS (SELECT user_id,
        |    CAST(SUM(CAST(ROUND(value, 3) AS DECIMAL(30,3))) * 1000
        |      AS BIGINT) AS m
        |  FROM events GROUP BY user_id),
        |r AS (SELECT m, ROW_NUMBER() OVER (ORDER BY m, user_id) AS i,
        |    CAST(SUM(CAST(m AS DECIMAL(30,0))) OVER (ORDER BY m, user_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |      AS cm
        |  FROM m),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(m) AS BIGINT) AS s FROM m)
        |$decile
        |ORDER BY decile""".stripMargin
    },

    // same cohorting, same exact-decimal cumulative revenue
    "q_cohort_ltv" ->
      """WITH ev AS (SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS wk,
        |    CAST(ROUND(value, 3) AS DECIMAL(30,3)) AS v
        |  FROM events),
        |c AS (SELECT user_id, MIN(wk) AS cw FROM ev GROUP BY user_id),
        |sz AS (SELECT cw, COUNT(*) AS n_users FROM c GROUP BY cw),
        |rev AS (SELECT c.cw, ev.wk - c.cw AS week_offset, SUM(ev.v) AS r
        |  FROM ev JOIN c USING (user_id) GROUP BY 1, 2),
        |cum AS (SELECT cw, week_offset,
        |    SUM(r) OVER (PARTITION BY cw ORDER BY week_offset) AS cum
        |  FROM rev)
        |SELECT cum.cw AS cohort_week, week_offset,
        |  CAST(n_users AS BIGINT) AS n_users,
        |  ROUND(CAST(cum AS DOUBLE), 3) AS cum_revenue,
        |  ROUND(CAST(cum AS DOUBLE) / CAST(n_users AS DOUBLE), 6)
        |    AS ltv_per_user
        |FROM cum JOIN sz USING (cw)
        |ORDER BY cohort_week, week_offset""".stripMargin,

    // identical md5-coin v2 construction, one full outer join
    "q_snapshot_diff" ->
      s"""WITH v1 AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
        |mk AS (SELECT MAX(k) AS mk FROM v1),
        |v2 AS (SELECT k,
        |    CASE WHEN ${Extras.hex8("'upd:' || k::VARCHAR")} % 20 = 0
        |      THEN p + 1.0 ELSE p END AS p
        |  FROM v1 WHERE ${Extras.hex8("'del:' || k::VARCHAR")} % 20 <> 0
        |  UNION ALL
        |  SELECT k + mk AS k, p FROM v1, mk
        |  WHERE ${Extras.hex8("'ins:' || k::VARCHAR")} % 25 = 0),
        |j AS (SELECT COALESCE(a.k, b.k) AS k, a.p AS p1, b.p AS p2,
        |    CASE WHEN a.p IS NULL THEN 'inserted'
        |      WHEN b.p IS NULL THEN 'deleted'
        |      WHEN a.p <> b.p THEN 'updated'
        |      ELSE 'unchanged' END AS change
        |  FROM v1 a FULL OUTER JOIN v2 b ON a.k = b.k)
        |SELECT change, COUNT(*) AS n,
        |  CAST(COALESCE(SUM(CAST(p2 - p1 AS DECIMAL(30,2))), 0) AS DOUBLE)
        |    AS net_delta
        |FROM j GROUP BY change ORDER BY change""".stripMargin,

    // same salted split, same pooled-z op sequence on exact integers
    "q_ab_test" ->
      s"""WITH u AS (SELECT user_id,
        |    CASE WHEN SUM(CASE WHEN event_type = 'purchase'
        |      THEN 1 ELSE 0 END) * 5 > COUNT(*) THEN 1 ELSE 0 END
        |      AS converted,
        |    CASE WHEN ${Extras.hex8("'ab:' || user_id::VARCHAR")} % 2 = 0
        |      THEN 'A' ELSE 'B' END AS grp
        |  FROM events GROUP BY user_id),
        |g AS (SELECT
        |    CAST(SUM(CASE WHEN grp = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(SUM(CASE WHEN grp = 'A' THEN converted ELSE 0 END)
        |      AS BIGINT) AS c_a,
        |    CAST(SUM(CASE WHEN grp = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(SUM(CASE WHEN grp = 'B' THEN converted ELSE 0 END)
        |      AS BIGINT) AS c_b
        |  FROM u)
        |SELECT n_a, c_a, n_b, c_b,
        |  ROUND(CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS p_a,
        |  ROUND(CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS p_b,
        |  CASE WHEN c_a + c_b > 0 AND c_a + c_b < n_a + n_b THEN
        |  ROUND((CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |      - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |    / sqrt((CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |      * (1.0 - CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |      * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 6)
        |    END AS z
        |FROM g""".stripMargin,

    "q_funnel_time" ->
      """WITH f AS (SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view'
        |      THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS v,
        |    MIN(CASE WHEN event_type = 'purchase'
        |      THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS p
        |  FROM events GROUP BY user_id),
        |d AS (SELECT (p - v) // 1000000 AS tts FROM f
        |  WHERE v IS NOT NULL AND p IS NOT NULL AND p > v),
        |r AS (SELECT CAST(tts AS DOUBLE) AS w,
        |    ROW_NUMBER() OVER (ORDER BY CAST(tts AS DOUBLE)) AS rn FROM d),
        |n AS (SELECT MAX(rn) AS n FROM r),
        |st AS (SELECT COUNT(*) AS n_converted,
        |    ROUND(CAST(SUM(tts) AS DOUBLE) / COUNT(*), 6) AS mean_tts_s
        |  FROM d),
        |p AS (SELECT
        |    SUM(CASE WHEN rn = GREATEST(
        |      CAST(CEIL(CAST(n AS DOUBLE) * 0.5) AS BIGINT), 1) THEN w END)
        |      AS p50_tts_s,
        |    SUM(CASE WHEN rn = GREATEST(
        |      CAST(CEIL(CAST(n AS DOUBLE) * 0.9) AS BIGINT), 1) THEN w END)
        |      AS p90_tts_s
        |  FROM r, n)
        |SELECT n_converted, mean_tts_s, p50_tts_s, p90_tts_s
        |FROM st, p""".stripMargin,

    "q_gini" ->
      """WITH m AS (SELECT user_id,
        |    CAST(SUM(CAST(ROUND(value, 3) AS DECIMAL(30,3))) * 1000
        |      AS BIGINT) AS m
        |  FROM events GROUP BY user_id),
        |r AS (SELECT m, ROW_NUMBER() OVER (ORDER BY m, user_id) AS i FROM m),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(m) AS BIGINT) AS s0,
        |    CAST(SUM(i * m) AS BIGINT) AS s1 FROM r)
        |SELECT n AS n_users,
        |  ROUND(CAST(2 * s1 - (n + 1) * s0 AS DOUBLE)
        |    / CAST(n * s0 AS DOUBLE), 6) AS gini
        |FROM a""".stripMargin,

    // same exact-integer cumulative construction on the distinct-value
    // frame; the |ca·nb − cb·na| numerator stays exact until one
    // rounded division
    "q_ks_test" ->
      """WITH ev AS (SELECT event_type, value FROM events
        |  WHERE event_type IN ('click', 'view')),
        |pv AS (SELECT value,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
        |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS cb
        |  FROM ev GROUP BY value),
        |c AS (SELECT value, ca, cb,
        |    CAST(SUM(CAST(ca AS DECIMAL(30,0))) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |      AS cca,
        |    CAST(SUM(CAST(cb AS DECIMAL(30,0))) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |      AS ccb
        |  FROM pv),
        |t AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
        |    CAST(SUM(cb) AS BIGINT) AS n_b FROM pv)
        |SELECT n_a, n_b,
        |  ROUND(MAX(ABS(cca * n_b - ccb * n_a))
        |    / CAST(n_a * n_b AS DOUBLE), 6) AS d_stat
        |FROM c, t GROUP BY n_a, n_b""".stripMargin,

    "q_churn" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |    (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) // 7 AS week
        |  FROM events),
        |mw AS (SELECT MAX(week) AS maxw FROM uw),
        |j AS (SELECT a.week,
        |    CASE WHEN b.user_id IS NULL THEN 1 ELSE 0 END AS churned
        |  FROM uw a LEFT JOIN uw b
        |    ON a.user_id = b.user_id AND b.week = a.week + 1)
        |SELECT week, COUNT(*) AS active,
        |  CAST(SUM(churned) AS BIGINT) AS churned,
        |  ROUND(CAST(SUM(churned) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
        |    AS churn_rate
        |FROM j, mw WHERE week < maxw GROUP BY week ORDER BY week""".stripMargin,

    "q_basket_pairs" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  COUNT(*) AS support
        |FROM ut a JOIN ut b
        |  ON a.user_id = b.user_id AND a.event_type < b.event_type
        |GROUP BY type_a, type_b ORDER BY type_a, type_b""".stripMargin,

    "q_weekday_hour_heatmap" ->
      """SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 + 3) % 7 + 1
        |    AS dow,
        |  CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hr,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(value, 3) AS DECIMAL(30,3))) AS DOUBLE)
        |    AS sum_value
        |FROM events GROUP BY dow, hr ORDER BY dow, hr""".stripMargin,

    // same 30-min gap/cumsum session rule as the sessionize oracles,
    // nearest-rank percentile picks on the duration longs
    "q_session_stats" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |g AS (SELECT user_id, event_id, ts,
        |  CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) IS NULL
        |       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
        |       THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts,
        |  SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g),
        |d AS (SELECT user_id, sid,
        |  (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 1000000 AS dur_s
        |  FROM s GROUP BY user_id, sid),
        |r AS (SELECT CAST(dur_s AS DOUBLE) AS v,
        |  ROW_NUMBER() OVER (ORDER BY CAST(dur_s AS DOUBLE)) AS rn FROM d),
        |n AS (SELECT MAX(rn) AS n FROM r),
        |st AS (SELECT COUNT(*) AS n_sessions,
        |  ROUND(CAST(SUM(dur_s) AS DOUBLE) / COUNT(*), 6) AS mean_dur_s
        |  FROM d),
        |p AS (SELECT
        |  SUM(CASE WHEN rn = GREATEST(
        |    CAST(CEIL(CAST(n AS DOUBLE) * 0.5) AS BIGINT), 1) THEN v END)
        |    AS p50_dur_s,
        |  SUM(CASE WHEN rn = GREATEST(
        |    CAST(CEIL(CAST(n AS DOUBLE) * 0.9) AS BIGINT), 1) THEN v END)
        |    AS p90_dur_s
        |  FROM r, n)
        |SELECT n_sessions, mean_dur_s, p50_dur_s, p90_dur_s
        |FROM st, p""".stripMargin,

    // each distinct user-day feeds the 7 daily windows it falls in —
    // the windowed COUNT DISTINCT scale rewrite, replayed verbatim
    "q_active_users" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
        |  FROM events),
        |dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day),
        |w7 AS (SELECT day + CAST(o AS INTEGER) AS day, user_id
        |  FROM ud, (SELECT unnest(generate_series(0, 6)) AS o) t),
        |wau AS (SELECT day, COUNT(DISTINCT user_id) AS wau7
        |  FROM w7 GROUP BY day)
        |SELECT day, dau, wau7 FROM dau JOIN wau USING (day)
        |ORDER BY day""".stripMargin,

    // same exact-decimal cumulative sum in revenue-desc order, same
    // rounded share before the A/B/C cut
    "q_pareto_abc" ->
      """WITH b AS (SELECT p_brand,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE)
        |      AS revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand),
        |c AS (SELECT p_brand, revenue,
        |    CAST(SUM(CAST(revenue AS DECIMAL(30,2)))
        |      OVER (ORDER BY revenue DESC, p_brand
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS DOUBLE) AS cum,
        |    CAST(SUM(CAST(revenue AS DECIMAL(30,2))) OVER () AS DOUBLE)
        |      AS tot
        |  FROM b)
        |SELECT p_brand, revenue, ROUND(cum / tot, 6) AS cum_share,
        |  CASE WHEN ROUND(cum / tot, 6) <= 0.70 THEN 'A'
        |       WHEN ROUND(cum / tot, 6) <= 0.90 THEN 'B'
        |       ELSE 'C' END AS abc
        |FROM c ORDER BY revenue DESC, p_brand""".stripMargin,

    // same rounding points: med to 6 dp before deviations, threshold
    // to 6 dp before the compare — identical doubles on both engines
    "q_events_anomaly" ->
      """WITH m AS (SELECT ROUND(quantile_cont(value, 0.5), 6) AS med
        |  FROM events),
        |d AS (SELECT event_type, ABS(value - med) AS ad FROM events, m),
        |t AS (SELECT ROUND(3.0 * 1.4826 * quantile_cont(ad, 0.5), 6) AS thr
        |  FROM d)
        |SELECT event_type, COUNT(*) AS n,
        |  CAST(COUNT(*) FILTER (WHERE ad > thr) AS BIGINT) AS n_anomalies
        |FROM d, t GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_user_paths" ->
      """WITH r AS (SELECT user_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rk
        |  FROM events),
        |p AS (SELECT user_id,
        |    concat_ws('>', MAX(CASE WHEN rk = 1 THEN event_type END),
        |                   MAX(CASE WHEN rk = 2 THEN event_type END),
        |                   MAX(CASE WHEN rk = 3 THEN event_type END)) AS path
        |  FROM r WHERE rk <= 3 GROUP BY user_id)
        |SELECT path, COUNT(*) AS n_users FROM p GROUP BY path
        |ORDER BY n_users DESC, path LIMIT 20""".stripMargin,

    // same qcut bucket formula ⌈5r/n⌉ as integer division, same
    // (metric, user_id) tie-break
    "q_rfm" ->
      """WITH base AS (
        |  SELECT user_id,
        |    MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS last_us,
        |    COUNT(*) AS frequency,
        |    CAST(SUM(CAST(ROUND(value, 3) AS DECIMAL(30,3))) AS DOUBLE)
        |      AS monetary
        |  FROM events GROUP BY user_id),
        |b AS (SELECT user_id,
        |    ((SELECT MAX(last_us) FROM base) - last_us) // 86400000000
        |      AS recency_days,
        |    frequency, monetary
        |  FROM base),
        |r AS (SELECT user_id, recency_days, frequency, monetary,
        |    ROW_NUMBER() OVER (ORDER BY recency_days, user_id) AS rr,
        |    ROW_NUMBER() OVER (ORDER BY frequency, user_id) AS rf,
        |    ROW_NUMBER() OVER (ORDER BY monetary, user_id) AS rm,
        |    COUNT(*) OVER () AS n
        |  FROM b)
        |SELECT user_id, recency_days, frequency, monetary,
        |  6 - ((5 * rr - 1) // n + 1) AS r_score,
        |  (5 * rf - 1) // n + 1 AS f_score,
        |  (5 * rm - 1) // n + 1 AS m_score,
        |  (6 - ((5 * rr - 1) // n + 1)) * 100
        |    + ((5 * rf - 1) // n + 1) * 10
        |    + ((5 * rm - 1) // n + 1) AS rfm
        |FROM r ORDER BY user_id""".stripMargin,

    "q_upsert_latest" ->
      """SELECT user_id, event_type, event_id, ROUND(value, 6) AS value
        |FROM events
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |  ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id, event_type""".stripMargin,

    "q_scd2" ->
      """SELECT user_id, event_id,
        |  CAST(ts AS TIMESTAMP) AS valid_from,
        |  ROUND(value, 6) AS value,
        |  LEAD(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS valid_to,
        |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    IS NULL AS is_current
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id, valid_from, event_id""".stripMargin,

    "q_funnel" ->
      """WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts) AS t_click
        |  FROM events e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= v.t_view
        |  GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
        |  FROM events e JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
        |  GROUP BY e.user_id)
        |SELECT COUNT(v.t_view) AS n_view, COUNT(c.t_click) AS n_click,
        |  COUNT(p.t_purchase) AS n_purchase
        |FROM v LEFT JOIN c ON c.user_id = v.user_id
        |       LEFT JOIN p ON p.user_id = v.user_id""".stripMargin,

    "q_retention" ->
      """WITH weeks AS (SELECT DISTINCT user_id,
        |    date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk FROM events),
        |cohort AS (SELECT user_id, MIN(wk) AS cohort_wk
        |  FROM weeks GROUP BY user_id)
        |SELECT CAST(c.cohort_wk AS DATE) AS cohort_week,
        |  CAST(FLOOR(datediff('day', CAST(c.cohort_wk AS DATE),
        |    CAST(w.wk AS DATE)) / 7.0) AS INT) AS week_offset,
        |  COUNT(*) AS n_users
        |FROM weeks w JOIN cohort c ON c.user_id = w.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_transition_counts" ->
      """WITH lagged AS (SELECT event_type,
        |  LAG(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |SELECT prev_type, event_type, COUNT(*) AS n
        |FROM lagged WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, event_type
        |ORDER BY prev_type, event_type""".stripMargin
  )
}
