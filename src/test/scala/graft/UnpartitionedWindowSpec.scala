package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.window.WindowExec

/** README's scale claim "no single-partition windows anywhere; the only
  * `Window.orderBy` without partitioning runs over one row per
  * partition (the offsets frame)" — as a GATE, not a comment (r12
  * advice item 6). The ten heaviest bench queries are EXECUTED, their
  * final adaptive plans walked, and every WindowExec with an empty
  * partition spec must have consumed a metadata-sized input (the
  * numPartitions-row GlobalOrder summary, never a data-sized frame).
  * The expected WindowExec console warning for those summary frames is
  * exactly what this spec proves harmless. */
class UnpartitionedWindowSpec extends SparkSpecBase {

  /** Whole executed tree, descending through AQE stages, exchange
    * reuse, and physical subqueries. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
    case q: QueryStageExec => p +: flatten(q.plan)
    case r: ReusedExchangeExec => p +: flatten(r.child)
    case _ => p +: (p.children ++ p.subqueries).flatMap(flatten)
  }

  /** Rows produced by `p` after execution: WindowExec publishes no row
    * metric, so read the nearest descendant that does. Every node this
    * skips past (Sort, Project, Exchange, codegen glue) preserves
    * cardinality; multi-child metric-less nodes (Union) sum. */
  private def outputRows(p: SparkPlan): Long =
    p.metrics.get("numOutputRows").map(_.value).getOrElse(p match {
      case a: AdaptiveSparkPlanExec => outputRows(a.executedPlan)
      case q: QueryStageExec => outputRows(q.plan)
      case r: ReusedExchangeExec => outputRows(r.child)
      case _ if p.children.nonEmpty => p.children.map(outputRows).sum
      case _ => fail(s"no row metric at or below ${p.nodeName}")
    })

  // The ten heaviest bench queries by BENCH_r12.json wall time — the
  // plans where a data-sized single-partition window would hurt most.
  private val heaviest = Seq(
    "q_chain_recall", "q_dedup_keep_best", "q_dedup_union",
    "q_dedup_minhash_sorted", "q_union_recall", "q_minhash_recall",
    "q_pagerank_converged", "q_naive_bayes", "q_kmeans_converged",
    "q_pagerank",
    // not heavy, but its pct window is deliberately unpartitioned —
    // gate that it only ever sees the stage-count agg (≤ |stages| rows)
    "q_filter_funnel")

  for (q <- heaviest)
    test(s"$q: every unpartitioned WindowExec input is metadata-sized") {
      val df = SparkEntry.queries(q)(spark, sf)
      // Execute the exact plan instance so its metrics populate (an
      // action like count() would re-plan and leave these at zero).
      df.queryExecution.executedPlan.execute().count()
      val unpartitioned = flatten(df.queryExecution.executedPlan)
        .collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
      for (w <- unpartitioned) {
        val n = outputRows(w.child)
        // The offsets frame is one row per range partition; 128 is
        // generous for any parts setting a spec-session query uses
        // while still 40× under the smallest sf0.001 data frame.
        assert(n <= 128,
          s"$q has an unpartitioned WindowExec over $n rows — a " +
            s"data-sized single-partition window:\n" + w.toString.take(800))
      }
    }
}
