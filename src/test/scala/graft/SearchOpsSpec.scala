package graft

import org.apache.spark.sql.functions._

/** Semantic contracts of the retrieval/layout tier and the new pandas
  * fills (the oracle gate checks exact values; these pin the invariants
  * that must survive refactors). */
class SearchOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("bm25 scores are positive and capped at the query-term count") {
    val got = SparkEntry.queries("q_bm25")(spark, sf)
      .select("bm25", "n_terms_hit").as[(Double, Int)].collect()
    assert(got.nonEmpty && got.length <= 20)
    assert(got.forall { case (s, h) =>
      s > 0.0 && h >= 1 && h <= queries.SearchOps.bm25Terms.size })
    // descending by score (the top-k contract)
    assert(got.map(_._1).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("inverted-index postings are sorted, distinct, capped, df consistent") {
    val rows = SparkEntry.queries("q_inverted_index")(spark, sf)
      .select("term", "df", "cf", "postings_head")
      .as[(String, Long, Long, String)].collect()
    assert(rows.map(_._1).toSet.subsetOf(queries.SearchOps.indexTerms.toSet))
    rows.foreach { case (_, df, cf, heads) =>
      val ids = heads.split(",").map(_.toLong).toSeq
      assert(ids == ids.sorted && ids.distinct == ids)
      assert(ids.length == math.min(df, queries.SearchOps.postingCap))
      assert(cf >= df) // every posting has tf ≥ 1
    }
  }

  test("z-order key interleaves: low bits of either dimension move zval less than high bits") {
    // bit i of x lands at position 2i, bit i of y at 2i+1 — verify the
    // interleave on a few closed-form points by recomputing in Scala
    val got = SparkEntry.queries("q_zorder_layout")(spark, sf)
      .select(col("o_custkey").cast("long"), col("o_orderdate").cast("date"),
        col("zval").cast("long"))
      .as[(Long, java.sql.Date, Long)].collect()
    val epoch = java.time.LocalDate.parse("1990-01-01")
    got.foreach { case (ck, od, z) =>
      val y = java.time.temporal.ChronoUnit.DAYS.between(epoch, od.toLocalDate)
      val expect = (0 until 16).map { i =>
        (((ck >> i) & 1L) << (2 * i)) + (((y >> i) & 1L) << (2 * i + 1))
      }.sum
      assert(z == expect, s"zval mismatch for ($ck, $od)")
    }
  }

  test("factorize assigns dense first-appearance codes") {
    val rows = SparkEntry.queries("q_factorize")(spark, sf)
      .select("event_type", "code").as[(String, Int)].collect().toSeq
    assert(rows.map(_._2).sorted == rows.indices.toSeq) // dense 0..n-1
    // code order == order of min(event_id)
    val firsts = Tables(spark, sf, "events")
      .groupBy("event_type").agg(min("event_id").as("f"))
      .as[(String, Long)].collect().sortBy(_._2).map(_._1).toSeq
    assert(rows.sortBy(_._2).map(_._1) == firsts)
  }

  test("searchsorted: pos_left <= pos_right, monotone in the probe") {
    val rows = SparkEntry.queries("q_searchsorted")(spark, sf)
      .select("p", "pos_left", "pos_right")
      .as[(Double, Long, Long)].collect().sortBy(_._1)
    rows.foreach { case (_, l, r) => assert(l <= r) }
    assert(rows.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    val n = Tables(spark, sf, "events").count()
    rows.foreach { case (_, l, r) => assert(l >= 0 && r <= n) }
  }

  test("groupby idxmax rows carry the true per-group extremes") {
    val got = SparkEntry.queries("q_groupby_idxmax")(spark, sf)
      .select("l_returnflag", "which", "l_quantity")
      .as[(String, String, Double)].collect()
    val ext = Tables(spark, sf, "lineitem").groupBy("l_returnflag")
      .agg(max("l_quantity").as("mx"), min("l_quantity").as("mn"))
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    got.foreach { case (flag, which, q) =>
      val (mx, mn) = ext(flag)
      assert(if (which == "idxmax") q == mx else q == mn)
    }
    assert(got.length == ext.size * 2)
  }
}
