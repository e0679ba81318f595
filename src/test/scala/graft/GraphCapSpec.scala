package graft

import org.apache.spark.sql.functions._

import graft.operators.Graphs

/** The co-occurrence per-key fan-out cap (Graphs.coOccurrencePairs
  * maxBasket): binding and no-op behavior, and determinism when the
  * cap boundary falls inside a run of duplicate items. The last
  * quadratic-risk family to get the cap treatment — minhash buckets,
  * RangeJoin matches, and fuzzy/ngram blocks already have theirs. */
class GraphCapSpec extends SparkSpecBase {
  import spark.implicits._

  test("cap is a no-op when every basket fits") {
    val df = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (3L, 30L)).toDF("k", "i")
    val capped = Graphs.coOccurrencePairs(df, "k", "i", minCount = 2L,
      maxBasket = 64).orderBy("a", "b").as[(Long, Long)].collect().toSeq
    val wide = Graphs.coOccurrencePairs(df, "k", "i", minCount = 2L,
      maxBasket = 1000000).orderBy("a", "b").as[(Long, Long)].collect().toSeq
    assert(capped == wide && capped == Seq((10L, 20L)))
  }

  test("binding cap keeps the item-ordered head of the hot basket only") {
    // hot key 1 holds items 1..10; cap 4 keeps {1,2,3,4} — pairs among
    // them only. Key 2 repeats {1,2} so those pairs reach minCount 2.
    val hot = (1L to 10L).map(i => (1L, i))
    val df = (hot ++ Seq((2L, 1L), (2L, 2L), (2L, 3L), (2L, 4L)))
      .toDF("k", "i")
    val got = Graphs.coOccurrencePairs(df, "k", "i", minCount = 2L,
      maxBasket = 4).orderBy("a", "b").as[(Long, Long)].collect().toSeq
    // co-occurrence >= 2 needs a pair in BOTH baskets' kept heads:
    // key 1 keeps 1..4, key 2 keeps all of 1..4
    assert(got == Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)))
    // without the cap, items 5..10 would pair inside key 1 but never
    // reach minCount — same answer here, so ALSO assert the cap cut the
    // quadratic term: pair weights from key 1 alone must be gone when
    // minCount = 1
    val uncapped1 = Graphs.coOccurrencePairs(df, "k", "i", minCount = 1L,
      maxBasket = 1000000).count()
    val capped1 = Graphs.coOccurrencePairs(df, "k", "i", minCount = 1L,
      maxBasket = 4).count()
    assert(uncapped1 == 45L && capped1 == 6L,
      s"cap must bound the basket-squared term ($uncapped1 vs $capped1)")
  }

  test("cap boundary inside duplicate items is partition-invariant") {
    // key 1: items (5, 5, 5, 9) — cap 2 keeps two of the three 5s,
    // indistinguishable rows, so the kept multiset is {5, 5} under any
    // partitioning; pairs need minCount 1 to show up
    val df = Seq((1L, 5L), (1L, 5L), (1L, 5L), (1L, 9L), (2L, 5L),
      (2L, 9L)).toDF("k", "i")
    for (n <- Seq(1, 3, 7)) {
      val got = Graphs.coOccurrencePairs(df.repartition(n), "k", "i",
          minCount = 1L, maxBasket = 2)
        .orderBy("a", "b").as[(Long, Long)].collect().toSeq
      // key 1 keeps {5, 5} → no a<b pair; key 2 keeps {5, 9} → (5, 9)
      assert(got == Seq((5L, 9L)), s"partitions=$n got $got")
    }
  }
}
