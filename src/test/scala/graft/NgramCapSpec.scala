package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** ngramJaccardPairs block-cap semantics: the (lang, length-bucket)
  * gate — the same guard minhashPairs applies per LSH bucket — must
  * drop oversized blocks before anything quadratic runs, and must not
  * disturb blocks under the cap. */
class NgramCapSpec extends SparkSpecBase {

  // Five near-identical docs in one (lang, len/100) block, plus a
  // two-doc near-dup block in another language.
  private lazy val docs = spark.createDataFrame(Seq(
    (1L, "en", "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "en", "the quick brown fox jumps over the lazy dog near the river bend"),
    (3L, "en", "the quick brown fox jumps over the lazy dog near the river side"),
    (4L, "en", "the quick brown fox jumps over the lazy dog near the river edge"),
    (5L, "en", "the quick brown fox jumps over the lazy dog near the river road"),
    (6L, "de", "der schnelle braune fuchs springt ueber den faulen hund am ufer"),
    (7L, "de", "der schnelle braune fuchs springt ueber den faulen hund am wege")
  )).toDF("doc_id", "lang", "text")

  test("blocks over maxBlock are dropped; blocks under it still pair") {
    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "lang",
        w = 3, threshold = 0.2, maxBlock = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 5-doc en block exceeds maxBlock=3 and must yield nothing;
    // the 2-doc de block survives
    assert(capped == Set((6L, 7L)), capped.toString)
  }

  test("a cap above every block size changes nothing") {
    def pairs(maxBlock: Int) =
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", "lang",
          w = 3, threshold = 0.2, maxBlock = maxBlock)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs(1000) == pairs(5))
    assert(pairs(1000).size >= 1 + 4 * 5 / 2) // de pair + all en pairs
  }

  test("raising the threshold only removes pairs (monotonicity)") {
    def ids(threshold: Double) =
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", "lang",
          w = 3, threshold = threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val loose = ids(0.1)
    val tight = ids(0.6)
    assert(tight.subsetOf(loose), s"tight=$tight loose=$loose")
  }
}
