package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The bloom-prefiltered contamination scan claims ANSWER INVARIANCE:
  * identical output to the plain scan for every sketch size, because
  * bloom misses are definitive and bloom hits are exactly confirmed.
  * Pinned here under adversarial sketch sizing — a 16-item sketch over
  * thousands of distinct shingles is saturated (≈ every probe is a
  * false positive), the opposite extreme of a right-sized sketch; both
  * must match the plain scan row for row. */
class BloomParitySpec extends SparkSpecBase {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("bloom contamination equals the plain scan at any sketch size") {
    val b = graft.functions.md5Bucket(col("doc_id"), 100L)
    val test = docs.filter(b >= 85)
    val train = docs.filter(b < 70)
    val want = Dedup.contaminationScan(test, train, "doc_id", "text")
      .collect().map(_.toString).sorted
    assert(want.nonEmpty, "fixture split is vacuous")
    for (items <- Seq(16L, 1000000L)) {
      val got = Dedup.contaminationScanBloom(test, train, "doc_id", "text",
          expectedItems = items)
        .collect().map(_.toString).sorted
      assert(got.sameElements(want), s"bloom(expectedItems=$items) diverged")
    }
  }

  test("empty train side reports zero hits, not zero rows") {
    val test = docs.limit(5)
    val train = docs.filter(lit(false))
    val got = Dedup.contaminationScanBloom(test, train, "doc_id", "text")
      .collect()
    assert(got.length == 5, s"expected 5 rows, got ${got.length}")
    assert(got.forall(_.getAs[Long]("n_hit") == 0L))
  }
}
