package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** simhashPairs banded-Hamming semantics: the band split must be
  * COMPLETE for the budget (pigeonhole: Hamming <= maxHamming implies
  * one of the maxHamming+1 bands agrees exactly), so against a
  * brute-force bit_count cross-join the banded result can only differ
  * where the bucket cap dropped a degenerate bucket. */
class SimhashPairsSpec extends SparkSpecBase {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  private def brute(maxHamming: Int) = {
    val sig = Dedup.simhashDF(docs, "doc_id", "text")
    sig.select(col("doc_id").as("id_a"), col("simhash").as("sa"))
      .crossJoin(sig.select(col("doc_id").as("id_b"), col("simhash").as("sb")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("h", bit_count(col("sa").bitwiseXOR(col("sb"))).cast("int"))
      .filter(col("h") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("banded pairs equal brute force when no bucket hits the cap") {
    val banded = Dedup.simhashPairs(docs, "doc_id", "text",
        maxHamming = 3, maxBucket = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = brute(3)
    assert(banded == want, s"banded=$banded brute=$want")
    assert(banded.nonEmpty, "fixture must exercise the pairing")
  }

  test("maxHamming = 0 (single 64-bit band) pairs exact-signature duplicates") {
    val dup = spark.createDataFrame(Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "something else entirely")
    )).toDF("doc_id", "text")
    val got = Dedup.simhashPairs(dup, "doc_id", "text", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 0)), got.toString)
  }

  test("every reported pair respects the Hamming budget") {
    val bad = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .filter(col("hamming") > 3).count()
    assert(bad == 0)
  }

  test("a wider budget only adds pairs (monotonicity, 8x8-bit bands)") {
    def ids(mh: Int, cap: Int = 1000000) =
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = mh,
          maxBucket = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tight = ids(3)
    val wide = ids(7)
    assert(tight.subsetOf(wide), s"tight=$tight wide=$wide")
    assert(wide == brute(7).map(t => (t._1, t._2)))
  }

  test("the bucket cap drops degenerate buckets before pairing") {
    // Identical texts share every band: with maxBucket = 1 every bucket
    // they occupy exceeds the cap, so no pairs survive.
    val dup = spark.createDataFrame(Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "alpha beta gamma delta")
    )).toDF("doc_id", "text")
    assert(Dedup.simhashPairs(dup, "doc_id", "text", maxBucket = 1).count() == 0)
    assert(Dedup.simhashPairs(dup, "doc_id", "text", maxBucket = 3).count() == 3)
  }

  test("bands must divide 64") {
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 4)
    }
  }
}
