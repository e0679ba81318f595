package graft

import graft.operators.Dedup

/** Dedup.incremental status semantics on a fixture that exercises all
  * three outcomes (the parquet fixtures have no in-batch dups at
  * sf0.001, so they are injected here). */
class IncrementalDedupSpec extends SparkSpecBase {

  private lazy val base = spark.createDataFrame(Seq(
    (1L, "seen before"), (2L, "also seen"), (3L, "seen before")
  )).toDF("doc_id", "text")

  private lazy val incoming = spark.createDataFrame(Seq(
    (10L, "seen before"),   // digest in base -> dup_base
    (11L, "fresh text a"),  // first of an in-batch pair -> keep
    (12L, "fresh text a"),  // second -> dup_batch
    (13L, "fresh text b")   // unique -> keep
  )).toDF("doc_id", "text")

  test("dup_base / dup_batch / keep classification") {
    val got = Dedup.incremental(incoming, base, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(10L -> "dup_base", 11L -> "keep",
      12L -> "dup_batch", 13L -> "keep"), got.toString)
  }

  test("dup_base wins over dup_batch when both apply") {
    // two incoming copies of a base digest: BOTH are dup_base (the
    // batch-first rule only ranks digests absent from base)
    val inc2 = spark.createDataFrame(Seq(
      (20L, "seen before"), (21L, "seen before")
    )).toDF("doc_id", "text")
    val got = Dedup.incremental(inc2, base, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(20L -> "dup_base", 21L -> "dup_base"), got.toString)
  }

  test("an empty base keeps exactly one row per digest") {
    val got = Dedup.incremental(incoming, base.limit(0), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(10L -> "keep", 11L -> "keep",
      12L -> "dup_batch", 13L -> "keep"), got.toString)
  }
}
