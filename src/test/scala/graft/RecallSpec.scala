package graft

import graft.operators.Similarity

/** ANN recall measurement (the LSH path trades recall for pruning; this
  * pins the tradeoff so a regression in the signature math shows up).
  *
  * The synthetic embeddings are near-isotropic, the hardest case for
  * hyperplane LSH (query dot products sit near zero, so sign bits are
  * noisy): recall@20 must still clear the floor at the query's Hamming
  * radius and grow monotonically as the ball widens. Production recall
  * tuning is OR-amplification (multiple tables), not a wider ball —
  * a radius-6 ball over 12 planes already admits ~61% of buckets. */
class RecallSpec extends SparkSpecBase {

  test("LSH recall@20 clears the floor and grows with the Hamming radius") {
    val emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")
    val q = Seq.fill(64)(0.1)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 20)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recalls = Seq(2, 4, 6).map { h =>
      val lsh = Similarity
        .lshTopK(emb, "vec_id", "embedding", q, 20, planes = 12, maxHammingDist = h)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      (brute & lsh).size
    }
    assert(recalls == recalls.sorted, s"recall not monotone in radius: $recalls")
    assert(recalls(1) >= 5, s"recall@20 at h=4 collapsed: ${recalls(1)}/20")
    assert(recalls(2) >= 10, s"recall@20 at h=6 collapsed: ${recalls(2)}/20")
  }

  test("IVF recall@20 grows with nprobe and reaches 100% at nprobe=nCents") {
    val emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")
    val q = Seq.fill(64)(0.1)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 20)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recalls = Seq(2, 4, 16).map { np =>
      val ivf = Similarity
        .ivfTopK(emb, "vec_id", "embedding", q, 20, nCents = 16, nprobe = np)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      (brute & ivf).size
    }
    assert(recalls == recalls.sorted, s"recall not monotone in nprobe: $recalls")
    assert(recalls(1) >= 5, s"recall@20 at nprobe=4 collapsed: ${recalls(1)}/20")
    // probing every list IS brute force — exact by construction
    assert(recalls(2) == 20, s"nprobe=nCents must be exact: ${recalls(2)}/20")
  }

  test("partitioned index probe equals in-memory IVF for arbitrary queries") {
    val emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_recallspec"
    Similarity.ivfWriteIndex(emb, "vec_id", "embedding", nCents = 16, path = path)
    // the materialization must be answer-invariant for ANY query vector,
    // not just the oracle's all-0.1 — deterministic pseudo-random probes
    for (seed <- 1 to 4) {
      val q = (0 until 64).map(i => math.sin(seed * 64 + i))
      val mem = Similarity
        .ivfTopK(emb, "vec_id", "embedding", q, 20, nCents = 16, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val idx = Similarity
        .ivfQueryIndex(spark, "vec_id", "embedding", path, q, 20, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(idx == mem, s"seed=$seed: materialized probe diverged")
    }
  }
}
