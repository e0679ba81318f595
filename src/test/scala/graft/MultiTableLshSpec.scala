package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** OR-amplified (multi-table) LSH is the production recall path for
  * NEAR-DUPLICATE retrieval: a vector at cos ≥ 0.98 agrees with each
  * hyperplane with p ≈ 0.96, so an 8-plane table matches its bucket
  * with p ≈ 0.72 and eight independent tables reach ~1 − 0.28^8 ≈ 1 —
  * while an unrelated vector shares a bucket with p ≈ 2^-8 per table.
  * (On isotropic non-duplicate data no exact-bucket scheme can help;
  * that regime is RecallSpec's Hamming-ball measurement.) */
class MultiTableLshSpec extends SparkSpecBase {

  private val dim = 64

  private def unit(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(x => x / n)
  }

  test("planted near-duplicates are retrieved through exact-bucket OR-match") {
    val rnd = new scala.util.Random(7L)
    val base = (0 until 200).map { i =>
      (i.toLong, unit(Array.fill(dim)(rnd.nextGaussian())))
    }
    import spark.implicits._
    val df = base.toDF("vec_id", "embedding")

    // probe with a small perturbation of vector i (cos ≈ 0.995)
    val probes = (0 until 10).map { i =>
      val v = base(i)._2
      i.toLong -> unit(v.map(x => x + 0.07 * rnd.nextGaussian()))
    }
    var hits = 0
    for ((id, probe) <- probes) {
      val got = Similarity
        .multiTableTopK(df, "vec_id", "embedding", probe.toSeq, k = 5,
          planes = 8, tables = 8)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      if (got.contains(id)) hits += 1
    }
    assert(hits >= 8, s"planted near-dup recall collapsed: $hits/10")

    // pruning must be real: an unrelated probe's candidate set is tiny
    val far = unit(Array.fill(dim)(rnd.nextGaussian())).toSeq
    val sigs = Similarity.withHyperplaneSigs(df, "vec_id", "embedding", dim, 8, 8)
    val qs = Similarity.querySigs(far, 8, 8)
    val anyMatch = (0 until 8).map(t => col(s"sig$t") === lit(qs(t))).reduce(_ || _)
    val cand = sigs.filter(anyMatch).count()
    assert(cand <= 40, s"candidate set not pruned: $cand/200")
  }
}
