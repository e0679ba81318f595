package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Similarity

/** kmeans sanity on a separable synthetic set: two tight blobs must
  * recover the generating partition regardless of input order. */
class KmeansSpec extends SparkSpecBase {

  test("two separable blobs are recovered with correct sizes") {
    val dim = 8
    def v(center: Double, j: Int): Seq[Float] =
      (0 until dim).map(d => (center + 0.001 * ((j + d) % 3)).toFloat)
    // ids 0,1 seed the two clusters (one in each blob)
    val rows = (Seq(0 -> 0.0, 1 -> 5.0) ++
      (2 until 30).map(j => j -> (if (j % 3 == 0) 0.0 else 5.0)))
      .map { case (id, c) => Row(id.toLong, v(c, id)) }
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    val got = Similarity.kmeans(df, "vec_id", "embedding",
        dim = dim, k = 2, iters = 2)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val blob0 = 1 + (2 until 30).count(_ % 3 == 0)
    assert(got == Map(0 -> blob0.toLong, 1 -> (30 - blob0).toLong), got.toString)
  }

  test("converged: bound-riding run equals the fixed-iteration path, " +
    "loose gate exits early, and n_iters is partition-invariant") {
    val dim = 8
    def v(center: Double, j: Int): Seq[Float] =
      (0 until dim).map(d => (center + 0.01 * ((j + d) % 5)).toFloat)
    val rows = (0 until 36).map(j =>
      Row(j.toLong, v(if (j % 3 == 0) 0.0 else 4.0, j)))
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = false)))
    def df(parts: Int) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, parts), schema)
    def key(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet

    // separable blobs converge EXACTLY (assignments stabilize, movement
    // hits 0) so even a 1‰ gate fires — at round 2 here — and the
    // result must be bit-identical to the fixed-iteration path run for
    // the same count
    val (tight, kTight) = Similarity.kmeansConverged(df(3), "vec_id",
      "embedding", dim = dim, k = 2, epsMilli = 1L, maxIters = 5)
    assert(kTight == 2, s"exact convergence expected at round 2, got $kTight")
    assert(key(tight) == key(Similarity.kmeans(df(3), "vec_id", "embedding",
      dim = dim, k = 2, iters = kTight)))

    // a trivial gate (100% movement allowed) exits after round 1
    val (_, kLoose) = Similarity.kmeansConverged(df(3), "vec_id",
      "embedding", dim = dim, k = 2, epsMilli = 1000L, maxIters = 3)
    assert(kLoose == 1)

    // the stopping decision itself is partition-invariant
    val (rA, kA) = Similarity.kmeansConverged(df(1), "vec_id", "embedding",
      dim = dim, k = 2, epsMilli = 120L, maxIters = 5)
    val (rB, kB) = Similarity.kmeansConverged(df(7), "vec_id", "embedding",
      dim = dim, k = 2, epsMilli = 120L, maxIters = 5)
    assert(kA == kB, s"n_iters drifted across partitioning: $kA vs $kB")
    assert(key(rA) == key(rB))
  }

  test("converged: empty input fails with a named cause, not an NPE") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = false)))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
    val e = intercept[IllegalArgumentException] {
      Similarity.kmeansConverged(empty, "vec_id", "embedding",
        dim = 4, k = 2, epsMilli = 10L, maxIters = 3)
    }
    assert(e.getMessage.contains("empty points frame"), e.getMessage)
  }

  test("clusters that empty mid-run survive (ANSI element_at regression) " +
    "and k = 1 fits work (least-of-one regression)") {
    val dim = 4
    // ids 0,1,2 share identical coordinates, so round 1 assigns EVERY
    // point to cent 0 (distance ties resolve to the smallest cent) and
    // clusters 1 and 2 vanish in the update; round 2 then runs with a
    // single surviving centroid. Under Spark 4's default ANSI mode the
    // r15 spelling threw (element_at past the collected array's end,
    // then least() with one argument) — scaladoc'd as supported.
    val rows = (0 until 12).map { j =>
      val v = if (j < 3) 1.0f else 3.0f
      Row(j.toLong, (0 until dim).map(_ => v))
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    val got = Similarity.kmeans(df, "vec_id", "embedding",
        dim = dim, k = 3, iters = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    // single survivor: all 12 points, centroid mean 2.5 per dim
    assert(got.toSeq == Seq((0, 12L, 10.0)), got.mkString(","))
    // the converged variant rides the same vanish without crashing and
    // stops once movement hits zero
    val (cr, ci) = Similarity.kmeansConverged(df, "vec_id", "embedding",
      dim = dim, k = 3, epsMilli = 1L, maxIters = 5)
    assert(ci <= 3 && cr.collect().map(_.getLong(1)).sum == 12L)
    // an explicit k = 1 fit — the old least() spelling failed analysis
    val one = Similarity.kmeans(df, "vec_id", "embedding",
        dim = dim, k = 1, iters = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(one.toSeq == Seq((0, 12L, 10.0)), one.mkString(","))
  }

  test("result is invariant to input partitioning") {
    val dim = 4
    val rows = (0 until 40).map(j =>
      Row(j.toLong, (0 until dim).map(d => ((j % 7) + 0.1 * d).toFloat)))
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = false)))
    def run(parts: Int) = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, parts), schema)
      Similarity.kmeans(df, "vec_id", "embedding", dim = dim, k = 3, iters = 2)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    }
    assert(run(1) == run(7))
  }
}
