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
