package graft

import org.apache.spark.sql.functions._

import graft.queries.Extras

/** q_pca_power against a SEQUENTIAL driver-side replay of the same
  * quantized power iteration — like LogregSpec, a determinism witness
  * independent of both engines: the quantized cross-row sums make the
  * distributed result a well-defined pure function of the data, which a
  * scalar loop can reproduce exactly. */
class PcaSpec extends SparkSpecBase {

  test("three power iterations equal the sequential quantized replay") {
    val rows: Array[Array[Double]] = Tables(spark, sf, "embeddings")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = rows.length
    val dims = 64

    // exact per-pos mean (1e-6 quantized, like the engine)
    val mu = (0 until dims).map { j =>
      rows.map(r => math.floor(r(j) * 1e6 + 0.5).toLong).sum.toDouble /
        (n * 1e6)
    }.toArray
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    var v = Array.fill(dims)(0.125)
    for (_ <- 1 to 3) {
      val mv = dot(mu, v)
      val ss = rows.map(r => dot(r, v) - mv)
      val qs = ss.map(s => math.floor(s * 1e9 + 0.5).toLong).sum
      val u = (0 until dims).map { j =>
        val qc = rows.indices
          .map(i => math.floor(rows(i)(j) * ss(i) * 1e9 + 0.5).toLong).sum
        (qc.toDouble / 1e9 - mu(j) * (qs.toDouble / 1e9)) / n
      }.toArray
      val qn = u.map(x => math.floor(x * x * 1e9 + 0.5).toLong).sum
      val nrm = math.sqrt(qn.toDouble / 1e9)
      v = u.map(_ / nrm)
    }
    val mv = dot(mu, v)
    val ql = rows.map { r =>
      val s = dot(r, v) - mv
      math.floor(s * s * 1e6 + 0.5).toLong
    }.sum
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val wantLambda = r6(ql.toDouble / 1e6 / (n - 1.0))

    val got = Extras.queries("q_pca_power")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("lambda1") === wantLambda)
    for (j <- 0 until 8)
      assert(got(s"v$j") === r6(v(j)), s"loading v$j mismatch")
    // sanity: unit direction up to the 1e-9 norm quantization (u ~ 1e-2
    // here, so qn carries ~1e-5 relative error) and positive lambda
    assert(math.abs(dot(v, v) - 1.0) < 1e-4 && wantLambda > 0.0)
  }
}
