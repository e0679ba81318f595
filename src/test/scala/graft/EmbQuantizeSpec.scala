package graft

import org.apache.spark.sql.functions._

import graft.queries.Extras

/** q_emb_quantize invariants: round-half-up int8 codes must stay in
  * [−127, 127] and the reconstruction error can never exceed half a
  * quantization step. */
class EmbQuantizeSpec extends SparkSpecBase {

  test("int8 codes bounded and reconstruction error <= scale/2") {
    val df = Extras.queries("q_emb_quantize")(spark, sf)
    val bad = df.filter(
      // q_l1 = sum(|qi|) over 64 dims, each |qi| <= 127
      col("q_l1") > 64L * 127L ||
        col("q_l1") < abs(col("q_sum")) ||
        // err_q and scale_q share the 1e9 quantization; rounding to the
        // nearest code keeps |x - qi*scale| <= scale/2 (+1 ulp slack
        // from the two independent floor(·+0.5) quantizations)
        col("err_q") > col("scale_q") / 2 + 1)
    assert(bad.isEmpty, bad.limit(5).collect().mkString("\n"))
    assert(df.count() === Tables(spark, sf, "embeddings").count())
  }
}
