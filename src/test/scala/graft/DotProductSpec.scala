package graft

import org.apache.spark.sql.functions._

import graft.functions.dotp
import graft.operators.Similarity

/** [[graft.functions.DotProduct]] (graft_dot): the native codegen loop
  * must be bit-identical to the ordered higher-order-function fold it
  * replaced (same FP-operation sequence), across codegen and interpreted
  * paths, and must keep the HOF null semantics. */
class DotProductSpec extends SparkSpecBase {

  private def hofDot(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column) =
    aggregate(zip_with(transform(a, x => x.cast("double")),
      transform(b, x => x.cast("double")), (x, y) => x * y), lit(0.0), _ + _)

  test("graft_dot is bit-identical to the ordered HOF fold on real embeddings") {
    val q = array(Seq.fill(64)(lit(0.1)): _*)
    val d = Tables(spark, sf, "embeddings")
      .select(dotp(col("embedding"), q).as("fast"),
        hofDot(col("embedding"), q).as("ref"),
        dotp(col("embedding"), col("embedding")).as("fast_nrm"),
        hofDot(col("embedding"), col("embedding")).as("ref_nrm"))
      .filter(col("fast") =!= col("ref") || col("fast_nrm") =!= col("ref_nrm"))
    assert(d.count() == 0)
  }

  test("graft_dot agrees between codegen and interpreted evaluation") {
    val q = array((0 until 64).map(i => lit(0.01 * i - 0.3)): _*)
    val expected = Tables(spark, sf, "embeddings")
      .select(sum(dotp(col("embedding"), q)).as("s")).collect()(0).getDouble(0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = Tables(spark, sf, "embeddings")
        .select(sum(dotp(col("embedding"), q)).as("s")).collect()(0).getDouble(0)
      assert(interp == expected)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("graft_dot null semantics: null array → null, null element → null") {
    val df = spark.sql(
      """SELECT graft_dot(a, b) AS d FROM VALUES
        |  (array(1.0D, 2.0D), array(3.0D, 4.0D)),
        |  (CAST(NULL AS ARRAY<DOUBLE>), array(3.0D, 4.0D)),
        |  (array(1.0D, CAST(NULL AS DOUBLE)), array(3.0D, 4.0D)) t(a, b)""".stripMargin)
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0) && rows(2).isNullAt(0))
  }

  test("signature generation is a shuffle-free whole-stage-codegen projection") {
    val emb = Tables(spark, sf, "embeddings")
    val df = graft.operators.Similarity
      .withHyperplaneSig(emb, "vec_id", "embedding", 64, 12)
    df.collect() // finalize the adaptive plan so codegen stages appear
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    // The only allowed Exchange is Parallelism.fanOut's round-robin
    // repartition of a small single-split input (a no-op on production
    // inputs); no key shuffle, no aggregation.
    assert(!plan.contains("hashpartitioning") && !plan.contains("Aggregate"),
      "signatures must be a pure projection:\n" +
        plan.linesIterator
          .filter(l => l.contains("Exchange") || l.contains("Aggregate"))
          .mkString("\n"))
    // simple-mode explain marks whole-stage-codegen stages with "*(n)";
    // the projection carrying graft_dot must be inside one
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("Project")),
      plan.take(400))
  }

  test("hyperplane signatures from graft_dot match scalar recomputation") {
    val emb = Tables(spark, sf, "embeddings")
    val got = Similarity.withHyperplaneSig(emb, "vec_id", "embedding", 64, 8)
      .select(col("id"), col("sig"), col("e")).collect()
    got.take(50).foreach { r =>
      val e = r.getSeq[Float](2)
      val want = (0 until 8).map { p =>
        val dot = (0 until 64).foldLeft(0.0)((acc, d) =>
          acc + e(d).toDouble * Similarity.planeComponent(p, d))
        if (dot >= 0) 1L << p else 0L
      }.reduce(_ | _)
      assert(r.getLong(1) == want, s"id=${r.getLong(0)}")
    }
  }
}
