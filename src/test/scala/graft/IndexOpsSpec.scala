package graft

import org.apache.spark.sql.functions._

import graft.queries.IndexOps

/** Index-subsystem semantics (SURVEY §1; reference
  * `sdc/extensions/indexes`): reindex null-fill, from_product
  * completeness, and the `equals` contract as symmetric exceptAll
  * emptiness. */
class IndexOpsSpec extends SparkSpecBase {

  test("reindex carries values for present labels and nulls for absent ones") {
    val r = IndexOps.queries("q_reindex")(spark, sf)
    val custCount = Tables(spark, sf, "customer").count()
    val present = r.filter(col("c_custkey") <= custCount)
    val absent = r.filter(col("c_custkey") > custCount)
    assert(present.filter(col("c_acctbal").isNull).count() == 0)
    assert(absent.count() > 0 && absent.filter(col("c_acctbal").isNotNull).count() == 0)
  }

  test("from_product covers exactly |levels1| x |levels2| combinations") {
    val li = Tables(spark, sf, "lineitem")
    val nf = li.select("l_returnflag").distinct().count()
    val ns = li.select("l_linestatus").distinct().count()
    assert(IndexOps.queries("q_multiindex")(spark, sf).count() == nf * ns)
  }

  test("index equals = symmetric exceptAll emptiness") {
    val a = spark.range(1, 100, 3).toDF("k")
    val b = spark.range(1, 100, 3).toDF("k")
    val c = spark.range(1, 100, 4).toDF("k")
    def eqIdx(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty
    assert(eqIdx(a, b) && !eqIdx(a, c))
  }
}
