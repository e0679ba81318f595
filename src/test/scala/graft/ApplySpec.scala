package graft

import org.apache.spark.sql.functions._

import graft.queries.Apply

/** S.apply / S.map surface: the opaque typed-map path must agree with
  * the codegen'd expression path row for row. */
class ApplySpec extends SparkSpecBase {

  test("userLambda tiers and adjusts like the expression tree") {
    val r = Apply.userLambda(Apply.OrderRow(1L, 250000.0))
    assert(r.tier == "high" && r.adj == 250000.0 * 1.1)
    val r2 = Apply.userLambda(Apply.OrderRow(2L, 100.0))
    assert(r2.tier == "low" && r2.adj == 125.0)
  }

  test("typed Dataset.map result equals the native expression result") {
    val viaExpr = Apply.queries("q_apply_lambda")(spark, sf)
    val viaMap = Apply.queries("q_apply_typed_map")(spark, sf)
    assert(viaExpr.exceptAll(viaMap).isEmpty && viaMap.exceptAll(viaExpr).isEmpty)
  }

  test("grouped apply (flatMapGroups) matches a declarative window replay") {
    val got = Apply.queries("q_groupby_apply")(spark, sf)
    // declarative twin: gaps-and-islands in Spark SQL windows
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val s = Tables(spark, sf, "orders")
      .withColumn("brk",
        when(col("o_totalprice") > lag(col("o_totalprice"), 1).over(w), 0)
          .otherwise(1))
      .withColumn("grp", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val want = s.groupBy(col("o_custkey"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("len")).as("n_orders"), max(col("len")).as("max_streak"))
      .orderBy(col("o_custkey"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() > 0)
  }

  test("map(dict) leaves unmapped keys null like pandas") {
    val got = Apply.queries("q_map_dict")(spark, sf)
    val unmapped = got.filter(col("sla_days").isNull)
      .select("o_orderpriority").distinct().collect().map(_.getString(0))
    assert(unmapped.toSeq == Seq("5-LOW"))
  }
}
