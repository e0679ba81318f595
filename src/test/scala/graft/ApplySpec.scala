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

  test("grouped fold runs with O(1) task memory via secondary sort — " +
    "the huge-group alternative to flatMapGroups' buffered group") {
    // q_groupby_apply buffers one group per task to sort it — fine
    // while groups are basket-bounded, but a pipeline whose groups can
    // be millions of rows wants the secondary-sort shape instead:
    // repartition ON the key, sortWithinPartitions BY (key, order),
    // then one streaming mapPartitions fold that detects group
    // boundaries — per-task state is three scalars, independent of
    // group size. Same answer, bit for bit.
    val spark2 = spark
    import spark2.implicits._
    val base = Tables(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        unix_timestamp(col("o_orderdate")).as("ots"))
    val streamed = base
      .repartition(7, col("o_custkey"))
      .sortWithinPartitions(col("o_custkey"), col("ots"), col("o_orderkey"))
      .as[(Long, Long, Double, Long)]
      .mapPartitions { it =>
        new Iterator[(Long, Long, Long)] {
          private var cust = 0L
          private var n = 0L
          private var cur = 0
          private var best = 0
          private var prev = 0.0
          private var open = false
          private def close(): (Long, Long, Long) = { open = false; (cust, n, best.toLong) }
          def hasNext: Boolean = it.hasNext || open
          def next(): (Long, Long, Long) = {
            while (it.hasNext) {
              val r = it.next()
              if (!open) { cust = r._1; n = 0; cur = 0; best = 0; open = true }
              else if (r._1 != cust) {
                val done = close()
                cust = r._1; n = 0; cur = 0; best = 0; open = true
                n = 1; cur = 1; best = 1; prev = r._3
                return done
              }
              cur = if (n == 0L || r._3 > prev) cur + 1 else 1
              n += 1
              prev = r._3
              if (cur > best) best = cur
            }
            close()
          }
        }
      }
      .toDF("o_custkey", "n_orders", "max_streak")
      .orderBy(col("o_custkey"))
    val want = Apply.queries("q_groupby_apply")(spark, sf)
    assert(streamed.exceptAll(want).isEmpty && want.exceptAll(streamed).isEmpty)
  }

  test("map(dict) leaves unmapped keys null like pandas") {
    val got = Apply.queries("q_map_dict")(spark, sf)
    val unmapped = got.filter(col("sla_days").isNull)
      .select("o_orderpriority").distinct().collect().map(_.getString(0))
    assert(unmapped.toSeq == Seq("5-LOW"))
  }
}
