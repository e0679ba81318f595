package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.types._

import graft.Tables

/** SURVEY §2.12 UDF surface: `S.apply(func)` / `S.map(func|dict)`.
  *
  * Reference surface: arbitrary jitted Python lambdas applied elementwise
  * (`sdc/datatypes/pandas_series_functions/apply.py:38-120`,
  * `map.py:38-130`) with the return dtype inferred by the compiler.
  *
  * Spark mapping, in preference order (SURVEY §2.12):
  *   - a lambda made of arithmetic/conditionals compiles to a native
  *     `Column` expression tree — stays inside whole-stage codegen, the
  *     fastest path and the one a Spark-first engine should choose
  *     whenever the lambda body is expressible (`q_apply_lambda`);
  *   - a genuinely opaque lambda runs as a typed `Dataset.map` over a
  *     case-class encoder — JVM bytecode per row, no Python round-trip
  *     (`q_apply_typed_map`);
  *   - `S.map(dict)` is a lookup against a small map: broadcast-join the
  *     dict as a tiny DataFrame so the big side never shuffles
  *     (`q_map_dict`).
  */
object Apply {

  /** Input row for the typed-map path (subset of orders). */
  private[graft] case class OrderRow(o_orderkey: Long, o_totalprice: Double)

  /** Output row: the "lambda" result with its compiler-inferred type. */
  private[graft] case class AppliedRow(o_orderkey: Long, tier: String, adj: Double)

  /** The opaque per-row function a user would pass to S.apply. Arbitrary
    * JVM logic — branches, locals, string building — executed once per
    * row inside the task, fully distributed. */
  private[graft] def userLambda(r: OrderRow): AppliedRow = {
    val tier =
      if (r.o_totalprice >= 200000.0) "high"
      else if (r.o_totalprice >= 50000.0) "mid"
      else "low"
    val adj = if (tier == "high") r.o_totalprice * 1.1 else r.o_totalprice + 25.0
    AppliedRow(r.o_orderkey, tier, adj)
  }

  /** The S.map(dict) dictionary: order priority → SLA days. Unmapped
    * keys become null (pandas semantics). */
  private[graft] val slaDict: Seq[(String, Int)] = Seq(
    "1-URGENT" -> 1, "2-HIGH" -> 3, "3-MEDIUM" -> 7, "4-NOT SPECIFIED" -> 14)

  val queries: Map[String, Q] = Map(
    // S.apply(lambda) compiled to a native expression tree (codegen path)
    "q_apply_lambda" -> ((s, dir) => {
      val p = col("o_totalprice")
      val tier = when(p >= 200000.0, "high")
        .when(p >= 50000.0, "mid").otherwise("low")
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), tier.as("tier"),
          when(tier === "high", p * 1.1).otherwise(p + 25.0).as("adj"))
        .orderBy(col("o_orderkey"))
    }),

    // Same lambda as opaque JVM code via typed Dataset.map — proves the
    // general path; results must be identical to the codegen'd variant.
    "q_apply_typed_map" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .as[OrderRow]
        .map(userLambda _)
        .toDF()
        .orderBy(col("o_orderkey"))
    }),

    // df.groupby(key).apply(func) — the GROUPED arbitrary-function seam
    // (pandas' most general escape hatch): groupByKey + flatMapGroups
    // runs opaque sequential JVM logic once per group. The logic here —
    // longest strictly-increasing o_totalprice streak in (date, key)
    // order — is genuinely stateful-sequential, the kind of fold users
    // reach for apply() to write. Scale shape: one hash shuffle on the
    // group key; per-task state is ONE group's rows (per-customer
    // orders — basket-bounded, like rolling.apply's window buffer),
    // never the partition. The in-memory sort inside each group is
    // bounded by the same basket size. Oracle: gaps-and-islands
    // windows replay the identical fold declaratively.
    "q_groupby_apply" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      Tables(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          unix_timestamp(col("o_orderdate")).as("ots"))
        .as[(Long, Long, Double, Long)]
        .groupByKey(_._1)
        .flatMapGroups { (cust: Long, it: Iterator[(Long, Long, Double, Long)]) =>
          val rows = it.toIndexedSeq.sortBy(r => (r._4, r._2))
          var best = 0
          var cur = 0
          var prev = Double.NegativeInfinity
          var first = true
          rows.foreach { r =>
            cur = if (first || r._3 > prev) cur + 1 else 1
            first = false
            prev = r._3
            if (cur > best) best = cur
          }
          Iterator.single((cust, rows.length.toLong, best.toLong))
        }
        .toDF("o_custkey", "n_orders", "max_streak")
        .orderBy(col("o_custkey"))
    }),

    // S.map(dict): broadcast the dict as a 4-row frame; left join keeps
    // unmapped keys as null like pandas map
    "q_map_dict" -> ((s, dir) => {
      val dict = s.createDataFrame(
        s.sparkContext.parallelize(slaDict.map { case (k, v) => Row(k, v) }),
        StructType(Seq(
          StructField("o_orderpriority", StringType, nullable = false),
          StructField("sla_days", IntegerType, nullable = false))))
      Tables(s, dir, "orders")
        .join(broadcast(dict), Seq("o_orderpriority"), "left")
        .select(col("o_orderkey"), col("o_orderpriority"), col("sla_days"))
        .orderBy(col("o_orderkey"))
    })
  )

  private val lambdaSql =
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice >= 200000.0 THEN 'high'
      |       WHEN o_totalprice >= 50000.0 THEN 'mid' ELSE 'low' END AS tier,
      |  CASE WHEN o_totalprice >= 200000.0 THEN o_totalprice * 1.1
      |       ELSE o_totalprice + 25.0 END AS adj
      |FROM orders ORDER BY o_orderkey""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_apply_lambda" -> lambdaSql,
    "q_apply_typed_map" -> lambdaSql,

    // gaps-and-islands replay of the grouped fold: a streak break is
    // price <= lag(price) (lag NULL on the first row also breaks —
    // CASE's NULL falls to ELSE 1); islands are running sums of breaks;
    // the streak is the island length
    "q_groupby_apply" ->
      """WITH s AS (SELECT o_custkey, o_orderkey, o_orderdate,
        |    CASE WHEN o_totalprice > lag(o_totalprice) OVER w
        |         THEN 0 ELSE 1 END AS brk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_orderdate, o_orderkey)),
        |g AS (SELECT o_custkey,
        |    SUM(brk) OVER (PARTITION BY o_custkey
        |                   ORDER BY o_orderdate, o_orderkey
        |                   ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM s),
        |isl AS (SELECT o_custkey, grp, COUNT(*) AS len
        |  FROM g GROUP BY o_custkey, grp)
        |SELECT o_custkey, CAST(SUM(len) AS BIGINT) AS n_orders,
        |  MAX(len) AS max_streak
        |FROM isl GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q_map_dict" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CASE o_orderpriority
        |    WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 3
        |    WHEN '3-MEDIUM' THEN 7 WHEN '4-NOT SPECIFIED' THEN 14
        |  END AS sla_days
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
