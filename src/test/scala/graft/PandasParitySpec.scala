package graft

import org.apache.spark.sql.functions._

import graft.queries.{GroupBy, Joins, Reshape, SeriesExtra}

/** Invariants for the round-6 pandas-parity additions (cumcount/ngroup,
  * cross merge, to_numeric coerce, axis-1 concat) — oracle-independent
  * semantics checks. */
class PandasParitySpec extends SparkSpecBase {

  test("cumcount is 0..n-1 per group; ngroup is a dense 0..k-1 key rank") {
    val df = GroupBy.queries("q_cumcount_ngroup")(spark, sf)
    val per = df.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), min(col("cumcount")).as("mn"),
        max(col("cumcount")).as("mx"), countDistinct(col("cumcount")).as("nd"),
        countDistinct(col("ngroup")).as("ng"))
    // within each group: cumcount is exactly the set {0..n-1}, and the
    // group maps to exactly one ngroup value
    assert(per.filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1 ||
      col("nd") =!= col("n") || col("ng") =!= 1).count() === 0)
    val ngroups = df.select(col("ngroup")).distinct().collect()
      .map(_.getLong(0)).sorted
    assert(ngroups.toSeq === ngroups.indices.map(_.toLong).toSeq)
    // ngroup order follows sorted keys (sort=True)
    val keyed = df.select(col("o_orderpriority"), col("ngroup")).distinct()
      .orderBy(col("o_orderpriority")).collect().map(_.getLong(1))
    assert(keyed.toSeq === keyed.indices.map(_.toLong).toSeq)
  }

  test("cross merge cardinality is the product of the inputs") {
    val n = Joins.queries("q_join_cross")(spark, sf).count()
    val r = Tables(spark, sf, "region").count()
    val na = Tables(spark, sf, "nation").count()
    assert(n === r * na)
  }

  test("to_numeric coerce: numeric branches parse, junk branch nulls") {
    val df = SeriesExtra.queries("q_to_numeric")(spark, sf)
    assert(df.filter(col("c_custkey") % 3 === 2 &&
      col("as_num").isNotNull).count() === 0)
    assert(df.filter(col("c_custkey") % 3 =!= 2 &&
      col("as_num").isNull).count() === 0)
    // the ".5" branch parses to key*10 + 0.5 exactly
    assert(df.filter(col("c_custkey") % 3 === 0 &&
      col("as_num") =!= col("c_custkey") * 10 + 0.5).count() === 0)
  }

  test("axis-1 concat: outer length, null padding past the short side") {
    val df = Reshape.queries("q_concat_axis1")(spark, sf)
    val nO = Tables(spark, sf, "orders").count()
    val nC = Tables(spark, sf, "customer").count()
    assert(df.count() === math.max(nO, nC))
    assert(df.filter(col("pos") > math.min(nO, nC) &&
      col("c_acctbal").isNotNull && col("o_totalprice").isNotNull)
      .count() === 0)
    // positions are a contiguous 1..max range
    val r = df.agg(min(col("pos")), max(col("pos")),
      countDistinct(col("pos"))).collect()(0)
    assert(r.getLong(0) === 1L && r.getLong(1) === math.max(nO, nC) &&
      r.getLong(2) === math.max(nO, nC))
  }
}
