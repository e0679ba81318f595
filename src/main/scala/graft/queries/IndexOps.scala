package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY §1 index emulation — the reference's index extension subsystem
  * (the `sdc/extensions/indexes/` `…_ext.py` modules:
  * Positional/Range/Int64/Multi index types with
  * `take/reindex/equals/join` methods).
  *
  * Spark has no row labels; an index is an ordinary column (MultiIndex =
  * struct column), and the index METHODS map to relational plans:
  *  - `reindex(target)` (`int64_index_ext.py:447`,
  *    `common_functions.py:603 sdc_reindex_series`) = left join FROM the
  *    target index onto the data, nulls where labels are absent;
  *  - `MultiIndex.from_product(levels)` (`multi_index_ext.py:865`) =
  *    cross join of the level frames;
  *  - `equals` (`int64_index_ext.py:428`) = symmetric `exceptAll`
  *    emptiness (set equality), used by the specs rather than a query.
  *
  * Scale: the target index is usually orders of magnitude smaller than
  * the data (it is a label set) — broadcast it; level frames in
  * from_product are tiny distinct sets, so the cross join is a
  * broadcast nested loop over |levels₁|×|levels₂| rows, never |data|².
  */
object IndexOps {

  val queries: Map[String, Q] = Map(
    // S.reindex(Int64Index target): custkeys 1,8,15,… — present keys
    // carry their value, absent keys null (pandas fill placeholder).
    // Left join FROM the target label set; AQE broadcasts the smaller
    // side (here the 2-column data projection; on a 100 TB frame it
    // would be the label set).
    "q_reindex" -> ((s, dir) => {
      val target = s.range(1, 30000, 7).select(col("id").as("c_custkey"))
      target.join(
          Tables(s, dir, "customer").select(col("c_custkey"), col("c_acctbal")),
          Seq("c_custkey"), "left")
        .orderBy(col("c_custkey"))
    }),

    // MultiIndex.from_product([flags, statuses]) + reindex the grouped
    // frame onto the full product — combos absent from the data show as
    // null counts (exactly pandas' reindex-on-MultiIndex semantics)
    "q_multiindex" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val flags = li.select(col("l_returnflag").as("f")).distinct()
      val statuses = li.select(col("l_linestatus").as("st")).distinct()
      val product = flags.crossJoin(broadcast(statuses))
        .select(struct(col("f"), col("st")).as("idx"))
      val agg = li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
      product.join(broadcast(agg),
          col("idx.f") === col("l_returnflag") &&
            col("idx.st") === col("l_linestatus"), "left")
        .select(col("idx.f").as("l_returnflag"),
          col("idx.st").as("l_linestatus"), col("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_reindex" ->
      """SELECT t.range AS c_custkey, c.c_acctbal
        |FROM range(1, 30000, 7) t
        |LEFT JOIN customer c ON c.c_custkey = t.range
        |ORDER BY c_custkey""".stripMargin,

    "q_multiindex" ->
      """WITH f AS (SELECT DISTINCT l_returnflag FROM lineitem),
        |s AS (SELECT DISTINCT l_linestatus FROM lineitem),
        |p AS (SELECT * FROM f CROSS JOIN s),
        |a AS (SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |      FROM lineitem GROUP BY 1, 2)
        |SELECT p.l_returnflag, p.l_linestatus, a.n
        |FROM p LEFT JOIN a USING (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
