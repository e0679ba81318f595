// Dump minhash-sorted chain pairs at a NON-default config (the recall
// ladder's alternate rungs) for tools/uf_compare.py --alt-pairs — e.g.
// the 4x8 row at sf10, where the union-denominator ladder is infeasible
// and chain recall is measured against the hash-exact banded pairs.
//
// Run (after `sbt -batch compile`):
//   SPARK_GRAFT_SF_DIR=/tmp/sf10_real SPARK_GRAFT_OUT=/tmp/sf10_w8_pairs \
//   SPARK_GRAFT_WINDOW=8 /opt/spark/bin/spark-shell --master 'local[32]' \
//     --driver-memory 48g \
//     --driver-class-path /root/repo/target/scala-2.13/classes \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.extensions=graft.GraftExtensions \
//     --conf spark.ui.enabled=false \
//     -I tools/gen_alt_pairs.scala
import org.apache.spark.sql.functions._

val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10_real")
val out = sys.env.getOrElse("SPARK_GRAFT_OUT", "/tmp/sf10_w8_pairs")
val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "4").toInt
val window = sys.env.getOrElse("SPARK_GRAFT_WINDOW", "8").toInt
// SPARK_GRAFT_COEFF_SKIP=16 draws the chain family DISJOINT from the
// banding family's minhashCoeffs(16) — the unbiased ladder read (the
// default-prefix family shares mh0-7 with bands 0-1 and scores
// optimistically against the banded denominator).
val coeffSkip = sys.env.getOrElse("SPARK_GRAFT_COEFF_SKIP", "0").toInt
// SPARK_GRAFT_FAMILY=union_simhash dumps the FAMILY-DIVERSITY union
// instead: chain candidates (at the passes/window/skip above) ∪ SimHash
// banded-Hamming pairs, one shared exact-Jaccard verification — the r15
// "does a second family beat more passes?" measurement. Output carries
// from_chain/from_simhash provenance; uf_compare --alt-pairs ignores
// the extra columns.
val family = sys.env.getOrElse("SPARK_GRAFT_FAMILY", "chains")

val t0 = System.nanoTime()
val d = graft.Tables(spark, sfDir, "documents")
val pairs = family match {
  case "chains" =>
    graft.operators.Dedup.minhashSortedPairs(d, "doc_id", "text",
      passes = passes, window = window, threshold = 0.5,
      coeffSkip = coeffSkip)
  case "union_simhash" =>
    graft.operators.Dedup.chainSimhashUnionPairs(d, "doc_id", "text",
      passes = passes, window = window, threshold = 0.5,
      coeffSkip = coeffSkip)
  case other => sys.error(s"unknown SPARK_GRAFT_FAMILY: $other")
}
pairs.orderBy(col("id_a"), col("id_b")).coalesce(1).write.mode("overwrite").parquet(out)
println(f"[gen_alt_pairs] $family ${passes}x$window skip=$coeffSkip -> $out in " +
  f"${(System.nanoTime() - t0) / 1e9}%.1f s")
sys.exit(0)
