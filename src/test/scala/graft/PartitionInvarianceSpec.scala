package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Partition-invariance: the sampling/split/dedup family claims
  * "deterministic under any partitioning" — the property that makes a
  * 1000-executor run reproduce a laptop run. Each op here must return
  * the SAME rows for 1, 5, and 97 input partitions (97 > row count at
  * sf0.001, so most partitions are empty or single-row). */
class PartitionInvarianceSpec extends SparkSpecBase {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  private def invariant(name: String)(op: DataFrame => DataFrame): Unit = {
    val want = op(docs.repartition(5)).collect().map(_.toString).sorted
    for (n <- Seq(1, 97)) {
      val got = op(docs.repartition(n)).collect().map(_.toString).sorted
      assert(got.sameElements(want),
        s"$name differs at $n partitions: got ${got.length} rows, want ${want.length}")
    }
    assert(want.nonEmpty, s"$name is vacuous on the fixture")
  }

  test("graph ops (pagerank, triangles) are partition-invariant") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    def run(d: DataFrame) = {
      val pairs = graft.operators.Graphs.coOccurrencePairs(
        d, "l_orderkey", "l_partkey")
      (graft.operators.Graphs.pageRank(pairs, iters = 2)
         .collect().map(_.toString).sorted.toSeq,
       graft.operators.Graphs.triangleStats(pairs)
         .collect().map(_.toString).toSeq)
    }
    val want = run(li.repartition(5))
    assert(want._1.nonEmpty && want._2.nonEmpty)
    for (n <- Seq(1, 97)) {
      val got = run(li.repartition(n))
      assert(got == want, s"graph results differ at $n partitions")
    }
  }

  test("pageRankConverged on an empty edge set names the cause") {
    val empty = spark.range(0).selectExpr("id as a", "id as b")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Graphs.pageRankConverged(empty,
        epsMilli = 20L, maxIters = 3)
    }
    assert(e.getMessage.contains("empty edge set"), e.getMessage)
  }

  test("reservoir top-k sample is partition-invariant") {
    invariant("reservoir") { d =>
      d.select(col("doc_id"),
          graft.functions.md5Bucket(col("doc_id"), 4294967296L, salt = "res:")
            .as("pri"))
        .orderBy(col("pri"), col("doc_id")).limit(20)
    }
  }

  test("temperature sample is partition-invariant") {
    invariant("temperature") { d =>
      val counts = d.groupBy(col("lang")).agg(count(lit(1)).as("n_l"))
        .withColumn("rate",
          least(lit(1.0), lit(3.0) / sqrt(col("n_l").cast("double"))))
      val u = graft.functions.md5Fold32(
        concat(lit("temp:"), col("doc_id").cast("string")))
      d.join(broadcast(counts), Seq("lang"))
        .filter(u.cast("double") < col("rate") * lit(4294967296.0))
        .select(col("doc_id"), col("lang"))
    }
  }

  test("exact dedup keeper choice is partition-invariant") {
    invariant("dedup.exact")(d => Dedup.exact(d, "doc_id", "text"))
  }

  test("incremental dedup statuses are partition-invariant") {
    invariant("dedup.incremental") { d =>
      val b = graft.functions.md5Bucket(col("doc_id"), 100L)
      Dedup.incremental(d.filter(b >= 50), d.filter(b < 50), "doc_id", "text")
    }
  }

  test("simhash pairing is partition-invariant") {
    invariant("simhashPairs")(d =>
      Dedup.simhashPairs(d, "doc_id", "text", maxHamming = 7))
  }

  test("bloom contamination is partition-invariant") {
    invariant("contaminationBloom") { d =>
      val b = graft.functions.md5Bucket(col("doc_id"), 100L)
      Dedup.contaminationScanBloom(d.filter(b >= 85), d.filter(b < 70),
        "doc_id", "text")
    }
  }

  // the exact-rank statistics family: Gini / Lorenz / KS / nearest-rank
  // picks claim bit-identical answers on any layout — the property the
  // milli-long quantization and two-pass rank machinery exist for
  test("gini-style milli-long rank statistic is partition-invariant") {
    import graft.operators.GlobalOrder
    invariant("gini") { d =>
      val totals = d.groupBy(col("lang"))
        .agg(sum(col("n_chars")).as("m"))
      val ranked = GlobalOrder.withRowNumberLong(totals,
        Seq(col("m"), col("lang")), "i")
      ranked.agg(count(lit(1)).as("n"), sum(col("m")).as("s0"),
          sum(col("i") * col("m")).as("s1"))
        .select(round((lit(2L) * col("s1") - (col("n") + 1) * col("s0"))
          .cast("double") / (col("n") * col("s0")).cast("double"), 6)
          .as("gini"))
    }
  }

  test("nearest-rank picks are partition-invariant") {
    import graft.operators.GlobalOrder
    invariant("nearestRank") { d =>
      GlobalOrder.nearestRankPicks(d, col("n_chars").cast("double"),
        Seq(("p05", 0.05), ("p50", 0.5), ("p95", 0.95)))
    }
  }

  test("ks cumulative-count statistic is partition-invariant") {
    import graft.operators.GlobalOrder
    invariant("ks") { d =>
      val perValue = d.groupBy(col("n_chars"))
        .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ca"),
          sum(when(col("lang") =!= "en", 1L).otherwise(0L)).as("cb"))
      val cum = GlobalOrder.withRunningSum(
          GlobalOrder.withRunningSum(perValue, Seq(col("n_chars")),
            col("ca"), "cca", scale = 0),
          Seq(col("n_chars")), col("cb"), "ccb", scale = 0)
        .localCheckpoint(true)
      val totals = cum.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      cum.crossJoin(broadcast(totals))
        .agg(max(abs(col("cca") * col("nb") - col("ccb") * col("na")))
          .as("num"), max(col("na")).as("na"), max(col("nb")).as("nb"))
        .select(round(col("num") /
          (col("na") * col("nb")).cast("double"), 6).as("d"))
    }
  }
}
