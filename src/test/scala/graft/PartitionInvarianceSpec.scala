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
}
