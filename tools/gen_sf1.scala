// [SUPERSEDED in round 8 by gen_sf1_real.scala — replication preserves
// replica-flat distributions and cannot produce organic key skew, value
// tails, or text diversity; the real generator synthesizes them. Kept
// for provenance of the round-7 BENCH_sf1.json artifact.]
// sf1 generator: 10x key-shifted replication of sf0.1 (distributions,
// skew, and per-key cardinalities preserved; keys disjoint per copy).
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

val src = "/root/testdata/sf0.1"
val out = "/tmp/sf1"
val COPIES = 10

def rd(t: String) = spark.read.parquet(s"$src/$t.parquet")

def replicate(df: DataFrame, keyShifts: Map[String, Long],
              textCol: Option[String] = None): DataFrame = {
  val copies = (0 until COPIES).map { i =>
    var d = df
    for ((c, base) <- keyShifts) d = d.withColumn(c, col(c) + lit(base * i))
    textCol.foreach { tc =>
      // perturb replicated text so copies are near-dups, not exact dups
      if (i > 0) d = d.withColumn(tc, concat(col(tc), lit(s" c$i")))
    }
    d
  }
  copies.reduce(_ unionAll _)
}

// dimension tables stay fixed (nation/region/part/supplier/customer keys
// are referenced by shifted facts ONLY within copy 0's key space for
// dims we keep; customer/supplier/part are scaled so FK joins scale)
val custMax = rd("customer").agg(max("c_custkey")).head.getLong(0) + 1
val suppMax = rd("supplier").agg(max("s_suppkey")).head.getLong(0) + 1
val partMax = rd("part").agg(max("p_partkey")).head.getLong(0) + 1
val ordMax = rd("orders").agg(max("o_orderkey")).head.getLong(0) + 1

rd("region").write.mode("overwrite").parquet(s"$out/region.parquet")
rd("nation").write.mode("overwrite").parquet(s"$out/nation.parquet")

replicate(rd("customer"), Map("c_custkey" -> custMax))
  .write.mode("overwrite").parquet(s"$out/customer.parquet")
replicate(rd("supplier"), Map("s_suppkey" -> suppMax))
  .write.mode("overwrite").parquet(s"$out/supplier.parquet")
replicate(rd("part"), Map("p_partkey" -> partMax))
  .write.mode("overwrite").parquet(s"$out/part.parquet")
replicate(rd("orders"), Map("o_orderkey" -> ordMax, "o_custkey" -> custMax))
  .write.mode("overwrite").parquet(s"$out/orders.parquet")
replicate(rd("lineitem"), Map("l_orderkey" -> ordMax,
  "l_partkey" -> partMax, "l_suppkey" -> suppMax))
  .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

val evUserMax = rd("events").agg(max("user_id")).head.getLong(0) + 1
val evIdMax = rd("events").agg(max("event_id")).head.getLong(0) + 1
replicate(rd("events"), Map("event_id" -> evIdMax, "user_id" -> evUserMax))
  .write.mode("overwrite").parquet(s"$out/events.parquet")

val docMax = rd("documents").agg(max("doc_id")).head.getLong(0) + 1
replicate(rd("documents"), Map("doc_id" -> docMax), textCol = Some("text"))
  .write.mode("overwrite").parquet(s"$out/documents.parquet")

val vecMax = rd("embeddings").agg(max("vec_id")).head.getLong(0) + 1
// perturb replicated embeddings deterministically (copy-indexed epsilon)
val embCopies = (0 until COPIES).map { i =>
  val d = rd("embeddings").withColumn("vec_id", col("vec_id") + lit(vecMax * i))
  if (i == 0) d
  else d.withColumn("embedding",
    transform(col("embedding"),
      x => x + (pmod(col("vec_id"), lit(97)) + lit(i)).cast("float") * lit(1e-4f)))
}
embCopies.reduce(_ unionAll _)
  .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

for (t <- Seq("region","nation","customer","supplier","part","orders",
    "lineitem","events","documents","embeddings"))
  println(s"GEN $t ${spark.read.parquet(s"$out/$t.parquet").count()}")
System.exit(0)
