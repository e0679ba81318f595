package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage profiler: times sub-pipelines of the heavy operators so
  * optimization targets are measured, not guessed (not part of the driver
  * contract; run via `sbt "runMain graft.ProfileMain"`). */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosConf._1, Tables.nanosConf._2)
      .config(Tables.aqeMinPartitionConf._1, Tables.aqeMinPartitionConf._2)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(df: => DataFrame): Unit = {
      df.write.mode("overwrite").format("noop").save() // warm
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

    import graft.operators.{Dedup, Parallelism}
    val docs = Tables(spark, sfDir, "documents")
    println(s"[profile] documents rows = ${docs.count()}")

    val fanned = Parallelism.fanOut(docs)
    // Stage 1+2: shingle rows → base hash → 16 min-aggs
    val toksOnly = fanned
      .select(col("doc_id").as("id"),
        graft.operators.TextOps.normWords(col("text")).as("ws"))
      .select(col("id"), col("ws"), posexplode(col("ws")))
    time("words+posexplode")(toksOnly.select(col("id"), col("col")))
    val sh = toksOnly
      .filter(col("pos") + 3 <= size(col("ws")) ||
        (size(col("ws")) < 3 && col("pos") === 0))
      .select(col("id"), concat_ws(" ",
        Seq(col("col")) ++ (1 until 3).map(j => get(col("ws"), col("pos") + j)): _*).as("shingle"))
    time("  +shingle concat")(sh)
    val hashed = sh.select(col("id"),
      conv(substring(md5(col("shingle")), 1, 8), 16, 10).cast("long").as("__h"))
    time("  +md5 basehash")(hashed)
    val coeffs = Dedup.minhashCoeffs(16)
    val sig = hashed.groupBy(col("id")).agg(
      min(Dedup.minhashTerm(col("__h"), coeffs(0)._1, coeffs(0)._2)).as("mh0"),
      (1 until 16).map { s =>
        val (a, b) = coeffs(s)
        min(Dedup.minhashTerm(col("__h"), a, b)).as(s"mh$s")
      }: _*)
    time("  +16 min-aggs (sig)")(sig)
    time("full minhashPairs")(Dedup.minhashPairs(docs, "doc_id", "text"))

    // ——— q_rolling_skew_kurt stage anatomy ———
    import org.apache.spark.sql.expressions.Window
    val li = Tables(spark, sfDir, "lineitem")
    val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
      col("l_partkey"))
    val wPart = Window.partitionBy(col("l_suppkey")).orderBy(order: _*)
    val wRun = wPart.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val x = col("l_quantity")
    val xl = x.cast("long")
    val base = li.select(col("l_suppkey"), col("l_orderkey"),
      col("l_linenumber"), col("l_partkey"), x, col("l_shipdate"))
    time("skb: scan+select")(base)
    val cums = base
      .withColumn("__rn", row_number().over(wPart))
      .withColumn("__c1", sum(xl).over(wRun))
      .withColumn("__c2", sum(xl * xl).over(wRun))
      .withColumn("__c3", sum(xl * xl * xl).over(wRun))
      .withColumn("__c4", sum(xl * xl * xl * xl).over(wRun))
    time("skb: +5 window cums")(cums)
    val lagged = cums
      .withColumn("__l1", lag(col("__c1"), 6).over(wPart))
      .withColumn("__l2", lag(col("__c2"), 6).over(wPart))
      .withColumn("__l3", lag(col("__c3"), 6).over(wPart))
      .withColumn("__l4", lag(col("__c4"), 6).over(wPart))
    time("skb: +4 lags")(lagged)
    time("skb: full query no sort")(
      graft.queries.Rolling.queries("q_rolling_skew_kurt")(spark, sfDir)
        .sortWithinPartitions(col("l_suppkey")))
    time("skb: full query")(
      graft.queries.Rolling.queries("q_rolling_skew_kurt")(spark, sfDir))
    spark.stop()
  }
}
