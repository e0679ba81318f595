package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: stage anatomy of q_chain_recall (r15 regression hunt). */
object ProfileCR {
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
    import graft.operators.Dedup
    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"[cr] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    val d = Tables(spark, sfDir, "documents")
    time("unionPairs")(Dedup.unionPairs(d, "doc_id", "text", "lang",
      threshold = 0.5))
    time("minhashSortedCandidates")(Dedup.minhashSortedCandidates(
      d, "doc_id", "text", 8, 4, 3, fastHash = false))
    time("minhashSortedPairs")(Dedup.minhashSortedPairs(
      d, "doc_id", "text", threshold = 0.5))
    val sp = Dedup.minhashSortedPairs(d, "doc_id", "text", threshold = 0.5)
    time("star CC over sp")(Dedup.connectedComponentsStar(sp))
    time("full q_chain_recall")(
      graft.queries.Extras.queries("q_chain_recall")(spark, sfDir))
    time("full q_chain_recall again")(
      graft.queries.Extras.queries("q_chain_recall")(spark, sfDir))
    spark.stop()
  }
}
