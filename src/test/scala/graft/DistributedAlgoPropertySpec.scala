package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Dedup, GlobalOrder, Skew}

/** The iterative/two-phase distributed algorithms vs sequential
  * references on generated inputs: min-label propagation vs union-find,
  * the two-pass exact quantile vs a sorted-pick lerp, and the salted
  * two-phase aggregation vs the direct groupBy it must equal. */
class DistributedAlgoPropertySpec extends SparkSpecBase {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(31L + i)))

  test("connectedComponents equals sequential union-find on random graphs") {
    val graphs: Seq[List[(Long, Long)]] = samples(for {
      n <- Gen.chooseNum(2, 24)
      m <- Gen.chooseNum(1, 30)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0L, n.toLong)
        b <- Gen.chooseNum(0L, n.toLong) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield es.distinct, 6).filter(_.nonEmpty)

    for (edges <- graphs) {
      val schema = StructType(Seq(
        StructField("id_a", LongType, nullable = false),
        StructField("id_b", LongType, nullable = false)))
      val pairs = spark.createDataFrame(
        spark.sparkContext.parallelize(
          edges.map { case (a, b) => Row(a, b) }, 3), schema)
      val got = Dedup.connectedComponents(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      // sequential union-find with min-id labels
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      for ((a, b) <- edges) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(x => x -> find(x)).toMap
      assert(got == want, s"edges=$edges")
    }
  }

  test("minhash family: passes select independent argmin shingles") {
    // Regression guard for the r12 family fix: the old
    // (a·h + b) mod 2^61−1 family over unreduced 32-bit hashes was
    // ORDER-PRESERVING whenever a < 2^29 (the modulus never wrapped),
    // so those passes all selected the same argmin shingle — pass
    // "independence" was an illusion and a 4th sorted pass added zero
    // candidates. Over Z_(2^31−1) with h reduced first, two distinct
    // passes should agree on a doc's argmin only ≈ 1/|doc| of the
    // time. Pure-JVM replica of minhashTerm's exact arithmetic.
    val coeffs = Dedup.minhashCoeffs(8)
    val rnd = new scala.util.Random(7)
    val docs = Seq.fill(200)(Set.fill(30)(rnd.nextLong().abs % (1L << 32)))
    def argmin(doc: Set[Long], a: Long, b: Long): Long =
      doc.minBy(h => (a * (h % Dedup.MinhashP) + b) % Dedup.MinhashP)
    for (i <- coeffs.indices; j <- coeffs.indices if i < j) {
      val agree = docs.count(d =>
        argmin(d, coeffs(i)._1, coeffs(i)._2) ==
          argmin(d, coeffs(j)._1, coeffs(j)._2))
      // expected ≈ 200/30 ≈ 7; the broken family scored 200 for any
      // order-preserving pair — fail anywhere near that
      assert(agree < 50, s"passes $i,$j agree on $agree/200 argmins — " +
        "the permutation family has lost pass independence")
    }
  }

  test("connectedComponents auto-escalates to star on >maxIter-diameter chains") {
    // a 30-edge path has diameter 30 > maxIter=20: label propagation
    // alone would return unconverged (silently wrong) labels — the r11
    // escalation must hand the graph to star contraction and come back
    // with the exact min-id labeling (everything -> 0)
    val edges = (0L until 30L).sliding(2).map(s => (s(0), s(1))).toList
    val schema = StructType(Seq(
      StructField("id_a", LongType, nullable = false),
      StructField("id_b", LongType, nullable = false)))
    val pairs = spark.createDataFrame(
      spark.sparkContext.parallelize(
        edges.map { case (a, b) => Row(a, b) }, 3), schema)
    Dedup.drainCcRuns() // discard records from earlier tests
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (0L until 30L).map(_ -> 0L).toMap
    assert(got == want)
    // r12 observability: the escalation is RECORDED, not silent — one
    // labelprop run flagged escalated at the round budget, then the
    // star run that produced the labels
    val runs = Dedup.drainCcRuns().map(_._2)
    assert(runs.exists(r => r.algo == "labelprop" && r.escalated &&
      r.rounds == 20), s"runs=$runs")
    assert(runs.exists(r => r.algo == "star" && !r.escalated), s"runs=$runs")
  }

  test("large-star/small-star CC equals union-find, including path graphs") {
    // a 40-node path is the adversarial case: label propagation needs
    // 40 rounds, star contraction O(log 40)
    val path = (0L until 40L).sliding(2).map(s => (s(0), s(1))).toList
    val graphs = path :: samples(for {
      n <- Gen.chooseNum(2, 24)
      m <- Gen.chooseNum(1, 30)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0L, n.toLong)
        b <- Gen.chooseNum(0L, n.toLong) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield es.distinct, 5).filter(_.nonEmpty).toList

    for (edges <- graphs) {
      val schema = StructType(Seq(
        StructField("id_a", LongType, nullable = false),
        StructField("id_b", LongType, nullable = false)))
      val pairs = spark.createDataFrame(
        spark.sparkContext.parallelize(
          edges.map { case (a, b) => Row(a, b) }, 3), schema)
      val got = Dedup.connectedComponentsStar(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      for ((a, b) <- edges) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(x => x -> find(x)).toMap
      assert(got == want, s"edges=$edges")
    }
  }

  test("exactQuantiles equals a sequential sorted-pick lerp") {
    val lists: Seq[List[Int]] = samples(
      Gen.listOf(Gen.chooseNum(-1000, 1000)), 6).filter(_.size >= 2)
    val qs = Seq("q10" -> 0.1, "q25" -> 0.25, "q50" -> 0.5,
      "q75" -> 0.75, "q99" -> 0.99)
    for (xs <- lists) {
      val schema = StructType(Seq(StructField("v", DoubleType, nullable = false)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(xs.map(x => Row(x.toDouble)), 4), schema)
      val row = GlobalOrder.exactQuantiles(df, col("v"), qs).collect()(0)
      val sorted = xs.sorted.map(_.toDouble)
      for (((name, q), idx) <- qs.zipWithIndex) {
        val k = (sorted.size - 1).toDouble * q
        val lo = sorted(math.floor(k).toInt)
        val hi = sorted(math.ceil(k).toInt)
        val want = lo + (hi - lo) * (k - math.floor(k))
        assert(row.getDouble(idx) == want, s"$name over n=${xs.size}")
      }
    }
  }

  test("salted two-phase aggregation equals the direct groupBy exactly") {
    // skewed generator: ~60% of rows land on one hot key
    val rows: Seq[(String, Double)] = samples(Gen.listOfN(80, for {
      hot <- Gen.frequency(3 -> Gen.const("hot"), 2 -> Gen.oneOf("a", "b", "c"))
      v <- Gen.chooseNum(-10000, 10000)
    } yield (hot, v / 100.0)), 4).flatten
    val schema = StructType(Seq(
      StructField("k", StringType, nullable = false),
      StructField("v", DoubleType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, v) => Row(k, v) }, 5),
      schema)
    val salted = Skew.saltedSumCount(df, "k", "v", col("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val dec = DecimalType(30, 2)
    val direct = df.groupBy(col("k"))
      .agg(count(lit(1)).as("cnt"), sum(col("v").cast(dec)).cast("double").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted == direct, s"salted=$salted direct=$direct")
  }
}
