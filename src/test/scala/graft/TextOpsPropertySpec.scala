package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.TextOps

/** TextOps Column pipelines vs straightforward sequential definitions
  * on generated text. The Column forms are compositions of when/trim/
  * split/regexp guards whose edge cases (empty, blank, punct-only,
  * adjacent stopwords) are exactly what a refactor breaks — each op is
  * re-derived here the naive way and compared on arbitrary strings. */
class TextOpsPropertySpec extends SparkSpecBase {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  private val word = Gen.oneOf("the", "Fox", "jumps", "over", "a", "Dog",
    "42", "e.g", "UTF", "naive", "and", "of", "x1")
  private val sep = Gen.oneOf(" ", "  ", "\t", "\n", " , ", "! ", "; ")
  private val texts: Seq[String] =
    Seq("", " ", "\t\n", ".,!?", "the", " the and of ") ++
      samples(for {
        n <- Gen.chooseNum(1, 12)
        ws <- Gen.listOfN(n, word)
        ss <- Gen.listOfN(n, sep)
      } yield ws.zip(ss).map { case (w, s) => w + s }.mkString, 40)

  private lazy val df = {
    val schema = StructType(Seq(StructField("t", StringType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(texts.map(Row(_)), 3), schema)
  }

  private def run(c: org.apache.spark.sql.Column): Map[String, Any] =
    df.select(col("t"), c.as("v")).collect()
      .map(r => r.getString(0) -> r.get(1)).toMap

  private def seqTokens(t: String): Seq[String] =
    if (t.trim.isEmpty) Seq("") else t.trim.split("\\s+").toSeq

  test("tokenCount == whitespace-split count, 0 for blank") {
    val got = run(TextOps.tokenCount(col("t")))
    for (t <- texts) {
      val want = if (t.trim.isEmpty) 0 else t.trim.split("\\s+").length
      assert(got(t) == want, s"'$t'")
    }
  }

  test("normWords lowercases, strips punctuation, never yields an empty-mid token") {
    val got = df.select(col("t"), TextOps.normWords(col("t")).as("v"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    for (t <- texts) {
      val want = t.toLowerCase.replaceAll("[^a-z0-9\\s]", " ")
        .trim.split("\\s+").toSeq
      assert(got(t) == want, s"'$t': ${got(t)} vs $want")
      assert(got(t).forall(w => w.isEmpty || w.matches("[a-z0-9]+")))
    }
  }

  test("punctRatio == counted ratio, in [0,1]") {
    val got = run(TextOps.punctRatio(col("t")))
    for (t <- texts) {
      val p = t.count(ch => ".,!?;:'\"()[]-".contains(ch))
      val want = p.toDouble / math.max(t.length, 1)
      assert(got(t) == want, s"'$t'")
      assert(want >= 0 && want <= 1)
    }
  }

  test("stopwordRatio counts adjacent stopwords and caps denominator at 1") {
    val got = run(TextOps.stopwordRatio(col("t")))
    val pat = ("(?:^|\\s)(?:" +
      TextOps.enStopwords.map(java.util.regex.Pattern.quote).mkString("|") +
      ")(?=\\s|$)").r
    for (t <- texts) {
      val low = t.toLowerCase
      val hits = pat.findAllMatchIn(low.trim).size
      val want = hits.toDouble / math.max(seqTokens(low).size, 1)
      assert(got(t) == want, s"'$t': ${got(t)} vs $want")
    }
  }

  test("meanTokenLen == non-whitespace chars over token count") {
    val got = run(TextOps.meanTokenLen(col("t")))
    for (t <- texts) {
      val chars = t.trim.replaceAll("\\s+", "").length
      val want = chars.toDouble / math.max(seqTokens(t).size, 1)
      assert(got(t) == want, s"'$t'")
    }
  }

  test("bpeTokenCount == sequential lexeme-class match count") {
    val got = run(TextOps.bpeTokenCount(col("t")))
    val pat = TextOps.bpeTokenPattern.r
    for (t <- texts)
      assert(got(t) == pat.findAllIn(t).size, s"'$t'")
  }

  test("qualityScore3 is the sum of its three rule bits") {
    val got = run(TextOps.qualityScore3(col("t")))
    val punct = run(TextOps.punctRatio(col("t")))
    val stop = run(TextOps.stopwordRatio(col("t")))
    for (t <- texts) {
      val want = (if (t.length >= 50 && t.length <= 5000) 1 else 0) +
        (if (stop(t).asInstanceOf[Double] > 0.05) 1 else 0) +
        (if (punct(t).asInstanceOf[Double] < 0.2) 1 else 0)
      assert(got(t) == want, s"'$t'")
    }
  }

  test("langId is deterministic and marker-dominant text wins") {
    val labeled = Seq(
      "the cat and the dog of the house" -> "en",
      "le chat et la maison de un ami" -> "fr",
      "el gato y la casa de un amigo" -> "es",
      "der hund und die katze ist ein tier" -> "de")
    val schema = StructType(Seq(StructField("t", StringType, nullable = false)))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(labeled.map(p => Row(p._1)), 2), schema)
    val got = d.select(col("t"), TextOps.langId(col("t")).as("v"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for ((t, want) <- labeled) assert(got(t) == want, s"'$t'")
  }
}
