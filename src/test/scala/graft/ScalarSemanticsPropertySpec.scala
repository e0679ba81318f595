package graft

import java.time.LocalDate

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** String pad family and datetime field extraction vs JVM sequential
  * references on generated values — the pandas-parity compositions
  * (center's asymmetric split, zfill, quarter/day-of-year math) are
  * re-derived naively and compared. */
class ScalarSemanticsPropertySpec extends SparkSpecBase {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(47L + i)))

  test("ljust/rjust/zfill/center match pandas pad definitions") {
    val strs = (Seq("", "a", "ab", "abc") ++ samples(for {
      n <- Gen.chooseNum(0, 14)
      cs <- Gen.listOfN(n, Gen.alphaNumChar)
    } yield cs.mkString, 30)).distinct
    val w = 10
    val schema = StructType(Seq(StructField("s", StringType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(strs.map(Row(_)), 3), schema)
    val len = length(col("s"))
    val padTotal = greatest(lit(w) - len, lit(0))
    // the q_str_pad composition: Spark lpad/rpad TRUNCATE past the
    // width, pandas never does — the len guard restores pandas parity
    def noTrunc(padded: org.apache.spark.sql.Column) =
      when(len >= w, col("s")).otherwise(padded)
    val got = df.select(col("s"),
        noTrunc(rpad(col("s"), w, " ")).as("lj"),
        noTrunc(lpad(col("s"), w, " ")).as("rj"),
        noTrunc(lpad(col("s"), w, "0")).as("zf"),
        noTrunc(rpad(lpad(col("s"), (len + floor(padTotal / 2)).cast("int"),
          lit(" ")), lit(w), lit(" "))).as("ce"))
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getString(3), r.getString(4))).toMap
    for (s <- strs) {
      val (lj, rj, zf, ce) = got(s)
      val pad = math.max(w - s.length, 0)
      assert(lj == s + " " * pad, s"ljust '$s'")
      assert(rj == " " * pad + s, s"rjust '$s'")
      assert(zf == "0" * pad + s, s"zfill '$s'")
      // pandas str.center: left pad = floor(pad/2), right gets the rest
      assert(ce == " " * (pad / 2) + s + " " * (pad - pad / 2),
        s"center '$s': '$ce'")
    }
  }

  test("datetime fields match java.time on generated dates") {
    val dates = samples(Gen.chooseNum(-10000L, 20000L), 50)
      .map(LocalDate.ofEpochDay).distinct
    val schema = StructType(Seq(StructField("d", DateType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        dates.map(d => Row(java.sql.Date.valueOf(d))), 3), schema)
    val got = df.select(col("d"),
        year(col("d")).as("y"), month(col("d")).as("m"),
        dayofmonth(col("d")).as("dom"), quarter(col("d")).as("q"),
        dayofyear(col("d")).as("doy"), weekday(col("d")).as("wd"),
        datediff(col("d"), lit("1992-01-01").cast("date")).as("dd"))
      .collect().map(r => r.getDate(0).toLocalDate ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5),
          r.getInt(6), r.getInt(7))).toMap
    val epoch = LocalDate.parse("1992-01-01")
    for (d <- dates) {
      val (y, m, dom, q, doy, wd, dd) = got(d)
      assert(y == d.getYear && m == d.getMonthValue && dom == d.getDayOfMonth, s"$d")
      assert(q == (d.getMonthValue - 1) / 3 + 1, s"quarter $d")
      assert(doy == d.getDayOfYear, s"doy $d")
      // pandas dt.weekday: Monday=0 — Spark's weekday() matches
      assert(wd == d.getDayOfWeek.getValue - 1, s"weekday $d")
      assert(dd == java.time.temporal.ChronoUnit.DAYS.between(epoch, d), s"datediff $d")
    }
  }

  test("date_trunc to month and 30-day arithmetic match java.time") {
    val dates = samples(Gen.chooseNum(0L, 20000L), 40)
      .map(LocalDate.ofEpochDay).distinct
    val schema = StructType(Seq(StructField("d", DateType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        dates.map(d => Row(java.sql.Date.valueOf(d))), 3), schema)
    val got = df.select(col("d"),
        date_trunc("month", col("d")).cast("date").as("mo"),
        date_add(col("d"), 30).as("p30"))
      .collect().map(r => r.getDate(0).toLocalDate ->
        (r.getDate(1).toLocalDate, r.getDate(2).toLocalDate)).toMap
    for (d <- dates) {
      val (mo, p30) = got(d)
      assert(mo == d.withDayOfMonth(1), s"trunc $d")
      assert(p30 == d.plusDays(30), s"date_add $d")
    }
  }
}
