package graft

import org.apache.spark.sql.functions._

import graft.queries.{Rolling, SeriesExtra, TrainPrep}

/** Invariants for the training-mixture tier + the ewm/quantile-bound
  * additions — oracle-independent checks (the DuckDB gate pins values;
  * these pin the semantics that hold on ANY data). */
class TrainPrepSpec extends SparkSpecBase {

  test("domain mixture: epochs contiguous, count within floor/ceil of weight") {
    val df = TrainPrep.queries("q_domain_mixture")(spark, sf)
    val perDoc = df.groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n"), min(col("epoch")).as("mn"),
        max(col("epoch")).as("mx"))
    // epochs are exactly 1..n per doc
    assert(perDoc.filter(col("mn") =!= 1 || col("mx") =!= col("n")).count() === 0)
    // every doc repeats floor(w) or floor(w)+1 times for its source
    // weight (fractional-epoch rule); w integral ⇒ exactly w
    val weights = Map("src0" -> 2.5, "src1" -> 1.25, "src2" -> 0.75,
      "src3" -> 1.5, "src4" -> 0.25, "src5" -> 1.0, "src6" -> 2.0,
      "src7" -> 0.5, "src8" -> 1.75, "src9" -> 0.125)
    val bad = perDoc.collect().filter { r =>
      val w = weights(r.getAs[String]("source"))
      val n = r.getAs[Long]("n")
      n < math.floor(w).toLong.max(0L) || n > math.floor(w).toLong + 1 ||
        (w == math.floor(w) && n != w.toLong)
    }
    assert(bad.isEmpty, bad.take(3).mkString(", "))
    // per-source totals land near n_docs · w (binomial coin; loose 3σ)
    val docs = Tables(spark, sf, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("nd")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("nd")).toMap
    val tot = df.groupBy(col("source")).agg(count(lit(1)).as("nm")).collect()
    tot.foreach { r =>
      val src = r.getAs[String]("source")
      val nd = docs(src).toDouble
      val exp = nd * weights(src)
      val sd = math.sqrt(nd * 0.25) * 3 + 1e-9
      assert(math.abs(r.getAs[Long]("nm") - exp) <= sd,
        s"$src: ${r.getAs[Long]("nm")} vs $exp ± $sd")
    }
  }

  test("shard assign: partitions the corpus, chars consistent") {
    val df = TrainPrep.queries("q_shard_assign")(spark, sf).collect()
    val nDocs = Tables(spark, sf, "documents").count()
    val nChars = Tables(spark, sf, "documents")
      .agg(sum(col("n_chars"))).collect()(0).getLong(0)
    assert(df.map(_.getAs[Long]("n_docs")).sum === nDocs)
    assert(df.map(_.getAs[Long]("n_chars_total")).sum === nChars)
    assert(df.forall(r => (0 until 16).contains(r.getAs[Long]("shard").toInt)))
  }

  test("vocab coverage: monotone in k, bounded by 1") {
    val r = TrainPrep.queries("q_vocab_coverage")(spark, sf).collect()(0)
    val (c10, c100, c1000) = (r.getAs[Double]("cov10"),
      r.getAs[Double]("cov100"), r.getAs[Double]("cov1000"))
    assert(c10 > 0 && c10 <= c100 && c100 <= c1000 && c1000 <= 1.0)
    // 1000 types ≥ the whole vocab ⇒ full coverage at the tail
    if (r.getAs[Long]("n_vocab") <= 1000) assert(c1000 === 1.0)
  }

  test("heavy hitters: all above threshold, counts match a direct count") {
    val hh = TrainPrep.queries("q_heavy_hitters")(spark, sf)
    val toks = Tables(spark, sf, "documents")
      .select(explode(graft.operators.TextOps.normWords(col("text"))).as("w"))
    val tot = toks.count()
    val rows = hh.collect()
    assert(rows.nonEmpty) // stopword-dense synthetic corpus has hitters
    rows.foreach { r =>
      assert(r.getAs[Long]("n") * 200 > tot)
      val direct = toks.filter(col("w") === r.getAs[String]("word")).count()
      assert(direct === r.getAs[Long]("n"))
    }
  }

  test("oov rate: zero when vocab covers everything, bounded in [0,1]") {
    val df = TrainPrep.queries("q_oov_rate")(spark, sf)
    assert(df.filter(col("oov_rate") < 0 || col("oov_rate") > 1).count() === 0)
    // n_tok matches a direct per-doc token count
    val direct = Tables(spark, sf, "documents")
      .select(col("doc_id"),
        size(graft.operators.TextOps.normWords(col("text"))).cast("long")
          .as("n_direct"))
    val joined = df.join(direct, Seq("doc_id"))
    assert(joined.filter(col("n_tok") =!= col("n_direct")).count() === 0)
    // sf0.001's vocab is under 1000 types ⇒ nothing is OOV; if it is
    // larger the rates must still average well under the tail mass
    val vocabN = Tables(spark, sf, "documents")
      .select(explode(graft.operators.TextOps.normWords(col("text"))).as("w"))
      .select(col("w")).distinct().count()
    if (vocabN <= 1000)
      assert(df.filter(col("oov_rate") =!= 0.0).count() === 0)
  }

  test("length histogram: buckets are bit-lengths, totals add up") {
    val df = TrainPrep.queries("q_length_histogram")(spark, sf).collect()
    val nDocs = Tables(spark, sf, "documents").count()
    assert(df.map(_.getAs[Long]("n_docs")).sum === nDocs)
    // bucket b covers [2^(b-1), 2^b): a doc count in bucket b implies
    // its token total fits the bucket bounds
    df.filter(_.getAs[Long]("bucket") > 0).foreach { r =>
      val b = r.getAs[Long]("bucket")
      val lo = 1L << (b - 1)
      val hi = (1L << b) - 1
      val nd = r.getAs[Long]("n_docs")
      val tt = r.getAs[Long]("n_tok_total")
      assert(tt >= nd * lo && tt <= nd * hi, s"bucket $b: $tt vs [$lo,$hi]×$nd")
    }
  }

  test("zipf check: rank contiguous 1..20, freqs non-increasing") {
    val rows = TrainPrep.queries("q_zipf_check")(spark, sf).collect()
      .sortBy(_.getAs[Long]("rank"))
    assert(rows.map(_.getAs[Long]("rank")).toSeq ===
      (1L to rows.length.toLong))
    val freqs = rows.map(_.getAs[Long]("freq"))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b })
    rows.foreach(r => assert(r.getAs[Long]("rank_freq") ===
      r.getAs[Long]("rank") * r.getAs[Long]("freq")))
  }

  test("ngram novelty in [0,1]; exact duplicate docs score zero") {
    val df = graft.queries.Extras.queries("q_ngram_novelty")(spark, sf)
      .localCheckpoint(true)
    assert(df.filter(col("novelty") < 0 || col("novelty") > 1).count() === 0)
    // exact duplicate texts share every bigram with their twin ⇒ 0
    val dups = Tables(spark, sf, "documents")
      .groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("c"), min(col("doc_id")).as("doc_id"))
      .filter(col("c") > 1).select(col("doc_id"))
    val bad = df.join(dups, Seq("doc_id")).filter(col("novelty") > 0)
    assert(bad.count() === 0)
  }

  test("value spikes: top-10 by absolute delta, internally consistent") {
    val rows = graft.queries.EventAnalytics.queries("q_value_spikes")(spark, sf)
      .collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("total") - r.getAs[Double]("prev") -
        r.getAs[Double]("delta")) < 1e-5)
    }
    val deltas = rows.map(r => math.abs(r.getAs[Double]("delta")))
    assert(deltas.zip(deltas.tail).forall { case (a, b) => a >= b })
  }

  test("mixture report agrees with the exploded mixture") {
    val rep = TrainPrep.queries("q_mixture_report")(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_mixture")).toMap
    val mix = TrainPrep.queries("q_domain_mixture")(spark, sf)
      .groupBy(col("source")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n")).toMap
    // sources whose docs all drew zero repeats are absent from the
    // exploded mixture but present (n_mixture = 0) in the report
    rep.foreach { case (s0, n) => assert(mix.getOrElse(s0, 0L) === n, s0) }
  }

  test("groupby entropy: bounded by ln(n_langs), zero iff monoculture") {
    val rows = TrainPrep.queries("q_groupby_entropy")(spark, sf).collect()
    rows.foreach { r =>
      val e = r.getAs[Double]("lang_entropy")
      val k = r.getAs[Long]("n_langs")
      assert(e >= 0.0 && e <= math.log(k.toDouble) + 1e-6,
        s"${r.getAs[String]("source")}: $e vs ln($k)")
      assert((e == 0.0) == (k == 1L))
    }
  }

  test("tokenizer fertility >= 1 (a word is at least one bpe token)") {
    val df = TrainPrep.queries("q_tokenizer_fertility")(spark, sf)
    assert(df.filter(col("fertility") < 1.0).count() === 0)
    assert(df.filter(col("n_bpe") < col("n_ws")).count() === 0)
  }

  test("dataset card: totals consistent with direct counts") {
    val r = TrainPrep.queries("q_dataset_card")(spark, sf).collect()(0)
    val d = Tables(spark, sf, "documents")
    assert(r.getAs[Long]("n_docs") === d.count())
    assert(r.getAs[Long]("n_langs") ===
      d.select(col("lang")).distinct().count())
    val dup = r.getAs[Double]("dup_rate")
    assert(dup >= 0.0 && dup < 1.0)
    assert(r.getAs[Double]("mean_doc_tokens") > 0.0)
  }

  test("char entropy: bounded by ln(36), maximal only under diversity") {
    val df = TrainPrep.queries("q_char_entropy")(spark, sf)
      .localCheckpoint(true)
    val cap = math.log(36.0) + 1e-9
    assert(df.filter(col("entropy") < 0 || col("entropy") > cap)
      .count() === 0)
    // zero entropy ⟺ the normalized text has at most one distinct char
    val distinctChars = Tables(spark, sf, "documents")
      .select(col("doc_id"), size(array_distinct(split(
        regexp_replace(lower(col("text")), "[^a-z0-9]", ""), "")))
        .as("nd"))
    val joined = df.join(distinctChars, Seq("doc_id"))
    assert(joined.filter(col("entropy") === 0.0 && col("nd") > 2)
      .count() === 0) // split("") may yield an empty-string element
    assert(joined.filter(col("entropy") > 0.0 && col("nd") <= 1)
      .count() === 0)
  }

  test("ks test: statistic in [0,1], zero against itself") {
    val r = graft.queries.EventAnalytics.queries("q_ks_test")(spark, sf)
      .collect()(0)
    val d = r.getAs[Double]("d_stat")
    assert(d >= 0.0 && d <= 1.0)
    assert(r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0)
  }

  test("feature hash: buckets bounded, counts total the token stream") {
    val df = TrainPrep.queries("q_feature_hash")(spark, sf)
    assert(df.filter(col("bucket") < 0 || col("bucket") > 63).count() === 0)
    val tokens = Tables(spark, sf, "documents")
      .select(explode(graft.operators.TextOps.normWords(col("text"))))
      .count()
    assert(df.agg(sum(col("n"))).collect()(0).getLong(0) === tokens)
  }

  test("balanced sample: every class keeps exactly the minority count") {
    val df = TrainPrep.queries("q_sample_balanced")(spark, sf)
    val minN = Tables(spark, sf, "documents")
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .agg(min(col("n"))).collect()(0).getLong(0)
    val per = df.groupBy(col("lang")).agg(count(lit(1)).as("n")).collect()
    assert(per.nonEmpty && per.forall(_.getAs[Long]("n") === minN))
  }

  test("neardup sweep: counts monotone decreasing in the threshold") {
    val r = graft.queries.Extras.queries("q_neardup_sweep")(spark, sf)
      .collect()(0)
    val ns = Seq("n_030", "n_040", "n_050", "n_070").map(r.getAs[Long])
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    // the 0.30 count is exactly the q_emb_neardup pair count
    val direct = graft.queries.Extras.queries("q_emb_neardup")(spark, sf)
      .count()
    assert(ns.head === direct)
  }

  test("ewm var/std: null head, non-negative, std = sqrt(var)") {
    val df = Rolling.queries("q_ewm_var")(spark, sf)
    // exactly the single-observation head of each suppkey partition has
    // no variance (pandas NaN ≡ null here) — order-independent check:
    // one null per key (the output drops the shipdate order column)
    val nullsPerKey = df.groupBy(col("l_suppkey"))
      .agg(sum(when(col("ewm_var").isNull, 1L).otherwise(0L)).as("nn"))
    assert(nullsPerKey.filter(col("nn") =!= 1).count() === 0)
    assert(df.filter(col("ewm_var") < 0).count() === 0)
    val mism = df.filter(col("ewm_var").isNotNull &&
      abs(sqrt(col("ewm_var")) - col("ewm_std")) > 1e-12).count()
    assert(mism === 0)
  }

  test("winsorize: bounds are data values, clip preserves row count") {
    val li = Tables(spark, sf, "lineitem")
    val df = SeriesExtra.queries("q_winsorize")(spark, sf)
    assert(df.count() === li.count())
    val prices = li.select(col("l_extendedprice")).distinct()
      .collect().map(_.getDouble(0)).toSet
    val winsVals = df.select(col("wins")).distinct().collect()
      .map(_.getDouble(0))
    // every output value is an actual price (nearest-rank bounds are
    // data values; clipped rows take one of them)
    assert(winsVals.forall(prices.contains))
    // clipping is monotone: min/max of wins are within the raw range
    val (rawMin, rawMax) = {
      val r = li.agg(min(col("l_extendedprice")), max(col("l_extendedprice")))
        .collect()(0)
      (r.getDouble(0), r.getDouble(1))
    }
    val r2 = df.agg(min(col("wins")), max(col("wins"))).collect()(0)
    assert(r2.getDouble(0) >= rawMin && r2.getDouble(1) <= rawMax)
  }

  test("outlier iqr: counts partition the table") {
    val r = SeriesExtra.queries("q_outlier_iqr")(spark, sf).collect()(0)
    val n = Tables(spark, sf, "lineitem").count()
    assert(r.getAs[Long]("n_lo") + r.getAs[Long]("n_hi") +
      r.getAs[Long]("n_in") === n)
    assert(r.getAs[Double]("fence_lo") < r.getAs[Double]("fence_hi"))
  }
}
