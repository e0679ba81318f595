package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Design for 100 TB:
  *  - exact dedup is a single hash-shuffle on a 128-bit digest (never on
  *    the full text);
  *  - MinHash/LSH turns all-pairs similarity into an equi-join on
  *    (band, bandHash) — the only shuffle key — so cost is driven by
  *    bucket sizes, not |D|²;
  *  - candidate verification re-checks true Jaccard only inside buckets.
  * All signature computation is a pure projection over the scan
  * (higher-order functions, no UDFs, no driver-side loops).
  */
object Dedup {

  /** Normalized word array. */
  private def words(text: Column): Column =
    split(trim(regexp_replace(lower(text), "[^a-z0-9\\s]", " ")), "\\s+")

  /** Word w-shingles as an array of strings (empty-safe). */
  def shingles(text: Column, w: Int = 3): Column = {
    val ws = words(text)
    when(size(ws) < w, array(concat_ws(" ", ws)))
      .otherwise(transform(sequence(lit(0), size(ws) - w),
        i => concat_ws(" ", slice(ws, i + 1, lit(w)))))
  }

  /** k 64-bit MinHash values of the shingle set (seeded xxhash64). */
  def minhashSig(text: Column, k: Int = 16, w: Int = 3): Column = {
    val sh = array_distinct(shingles(text, w))
    array((0 until k).map { seed =>
      array_min(transform(sh, s => xxhash64(lit(seed), s)))
    }: _*)
  }

  /** Exact dedup: keep the lowest-id row per exact content digest.
    * Returns (keyCol, kept id, duplicate count). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_md5"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** MinHash-LSH near-duplicate candidate pairs with Jaccard verification.
    *
    * @param bands    number of LSH bands (k % bands == 0)
    * @param threshold verified word-shingle Jaccard similarity cut
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 16, bands: Int = 4, w: Int = 3,
                   threshold: Double = 0.7): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val sig = df.select(col(idCol).as("id"),
      array_distinct(shingles(col(textCol), w)).as("sh"),
      minhashSig(col(textCol), k, w).as("sig"))

    // band rows: (band index, hash of the band's r minhash slots)
    val banded = sig.select(col("id"), col("sh"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * r + 1, lit(r))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")

    val l = banded.select(col("band"), col("bh"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val rgt = banded.select(col("band"), col("bh"),
      col("id").as("id_b"), col("sh").as("sh_b"))

    val cand = l.join(rgt, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .distinct()

    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val union = size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    cand.withColumn("jaccard", inter / union)
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash of the word multiset: per bit, sign of Σ±1 over token
    * hashes. Hamming-close simhashes ⇒ near-duplicate texts. */
  def simhash64(text: Column, bits: Int = 64): Column = {
    val hs = transform(words(text), wd => xxhash64(wd))
    (0 until bits).map { b =>
      val bitSum = aggregate(hs, lit(0),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1)
          .otherwise(-1))
      when(bitSum > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** n-gram Jaccard dedup without LSH: blocks by (lang, length bucket) and
    * verifies all pairs inside a block. Right for modest block sizes;
    * use [[minhashPairs]] when blocks get large. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        langCol: String, w: Int = 3,
                        threshold: Double = 0.5): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(langCol).as("lang"),
      (length(col(textCol)) / 100).cast("int").as("lenb"),
      array_distinct(shingles(col(textCol), w)).as("sh"))
    val a = base.select(col("lang"), col("lenb"), col("id").as("id_a"),
      col("sh").as("sh_a"))
    val b = base.select(col("lang"), col("lenb"), col("id").as("id_b"),
      col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val union = size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    a.join(b, Seq("lang", "lenb")).filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", inter / union)
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
