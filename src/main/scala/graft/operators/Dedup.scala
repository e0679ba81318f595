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

  /** k 64-bit MinHash values of the shingle set (seeded xxhash64).
    *
    * NOTE: `text` should be a plain (already materialized) column, not a
    * derived expression — Catalyst's projection collapse would otherwise
    * inline the argument's expression tree into each of the k lambdas and
    * evaluate it k times per row. [[minhashPairs]] inserts an explicit
    * shuffle barrier for exactly this reason. */
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
    * 100 TB shape (each stage's shuffle carries the minimum possible,
    * and — critically — the hot path contains NO higher-order functions:
    * `transform`/`slice`/`array_min` are CodegenFallback in Spark and an
    * interpreted shingle tree measured 330s at sf0.1 vs ~3s for this plan):
    *  1. the word array (plain codegen `split`) is exploded with position;
    *     a w-shingle is identified by the codegen tuple-hash
    *     xxhash64(seed, word_i, …, word_{i+w-1}) — banding only needs a
    *     deterministic hash of the shingle, never the joined string;
    *  2. the k minhashes are k `min(...)` hash aggregates over the token
    *     rows — whole-stage codegen, and map-side partial aggregation
    *     means the only shuffle carries (id, k longs) per doc;
    *  3. band hash = xxhash64 of the band's r minhash columns — a plain
    *     projection; candidate generation self-joins (band, bandHash, id)
    *     rows ONLY and dedups on the (id_a, id_b) pair;
    *  4. degenerate buckets (empty/boilerplate docs hashing together) are
    *     capped at `maxBucket` members before the self-join, bounding the
    *     worst bucket at maxBucket² instead of |D|²;
    *  5. exact string-shingle Jaccard is verified only for docs that
    *     appear in some candidate pair (semi-join first), so the
    *     interpreted array ops run on hundreds of rows, not |D|.
    *
    * @param bands     number of LSH bands (k % bands == 0)
    * @param threshold verified word-shingle Jaccard similarity cut
    * @param maxBucket per-(band, bandHash) membership cap; a bucket larger
    *                  than this is boilerplate, not near-duplication, and
    *                  is dropped from candidate generation (logged in the
    *                  reference pipelines as "tombstoned buckets")
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 16, bands: Int = 4, w: Int = 3,
                   threshold: Double = 0.7, maxBucket: Int = 200): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands

    // Stage 1: (id, word, pos) token rows; shingle start positions are
    // pos ≤ n−w, plus pos = 0 for short docs (whole doc as one shingle,
    // mirroring `shingles`; xxhash64 skips the null tail words). Every
    // doc yields ≥1 row (split of "" is [""]), so no id is lost.
    val toks = df
      .select(col(idCol).as("id"), words(col(textCol)).as("ws"))
      .select(col("id"), col("ws"), posexplode(col("ws")))
      .filter(col("pos") + w <= size(col("ws")) ||
        (size(col("ws")) < w && col("pos") === 0))
    def shingleHash(seed: Int): Column =
      xxhash64(Seq(lit(seed), col("col")) ++
        (1 until w).map(j => element_at(col("ws"), col("pos") + j + 1)): _*)
    val sig = toks.groupBy(col("id")).agg(
      min(shingleHash(0)).as("mh0"),
      (1 until k).map(seed => min(shingleHash(seed)).as(s"mh$seed")): _*)

    // Stage 2: one row per (id, band, bandHash); ids only from here on.
    val bandHashes = array((0 until bands).map { b =>
      xxhash64((b * r until (b + 1) * r).map(s => col(s"mh$s")): _*)
    }: _*)
    val banded = sig.select(col("id"), posexplode(bandHashes))
      .select(col("id"), col("pos").as("band"), col("col").as("bh"))

    // Stage 3+4: cap degenerate buckets, then self-join ids within buckets.
    val okBuckets = banded.groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n").between(2, maxBucket))
      .select(col("band"), col("bh"))
    val member = banded.join(okBuckets, Seq("band", "bh"))
    val cand = member.select(col("band"), col("bh"), col("id").as("id_a"))
      .join(member.select(col("band"), col("bh"), col("id").as("id_b")),
        Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()

    // Stage 5: exact string-shingle Jaccard, but only for docs that made
    // it into a candidate pair — the (interpreted) shingle-array tree is
    // evaluated on the semi-joined subset, not the full corpus.
    val candIds = cand.select(col("id_a").as("cid"))
      .union(cand.select(col("id_b").as("cid"))).distinct()
    val candSh = df
      .join(broadcast(candIds), col(idCol) === col("cid"), "left_semi")
      .select(col(idCol).as("id"),
        array_distinct(shingles(col(textCol), w)).as("sh"))
    val verified = cand
      .join(candSh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(candSh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val union = size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    verified.withColumn("jaccard", inter / union)
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash of the word multiset: per bit, sign of Σ±1 over token
    * hashes. Hamming-close simhashes ⇒ near-duplicate texts.
    *
    * Single pass over the token array: the per-bit counters live in one
    * accumulator array folded by `aggregate`, so the (regexp-heavy) word
    * split and the token hashes are evaluated once per row — not once per
    * bit, which is what a naive per-bit reduce would cost after Catalyst
    * inlines the argument tree into all 64 bit expressions. */
  def simhash64(text: Column, bits: Int = 64): Column = {
    val hs = transform(words(text), wd => xxhash64(wd))
    val masks = array((0 until bits).map(b => lit(1L << b)): _*)
    val sums = aggregate(hs, array_repeat(lit(0), bits),
      (acc, h) => zip_with(acc, masks, (a, m) =>
        a + when(h.bitwiseAND(m) =!= 0, 1).otherwise(-1)))
    aggregate(
      zip_with(sums, masks, (s, m) => when(s > 0, m).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
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
