package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a single projection + TakeOrdered,
  * no shuffle of the embedding table beyond the top-k reduction; exact and
  * embarrassingly parallel, the right tool when k·|queries| is small.
  *
  * Scale path: random-hyperplane LSH bucketing — embeddings are hashed to
  * a signature of sign-bits against deterministic pseudo-random
  * hyperplanes; candidate search touches only matching buckets, turning a
  * 100 TB scan per query into a bucket-join. (IVF would need a trained
  * codebook; hyperplane LSH is data-independent and needs no fit step.)
  */
object Similarity {

  /** Cosine similarity between an embedding column and a broadcast-literal
    * query vector (float inputs widened to double). A compact
    * higher-order-function tree: interpreted, but evaluated only on
    * candidate/top-k paths — a flat per-element codegen chain was tried
    * and overflows Janino's 64 KB method limit at dim 64, which silently
    * falls the whole stage back to interpretation anyway. */
  def cosineToQuery(emb: Column, query: Seq[Double]): Column = {
    val q = array(query.map(lit): _*)
    val e = transform(emb, x => x.cast("double"))
    val dot = aggregate(zip_with(e, q, (a, b) => a * b), lit(0.0), _ + _)
    val ne = sqrt(aggregate(transform(e, x => x * x), lit(0.0), _ + _))
    val nq = lit(math.sqrt(query.map(x => x * x).sum))
    dot / (ne * nq)
  }

  /** Pairwise cosine between two embedding columns (same fold order as
    * [[cosineToQuery]]; evaluated on in-bucket candidate pairs only). */
  def cosinePair(a: Column, b: Column, dim: Int): Column = {
    val ea = transform(a, x => x.cast("double"))
    val eb = transform(b, x => x.cast("double"))
    val dot = aggregate(zip_with(ea, eb, (x, y) => x * y), lit(0.0), _ + _)
    val na = sqrt(aggregate(transform(ea, x => x * x), lit(0.0), _ + _))
    val nb = sqrt(aggregate(transform(eb, x => x * x), lit(0.0), _ + _))
    dot / (na * nb)
  }

  /** Exact brute-force top-k by cosine similarity (TakeOrderedAndProject —
    * per-partition top-k then a k-row merge, no global sort). */
  def bruteForceTopK(df: DataFrame, idCol: String, embCol: String,
                     query: Seq[Double], k: Int): DataFrame =
    df.select(col(idCol), cosineToQuery(col(embCol), query).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * the first 4 bytes of md5("p:d") as a uint32, mapped affinely to
    * [-1, 1). md5 — not a JVM hash — so the DuckDB oracle can regenerate
    * the identical planes; the mapping is exact in double arithmetic
    * (32-bit integer scaled by powers of two), so both engines hold
    * bit-identical components. */
  private[graft] def planeComponent(p: Int, d: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p:$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val v = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
      ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
    v.toDouble / 4294967296.0 * 2 - 1
  }

  /** LSH bucket signature: `planes` sign bits packed into a long.
    * Composable Column form (interpreted lambda folds); the full-table
    * scale path is [[withHyperplaneSig]], whose explode→aggregate plan
    * is whole-stage codegen. */
  def hyperplaneSig(emb: Column, dim: Int, planes: Int = 16): Column = {
    val bits = (0 until planes).map { p =>
      val plane = array((0 until dim).map(d => lit(planeComponent(p, d))): _*)
      val dot = aggregate(
        zip_with(transform(emb, x => x.cast("double")), plane, (a, b) => a * b),
        lit(0.0), _ + _)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Signature over a whole table, the 100 TB path: posexplode each
    * embedding to (id, d, x) rows, compute every plane's dot product as
    * a conditional-sum hash aggregate (small codegen expressions — a
    * flat multiply-add chain overflows Janino's 64 KB method limit and
    * de-codegens the stage), then fold sign bits in one projection.
    * A document's element rows stay contiguous in one scan partition,
    * so each sum accumulates in ascending-d order in a single partial —
    * the identical FP order to [[hyperplaneSig]] and the DuckDB oracle.
    *
    * CAVEAT (spill): the single-partial guarantee holds while the hash
    * aggregate keeps a group's accumulator resident. Under memory
    * pressure HashAggregateExec falls back to sort-based aggregation,
    * which can split one group across two partials whose merge
    * re-associates the FP sum — a last-ulp divergence from the ordered
    * fold. Sign bits flip only when a dot product sits within an ulp of
    * 0, so bucket assignment is stable in practice; deployments that
    * need bit-exactness under spill should size
    * `spark.sql.shuffle.partitions` so per-task group state fits (dim
    * doubles per in-flight doc), or collect the elements and fold in
    * order as the pair-verification stage does on its small candidate
    * set. Returns (id, e = original embedding, sig). */
  def withHyperplaneSig(df: DataFrame, idCol: String, embCol: String,
                        dim: Int, planes: Int): DataFrame = {
    val dims = Parallelism.fanOut(df)
      .select(col(idCol).as("id"), col(embCol).as("e"), posexplode(col(embCol)))
    val dots = (0 until planes).map { p =>
      val plane = array((0 until dim).map(d => lit(planeComponent(p, d))): _*)
      sum(col("col").cast("double") * element_at(plane, col("pos") + 1))
        .as(s"__dot$p")
    }
    val sig = (0 until planes)
      .map(p => when(col(s"__dot$p") >= 0, lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    // The L2 norm rides along in the same aggregate (identical ascending-d
    // accumulation order as an ordered fold), so downstream pair scoring
    // pays one dot product per pair instead of re-deriving two norms.
    val nrm = sqrt(sum(col("col").cast("double") * col("col").cast("double")))
    dims.groupBy(col("id"))
      .agg(first(col("e")).as("e"), dots :+ nrm.as("nrm"): _*)
      .select(col("id"), col("e"), col("nrm"), sig.as("sig"))
  }

  /** Index build: embeddings + their materialized LSH signature. At
    * 100 TB this frame is written ONCE, bucketed/partitioned by `__sig`
    * (e.g. `df.write.bucketBy(4096, "__sig")`), so each query's Hamming
    * ball prunes to matching buckets at scan time instead of re-hashing
    * the whole table per query. */
  def buildIndex(df: DataFrame, idCol: String, embCol: String,
                 dim: Int, planes: Int = 12): DataFrame =
    withHyperplaneSig(df, idCol, embCol, dim, planes)
      .select(col("id").as(idCol), col("e").as(embCol), col("sig").as("__sig"))

  /** Multi-table signatures over a whole table — OR-amplification, the
    * standard fix for single-table hyperplane recall on isotropic data
    * (a wider Hamming ball admits most buckets; more independent tables
    * don't). Table t uses global plane indices t·planes+p, so every
    * table hashes with distinct planes, and ALL tables' dot products run
    * in the ONE explode aggregate (same pass, same FP-order guarantees
    * as [[withHyperplaneSig]]). Returns (id, e, nrm, sig0..sig{T-1}). */
  def withHyperplaneSigs(df: DataFrame, idCol: String, embCol: String,
                         dim: Int, planes: Int, tables: Int): DataFrame = {
    val dims = Parallelism.fanOut(df)
      .select(col(idCol).as("id"), col(embCol).as("e"), posexplode(col(embCol)))
    val dots = (0 until tables * planes).map { gp =>
      val plane = array((0 until dim).map(d => lit(planeComponent(gp, d))): _*)
      sum(col("col").cast("double") * element_at(plane, col("pos") + 1))
        .as(s"__dot$gp")
    }
    val nrm = sqrt(sum(col("col").cast("double") * col("col").cast("double")))
    val sigs = (0 until tables).map { t =>
      (0 until planes)
        .map(p => when(col(s"__dot${t * planes + p}") >= 0, lit(1L << p))
          .otherwise(lit(0L)))
        .reduce(_ bitwiseOR _).as(s"sig$t")
    }
    dims.groupBy(col("id"))
      .agg(first(col("e")).as("e"), dots :+ nrm.as("nrm"): _*)
      .select(Seq(col("id"), col("e"), col("nrm")) ++ sigs: _*)
  }

  /** Per-table signatures of a literal query vector. */
  def querySigs(query: Seq[Double], planes: Int, tables: Int): Seq[Long] =
    (0 until tables).map { t =>
      (0 until planes).map { p =>
        val dot = query.indices
          .map(d => query(d) * planeComponent(t * planes + p, d)).sum
        if (dot >= 0) 1L << p else 0L
      }.reduce(_ | _)
    }

  /** Multi-table ANN top-k: a row is a candidate when ANY table's
    * signature exactly matches the query's (classic OR-amplified LSH —
    * each table prunes to one bucket of ~2^-planes of the data); exact
    * cosine reranks candidates only. */
  def multiTableTopK(df: DataFrame, idCol: String, embCol: String,
                     query: Seq[Double], k: Int,
                     planes: Int = 8, tables: Int = 4): DataFrame = {
    val sigs = withHyperplaneSigs(df, idCol, embCol, query.length, planes, tables)
    val qs = querySigs(query, planes, tables)
    val anyMatch = (0 until tables)
      .map(t => col(s"sig$t") === lit(qs(t)))
      .reduce(_ || _)
    sigs.filter(anyMatch)
      .select(col("id").as(idCol),
        cosineToQuery(col("e"), query).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Signature of a literal query vector (same planes as buildIndex). */
  def querySig(query: Seq[Double], planes: Int = 12): Long =
    (0 until planes).map { p =>
      val dot = query.indices.map(d => query(d) * planeComponent(p, d)).sum
      if (dot >= 0) 1L << p else 0L
    }.reduce(_ | _)

  /** Query stage against a built index: Hamming-ball filter on the
    * materialized signature, exact cosine only on survivors. */
  def queryIndex(index: DataFrame, idCol: String, embCol: String,
                 query: Seq[Double], k: Int, planes: Int = 12,
                 maxHammingDist: Int = 2): DataFrame =
    index
      .filter(bit_count(col("__sig").bitwiseXOR(lit(querySig(query, planes))))
        <= maxHammingDist)
      .select(col(idCol), cosineToQuery(col(embCol), query).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)

  /** ANN top-k via LSH: build + query in one shot (the one-off path;
    * recall is tunable via planes/maxHammingDist — candidates shrink
    * ~2^-planes per extra plane). */
  def lshTopK(df: DataFrame, idCol: String, embCol: String,
              query: Seq[Double], k: Int, planes: Int = 12,
              maxHammingDist: Int = 2): DataFrame =
    queryIndex(buildIndex(df, idCol, embCol, query.length, planes),
      idCol, embCol, query, k, planes, maxHammingDist)

  /** All-pairs near-duplicate detection by embedding cosine within LSH
    * buckets (bucket equi-join, verified exactly). `maxBucket` caps
    * per-bucket membership — one degenerate bucket (e.g. the all-zeros
    * region) would otherwise go quadratic at scale; capped buckets are
    * dropped, trading recall for a bounded candidate count (same policy
    * as Dedup.minhashPairs). */
  def cosineNearDupPairs(df: DataFrame, idCol: String, embCol: String,
                         dim: Int, planes: Int = 12,
                         threshold: Double = 0.95,
                         maxBucket: Int = 1000): DataFrame = {
    val sigAll = withHyperplaneSig(df, idCol, embCol, dim, planes)
    val small = sigAll.groupBy(col("sig"))
      .agg(count(lit(1)).as("__n")).filter(col("__n") <= maxBucket)
      .select(col("sig"))
    val sig = sigAll.join(broadcast(small), Seq("sig"))
    val a = sig.select(col("sig"), col("id").as("id_a"), col("e").as("e_a"),
      col("nrm").as("nrm_a"))
    val b = sig.select(col("sig"), col("id").as("id_b"), col("e").as("e_b"),
      col("nrm").as("nrm_b"))
    // Per-pair scoring, whole-stage codegen: zip the two embeddings,
    // explode to (pair, d, x_a, x_b) rows, and hash-aggregate the dot
    // product. A pair's element rows are contiguous in one partition,
    // so each sum accumulates in ascending-d order in a single partial —
    // the same FP order as an ordered fold (and the DuckDB oracle).
    // The norms were aggregated once per vector in the signature pass.
    // Same spill caveat as withHyperplaneSig: a sort-agg fallback could
    // re-associate a pair's sum; the candidate set is bucket-capped
    // (≤ maxBucket² pairs × dim rows per task), so partials fit.
    val pairs = a.join(b, Seq("sig")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("nrm_a"), col("nrm_b"),
        posexplode(arrays_zip(col("e_a"), col("e_b"))))
    pairs
      .groupBy(col("id_a"), col("id_b"), col("nrm_a"), col("nrm_b"))
      .agg(sum(col("col.e_a").cast("double") * col("col.e_b").cast("double"))
        .as("__dot"))
      .withColumn("cos_sim", col("__dot") / (col("nrm_a") * col("nrm_b")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos_sim"), 6).as("cos_sim"))
  }
}
