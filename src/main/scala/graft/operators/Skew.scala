package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting.
  *
  * AQE's skew-join split handles sort-merge joins at runtime, but two
  * shapes still hot-spot a single task at 100 TB:
  *   - hash aggregation on a power-law key (one reducer owns the heavy
  *     key's whole partial stream);
  *   - broadcast-infeasible joins against a skewed build side.
  * Salting splits each heavy key into `buckets` sub-keys: the big side
  * tags rows with a deterministic content-derived salt, the small side
  * is replicated once per salt value, and results compose exactly.
  *
  * The salt is `pmod(xxhash64(content), buckets)` — content-based and
  * deterministic, so retries and recomputations land rows in the same
  * bucket (a `rand()` salt breaks task retry idempotence under
  * speculative execution).
  */
object Skew {

  /** Deterministic salt in [0, buckets) derived from `content`. */
  def saltOf(content: Column, buckets: Int): Column =
    pmod(xxhash64(content), lit(buckets)).cast("int")

  /** Two-phase salted aggregation: count and decimal-exact sum per key.
    * Phase 1 aggregates (key, salt) — the heavy key's stream splits over
    * `buckets` reducers; phase 2 merges the per-salt partials. Exact
    * (longs + decimals), so the result is identical to the direct
    * groupBy on any data. */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: String,
                     saltFrom: Column, buckets: Int = 16): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(30, 2)
    df.withColumn("__salt", saltOf(saltFrom, buckets))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol).cast(dec)).as("__s"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).as("cnt"),
        sum(col("__s")).cast("double").as("sum_v"))
  }

  /** Salted equi-join for a skewed big side: big rows take a
    * content-derived salt; the small side is exploded once per salt
    * value so every (key, salt) bucket finds its match. Row multiset of
    * the output equals the unsalted inner join. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFrom: Column, buckets: Int = 16): DataFrame = {
    val bigS = big.withColumn("__salt", saltOf(saltFrom, buckets))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
