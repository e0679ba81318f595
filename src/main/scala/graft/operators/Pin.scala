package graft.operators

import org.apache.spark.sql.DataFrame

/** Frame pinning: materialize a DataFrame eagerly, once, so every
  * downstream branch reads the same blocks — same contents AND the same
  * partition identity (`spark_partition_id()` agrees across branches,
  * the property [[GlobalOrder]]'s offset composition depends on).
  *
  * Two modes, selected by `spark.graft.reliableCheckpoint`:
  *
  *  - `false` (default — local / single-JVM runs): `localCheckpoint
  *    (eager)`. Tungsten-resident executor blocks, zero extra I/O. The
  *    trade: lineage is truncated onto non-replicated executor blocks,
  *    so on a multi-executor cluster one lost executor fails the job
  *    instead of recomputing — a near-certain event per long job at
  *    thousand-executor scale. Exactly right for local[n], where the
  *    only executor is the driver itself.
  *
  *  - `true` (cluster runs): `checkpoint(eager)` against the reliable
  *    checkpoint directory (`spark.checkpoint.dir` — HDFS / object
  *    store on a real cluster). Survives executor loss: partitions are
  *    re-read from durable storage, never recomputed through lost
  *    lineage. Costs one write + read of the pinned frame — callers
  *    always project/pre-aggregate before pinning, so what is written
  *    is keys + needed values (or a metadata-sized summary), not the
  *    raw table.
  *
  * Both modes materialize the RDD's partitions 1:1, so every plan built
  * on the pin — offsets, rank joins, loop severing — is identical; a
  * spec asserts bit-identical results mode-to-mode.
  */
object Pin {
  val FLAG = "spark.graft.reliableCheckpoint"

  def apply(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get(FLAG, "false").toBoolean)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  implicit class PinOps(private val df: DataFrame) extends AnyVal {
    /** [[Pin.apply]] as postfix syntax — the drop-in spelling for what
      * used to be `.localCheckpoint(true)`. */
    def pinned: DataFrame = Pin(df)
  }
}
