package graft.operators

import org.apache.spark.sql.DataFrame

/** Guard against under-parallelized scans feeding compute-heavy stages.
  *
  * A small parquet file arrives as ONE scan partition (it is below
  * `spark.sql.files.maxPartitionBytes`), so a per-row-expensive stage
  * (shingle explode + hashing, 64-dim dot products) runs on one core no
  * matter how many the session has. At production scale inputs are
  * thousands of splits and this helper is a no-op — the round-robin
  * shuffle (which costs ~dataset size) happens ONLY when the input has
  * fewer partitions than the session has cores, i.e. exactly when the
  * data is small enough that the shuffle is cheap and the parallelism
  * win dominates.
  */
object Parallelism {
  def fanOut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // Estimate scan splits from file metadata (a few FS stat calls) —
    // df.rdd.getNumPartitions would be exact but forces full physical
    // planning + codegen of the subtree, which costs seconds of driver
    // time. ≥ target files always yields ≥ target splits; fewer, larger
    // files still split at maxPartitionBytes granularity.
    val files = df.inputFiles
    val under =
      if (files.length >= target) false
      else if (files.nonEmpty) {
        // byteStringAsBytes handles every conf spelling ("128m",
        // "134217728b", plain digits); manual suffix-stripping threw on
        // anything but the canonical "…b" form.
        val mpb = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
          spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
        val fs = new org.apache.hadoop.fs.Path(files.head)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val splits = files.map { f =>
          val len = fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen
          math.max(1L, (len + mpb - 1) / mpb)
        }.sum
        splits < target
      } else df.rdd.getNumPartitions < target
    if (under) df.repartition(target) else df
  }
}
