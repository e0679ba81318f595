package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Oracle-checked query inventory.
  *
  * Each module contributes `queries` (Spark implementations, one per
  * operator from SURVEY.md §2) and `oracle` (ANSI SQL the driver runs in
  * DuckDB over the same parquet tables). Contract (driver):
  *   - column names must match between the two sides;
  *   - results are hash-compared, so every query ends in a deterministic
  *     total ORDER BY and derived floats are computed by IEEE-deterministic
  *     expression shapes (see graft.functions decimal-sum helpers).
  */
package object queries {
  type Q = (SparkSession, String) => DataFrame
}
