package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys (SURVEY.md §7.4 "100 TB
  * posture"). AQE's skew-join handling covers sort-merge joins at runtime;
  * these cover the aggregation side, where one hot key would otherwise pin
  * a single reducer.
  */
object Skew {

  /** Two-stage salted sum: groupBy (key, salt) partial sums, then groupBy
    * key. Algebraic aggregates only (sum/count/min/max) — the partial
    * stage must commute with the final one. `salts` bounds the fan-out;
    * at 1000 executors a hot key with salts=32 spreads over 32 reducers.
    * The salt hashes the ROW CONTENT (not monotonically_increasing_id,
    * which shifts across retries/partitioning) so the float summation
    * grouping — and thus the rounded result — is fully deterministic.
    */
  def saltedSum(
      df: DataFrame,
      key: String,
      valueCol: String,
      salts: Int = 32,
      out: String = "sum"): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(salts)))
    salted
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(out))
  }

  /** Salted distinct-count via two-stage exact dedup (the salt spreads the
    * shuffle of a hot key's values; the second stage is tiny).
    */
  def saltedCountDistinct(
      df: DataFrame,
      key: String,
      valueCol: String,
      salts: Int = 32,
      out: String = "n_distinct"): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(col(valueCol)), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(collect_set(col(valueCol)).as("_vals"))
      .groupBy(col(key))
      .agg(sum(size(col("_vals"))).cast("long").as(out))
}
