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

  /** Salted equi-join for a skewed LEFT side: salt the big side's rows by
    * content hash, REPLICATE every right-side row across all `salts`
    * values (explode of a literal range — right is the small/dimension
    * side), and join on (key, salt). A hot left key spreads over `salts`
    * reducers instead of pinning one. Semantics are exactly the plain
    * equi-join's (proved by ScaleUtilsSpec); use when broadcast is too big
    * and AQE's runtime splitting isn't available (e.g. streaming
    * micro-batches, where AQE is disabled).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      salts: Int = 32): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(salts)))
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedLeft.join(replicatedRight, Seq(key, "_salt")).drop("_salt")
  }
}
