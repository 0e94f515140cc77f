package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable last-write-wins merge — the engine's upsert sink primitive
  * (reference: INSERT ... ON DUPLICATE KEY UPDATE,
  * /root/reference/src/utils/data_utils.py:10-15, and INSERT IGNORE,
  * /root/reference/src/validator_withdrawals_handler.py:21).
  *
  * Batch precedence is explicit so re-runs are idempotent (SURVEY.md
  * §7.5#6). At scale: one shuffle on the primary key; write the result
  * partitioned by the same key for idempotent overwrite-by-partition.
  */
object MergeSink {

  /** Last-write-wins upsert of `updates` into `base` on `keys`: an updates
    * row beats a base row with the same key. If either side itself carries
    * several rows per key, the winner among them is picked by descending
    * order of the non-key columns — arbitrary but DETERMINISTIC, so
    * re-runs always converge to the same row (the idempotency contract,
    * SURVEY.md §7.5#6).
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = base.columns.toSeq
    val tagged = base.select(cols.map(col): _*).withColumn("_src", lit(0))
      .unionByName(updates.select(cols.map(col): _*).withColumn("_src", lit(1)))
    // Only orderable column types participate directly in the tie-break (a
    // map column would fail analysis); a JSON rendering of the non-key
    // columns is appended as the final tie-break so the pick stays
    // deterministic even when NO column is orderable.
    val orderable = base.schema.fields.filter(f =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType))
      .map(_.name).toSet
    val nonKey = cols.filterNot(keys.contains)
    // keys-only frames need no tie-break: duplicate rows are identical.
    val tieBreak =
      if (nonKey.isEmpty) Nil
      else nonKey.filter(orderable).map(c => col(c).desc) :+
        to_json(struct(nonKey.map(col): _*)).desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_src").desc +: tieBreak: _*)
    tagged
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select(cols.map(col): _*)
  }

  /** INSERT IGNORE: keep every base row; append only updates whose key is
    * absent from base.
    */
  def insertIfAbsent(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = base.columns.toSeq
    base.unionByName(
      updates.select(cols.map(col): _*)
        .join(base.select(keys.map(col): _*).distinct(), keys, "left_anti"))
  }

  /** Idempotent overwrite-by-partition write: with dynamic partition
    * overwrite, re-running a batch replaces exactly the partitions it
    * produces and leaves the rest of the table untouched — the parquet
    * analog of the reference's PK upsert commit. `partitionCol` should be
    * the natural batch key (a date / epoch-bucket column).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)
}
