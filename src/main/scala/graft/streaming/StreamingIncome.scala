package graft.streaming

import graft.ops.IncomeKernel
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming restatement of the reference's incremental income
  * loop (SURVEY.md §2.9): the poll-every-6-minutes Lambda + runner-table
  * high-water mark becomes flatMapGroupsWithState — per-key state carries
  * (last epoch, last balance, cumulative earnings/losses), exactly the
  * state the reference reads back from MySQL each invocation
  * (/root/reference/src/validator_income_handler.py:29-39,171-191).
  *
  * Semantics match [[graft.ops.IncomeKernel]] batch-for-batch (same 6-dp
  * canonicalization, same withdrawal-at-lower-epoch indexing, same halt at
  * the first epoch gap > 1, the reference's "Backfiller Needed") — verified
  * by StreamingIncomeSpec against the batch kernel. Unlike the batch kernel
  * (which recomputes from scratch and so heals gaps implicitly), the
  * streaming halt parks per-key state at the high-water mark and RESUMES
  * when the backfilled contiguous epoch (lastEpoch + 1) arrives, converging
  * the two paths after a backfill.
  *
  * Scale posture: state is ~40 bytes/key in the state store, keys are
  * hash-partitioned, and each micro-batch touches only arriving keys.
  */
object StreamingIncome {

  case class BalanceRow(user_id: Long, epoch: Long, balance: Double, withdrawal: Double)

  // No explicit "halted" flag: a gap-halted key is simply one whose state
  // is parked at the high-water mark — the guard below re-derives it from
  // (arriving epoch - lastEpoch) every delivery, so carrying a flag in
  // every key's state-store entry would be write-only dead weight.
  case class IncomeState(
      lastEpoch: Long, lastBalance: Double, lastWithdrawal: Double,
      earnings: Double, losses: Double, epochs: Long)

  case class IncomeUpdate(
      user_id: Long, epoch: Long, earnings: Double, losses: Double,
      apr: Double, epochs_since_active: Long)

  private def r6(x: Double): Double =
    // valueOf (decimal string repr) mirrors Spark's round() exactly;
    // new BigDecimal(double) would round the binary expansion instead.
    java.math.BigDecimal.valueOf(x)
      .setScale(IncomeKernel.Scale, java.math.RoundingMode.HALF_UP).doubleValue()

  private def apr(earnings: Double, epochs: Long): Double =
    if (epochs > 0) r6(earnings * IncomeKernel.EpochsPerYear / (epochs.toDouble * IncomeKernel.AprDenom))
    else 0.0

  /** Fold newly-arrived (ordered) balance rows for one key into the
    * carried state, emitting one income row per consumed epoch.
    */
  def updateKey(
      userId: Long,
      rows: Iterator[BalanceRow],
      state: GroupState[IncomeState]): Iterator[IncomeUpdate] = {
    val sorted = rows.toSeq.sortBy(_.epoch)
    var st = state.getOption.getOrElse(
      IncomeState(Long.MinValue, 0.0, 0.0, 0.0, 0.0, -1L))
    val out = Seq.newBuilder[IncomeUpdate]
    sorted.foreach { r =>
      if (r.epoch > st.lastEpoch) {
        val coldStart = st.epochs < 0
        if (!coldStart && r.epoch - st.lastEpoch > 1) {
          // Gap: the reference prints "Backfiller Needed" and stops consuming
          // (validator_income_handler.py:109-111). The gapped row is NOT
          // consumed; state parks at the high-water mark. The halt is
          // RECOVERABLE: the reference's poll loop re-reads from the mark
          // each invocation and heals once the backfiller fills the gap —
          // here, a later delivery of epoch == lastEpoch + 1 resumes
          // processing (the gapped epochs themselves must be re-delivered
          // by the backfill, as the reference re-reads them from storage).
        } else {
          val (earn, loss) =
            if (coldStart) (0.0, 0.0) // cold start: first observed epoch
            else {
              val delta = r6(r.balance + st.lastWithdrawal - st.lastBalance)
              (r6(st.earnings + math.max(0.0, delta)),
                r6(st.losses + math.max(0.0, -delta)))
            }
          val epochs = st.epochs + 1
          st = IncomeState(r.epoch, r.balance, r.withdrawal, earn, loss, epochs)
          out += IncomeUpdate(userId, r.epoch, earn, loss, apr(earn, epochs), epochs)
        }
      }
    }
    state.update(st)
    out.result().iterator
  }

  /** Streaming income over a (possibly unbounded) balance stream. */
  def incomeStream(balances: Dataset[BalanceRow]): Dataset[IncomeUpdate] = {
    import balances.sparkSession.implicits._
    balances
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(updateKey)
  }

  /** Day-windowed per-key volume with a watermark — the streaming analog of
    * the daily APR rollup cron (reference: /root/reference/src/apr_sync_handler.py).
    */
  def dailyVolume(spark: SparkSession, events: Dataset[_]): Dataset[_] =
    events.toDF()
      .withWatermark("ts", "2 days")
      .groupBy(window(col("ts"), "1 day").as("day"), col("user_id"))
      .agg(round(sum(col("value")), IncomeKernel.Scale).as("volume"))
      .select(col("day.start").as("day_start"), col("user_id"), col("volume"))

  /** readStream -> transform -> writeStream over the landed parquet
    * directory: the full file-source pipeline (new files arriving in
    * `srcDir` are picked up by the checkpointed file index; with
    * Trigger.AvailableNow the same pipeline doubles as an incremental
    * batch job — exactly the reference's poll-loop semantics).
    *
    * Cumulative income CANNOT be derived from a micro-batch in isolation
    * (a later batch would cold-start mid-series and miss gaps), so each
    * batch (1) lands its unrounded per-(user, epoch) PARTIAL sums keyed by
    * batch_id into a bucketed store — replays overwrite their own partials,
    * making the sink idempotent under at-least-once delivery — then
    * (2) recomputes income from the merged history of only the touched
    * buckets and overwrites those income partitions. At scale the bucket
    * count bounds rewrite amplification; untouched buckets are never read
    * or written.
    */
  def incomeFilePipeline(
      spark: SparkSession,
      srcDir: String,
      outPath: String,
      checkpointDir: String,
      buckets: Int = 16): org.apache.spark.sql.streaming.StreamingQuery = {
    val balancesPath = s"$outPath/balances"
    val incomePath = s"$outPath/income"
    val stream = spark.readStream
      .schema(graft.model.Tables.eventsRawSchema)
      .option("pathGlobFilter", "*.parquet")
      // One file per micro-batch: the reference's bounded-work-per-run
      // semantics (<=10 epochs per invocation), and it exercises the
      // incremental merge path even under Trigger.AvailableNow.
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .withColumn("ts", expr("timestamp_micros(ts)"))
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // UNROUNDED per-batch partial sums keyed by (user, epoch, batch_id):
        // - raw partials keep the merged view equal to the batch path
        //   (rounding happens once, after cross-batch summation);
        // - the batch_id key makes replays idempotent — a replayed batch
        //   overwrites ITS OWN prior partials instead of double-counting.
        val newPartials = batch
          .groupBy(col("user_id"),
            floor(unix_timestamp(col("ts")) / 86400L).as("epoch"))
          .agg(
            sum(col("value")).as("balance"),
            sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0))
              .as("withdrawal"))
          .withColumn("batch_id", lit(batchId))
          .withColumn("bucket", pmod(col("user_id"), lit(buckets)))
        // Resolve the filesystem FROM the path (the default FS may differ
        // from outPath's scheme). Only a genuinely absent store means
        // "first batch" — any other read failure must propagate, not
        // silently wipe history.
        val balancesHPath = new org.apache.hadoop.fs.Path(balancesPath)
        val fs = balancesHPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val existing =
          if (fs.exists(balancesHPath))
            spark.read.parquet(balancesPath)
              .selectExpr("user_id", "epoch", "balance", "withdrawal",
                "batch_id", "CAST(bucket AS BIGINT) AS bucket")
              .where(col("batch_id") =!= batchId) // drop a replayed batch's old partials
              // Batches < batchId are checkpoint-committed and can never
              // replay, so their partials compact into one row per cell
              // (batch_id = -1): the store stays O(cells), not O(batches),
              // and per-batch rewrite work stays bounded.
              .groupBy("user_id", "epoch", "bucket")
              .agg(sum(col("balance")).as("balance"),
                sum(col("withdrawal")).as("withdrawal"))
              .withColumn("batch_id", lit(-1L))
              .select("user_id", "epoch", "balance", "withdrawal", "batch_id", "bucket")
          else newPartials.limit(0)
        val touched = newPartials.select("bucket").distinct()
        // Stage before touching balancesPath: a plan may never read from a
        // path it is overwriting (cache eviction would re-read half-written
        // state).
        val stagingPath = s"$outPath/_staging"
        existing.unionByName(newPartials)
          .join(broadcast(touched), Seq("bucket"), "left_semi")
          .write.mode("overwrite").parquet(stagingPath)
        val staged = spark.read.parquet(stagingPath)
        graft.ops.MergeSink.writePartitioned(staged, balancesPath, "bucket")
        val mergedBalances = staged
          .groupBy("user_id", "epoch")
          .agg(round(sum(col("balance")), IncomeKernel.Scale).as("balance"),
            round(sum(col("withdrawal")), IncomeKernel.Scale).as("withdrawal"))
        val income = IncomeKernel.cumulativeIncome(mergedBalances)
          .withColumn("bucket", pmod(col("user_id"), lit(buckets)))
        graft.ops.MergeSink.writePartitioned(income, incomePath, "bucket")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }
}
