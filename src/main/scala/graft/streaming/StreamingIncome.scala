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
  * by StreamingIncomeSpec against the batch kernel.
  *
  * Scale posture: state is ~40 bytes/key in the state store, keys are
  * hash-partitioned, and each micro-batch touches only arriving keys.
  */
object StreamingIncome {

  case class BalanceRow(user_id: Long, epoch: Long, balance: Double, withdrawal: Double)

  case class IncomeState(
      lastEpoch: Long, lastBalance: Double, lastWithdrawal: Double,
      earnings: Double, losses: Double, epochs: Long, halted: Boolean)

  case class IncomeUpdate(
      user_id: Long, epoch: Long, earnings: Double, losses: Double,
      apr: Double, epochs_since_active: Long)

  private def r6(x: Double): Double =
    // valueOf (decimal string repr) mirrors Spark's round() exactly;
    // new BigDecimal(double) would round the binary expansion instead.
    java.math.BigDecimal.valueOf(x)
      .setScale(IncomeKernel.Scale, java.math.RoundingMode.HALF_UP).doubleValue()

  private def apr(earnings: Double, epochs: Long): Double =
    if (epochs > 0) r6(earnings * IncomeKernel.EpochsPerYear / (epochs.toDouble * 2400000.0))
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
      IncomeState(Long.MinValue, 0.0, 0.0, 0.0, 0.0, -1L, halted = false))
    val out = Seq.newBuilder[IncomeUpdate]
    sorted.foreach { r =>
      if (!st.halted && r.epoch > st.lastEpoch) {
        if (st.epochs >= 0 && r.epoch - st.lastEpoch > 1) {
          // First gap: the reference prints "Backfiller Needed" and stops.
          st = st.copy(halted = true)
        } else {
          val (earn, loss) =
            if (st.epochs < 0) (0.0, 0.0) // cold start: first observed epoch
            else {
              val delta = r6(r.balance + st.lastWithdrawal - st.lastBalance)
              (r6(st.earnings + math.max(0.0, delta)),
                r6(st.losses + math.max(0.0, -delta)))
            }
          val epochs = st.epochs + 1
          st = IncomeState(r.epoch, r.balance, r.withdrawal, earn, loss, epochs,
            halted = false)
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
}
