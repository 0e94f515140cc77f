package graft.ops

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered / window operators (SURVEY.md §2.5, OP-36..OP-42) expressed
  * over the `events` fixture: user_id = key, day-bucket of ts = epoch,
  * sum(value) = balance. One shuffle by user_id; all windows share the
  * (user_id, epoch) sort so Catalyst plans a single exchange.
  */
object WindowOps {

  /** Discrete epoch = days since unix epoch. Both engines floor positive
    * seconds, so parity with the DuckDB oracle is exact.
    */
  private val dayEpoch = floor(unix_timestamp(col("ts")) / 86400L)

  /** events → (user_id, epoch, balance, withdrawal): the Validator_Balances
    * + withdrawals-map analog (SURVEY.md §1.4). Sums are canonicalized to 6
    * decimals so float aggregation order cannot diverge from the oracle.
    */
  def balancesFromEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), dayEpoch.as("epoch"))
      .agg(
        round(sum(col("value")), IncomeKernel.Scale).as("balance"),
        round(sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0)),
          IncomeKernel.Scale).as("withdrawal"))

  /** OP-36 lag-difference delta over ordered per-key series
    * (reference: /root/reference/src/utils/financials.py:11-16).
    */
  def op36LagDelta(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("epoch")
    balancesFromEvents(spark, dir)
      .withColumn("delta", round(col("balance") - lag(col("balance"), 1).over(w), IncomeKernel.Scale))
      .select("user_id", "epoch", "balance", "delta")
      .orderBy("user_id", "epoch")
  }

  /** OP-37 conditional sums of deltas: earnings = Σ positive deltas,
    * losses = Σ -negative deltas, per key
    * (reference: /root/reference/src/utils/financials.py:19-34).
    */
  def op37DeltaSplitSums(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("epoch")
    balancesFromEvents(spark, dir)
      .withColumn("_d", round(col("balance") - lag(col("balance"), 1).over(w), IncomeKernel.Scale))
      .groupBy("user_id")
      .agg(
        round(sum(when(col("_d") > 0, col("_d")).otherwise(0.0)), IncomeKernel.Scale).as("earnings"),
        round(sum(when(col("_d") < 0, -col("_d")).otherwise(0.0)), IncomeKernel.Scale).as("losses"))
      .orderBy("user_id")
  }

  /** OP-38 flagship: cumulative earnings/losses with withdrawal adjustment,
    * gap cutoff, and APR — see [[IncomeKernel.cumulativeIncome]].
    */
  def op38CumulativeIncome(spark: SparkSession, dir: String): DataFrame =
    IncomeKernel.cumulativeIncome(balancesFromEvents(spark, dir))
      .orderBy("user_id", "epoch")

  /** Shared oracle CTE mirroring [[balancesFromEvents]] for DuckDB. */
  private val balCte =
    """WITH bal AS (
      |  SELECT user_id,
      |         CAST(floor(date_part('epoch', ts)/86400) AS BIGINT) AS epoch,
      |         round(sum(value), 6) AS balance,
      |         round(sum(CASE WHEN event_type='purchase' THEN value ELSE 0 END), 6) AS withdrawal
      |  FROM events GROUP BY 1, 2
      |)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "op36_lag_delta" -> (op36LagDelta _),
    "op37_delta_split_sums" -> (op37DeltaSplitSums _),
    "op38_cumulative_income" -> (op38CumulativeIncome _))

  val oracles: Map[String, String] = Map(
    "op36_lag_delta" ->
      s"""$balCte
         |SELECT user_id, epoch, balance,
         |       round(balance - lag(balance) OVER (PARTITION BY user_id ORDER BY epoch), 6) AS delta
         |FROM bal ORDER BY user_id, epoch""".stripMargin,
    "op37_delta_split_sums" ->
      s"""$balCte, d AS (
         |  SELECT user_id,
         |         round(balance - lag(balance) OVER (PARTITION BY user_id ORDER BY epoch), 6) AS d
         |  FROM bal)
         |SELECT user_id,
         |       round(sum(CASE WHEN d > 0 THEN d ELSE 0 END), 6) AS earnings,
         |       round(sum(CASE WHEN d < 0 THEN -d ELSE 0 END), 6) AS losses
         |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin,
    "op38_cumulative_income" ->
      s"""$balCte, d AS (
         |  SELECT user_id, epoch, balance,
         |         lag(balance) OVER w AS prev_bal,
         |         lag(withdrawal) OVER w AS prev_wd,
         |         lag(epoch) OVER w AS prev_epoch
         |  FROM bal WINDOW w AS (PARTITION BY user_id ORDER BY epoch)
         |), d2 AS (
         |  SELECT user_id, epoch,
         |         round(balance + prev_wd - prev_bal, 6) AS delta,
         |         min(CASE WHEN epoch - prev_epoch > 1 THEN epoch END)
         |           OVER (PARTITION BY user_id) AS gap_epoch
         |  FROM d
         |), c AS (
         |  SELECT user_id, epoch,
         |         round(sum(CASE WHEN delta > 0 THEN delta ELSE 0 END) OVER cw, 6) AS earnings,
         |         round(sum(CASE WHEN delta < 0 THEN -delta ELSE 0 END) OVER cw, 6) AS losses,
         |         CAST(row_number() OVER (PARTITION BY user_id ORDER BY epoch) - 1 AS BIGINT) AS epochs_since_active
         |  FROM d2 WHERE gap_epoch IS NULL OR epoch < gap_epoch
         |  WINDOW cw AS (PARTITION BY user_id ORDER BY epoch
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |)
         |SELECT user_id, epoch, earnings, losses,
         |       round(CASE WHEN epochs_since_active > 0
         |                  THEN earnings * 82179.45 / (CAST(epochs_since_active AS DOUBLE) * 2400000.0)
         |                  ELSE 0 END, 6) AS apr,
         |       epochs_since_active
         |FROM c ORDER BY user_id, epoch""".stripMargin)
}
