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

  /** OP-39 APR scalar from cumulative state — pure column arithmetic
    * (reference: /root/reference/src/utils/financials.py:4-9).
    */
  def op39AprScalar(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("epoch")
    balancesFromEvents(spark, dir)
      .withColumn("_d", round(col("balance") - lag(col("balance"), 1).over(w), IncomeKernel.Scale))
      .groupBy("user_id")
      .agg(
        round(sum(when(col("_d") > 0, col("_d")).otherwise(0.0)), IncomeKernel.Scale).as("earnings"),
        (count(lit(1)) - 1).as("n_epochs"))
      .select(col("user_id"), col("earnings"), col("n_epochs"),
        IncomeKernel.aprColumn(col("earnings"), col("n_epochs")).as("apr"))
      .orderBy("user_id")
  }

  /** OP-40 interval assignment / as-of resolve: each row takes the most
    * recent preceding marker event's id per key
    * (reference: /root/reference/src/index_validator_handler.py:66-96 —
    * index transfers partition the epoch range; each epoch resolves to the
    * index in force). Spark: last(ignoreNulls) over an ordered window — the
    * classic as-of join collapsed into one pass, no range join needed.
    */
  def op40AsOfResolve(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("asof_marker",
        last(when(col("event_type") === "signup", col("event_id")), ignoreNulls = true).over(w))
      .select("event_id", "user_id", "event_type", "asof_marker")
      .orderBy("event_id")
  }

  /** OP-41 epoch catch-up enumeration, capped per key
    * (reference: /root/reference/src/extract_handler.py:54-90, cap at :24 —
    * range(ref+1, current+1) limited to 10 epochs per run).
    * sequence + explode is the built-in Generator form (SURVEY.md §2.10).
    */
  def op41SequenceEnum(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") < 100)
      .select(col("o_orderkey"),
        explode(sequence(
          to_date(col("o_orderdate")),
          date_add(to_date(col("o_orderdate")), 9))).as("d"))
      .select(col("o_orderkey"), date_format(col("d"), "yyyy-MM-dd").as("sync_date"))
      .orderBy("o_orderkey", "sync_date")

  /** OP-42 gap detection: expected epochs (min..max per key) minus observed
    * (reference: /root/reference/back-fillers/validator-balances-backfiller.py:154).
    */
  def op42GapDetection(spark: SparkSession, dir: String): DataFrame = {
    val actual = balancesFromEvents(spark, dir).select("user_id", "epoch")
    val expected = actual.groupBy("user_id")
      .agg(min("epoch").as("lo"), max("epoch").as("hi"))
      .select(col("user_id"), explode(sequence(col("lo"), col("hi"))).as("epoch"))
    expected.join(actual, Seq("user_id", "epoch"), "left_anti")
      .orderBy("user_id", "epoch")
  }

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
    "op38_cumulative_income" -> (op38CumulativeIncome _),
    "op39_apr_scalar" -> (op39AprScalar _),
    "op40_asof_resolve" -> (op40AsOfResolve _),
    "op41_sequence_enum" -> (op41SequenceEnum _),
    "op42_gap_detection" -> (op42GapDetection _))

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
         |                  THEN earnings * ${IncomeKernel.EpochsPerYear} / (CAST(epochs_since_active AS DOUBLE) * ${IncomeKernel.AprDenom})
         |                  ELSE 0 END, 6) AS apr,
         |       epochs_since_active
         |FROM c ORDER BY user_id, epoch""".stripMargin,
    "op39_apr_scalar" ->
      s"""$balCte, d AS (
         |  SELECT user_id,
         |         round(balance - lag(balance) OVER (PARTITION BY user_id ORDER BY epoch), 6) AS d
         |  FROM bal),
         |g AS (
         |  SELECT user_id,
         |         round(sum(CASE WHEN d > 0 THEN d ELSE 0 END), 6) AS earnings,
         |         count(*) - 1 AS n_epochs
         |  FROM d GROUP BY user_id)
         |SELECT user_id, earnings, n_epochs,
         |       round(CASE WHEN n_epochs > 0
         |                  THEN earnings * ${IncomeKernel.EpochsPerYear} / (CAST(n_epochs AS DOUBLE) * ${IncomeKernel.AprDenom})
         |                  ELSE 0 END, 6) AS apr
         |FROM g ORDER BY user_id""".stripMargin,
    "op40_asof_resolve" ->
      """SELECT event_id, user_id, event_type,
        |       last_value(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
        |         OVER (PARTITION BY user_id ORDER BY event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_marker
        |FROM events ORDER BY event_id""".stripMargin,
    "op41_sequence_enum" ->
      """SELECT o_orderkey,
        |       strftime(unnest(generate_series(CAST(o_orderdate AS DATE),
        |                                       CAST(o_orderdate AS DATE) + INTERVAL 9 DAY,
        |                                       INTERVAL 1 DAY)), '%Y-%m-%d') AS sync_date
        |FROM orders WHERE o_orderkey < 100
        |ORDER BY o_orderkey, sync_date""".stripMargin,
    "op42_gap_detection" ->
      s"""$balCte, bounds AS (
         |  SELECT user_id, min(epoch) AS lo, max(epoch) AS hi
         |  FROM bal GROUP BY user_id),
         |expected AS (
         |  SELECT user_id, unnest(generate_series(lo, hi)) AS epoch FROM bounds)
         |SELECT e.user_id, e.epoch FROM expected e
         |WHERE NOT EXISTS (SELECT 1 FROM bal b
         |                  WHERE b.user_id = e.user_id AND b.epoch = e.epoch)
         |ORDER BY user_id, epoch""".stripMargin)
}
