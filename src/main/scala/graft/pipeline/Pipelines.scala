package graft.pipeline

import graft.model.Tables
import graft.ops.{IncomeKernel, WindowOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end restatements of the reference's three lifecycle pipelines
  * (SURVEY.md §3), composed from the operator library. The Lambda/SQS/MySQL
  * choreography collapses into single DataFrame plans: each pipeline is one
  * job with one or two shuffles, all partitioned by the entity key.
  */
object Pipelines {

  private val dayEpoch = floor(unix_timestamp(col("ts")) / 86400L)

  /** §3.1 extract-catchup: for every key, enumerate the epochs between its
    * last synced epoch and the finalized epoch, capped at 10 per run
    * (reference: /root/reference/src/extract_handler.py:54-90,139-167).
    * The SQS fan-out + sha256 dedup ids + chunking disappear into Spark
    * partitioning; what remains is the work-unit table.
    */
  def extractCatchup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val finalized = ev.agg(max(dayEpoch).as("finalized_epoch"))
    val lastSynced = ev.groupBy("user_id").agg(max(dayEpoch).as("last_epoch"))
    val w = Window.partitionBy("user_id").orderBy("epoch")
    lastSynced
      .crossJoin(broadcast(finalized))
      .where(col("last_epoch") < col("finalized_epoch"))
      .select(col("user_id"),
        explode(sequence(col("last_epoch") + 1, col("finalized_epoch"))).as("epoch"))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= 10) // EPOCHS_PER_VALIDATOR_LIMIT
      .select("user_id", "epoch")
      .orderBy("user_id", "epoch")
  }

  /** §3.2 income derivation: balances ⟕ withdrawals → cumulative income
    * kernel → latest-row snapshot (the Validator_Earnings_Interface analog,
    * reference: /root/reference/src/validator_income_handler.py +
    * validator_earnings_handler.py:17-49). The warm/cold split vanishes:
    * every key starts from its first observed epoch in one window pass.
    */
  def incomeSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val income = IncomeKernel.cumulativeIncome(WindowOps.balancesFromEvents(spark, dir))
    val w = Window.partitionBy("user_id").orderBy(col("epoch").desc)
    income
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select(col("user_id"), col("epoch").as("latest_epoch"),
        col("earnings"), col("losses"), col("apr"))
      .orderBy("user_id")
  }

  /** §3.3 leaderboard serving: per-key income joined to the broadcast
    * entity dimension, per-group means, ranked output
    * (reference: /root/reference/src/api_handler.py:272-310 — /leaderboard
    * and /topIndexes). customer.c_mktsegment stands in for savETHIndex.
    */
  def leaderboard(spark: SparkSession, dir: String): DataFrame = {
    val snapshot = incomeSnapshot(spark, dir)
    val dim = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val w = Window.orderBy(col("sum_earnings").desc, col("c_mktsegment").asc)
    snapshot
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        round(avg(col("apr")), 6).as("avg_apr"),
        round(sum(col("earnings")), 6).as("sum_earnings"),
        round(sum(col("losses")), 6).as("sum_losses"),
        count(lit(1)).as("n_validators"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .select("rank", "c_mktsegment", "avg_apr", "sum_earnings", "sum_losses", "n_validators")
      .orderBy("rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_extract_catchup" -> (extractCatchup _),
    "pipe_income_snapshot" -> (incomeSnapshot _),
    "pipe_leaderboard" -> (leaderboard _))

  private val epochExpr = "CAST(floor(date_part('epoch', ts)/86400) AS BIGINT)"

  /** Shared income CTE chain mirroring IncomeKernel for DuckDB. */
  private val incomeCte =
    s"""WITH bal AS (
       |  SELECT user_id, $epochExpr AS epoch,
       |         round(sum(value), 6) AS balance,
       |         round(sum(CASE WHEN event_type='purchase' THEN value ELSE 0 END), 6) AS withdrawal
       |  FROM events GROUP BY 1, 2
       |), d AS (
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
       |), income AS (
       |  SELECT user_id, epoch,
       |         round(sum(CASE WHEN delta > 0 THEN delta ELSE 0 END) OVER cw, 6) AS earnings,
       |         round(sum(CASE WHEN delta < 0 THEN -delta ELSE 0 END) OVER cw, 6) AS losses,
       |         CAST(row_number() OVER (PARTITION BY user_id ORDER BY epoch) - 1 AS BIGINT) AS n_epochs
       |  FROM d2 WHERE gap_epoch IS NULL OR epoch < gap_epoch
       |  WINDOW cw AS (PARTITION BY user_id ORDER BY epoch
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |), apr AS (
       |  SELECT user_id, epoch, earnings, losses,
       |         round(CASE WHEN n_epochs > 0
       |                    THEN earnings * 82179.45 / (CAST(n_epochs AS DOUBLE) * 2400000.0)
       |                    ELSE 0 END, 6) AS apr
       |  FROM income
       |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "pipe_extract_catchup" ->
      s"""WITH f AS (SELECT max($epochExpr) AS finalized_epoch FROM events),
         |ls AS (SELECT user_id, max($epochExpr) AS last_epoch FROM events GROUP BY user_id),
         |ex AS (
         |  SELECT user_id, unnest(generate_series(last_epoch + 1, finalized_epoch)) AS epoch
         |  FROM ls CROSS JOIN f WHERE last_epoch < finalized_epoch),
         |r AS (
         |  SELECT user_id, epoch,
         |         row_number() OVER (PARTITION BY user_id ORDER BY epoch) AS rn
         |  FROM ex)
         |SELECT user_id, epoch FROM r WHERE rn <= 10
         |ORDER BY user_id, epoch""".stripMargin,
    "pipe_income_snapshot" ->
      s"""$incomeCte, latest AS (
         |  SELECT user_id, epoch AS latest_epoch, earnings, losses, apr,
         |         row_number() OVER (PARTITION BY user_id ORDER BY epoch DESC) AS rn
         |  FROM apr)
         |SELECT user_id, latest_epoch, earnings, losses, apr
         |FROM latest WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "pipe_leaderboard" ->
      s"""$incomeCte, latest AS (
         |  SELECT user_id, earnings, losses, apr,
         |         row_number() OVER (PARTITION BY user_id ORDER BY epoch DESC) AS rn
         |  FROM apr),
         |g AS (
         |  SELECT c_mktsegment,
         |         round(avg(apr), 6) AS avg_apr,
         |         round(sum(earnings), 6) AS sum_earnings,
         |         round(sum(losses), 6) AS sum_losses,
         |         count(*) AS n_validators
         |  FROM latest JOIN customer ON user_id = c_custkey
         |  WHERE rn = 1 GROUP BY c_mktsegment)
         |SELECT CAST(row_number() OVER (ORDER BY sum_earnings DESC, c_mktsegment ASC) AS BIGINT) AS rank,
         |       c_mktsegment, avg_apr, sum_earnings, sum_losses, n_validators
         |FROM g ORDER BY rank""".stripMargin)
}
