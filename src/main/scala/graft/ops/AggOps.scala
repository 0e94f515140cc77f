package graft.ops

import graft.model.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation operators (SURVEY.md §2.4, OP-27..OP-35). All are hash
  * aggregations with map-side partial agg — one shuffle per grouping, and
  * groupings over the same key reuse the exchange.
  */
object AggOps {

  private val dayEpoch = floor(unix_timestamp(col("ts")) / 86400L)

  /** Order-free exact micro-unit sum with the declared overflow
    * behavior ENFORCED: BIGINT sum that FAILS LOUD past ±2^63−1
    * micro-units (~9.2e12 in value per group) instead of Spark's silent
    * non-ANSI wrap. `try_sum` is the overflow-checked BIGINT sum (null
    * on overflow, codegen'd, order-free); the lazy `coalesce` turns that
    * null into a named error telling the operator to promote the
    * aggregate to DECIMAL(38,0) — the documented escape for
    * trillion-unit groups. Empty / all-null groups stay null (count
    * guard), matching plain `sum`. Both aggregate functions share ONE
    * hash-aggregate pass (same grouping); the per-group when/coalesce is
    * post-aggregation arithmetic. CALLER CONTRACT: pass a PROJECTED
    * column, not an inline expression — `count(micro)` and
    * `try_sum(micro)` each evaluate their child per row, so an inline
    * round/cast chain would run twice per row (measured: op30 full-eval
    * 0.53 → 0.90 s at sf0.1 when the micro expressions were inlined;
    * projecting them first returns the checked sum to plain-sum cost).
    */
  private[graft] def microUnitSumChecked(micro: Column, site: String): Column =
    when(count(micro) === 0, lit(null).cast("long"))
      .otherwise(coalesce(try_sum(micro), raise_error(lit(
        s"micro-unit BIGINT sum overflow at $site (>9.2e18 micro-units " +
          "in one group): promote this aggregate to DECIMAL(38,0)"))))

  /** OP-27 grouped MAX/MIN (high-water marks,
    * reference: /root/reference/src/validator_income_handler.py:59-69).
    */
  def op27GroupedMinMax(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(
        max(dayEpoch).as("max_epoch"),
        min(dayEpoch).as("min_epoch"),
        max(col("event_id")).as("max_event_id"))
      .orderBy("user_id")

  /** OP-28 grouped SUM (the reference's ordinal GROUP BY 2 becomes named,
    * reference: /root/reference/src/api_handler.py:192-194).
    */
  def op28GroupedSum(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(round(sum(col("value")), 6).as("earnings"))
      .orderBy("event_type")

  /** OP-29 grouped AVG per epoch (user-portfolio APR shape,
    * reference: /root/reference/src/api_handler.py:204-219).
    */
  def op29GroupedAvg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(dayEpoch.as("epoch"))
      .agg(round(avg(col("value")), 6).as("avg_value"))
      .orderBy("epoch")

  /** OP-30 multi-aggregate in one pass: AVG + SUM + SUM per group
    * (reference: /root/reference/src/index_epoch_apr_handler.py:49-54).
    */
  def op30MultiAgg(spark: SparkSession, dir: String): DataFrame =
    // The big sums quantize each row to integer micro-units BEFORE the
    // aggregate (round(x·1e6) → BIGINT): a double sum over millions of
    // rows reaches ~5e10, where one unit in the 6th decimal is below the
    // double's ULP — summation ORDER (distributed vs single-stream)
    // then decides the last rounded digit and the engines legitimately
    // disagree (measured: op30 at the 10× sf1 sweep). Integer sums are
    // order-free and exact up to BIGINT range — ~9.2e18 micro-units, i.e.
    // ~9.2e12 in value per group, ampler than any per-group price total
    // this framework targets but NOT unbounded: past it the sum FAILS
    // LOUD ([[microUnitSumChecked]] — Spark's non-ANSI sum(BIGINT) would
    // wrap silently) and the named error tells the operator to promote
    // to DECIMAL(38,0) (still order-free). One IEEE divide at the end.
    // Micro-unit quantization PROJECTED once per row before the agg:
    // count+try_sum each evaluate their child, so inlining the cast/round
    // chain into microUnitSumChecked ran it twice per row (the r12 op30
    // regression — see the contract note on microUnitSumChecked).
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"), col("l_discount"),
        expr("CAST(round(l_extendedprice * 1000000) AS BIGINT)").as("price_u"),
        expr("CAST(round(l_quantity * 1000000) AS BIGINT)").as("qty_u"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(avg(col("l_discount")), 6).as("avg_disc"),
        round(microUnitSumChecked(col("price_u"), "op30.sum_price") / 1e6, 6)
          .as("sum_price"),
        round(microUnitSumChecked(col("qty_u"), "op30.sum_qty") / 1e6, 6)
          .as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

  /** OP-31 DISTINCT / dedup
    * (reference: /root/reference/src/api_handler.py:102,127).
    */
  def op31Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select("user_id", "event_type")
      .distinct()
      .orderBy("user_id", "event_type")

  /** OP-31 approx variant: HyperLogLog++ distinct counts — the
    * cardinality-only form of DISTINCT (SURVEY.md §2.4 OP-31 mapping).
    * Sketch VALUES differ between engines, so the sketch value itself
    * cannot hash-match an oracle; instead the query emits the exact count
    * plus `approx_ok` = (|HLL - exact| <= 5% of exact), and the oracle
    * emits the exact count plus literal TRUE — hash-green IFF Spark's
    * sketch is within tolerance, making this oracle-ANCHORED rather than
    * rows-only. ApproxDistinctSpec additionally bounds the raw sketch.
    */
  def op31bApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.02).as("_approx"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("_approx") - col("exact_users"))
          <= col("exact_users") * 0.05).as("approx_ok"))
      .orderBy("event_type")

  /** OP-32 grouped mean over sorted groups — the reference pre-sorts for
    * itertools.groupby; Spark's hash agg needs no sort
    * (reference: /root/reference/src/utils/apiUtils.py:6-50).
    */
  def op32GroupedMean(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy("c_mktsegment")
      .agg(
        round(avg(col("c_acctbal")), 6).as("avg_bal"),
        round(sum(col("c_acctbal")), 6).as("sum_bal"))
      .orderBy("c_mktsegment")

  /** OP-33 global mean of per-group means
    * (reference: /root/reference/src/api_handler.py:338).
    */
  def op33MeanOfMeans(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(round(avg(col("value")), 6).as("user_avg"))
      .agg(round(avg(col("user_avg")), 6).as("global_avg_of_user_avgs"))

  /** OP-34 two-level aggregation: per-(key, fine-grain) sums re-aggregated
    * to a coarser grain (reference:
    * /root/reference/src/validator_withdrawals_handler.py:70-74,97-102 —
    * slot sums rolled into epoch sums).
    */
  def op34TwoLevelAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), dayEpoch.as("day"))
      .agg(round(sum(col("value")), 6).as("day_sum"))
      .groupBy(col("user_id"), floor(col("day") / 7L).as("week"))
      .agg(round(sum(col("day_sum")), 6).as("week_sum"), count(lit(1)).as("n_days"))
      .orderBy("user_id", "week")

  /** OP-35 trailing-range delta with a minimum-history gate: over the most
    * recent <=7 epochs per key, first-minus-last plus count; keys with <5
    * epochs of history are excluded
    * (reference: /root/reference/src/apr_sync_handler.py:17-27 — LIMIT 1575
    * trailing window, >=9 rows gate; scaled to the fixture's 30-day span).
    */
  def op35TrailingDelta(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("epoch").desc)
    WindowOps.balancesFromEvents(spark, dir)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= 7)
      .groupBy("user_id")
      .agg(
        round(max(col("balance")) - min(col("balance")), 6).as("trailing_delta"),
        count(lit(1)).as("n_epochs"))
      .filter(col("n_epochs") >= 5)
      .orderBy("user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "op27_grouped_minmax" -> (op27GroupedMinMax _),
    "op28_grouped_sum" -> (op28GroupedSum _),
    "op29_grouped_avg" -> (op29GroupedAvg _),
    "op30_multi_agg" -> (op30MultiAgg _),
    "op31_distinct" -> (op31Distinct _),
    "op31b_approx_distinct" -> (op31bApproxDistinct _),
    "op32_grouped_mean" -> (op32GroupedMean _),
    "op33_mean_of_means" -> (op33MeanOfMeans _),
    "op34_two_level_agg" -> (op34TwoLevelAgg _),
    "op35_trailing_delta" -> (op35TrailingDelta _))

  private val epochExpr = "CAST(floor(date_part('epoch', ts)/86400) AS BIGINT)"

  val oracles: Map[String, String] = Map(
    "op27_grouped_minmax" ->
      s"""SELECT user_id, max($epochExpr) AS max_epoch, min($epochExpr) AS min_epoch,
         |       max(event_id) AS max_event_id
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "op28_grouped_sum" ->
      """SELECT event_type, round(sum(value), 6) AS earnings
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "op29_grouped_avg" ->
      s"""SELECT $epochExpr AS epoch, round(avg(value), 6) AS avg_value
         |FROM events GROUP BY 1 ORDER BY epoch""".stripMargin,
    "op30_multi_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(avg(l_discount), 6) AS avg_disc,
        |       round(CAST(sum(CAST(round(l_extendedprice * 1000000) AS BIGINT)) AS DOUBLE) / 1000000, 6) AS sum_price,
        |       round(CAST(sum(CAST(round(l_quantity * 1000000) AS BIGINT)) AS DOUBLE) / 1000000, 6) AS sum_qty,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "op31_distinct" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,
    "op31b_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |       TRUE AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "op32_grouped_mean" ->
      """SELECT c_mktsegment, round(avg(c_acctbal), 6) AS avg_bal,
        |       round(sum(c_acctbal), 6) AS sum_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "op33_mean_of_means" ->
      """WITH u AS (SELECT user_id, round(avg(value), 6) AS user_avg
        |           FROM events GROUP BY user_id)
        |SELECT round(avg(user_avg), 6) AS global_avg_of_user_avgs FROM u""".stripMargin,
    "op34_two_level_agg" ->
      s"""WITH d AS (
         |  SELECT user_id, $epochExpr AS day, round(sum(value), 6) AS day_sum
         |  FROM events GROUP BY 1, 2)
         |SELECT user_id, CAST(floor(day / 7) AS BIGINT) AS week,
         |       round(sum(day_sum), 6) AS week_sum, count(*) AS n_days
         |FROM d GROUP BY 1, 2 ORDER BY user_id, week""".stripMargin,
    "op35_trailing_delta" ->
      """WITH bal AS (
        |  SELECT user_id,
        |         CAST(floor(date_part('epoch', ts)/86400) AS BIGINT) AS epoch,
        |         round(sum(value), 6) AS balance
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT user_id, balance,
        |         row_number() OVER (PARTITION BY user_id ORDER BY epoch DESC) AS rn
        |  FROM bal)
        |SELECT user_id,
        |       round(max(balance) - min(balance), 6) AS trailing_delta,
        |       count(*) AS n_epochs
        |FROM r WHERE rn <= 7 GROUP BY user_id
        |HAVING count(*) >= 5 ORDER BY user_id""".stripMargin)
}
