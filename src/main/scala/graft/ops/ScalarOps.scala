package graft.ops

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function families (SURVEY.md §2.8, OP-48..OP-53). Everything is
  * built-in Column arithmetic — codegen'd, no UDFs — so these stay inside
  * WholeStageCodegen spans at scale.
  */
object ScalarOps {

  /** OP-48 string functions: split-and-index, lower, sha256 digest
    * (reference: /root/reference/src/index_validator_handler.py:85,90 —
    * `value.split('-')`; /root/reference/src/utils/sqs.py:31-32 — sha256 ids).
    */
  def op48StringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        split(col("p_name"), " ").getItem(0).as("first_word"),
        split(col("p_name"), " ").getItem(1).as("second_word"),
        lower(col("p_brand")).as("brand_lower"),
        sha2(col("p_name"), 256).as("name_sha"))
      .orderBy("p_partkey")

  /** OP-49 date/time functions: format, unix seconds, day arithmetic
    * (reference: /root/reference/src/utils/apiUtils.py:52-53,
    * /root/reference/src/api_handler.py:535-537).
    */
  def op49DateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        unix_timestamp(col("o_orderdate").cast("timestamp")).as("order_epoch_s"),
        date_format(date_sub(to_date(col("o_orderdate")), 1), "yyyy-MM-dd").as("prev_day"))
      .orderBy("o_orderkey")

  /** OP-50 math / unit conversions: fixed-denominator scaling, integer
    * slot/epoch arithmetic, abs pct change, clamps
    * (reference: /root/reference/src/extract_handler.py:109,
    * /root/reference/src/index_validator_handler.py:52-54).
    */
  def op50MathUnits(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        round(col("l_extendedprice") / 1000.0, 6).as("price_k"),
        floor(col("l_orderkey") / 32).as("epoch_of_slot"),
        (col("l_orderkey") * 32 - 1).as("last_slot_of_epoch"),
        round(abs(col("l_discount") - col("l_tax")) * 100.0, 6).as("abs_pct_diff"))
      .orderBy("l_orderkey", "l_linenumber", "price_k", "abs_pct_diff")

  /** OP-51 conditional tiers (CASE WHEN chains): score from thresholds
    * (reference: /root/reference/src/api_handler.py:470-475 — validator
    * score; :504-509 — red/amber/green colour tiers).
    */
  def op51CaseTiers(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(
        col("c_custkey"),
        when(col("c_acctbal") >= 7000.0, lit(2L))
          .when(col("c_acctbal") >= 3000.0, lit(1L))
          .otherwise(lit(0L)).as("score"),
        when(col("c_acctbal") < 1000.0, lit("red"))
          .when(col("c_acctbal") < 5000.0, lit("Amber"))
          .otherwise(lit("green")).as("colour"))
      .orderBy("c_custkey")

  /** OP-52 JSON access + construction
    * (reference: /root/reference/src/utils/archive.py:25 — .get() chains;
    * /root/reference/src/api_handler.py:639-649 — response assembly).
    * Construction is manual concat so the byte-level output is engine-neutral.
    */
  def op52JsonAccess(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        concat(lit("{\"event_id\":"), col("event_id"),
          lit(",\"k\":"), get_json_object(col("props"), "$.k").cast("long"),
          lit("}")).as("payload"))
      .orderBy("event_id")

  /** OP-53 domain formulas: multi-input scalar over an aggregated join —
    * the redemption-rate shape `(24e9*n + x)/(8e9*n - y + z)`
    * (reference: /root/reference/src/api_handler.py:496-509).
    */
  def op53DomainFormula(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 6).as("total"))
    Tables.customer(spark, dir)
      .join(perCust, col("c_custkey") === col("o_custkey"))
      .select(
        col("c_custkey"),
        round((lit(24.0e4) * col("n") + col("total"))
          / (lit(8.0e4) * col("n") - col("c_acctbal") + col("total")), 6)
          .as("redemption_rate"))
      .orderBy("c_custkey")
  }

  /** OP-53b the REST of the domain-formula family as pure column
    * expressions over the same aggregated join as [[op53DomainFormula]]:
    * exchange rate `((24e9*n)+dETH)/(8e9*n)`
    * (reference: /root/reference/src/api_handler.py:700), per-validator
    * payoff rate `((8*v)-losses)/(8*v)` with v = validators/24 (`:626-635`),
    * sETH token value `((24+earnings)/8)*slot` (`:747-748`), and the MEV
    * redemption rate `(24+earnings)/(8-losses+topups)` (`:745-746`).
    * orders count/total stand in for validators/earnings, c_acctbal for
    * losses, and a deterministic `c_custkey % 4 + 1` for the slot — the
    * formula SHAPES are the operator; constants are fixture-scaled.
    */
  /** All inputs are 2-dp decimals, so exchange/payoff/sETH are RATIONALS
    * with small denominators — their 6-dp roundings routinely land on
    * half-points where Spark's decimal rounding and DuckDB's binary
    * rounding disagree. Evaluate them in exact integer cents/micro-units
    * (round-half-up(a/b) = (2a+b) div 2b); only redemption_mev, whose
    * denominator is an irregular mixed decimal, stays in rounded floats.
    */
  def op53bRateFormulas(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 6).as("total"))
    val slot = col("c_custkey") % 4 + 1
    Tables.customer(spark, dir)
      .join(perCust, col("c_custkey") === col("o_custkey"))
      // exact integer forms: order total and acctbal in cents
      .withColumn("_tc", round(col("total") * 100).cast("long"))
      .withColumn("_ac", round(col("c_acctbal") * 100).cast("long"))
      .withColumn("_slot", slot.cast("long"))
      .select(
        col("c_custkey"),
        // (24e4*n + total) / (8e4*n)  ==  (24e6*n + tc) / (8e6*n)
        (expr("((24000000 * n + _tc) * 2000000 + 8000000 * n) div (16000000 * n)")
          .cast("double") / 1e6).as("exchange_rate"),
        // (8v - acctbal/1e5) / 8v, v = n/24  ==  (1e7*n - 3*ac) / (1e7*n)
        (expr("((10000000 * n - 3 * _ac) * 2000000 + 10000000 * n) div (20000000 * n)")
          .cast("double") / 1e6).as("payoff_rate"),
        // (24 + total/1e5) / 8 * slot  ==  (24e7 + tc) * slot / 8e7
        (expr("((240000000 + _tc) * _slot * 2000000 + 80000000) div 160000000")
          .cast("double") / 1e6).as("seth_value"),
        round((lit(24.0) + col("total") / 1e5)
          / (lit(8.0) - col("c_acctbal") / 1e5 + slot), 6)
          .as("redemption_mev"))
      .orderBy("c_custkey")
  }

  /** OP-53c the two GLOBAL formulas of the family: slippage
    * `1 + dETHEarned / sum(validators)`
    * (reference: /root/reference/src/api_handler.py:637,641) and NAV
    * `mean(payoff_rate)` (`:642`). The NAV mean uses exact integer
    * micro-units ((2K+n) div 2n) — averaging 6-dp doubles directly flips
    * the last digit between engines (see graft-oracle-parity rules).
    */
  def op53cNavSlippage(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 6).as("total"))
    Tables.customer(spark, dir)
      .join(perCust, col("c_custkey") === col("o_custkey"))
      .withColumn("_tc", round(col("total") * 100).cast("long"))
      .withColumn("_ac", round(col("c_acctbal") * 100).cast("long"))
      // per-row payoff in exact micro-units (see op53bRateFormulas)
      .withColumn("_pm", expr(
        "((10000000 * n - 3 * _ac) * 2000000 + 10000000 * n) div (20000000 * n)"))
      .agg(
        sum(col("_tc")).as("_ct"), sum(col("n")).as("_sn"),
        sum(col("_pm")).as("_k"), count(lit(1)).as("_cnt"))
      .select(
        // 1 + dETHEarned/sum(v) == 1 + 24*CT/(1e7*SN), rounded half-up in
        // micro-units: 1e6 + (24*CT + 5*SN) div (10*SN)
        ((lit(1000000L) + expr("(24 * _ct + 5 * _sn) div (10 * _sn)"))
          .cast("double") / 1e6).as("slippage"),
        (expr("(_k * 2 + _cnt) div (_cnt * 2)").cast("double") / 1e6).as("nav"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "op53b_rate_formulas" -> (op53bRateFormulas _),
    "op53c_nav_slippage" -> (op53cNavSlippage _),
    "op48_string_funcs" -> (op48StringFuncs _),
    "op49_date_funcs" -> (op49DateFuncs _),
    "op50_math_units" -> (op50MathUnits _),
    "op51_case_tiers" -> (op51CaseTiers _),
    "op52_json_access" -> (op52JsonAccess _),
    "op53_domain_formula" -> (op53DomainFormula _))

  val oracles: Map[String, String] = Map(
    "op53b_rate_formulas" ->
      """WITH per_cust AS (
        |  SELECT o_custkey, count(*) AS n, round(sum(o_totalprice), 6) AS total
        |  FROM orders GROUP BY o_custkey),
        |c AS (
        |  SELECT c_custkey, c_acctbal, n, total,
        |         CAST(round(total * 100) AS BIGINT) AS tc,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS ac,
        |         CAST(c_custkey % 4 + 1 AS BIGINT) AS slot
        |  FROM customer JOIN per_cust ON c_custkey = o_custkey)
        |SELECT c_custkey,
        |       CAST(((24000000 * n + tc) * 2000000 + 8000000 * n)
        |            // (16000000 * n) AS DOUBLE) / 1e6 AS exchange_rate,
        |       CAST(((10000000 * n - 3 * ac) * 2000000 + 10000000 * n)
        |            // (20000000 * n) AS DOUBLE) / 1e6 AS payoff_rate,
        |       CAST(((240000000 + tc) * slot * 2000000 + 80000000)
        |            // 160000000 AS DOUBLE) / 1e6 AS seth_value,
        |       round((24.0 + total / 1e5) / (8.0 - c_acctbal / 1e5 + (c_custkey % 4 + 1)), 6)
        |         AS redemption_mev
        |FROM c
        |ORDER BY c_custkey""".stripMargin,
    "op53c_nav_slippage" ->
      """WITH per_cust AS (
        |  SELECT o_custkey, count(*) AS n, round(sum(o_totalprice), 6) AS total
        |  FROM orders GROUP BY o_custkey),
        |p AS (
        |  SELECT n,
        |         CAST(round(total * 100) AS BIGINT) AS tc,
        |         ((10000000 * n - 3 * CAST(round(c_acctbal * 100) AS BIGINT)) * 2000000
        |          + 10000000 * n) // (20000000 * n) AS pm
        |  FROM customer JOIN per_cust ON c_custkey = o_custkey),
        |g AS (
        |  SELECT sum(tc) AS ct, sum(n) AS sn, sum(pm) AS k, count(*) AS cnt
        |  FROM p)
        |SELECT CAST(1000000 + (24 * ct + 5 * sn) // (10 * sn) AS DOUBLE) / 1e6 AS slippage,
        |       CAST((k * 2 + cnt) // (cnt * 2) AS DOUBLE) / 1e6 AS nav
        |FROM g""".stripMargin,
    "op48_string_funcs" ->
      """SELECT p_partkey,
        |       string_split(p_name, ' ')[1] AS first_word,
        |       string_split(p_name, ' ')[2] AS second_word,
        |       lower(p_brand) AS brand_lower,
        |       sha256(p_name) AS name_sha
        |FROM part ORDER BY p_partkey""".stripMargin,
    "op49_date_funcs" ->
      """SELECT o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |       CAST(floor(date_part('epoch', o_orderdate)) AS BIGINT) AS order_epoch_s,
        |       strftime(CAST(o_orderdate AS DATE) - INTERVAL 1 DAY, '%Y-%m-%d') AS prev_day
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "op50_math_units" ->
      """SELECT l_orderkey, l_linenumber,
        |       round(l_extendedprice / 1000.0, 6) AS price_k,
        |       CAST(floor(l_orderkey / 32) AS BIGINT) AS epoch_of_slot,
        |       l_orderkey * 32 - 1 AS last_slot_of_epoch,
        |       round(abs(l_discount - l_tax) * 100.0, 6) AS abs_pct_diff
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, price_k, abs_pct_diff""".stripMargin,
    "op51_case_tiers" ->
      """SELECT c_custkey,
        |       CAST(CASE WHEN c_acctbal >= 7000.0 THEN 2
        |                 WHEN c_acctbal >= 3000.0 THEN 1 ELSE 0 END AS BIGINT) AS score,
        |       CASE WHEN c_acctbal < 1000.0 THEN 'red'
        |            WHEN c_acctbal < 5000.0 THEN 'Amber' ELSE 'green' END AS colour
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "op52_json_access" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |       '{"event_id":' || event_id || ',"k":' ||
        |         CAST(json_extract_string(props, '$.k') AS BIGINT) || '}' AS payload
        |FROM events ORDER BY event_id""".stripMargin,
    "op53_domain_formula" ->
      """WITH per_cust AS (
        |  SELECT o_custkey, count(*) AS n, round(sum(o_totalprice), 6) AS total
        |  FROM orders GROUP BY o_custkey)
        |SELECT c_custkey,
        |       round((24.0e4 * n + total) / (8.0e4 * n - c_acctbal + total), 6)
        |         AS redemption_rate
        |FROM customer JOIN per_cust ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin)
}
