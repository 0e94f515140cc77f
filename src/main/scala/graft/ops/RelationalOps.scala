package graft.ops

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Projections, filters and predicates (SURVEY.md §2.2, OP-11..OP-19).
  * All filters/projections are declarative Column expressions so Catalyst
  * pushes them into the parquet scan (PushedFilters / ReadSchema) — at
  * 100 TB these ops cost only the rows/columns they touch.
  */
object RelationalOps {

  /** OP-11 column projection + rename
    * (reference: /root/reference/src/validator_earnings_handler.py:17-49 —
    * `SELECT earnings as MaxEarnings ...`).
    */
  def op11ProjectRename(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey").as("order_key"),
        col("l_linenumber").cast("long").as("line_no"),
        col("l_extendedprice").as("max_earnings"),
        col("l_returnflag").as("flag"))
      .orderBy("order_key", "line_no", "max_earnings", "flag")

  /** OP-12 equality / IN-list predicate — the reference's 1-vs-many SQL
    * branches collapse into one isin
    * (reference: /root/reference/src/api_handler.py:142-145).
    */
  def op12InFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag").isin("A", "R") && col("l_linestatus") === "F")
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
      .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")

  /** OP-13 range predicates: BETWEEN / > / !=
    * (reference: /root/reference/src/validator_income_handler.py:51,75;
    * /root/reference/src/api_handler.py:250,257).
    */
  def op13RangeFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_quantity").between(10, 20)
        && col("l_extendedprice") > 50000.0
        && col("l_returnflag") =!= "N")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")

  /** OP-14 date-equality filter (the "yesterday's partition" scan,
    * reference: /root/reference/src/api_handler.py:19-23 +
    * /root/reference/src/utils/apiUtils.py:52-53). Fixed date stands in for
    * `now - 1 day`.
    */
  def op14DateEqFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(to_date(col("o_orderdate")) === lit("1997-07-27").cast("date"))
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .orderBy("o_orderkey")

  /** OP-15 existence filter = left-semi join against a dimension
    * (reference: /root/reference/src/api_handler.py:277).
    */
  def op15SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.orders(spark, dir).filter(col("o_totalprice") > 300000.0)
    Tables.lineitem(spark, dir)
      .join(bigOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
  }

  /** OP-16 anti-join via set difference (`set(all) - set(done)`,
    * reference: /root/reference/src/validator_start_handler.py:66).
    */
  def op16AntiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** OP-17 dict-filter on key membership = broadcast semi-join
    * (reference: /root/reference/src/validator_withdrawals_handler.py:95).
    * broadcast() is explicit: the tracked-key set is tiny even at 100 TB.
    */
  def op17BroadcastSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val tracked = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    Tables.orders(spark, dir)
      .join(broadcast(tracked), col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** OP-18 sign predicates on deltas: positive part / negative part clamps
    * (reference: /root/reference/src/utils/financials.py:25,34).
    */
  def op18SignSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("margin",
        round(col("l_extendedprice") * (col("l_discount") - col("l_tax")), 6))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(greatest(lit(0.0), col("margin")), 6).as("gain"),
        round(least(lit(0.0), col("margin")), 6).as("loss"))
      .orderBy("l_orderkey", "l_linenumber", "gain", "loss")

  /** OP-19 neighbor-outlier (spike) filter: drop row i iff its value
    * differs >10% of the CURRENT row's value from BOTH original neighbors
    * (reference: /root/reference/src/index_epoch_apr_handler.py:87-93 —
    * the current row is the denominator, a zero denominator keeps the row
    * (bare except: pass), and we implement the declared rule over original
    * neighbors, not the list.pop() quirk; SURVEY.md §4).
    */
  def op19SpikeFilter(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("epoch")
    WindowOps.balancesFromEvents(spark, dir)
      .withColumn("_prev", lag(col("balance"), 1).over(w))
      .withColumn("_next", lead(col("balance"), 1).over(w))
      .filter(!(col("_prev").isNotNull && col("_next").isNotNull
        && col("balance") =!= 0.0
        && abs(col("balance") - col("_prev")) > col("balance") * 0.1
        && abs(col("balance") - col("_next")) > col("balance") * 0.1))
      .select("user_id", "epoch", "balance")
      .orderBy("user_id", "epoch")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "op11_project_rename" -> (op11ProjectRename _),
    "op12_in_filter" -> (op12InFilter _),
    "op13_range_filter" -> (op13RangeFilter _),
    "op14_date_eq_filter" -> (op14DateEqFilter _),
    "op15_semi_join" -> (op15SemiJoin _),
    "op16_anti_join" -> (op16AntiJoin _),
    "op17_broadcast_semi_join" -> (op17BroadcastSemiJoin _),
    "op18_sign_split" -> (op18SignSplit _),
    "op19_spike_filter" -> (op19SpikeFilter _))

  val oracles: Map[String, String] = Map(
    "op11_project_rename" ->
      """SELECT l_orderkey AS order_key, CAST(l_linenumber AS BIGINT) AS line_no,
        |       l_extendedprice AS max_earnings, l_returnflag AS flag
        |FROM lineitem ORDER BY order_key, line_no, max_earnings, flag""".stripMargin,
    "op12_in_filter" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
        |FROM lineitem
        |WHERE l_returnflag IN ('A','R') AND l_linestatus = 'F'
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_linestatus""".stripMargin,
    "op13_range_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20
        |  AND l_extendedprice > 50000.0 AND l_returnflag <> 'N'
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,
    "op14_date_eq_filter" ->
      """SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) = DATE '1997-07-27'
        |ORDER BY o_orderkey""".stripMargin,
    "op15_semi_join" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem l
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_orderkey = l.l_orderkey AND o.o_totalprice > 300000.0)
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice""".stripMargin,
    "op16_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "op17_broadcast_semi_join" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE EXISTS (SELECT 1 FROM customer c
        |              WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,
    "op18_sign_split" ->
      """WITH m AS (
        |  SELECT l_orderkey, l_linenumber,
        |         round(l_extendedprice * (l_discount - l_tax), 6) AS margin
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        |       round(greatest(0.0, margin), 6) AS gain,
        |       round(least(0.0, margin), 6) AS loss
        |FROM m ORDER BY l_orderkey, l_linenumber, gain, loss""".stripMargin,
    "op19_spike_filter" ->
      """WITH bal AS (
        |  SELECT user_id,
        |         CAST(floor(date_part('epoch', ts)/86400) AS BIGINT) AS epoch,
        |         round(sum(value), 6) AS balance
        |  FROM events GROUP BY 1, 2
        |), n AS (
        |  SELECT user_id, epoch, balance,
        |         lag(balance)  OVER (PARTITION BY user_id ORDER BY epoch) AS prev,
        |         lead(balance) OVER (PARTITION BY user_id ORDER BY epoch) AS next
        |  FROM bal)
        |SELECT user_id, epoch, balance FROM n
        |WHERE NOT (prev IS NOT NULL AND next IS NOT NULL
        |           AND balance <> 0.0
        |           AND abs(balance - prev) > balance * 0.1
        |           AND abs(balance - next) > balance * 0.1)
        |ORDER BY user_id, epoch""".stripMargin)
}
