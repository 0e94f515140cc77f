package graft.ops

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2.3, OP-20..OP-26). Dimension sides are
  * explicitly broadcast (tiny even at 100 TB); fact-fact joins shuffle on
  * their keys and rely on AQE for skew. The reference's groupwise-max
  * self-joins become window row_number — one shuffle instead of two.
  */
object JoinOps {

  /** OP-20 groupwise-max (latest row per key). The reference self-joins to a
    * MAX(epoch) subquery (/root/reference/src/validator_income_handler.py:32-34);
    * window row_number is the strictly better physical plan (SURVEY.md §4).
    */
  def op20GroupwiseMax(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(spark, dir)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("latest_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("latest_date"),
        col("o_totalprice").as("latest_total"))
      .orderBy("o_custkey")
  }

  /** OP-21 two-level nested join: spend at each customer's LATEST order,
    * rolled up by market segment — the shape of "income at an index's
    * latest-APR epoch" (/root/reference/src/api_handler.py:134,192-194).
    */
  def op21NestedJoin(spark: SparkSession, dir: String): DataFrame = {
    val latest = op20GroupwiseMax(spark, dir)
      .select(col("o_custkey"), col("latest_orderkey"))
    val latestSpend = Tables.lineitem(spark, dir)
      .join(latest, col("l_orderkey") === col("latest_orderkey"))
    latestSpend
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      // Micro-unit integer sum (see op30MultiAgg): at 10× data the double
      // sum's last rounded digit depends on summation order.
      .agg(round(sum(expr("CAST(round(l_extendedprice * 1000000) AS BIGINT)")) / 1e6, 6)
        .as("latest_spend"))
      .orderBy("c_mktsegment")
  }

  /** OP-22 composite-key fact⋈fact join on (key, epoch) + per-epoch agg
    * (reference: /root/reference/src/index_epoch_apr_handler.py:48-54).
    * Both sides derive from the same day-bucketed events grain.
    */
  def op22CompositeKeyJoin(spark: SparkSession, dir: String): DataFrame = {
    val epoch = floor(unix_timestamp(col("ts")) / 86400L)
    val ev = Tables.events(spark, dir)
    val income = ev.groupBy(col("user_id"), epoch.as("epoch"))
      .agg(round(sum(col("value")), 6).as("balance"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("p_user"), epoch.as("p_epoch"))
      .agg(round(sum(col("value")), 6).as("purchase"))
    income
      .join(purchases,
        col("user_id") === col("p_user") && col("epoch") === col("p_epoch"))
      .groupBy("epoch")
      .agg(
        round(avg(col("balance")), 6).as("avg_balance"),
        round(sum(col("purchase")), 6).as("sum_purchase"),
        count(lit(1)).as("n_users"))
      .orderBy("epoch")
  }

  /** OP-23 join to progress marker: min over members bounds the group
    * (reference: /root/reference/src/index_epoch_apr_handler.py:56-66 —
    * min(runner epoch) over an index's validators).
    */
  def op23JoinMinMarker(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir)
      .join(Tables.customer(spark, dir), col("n_nationkey") === col("c_nationkey"))
      .groupBy(col("n_nationkey"), col("n_name"))
      .agg(round(min(col("c_acctbal")), 6).as("safe_bound"))
      .orderBy("n_nationkey")

  /** OP-24 broadcast hash join (map-side lookup enrich)
    * (reference: /root/reference/src/api_handler.py:279-280 — attach
    * subgraph dict values to DB rows).
    */
  def op24BroadcastEnrich(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("o_orderkey")

  /** OP-25 positional zip join: pair rows of two sorted inputs by position
    * (reference: /root/reference/scripts/check-sweeps.js:119-140).
    */
  def op25ZipJoin(spark: SparkSession, dir: String): DataFrame = {
    val cw = Window.orderBy("c_custkey")
    val sw = Window.orderBy("s_suppkey")
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name")).withColumn("rn", row_number().over(cw))
    val s = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_name")).withColumn("rn", row_number().over(sw))
    c.join(s, "rn")
      .select(col("rn").cast("long").as("pos"), col("c_name"), col("s_name"))
      .orderBy("pos")
  }

  /** OP-26 left-outer enrich with defaults for missing dimension rows
    * (reference: /root/reference/src/api_handler.py:439-440 — threat rows
    * default to [1,1,1]).
    */
  def op26LeftOuterDefault(spark: SparkSession, dir: String): DataFrame = {
    val supStats = Tables.supplier(spark, dir)
      .groupBy(col("s_nationkey"))
      .agg(round(sum(col("s_acctbal")), 6).as("nation_supp_bal"))
    Tables.customer(spark, dir)
      .join(supStats, col("c_nationkey") === col("s_nationkey"), "left_outer")
      .select(
        col("c_custkey"),
        coalesce(col("nation_supp_bal"), lit(1.0)).as("supp_bal_or_default"))
      .orderBy("c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "op20_groupwise_max" -> (op20GroupwiseMax _),
    "op21_nested_join" -> (op21NestedJoin _),
    "op22_composite_key_join" -> (op22CompositeKeyJoin _),
    "op23_join_min_marker" -> (op23JoinMinMarker _),
    "op24_broadcast_enrich" -> (op24BroadcastEnrich _),
    "op25_zip_join" -> (op25ZipJoin _),
    "op26_left_outer_default" -> (op26LeftOuterDefault _))

  private val latestCte =
    """WITH latest AS (
      |  SELECT * FROM (
      |    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
      |           row_number() OVER (PARTITION BY o_custkey
      |                              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |    FROM orders) WHERE rn = 1
      |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "op20_groupwise_max" ->
      s"""$latestCte
         |SELECT o_custkey, o_orderkey AS latest_orderkey,
         |       strftime(o_orderdate, '%Y-%m-%d') AS latest_date,
         |       o_totalprice AS latest_total
         |FROM latest ORDER BY o_custkey""".stripMargin,
    "op21_nested_join" ->
      s"""$latestCte
         |SELECT c_mktsegment, round(CAST(sum(CAST(round(l_extendedprice * 1000000) AS BIGINT)) AS DOUBLE) / 1000000, 6) AS latest_spend
         |FROM lineitem
         |JOIN latest ON l_orderkey = latest.o_orderkey
         |JOIN customer ON latest.o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "op22_composite_key_join" ->
      """WITH income AS (
        |  SELECT user_id, CAST(floor(date_part('epoch', ts)/86400) AS BIGINT) AS epoch,
        |         round(sum(value), 6) AS balance
        |  FROM events GROUP BY 1, 2),
        |purchases AS (
        |  SELECT user_id AS p_user, CAST(floor(date_part('epoch', ts)/86400) AS BIGINT) AS p_epoch,
        |         round(sum(value), 6) AS purchase
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT epoch,
        |       round(avg(balance), 6) AS avg_balance,
        |       round(sum(purchase), 6) AS sum_purchase,
        |       count(*) AS n_users
        |FROM income JOIN purchases ON user_id = p_user AND epoch = p_epoch
        |GROUP BY epoch ORDER BY epoch""".stripMargin,
    "op23_join_min_marker" ->
      """SELECT n_nationkey, n_name, round(min(c_acctbal), 6) AS safe_bound
        |FROM nation JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY n_nationkey, n_name ORDER BY n_nationkey""".stripMargin,
    "op24_broadcast_enrich" ->
      """SELECT o_orderkey, o_custkey, c_name, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "op25_zip_join" ->
      """WITH c AS (SELECT c_name, row_number() OVER (ORDER BY c_custkey) AS rn FROM customer),
        |     s AS (SELECT s_name, row_number() OVER (ORDER BY s_suppkey) AS rn FROM supplier)
        |SELECT CAST(c.rn AS BIGINT) AS pos, c_name, s_name
        |FROM c JOIN s ON c.rn = s.rn ORDER BY pos""".stripMargin,
    "op26_left_outer_default" ->
      """WITH sup AS (
        |  SELECT s_nationkey, round(sum(s_acctbal), 6) AS nation_supp_bal
        |  FROM supplier GROUP BY s_nationkey)
        |SELECT c_custkey,
        |       coalesce(nation_supp_bal, 1.0) AS supp_bal_or_default
        |FROM customer LEFT JOIN sup ON c_nationkey = s_nationkey
        |ORDER BY c_custkey""".stripMargin)
}
