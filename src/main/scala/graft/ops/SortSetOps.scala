package graft.ops

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorts / limits / top-k (SURVEY.md §2.6, OP-43..45) and set operations
  * (§2.7, OP-46..47). Global ORDER BY + LIMIT compiles to Spark's
  * TakeOrderedAndProject — no full sort materializes at scale.
  */
object SortSetOps {

  /** OP-43 ORDER BY + LIMIT with deterministic tie-break
    * (reference: /root/reference/src/api_handler.py:59,112,250 —
    * `ORDER BY epoch DESC LIMIT n` pagination).
    */
  def op43TopN(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(20)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  /** OP-44 top-k by multiple metrics in one pass: three row_number windows
    * over the same grouped stats, tagged by metric
    * (reference: /root/reference/src/api_handler.py:306-310 — "top7"
    * rankings by earnings/losses/apr).
    */
  def op44TopKMultiMetric(spark: SparkSession, dir: String): DataFrame = {
    val stats = Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(
        round(sum(col("o_totalprice")), 6).as("total_spend"),
        count(lit(1)).as("n_orders"),
        round(max(col("o_totalprice")), 6).as("max_order"))
    def top(metric: String): DataFrame = {
      val w = Window.orderBy(col(metric).desc, col("o_custkey").asc)
      stats.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 7)
        .select(lit(metric).as("metric"), col("rank"), col("o_custkey"),
          col(metric).cast("double").as("metric_value"))
    }
    top("total_spend").unionByName(top("n_orders")).unionByName(top("max_order"))
      .orderBy("metric", "rank")
  }

  /** OP-45 output ordering of grouped results (the reference pre-sorts for
    * groupby then sorts output; only the output sort survives in Spark)
    * (reference: /root/reference/src/api_handler.py:284,302).
    */
  def op45SortedGroupOutput(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy("c_mktsegment")
      .agg(round(avg(col("c_acctbal")), 6).as("avg_bal"))
      .orderBy(col("avg_bal").desc, col("c_mktsegment").asc)

  /** OP-46 union + dedup (v1+v2 subgraph result concat,
    * reference: /root/reference/src/utils/subgraph.py:177,295,327).
    */
  def op46UnionDedup(spark: SparkSession, dir: String): DataFrame = {
    val custNations = Tables.customer(spark, dir)
      .select(col("c_nationkey").cast("long").as("nationkey"))
    val suppNations = Tables.supplier(spark, dir)
      .select(col("s_nationkey").cast("long").as("nationkey"))
    custNations.unionByName(suppNations).distinct().orderBy("nationkey")
  }

  /** OP-47 set difference + intersection membership flag
    * (reference: /root/reference/src/api_handler.py:443-447 — 1/0 flag if a
    * validator appears in both sources).
    */
  def op47DiffIntersect(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_nationkey").cast("long").as("nationkey")).distinct()
    val supp = Tables.supplier(spark, dir)
      .select(col("s_nationkey").cast("long").as("s_nationkey")).distinct()
    cust.join(supp, col("nationkey") === col("s_nationkey"), "left_outer")
      .select(col("nationkey"),
        when(col("s_nationkey").isNotNull, lit(1L)).otherwise(lit(0L)).as("in_both"))
      .orderBy("nationkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "op43_top_n" -> (op43TopN _),
    "op44_topk_multi_metric" -> (op44TopKMultiMetric _),
    "op45_sorted_group_output" -> (op45SortedGroupOutput _),
    "op46_union_dedup" -> (op46UnionDedup _),
    "op47_diff_intersect" -> (op47DiffIntersect _))

  val oracles: Map[String, String] = Map(
    "op43_top_n" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,
    "op44_topk_multi_metric" ->
      """WITH stats AS (
        |  SELECT o_custkey,
        |         round(sum(o_totalprice), 6) AS total_spend,
        |         count(*) AS n_orders,
        |         round(max(o_totalprice), 6) AS max_order
        |  FROM orders GROUP BY o_custkey),
        |t1 AS (SELECT 'total_spend' AS metric,
        |              row_number() OVER (ORDER BY total_spend DESC, o_custkey ASC) AS rank,
        |              o_custkey, CAST(total_spend AS DOUBLE) AS metric_value FROM stats),
        |t2 AS (SELECT 'n_orders' AS metric,
        |              row_number() OVER (ORDER BY n_orders DESC, o_custkey ASC) AS rank,
        |              o_custkey, CAST(n_orders AS DOUBLE) AS metric_value FROM stats),
        |t3 AS (SELECT 'max_order' AS metric,
        |              row_number() OVER (ORDER BY max_order DESC, o_custkey ASC) AS rank,
        |              o_custkey, CAST(max_order AS DOUBLE) AS metric_value FROM stats)
        |SELECT metric, CAST(rank AS BIGINT) AS rank, o_custkey, metric_value
        |FROM (SELECT * FROM t1 WHERE rank <= 7
        |      UNION ALL SELECT * FROM t2 WHERE rank <= 7
        |      UNION ALL SELECT * FROM t3 WHERE rank <= 7)
        |ORDER BY metric, rank""".stripMargin,
    "op45_sorted_group_output" ->
      """SELECT c_mktsegment, round(avg(c_acctbal), 6) AS avg_bal
        |FROM customer GROUP BY c_mktsegment
        |ORDER BY avg_bal DESC, c_mktsegment ASC""".stripMargin,
    "op46_union_dedup" ->
      """SELECT DISTINCT nationkey FROM (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        |  UNION ALL
        |  SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier)
        |ORDER BY nationkey""".stripMargin,
    "op47_diff_intersect" ->
      """WITH cust AS (SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer),
        |     supp AS (SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS s_nationkey FROM supplier)
        |SELECT nationkey,
        |       CAST(CASE WHEN s_nationkey IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS in_both
        |FROM cust LEFT JOIN supp ON nationkey = s_nationkey
        |ORDER BY nationkey""".stripMargin)
}
