package graft.operators

import graft.model.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over the `events` stream (builder brief +
  * SURVEY.md §7.4: behavioral-pipeline operators a training-data engine
  * needs). The reference's closest shape is the epoch catch-up / gap
  * detection pair (/root/reference/src/validator_income_handler.py:223,
  * restated as OP-41/OP-42): segmenting a per-key ordered timeline at
  * gaps. Sessionization is the event-time generalization: a new session
  * starts when the gap to the previous event exceeds a threshold.
  *
  * Scale design: ONE hash exchange on `user_id` feeds both window
  * functions (lag + running sum), and the session aggregation reuses the
  * same partitioning (`user_id` is a prefix of the grouping key, so
  * Catalyst plans no second exchange — pinned by SessionOpsSpec). At
  * 100 TB this is the minimal shuffle any per-user sessionization needs;
  * the streaming twin (Spark's native `session_window`, cross-validated
  * in the spec) carries the same semantics incrementally with
  * watermark-bounded state.
  */
object SessionOps {

  /** 8 h in microseconds: sits between the fixtures' median per-user gap
    * (~7.3 h) and p90 (~25 h), so sessions genuinely merge AND split.
    */
  val GapUs: Long = 8L * 3600L * 1000000L

  /** Per-(user, session) rollup: event count, bounds, duration, value sum.
    * Timestamps stay in epoch-micros Longs end-to-end — exact arithmetic,
    * and the DuckDB oracle mirrors it with epoch_us(ts).
    */
  def nsSessionAgg(spark: SparkSession, dir: String): DataFrame =
    sessionize(Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"), col("value")))

  /** The sessionization core over any (user_id, tus: Long, value) frame —
    * [[nsSessionAgg]] binds it to the fixture events; the property spec
    * drives it with adversarial random series (exact-gap ties included).
    */
  def sessionize(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("tus")
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("new_sess",
        // First event, or gap strictly greater than the threshold ⇒ new
        // session. Ties at exactly GapUs stay merged — the same rule as
        // the oracle AND as Spark's native session_window (whose window
        // end is inclusive for the next event; the spec pins a tie case).
        when(lag("tus", 1).over(byUser).isNull
          || col("tus") - lag("tus", 1).over(byUser) > GapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_sess").over(running))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min("tus").as("start_us"),
        max("tus").as("end_us"),
        round(sum("value"), 6).as("total_value"))
      .select(col("user_id"), col("session_id"), col("n_events"),
        col("start_us"), col("end_us"),
        (col("end_us") - col("start_us")).as("duration_us"), col("total_value"))
      .orderBy("user_id", "session_id")
  }

  /** The same rollup through Spark's native `session_window` aggregation —
    * the form the streaming twin uses. Not separately oracled (the spec
    * proves it row-identical to [[nsSessionAgg]]); exposed so batch and
    * streaming share one definition.
    */
  def sessionWindowAgg(events: DataFrame, gap: String = "8 hours"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"),
        round(sum("value"), 6).as("total_value"))

  /** Ordered funnel per session (view → click → purchase): a step counts
    * only if it happens strictly AFTER the previous step's first
    * occurrence — the standard conversion-funnel semantics. Rides the
    * SAME single user_id exchange as [[nsSessionAgg]]: session ids from
    * the two windows, then one grouped aggregation with conditional mins;
    * the step logic is pure row arithmetic on the aggregated frame.
    */
  def nsSessionFunnel(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("tus")
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def firstOf(t: String) =
      min(when(col("event_type") === t, col("tus"))).as(s"t_$t")
    Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"), col("event_type"))
      .withColumn("new_sess",
        when(lag("tus", 1).over(byUser).isNull
          || col("tus") - lag("tus", 1).over(byUser) > GapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_sess").over(running))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        firstOf("view"), firstOf("click"), firstOf("purchase"))
      .select(
        col("user_id"), col("session_id"), col("n_events"),
        col("t_view").isNotNull.as("step_view"),
        // a null step timestamp makes the comparison NULL, not false —
        // coalesce pins missing steps to a non-conversion
        coalesce(col("t_view").isNotNull && col("t_click") > col("t_view"),
          lit(false)).as("step_click"),
        coalesce(col("t_view").isNotNull && col("t_click") > col("t_view")
          && col("t_purchase") > col("t_click"), lit(false)).as("step_purchase"))
      .orderBy("user_id", "session_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ns_session_agg" -> (nsSessionAgg _),
    "ns_session_funnel" -> (nsSessionFunnel _))

  val oracles: Map[String, String] = Map(
    "ns_session_agg" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS tus, value FROM events),
         |f AS (SELECT user_id, tus, value,
         |        CASE WHEN lag(tus) OVER w IS NULL
         |                  OR tus - lag(tus) OVER w > ${GapUs} THEN 1 ELSE 0 END AS new_sess
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)),
         |s AS (SELECT user_id, tus, value,
         |        CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus
         |             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         |      FROM f)
         |SELECT user_id, session_id, count(*) AS n_events,
         |       min(tus) AS start_us, max(tus) AS end_us,
         |       max(tus) - min(tus) AS duration_us,
         |       round(sum(value), 6) AS total_value
         |FROM s GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin,
    "ns_session_funnel" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_type FROM events),
         |f AS (SELECT user_id, tus, event_type,
         |        CASE WHEN lag(tus) OVER w IS NULL
         |                  OR tus - lag(tus) OVER w > ${GapUs} THEN 1 ELSE 0 END AS new_sess
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)),
         |s AS (SELECT user_id, tus, event_type,
         |        CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus
         |             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         |      FROM f),
         |g AS (SELECT user_id, session_id, count(*) AS n_events,
         |        min(CASE WHEN event_type = 'view' THEN tus END) AS t_view,
         |        min(CASE WHEN event_type = 'click' THEN tus END) AS t_click,
         |        min(CASE WHEN event_type = 'purchase' THEN tus END) AS t_purchase
         |      FROM s GROUP BY user_id, session_id)
         |SELECT user_id, session_id, n_events,
         |       t_view IS NOT NULL AS step_view,
         |       COALESCE(t_view IS NOT NULL AND t_click > t_view, FALSE) AS step_click,
         |       COALESCE(t_view IS NOT NULL AND t_click > t_view
         |                AND t_purchase > t_click, FALSE) AS step_purchase
         |FROM g ORDER BY user_id, session_id""".stripMargin)
}
