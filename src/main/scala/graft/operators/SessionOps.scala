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
    * only if SOME matching event happens strictly AFTER the previous
    * step's completion time — the standard conversion-funnel semantics.
    * Concretely: t_view is the session's first view; t_click the first
    * click strictly after t_view (a click BEFORE the first view does not
    * complete the step, but a later one still can); t_purchase the first
    * purchase strictly after that click.
    *
    * Rides the SAME single user_id exchange as [[nsSessionAgg]]: the
    * sequential step mins are unbounded-frame window aggregates over
    * (user_id, session_id) — hash-partitioning on user_id already
    * co-locates every session, so Catalyst plans sorts but NO further
    * exchange (pinned by SessionOpsSpec), and the final rollup reuses the
    * same partitioning via the grouping-key prefix.
    */
  def nsSessionFunnel(spark: SparkSession, dir: String): DataFrame =
    funnel(Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"), col("event_type")))

  /** The funnel core over any (user_id, tus: Long, event_type) frame —
    * [[nsSessionFunnel]] binds it to the fixture events; the property spec
    * drives it with adversarial shuffled-step random series.
    */
  def funnel(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("tus")
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Unbounded frame over the whole session: every row sees the step
    // times, so each conditional min can reference the previous step's.
    val bySession = Window.partitionBy("user_id", "session_id")
    events
      .withColumn("new_sess",
        when(lag("tus", 1).over(byUser).isNull
          || col("tus") - lag("tus", 1).over(byUser) > GapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_sess").over(running))
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("tus"))).over(bySession))
      // a null t_view makes the comparison NULL ⇒ when() yields NULL ⇒ the
      // min ignores it: no view, no click step — exactly the funnel rule
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("tus") > col("t_view"),
          col("tus"))).over(bySession))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" && col("tus") > col("t_click"),
          col("tus"))).over(bySession))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        // window aggregates are constant within the session; min() just
        // collapses the duplicated per-row copies
        min("t_view").as("tv"), min("t_click").as("tc"), min("t_purchase").as("tp"))
      .select(
        col("user_id"), col("session_id"), col("n_events"),
        col("tv").isNotNull.as("step_view"),
        col("tc").isNotNull.as("step_click"),
        col("tp").isNotNull.as("step_purchase"))
      .orderBy("user_id", "session_id")
  }

  /** The ordered funnel through Spark's native `session_window` — the form
    * the streaming twin uses. The sequential step logic can't ride window
    * functions there (the session isn't a window partition until it
    * closes), so the aggregation collects the session's (tus, event_type)
    * events and the step mins are higher-order-function folds over that
    * array in a post-aggregation projection — state per session is O(its
    * events), the same bound `collect_list` session analytics carry in
    * production. Not separately oracled: the spec proves it row-identical
    * to [[funnel]]; exposed so batch and streaming share one definition.
    */
  def sessionWindowFunnel(events: DataFrame, gap: String = "8 hours"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        collect_list(struct(unix_micros(col("ts")).as("tus"),
          col("event_type").as("et"))).as("evs"))
      .withColumn("t_view",
        expr("array_min(transform(filter(evs, e -> e.et = 'view'), e -> e.tus))"))
      .withColumn("t_click", expr(
        "array_min(transform(filter(evs, e -> e.et = 'click' AND e.tus > t_view), e -> e.tus))"))
      .withColumn("t_purchase", expr(
        "array_min(transform(filter(evs, e -> e.et = 'purchase' AND e.tus > t_click), e -> e.tus))"))
      .select(col("user_id"), col("w"), col("n_events"), col("start_us"),
        col("t_view").isNotNull.as("step_view"),
        col("t_click").isNotNull.as("step_click"),
        col("t_purchase").isNotNull.as("step_purchase"))

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
         |g AS (SELECT *, min(CASE WHEN event_type = 'view' THEN tus END)
         |             OVER (PARTITION BY user_id, session_id) AS t_view FROM s),
         |h AS (SELECT *, min(CASE WHEN event_type = 'click' AND tus > t_view
         |                         THEN tus END)
         |             OVER (PARTITION BY user_id, session_id) AS t_click FROM g),
         |i AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND tus > t_click
         |                         THEN tus END)
         |             OVER (PARTITION BY user_id, session_id) AS t_purchase FROM h)
         |SELECT user_id, session_id, count(*) AS n_events,
         |       min(t_view) IS NOT NULL AS step_view,
         |       min(t_click) IS NOT NULL AS step_click,
         |       min(t_purchase) IS NOT NULL AS step_purchase
         |FROM i GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin)
}
