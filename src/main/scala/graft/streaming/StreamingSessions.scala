package graft.streaming

import graft.operators.SessionOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.operators.SessionOps]]: the same
  * `session_window` rollup, incremental, with watermark-bounded state —
  * the generalization of the reference's poll-loop "segment a per-key
  * timeline at gaps" shape (SURVEY.md §2.9) to event-time sessions.
  *
  * Scale posture: session state lives in the state store keyed by
  * (user_id, open session), merged per micro-batch; the watermark closes
  * sessions whose end + gap falls behind it, so state is bounded by the
  * number of concurrently-open sessions, not by history. Append mode
  * emits each session exactly once, when it can no longer grow.
  */
object StreamingSessions {

  /** Watermarked streaming sessionization over an event stream with
    * (ts: timestamp, user_id, value). Emits one row per FINALIZED
    * session; the spec proves emitted rows identical to the batch
    * rollup ([[SessionOps.sessionWindowAgg]] ≡ [[SessionOps.nsSessionAgg]]).
    */
  def sessionStream(
      events: DataFrame,
      gap: String = "8 hours",
      watermark: String = "12 hours"): DataFrame =
    SessionOps.sessionWindowAgg(events.withWatermark("ts", watermark), gap)
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"),
        col("start_us"), col("end_us"), col("total_value"))

  /** Watermarked streaming ORDERED FUNNEL (view → click → purchase) over
    * an event stream with (ts, user_id, event_type): one row per finalized
    * session carrying the step flags, semantics identical to the batch
    * [[SessionOps.funnel]] (spec-gated via [[SessionOps.sessionWindowFunnel]],
    * which both forms share).
    */
  def funnelStream(
      events: DataFrame,
      gap: String = "8 hours",
      watermark: String = "12 hours"): DataFrame =
    SessionOps.sessionWindowFunnel(events.withWatermark("ts", watermark), gap)
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("start_us"),
        col("step_view"), col("step_click"), col("step_purchase"))

  /** readStream → ordered funnel → append parquet, in the same
    * exactly-once file pipeline as [[sessionFilePipeline]]: checkpointed
    * file offsets, watermark-driven session closure, one appended row per
    * finalized session across restarts.
    */
  def funnelFilePipeline(
      spark: org.apache.spark.sql.SparkSession,
      srcDir: String,
      outPath: String,
      checkpointDir: String,
      gap: String = "8 hours",
      watermark: String = "12 hours"): org.apache.spark.sql.streaming.StreamingQuery = {
    val stream = spark.readStream
      .schema(graft.model.Tables.eventsRawSchema)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .withColumn("ts", expr("timestamp_micros(ts)"))
    funnelStream(stream, gap, watermark)
      .writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }

  /** readStream → session rollup → append parquet: the file-landed form
    * of the pipeline. With Trigger.AvailableNow it doubles as an
    * incremental batch job over newly-landed event files, exactly like
    * [[StreamingIncome.incomeFilePipeline]]; the parquet sink is
    * append-only and exactly-once per finalized session (checkpointed
    * offsets + deterministic session closure).
    */
  def sessionFilePipeline(
      spark: org.apache.spark.sql.SparkSession,
      srcDir: String,
      outPath: String,
      checkpointDir: String,
      gap: String = "8 hours",
      watermark: String = "12 hours"): org.apache.spark.sql.streaming.StreamingQuery = {
    val stream = spark.readStream
      .schema(graft.model.Tables.eventsRawSchema)
      .option("pathGlobFilter", "*.parquet")
      // One file per micro-batch so the watermark advances BETWEEN files
      // and sessions straddling file boundaries exercise state merge.
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .withColumn("ts", expr("timestamp_micros(ts)"))
    sessionStream(stream, gap, watermark)
      .writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }
}
