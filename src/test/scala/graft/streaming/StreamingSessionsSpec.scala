package graft.streaming

import graft.SparkSpec
import graft.model.Tables
import graft.operators.SessionOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming sessionization == batch sessionization, across micro-batch
  * splits, with watermark-driven finalization.
  */
class StreamingSessionsSpec extends SparkSpec {

  private val keep = Seq("user_id", "n_events", "start_us", "end_us", "total_value")

  /** Far-future sentinel that pushes the watermark past every real
    * session's close; its own (still-open) session must never emit.
    */
  private val sentinel = (java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), 999999L, 0.0)

  private def runStream(
      batches: Seq[Seq[(java.sql.Timestamp, Long, Double)]]): Set[Seq[Any]] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val query = StreamingSessions.sessionStream(
      input.toDS().toDF("ts", "user_id", "value"))
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
      input.addData(Seq(sentinel)); query.processAllAvailable()
    } finally query.stop()
    val out = spark.table("sessions_out")
    assert(out.where(col("user_id") === sentinel._2).isEmpty,
      "the sentinel's open session leaked into append output")
    out.selectExpr(keep: _*).collect().map(_.toSeq).toSet
  }

  test("sessions split across micro-batches merge in state and match batch") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      // user 1: one session of 3 events (gaps < 8h) straddling the split,
      // then a second session 20h later
      (t("2024-01-01 00:00:00"), 1L, 1.0), (t("2024-01-01 05:00:00"), 1L, 2.0),
      (t("2024-01-01 09:00:00"), 1L, 3.0), (t("2024-01-02 05:00:00"), 1L, 4.0),
      // user 2: boundary case — a gap of EXACTLY 8h stays merged, in both
      // session_window (window end is inclusive for the next event) and
      // the lag form (new session only when gap is strictly > GapUs)
      (t("2024-01-01 00:00:00"), 2L, 5.0), (t("2024-01-01 08:00:00"), 2L, 6.0))
    val got = runStream(Seq(rows.take(2), rows.drop(2)))
    val batch = SessionOps.sessionWindowAgg(rows.toDF("ts", "user_id", "value"))
      .selectExpr(keep: _*).collect().map(_.toSeq).toSet
    assert(got == batch, s"streaming $got != batch $batch")
    assert(got.size == 3, s"expected 2 sessions for user1, 1 merged for user2: $got")
    assert(got.exists(r => r.head == 2L && r(1) == 2L), "user2's tie did not merge")
  }

  test("fixture events through two micro-batches equal the batch rollup") {
    val ev = Tables.events(spark, sfDir)
      .select(col("ts"), col("user_id"), col("value"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSeq
      .sortBy(_._1.getTime)
    val (b1, b2) = ev.splitAt(ev.length / 2)
    val got = runStream(Seq(b1, b2))
    val batch = SessionOps.nsSessionAgg(spark, sfDir)
      .selectExpr(keep: _*).collect().map(_.toSeq).toSet
    assert(got == batch,
      s"sizes ${got.size} vs ${batch.size}; only-stream=${(got -- batch).take(3)} " +
        s"only-batch=${(batch -- got).take(3)}")
  }

  /** session_window keys by start time; re-number per user in start order
    * to compare with the batch funnel's ordinal session_id.
    */
  private def ordinalize(
      rows: Seq[(Long, Long, Long, Boolean, Boolean, Boolean)]): Set[Seq[Any]] =
    rows.groupBy(_._1).toSeq.flatMap { case (uid, rs) =>
      rs.sortBy(_._2).zipWithIndex.map { case (r, i) =>
        Seq[Any](uid, (i + 1).toLong, r._3, r._4, r._5, r._6) }
    }.toSet

  private val funnelCols = Seq("user_id", "start_us", "n_events",
    "step_view", "step_click", "step_purchase")

  private def funnelTuples(df: org.apache.spark.sql.DataFrame) =
    df.selectExpr(funnelCols: _*).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))).toSeq

  test("streaming funnel across micro-batches equals the batch funnel") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, sfDir)
      .select(col("ts"), col("user_id"), col("event_type"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2)))
      .toSeq.sortBy(_._1.getTime)
    val (b1, b2) = ev.splitAt(ev.length / 2)
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val query = StreamingSessions.funnelStream(
      input.toDS().toDF("ts", "user_id", "event_type"))
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Append).start()
    try {
      Seq(b1, b2).foreach { b => input.addData(b); query.processAllAvailable() }
      input.addData(Seq((sentinel._1, sentinel._2, "view")))
      query.processAllAvailable()
    } finally query.stop()
    val out = spark.table("funnel_out").where(col("user_id") =!= sentinel._2)
    val got = ordinalize(funnelTuples(out))
    val want = SessionOps.nsSessionFunnel(spark, sfDir).collect().map(_.toSeq).toSet
    assert(got.nonEmpty && got == want,
      s"only-stream=${(got -- want).take(3)} only-batch=${(want -- got).take(3)}")
  }

  test("funnel file pipeline is exactly-once across restart and equals batch") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft_funl_src")
    val out = java.nio.file.Files.createTempDirectory("graft_funl_out").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_funl_cp").toString
    // Landed files carry ts as long micros (Tables.eventsRawSchema).
    val raw = Tables.events(spark, sfDir).withColumn("ts", expr("unix_micros(ts)"))
    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_funl_split").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.move(part, srcDir.resolve(name))
    }
    val mid = raw.selectExpr("CAST(approx_percentile(ts, 0.5) AS BIGINT)").first().getLong(0)
    land(raw.where(col("ts") <= mid), "a.parquet")
    StreamingSessions.funnelFilePipeline(spark, srcDir.toString, out, cp)
      .awaitTermination()
    land(raw.where(col("ts") > mid), "b.parquet")
    land(raw.limit(1).withColumn("ts", lit(java.sql.Timestamp.valueOf("2030-01-01 00:00:00")))
      .withColumn("ts", expr("unix_micros(ts)")) // back to landed long micros
      .withColumn("user_id", lit(999999L)), "z_sentinel.parquet")
    StreamingSessions.funnelFilePipeline(spark, srcDir.toString, out, cp)
      .awaitTermination()
    val gotRows = funnelTuples(
      spark.read.parquet(out).where(col("user_id") =!= 999999L))
    assert(gotRows.length == gotRows.distinct.length, "duplicate finalized sessions")
    val want = SessionOps.nsSessionFunnel(spark, sfDir).collect().map(_.toSeq).toSet
    assert(ordinalize(gotRows) == want,
      s"sizes ${gotRows.length} vs ${want.size}")
  }

  test("file pipeline appends each finalized session exactly once across restart") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft_sess_src")
    val out = java.nio.file.Files.createTempDirectory("graft_sess_out").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_sess_cp").toString
    // Landed files carry ts as long micros (Tables.eventsRawSchema).
    val raw = Tables.events(spark, sfDir).withColumn("ts", expr("unix_micros(ts)"))
    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_sess_split").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.move(part, srcDir.resolve(name))
    }
    // Time-ordered halves (event_id follows ts in the fixture), so run 2's
    // watermark catches up past run 1's sessions.
    val mid = raw.selectExpr("CAST(approx_percentile(ts, 0.5) AS BIGINT)").first().getLong(0)
    land(raw.where(col("ts") <= mid), "a.parquet")
    StreamingSessions.sessionFilePipeline(spark, srcDir.toString, out, cp)
      .awaitTermination()
    // Sentinel file pushes the watermark past every real session's close;
    // restart consumes ONLY the new files from the checkpointed index.
    land(raw.where(col("ts") > mid), "b.parquet")
    land(raw.limit(1).withColumn("ts", lit(java.sql.Timestamp.valueOf("2030-01-01 00:00:00")))
      .withColumn("ts", expr("unix_micros(ts)")) // back to landed long micros
      .withColumn("user_id", lit(999999L)), "z_sentinel.parquet")
    StreamingSessions.sessionFilePipeline(spark, srcDir.toString, out, cp)
      .awaitTermination()
    val got = spark.read.parquet(out).where(col("user_id") =!= 999999L)
      .selectExpr(keep: _*).collect().map(_.toSeq)
    val batch = SessionOps.nsSessionAgg(spark, sfDir)
      .selectExpr(keep: _*).collect().map(_.toSeq)
    // exactly once: no duplicate session rows across the two runs
    assert(got.length == got.distinct.length, "duplicate finalized sessions")
    assert(got.toSet == batch.toSet,
      s"sizes ${got.length} vs ${batch.length}")
  }
}
