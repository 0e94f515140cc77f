package graft.streaming

import graft.SparkSpec
import graft.ops.{IncomeKernel, WindowOps}
import graft.streaming.StreamingIncome.{BalanceRow, IncomeUpdate}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming income == batch income, across micro-batch boundaries. */
class StreamingIncomeSpec extends SparkSpec {

  private def runStream(batches: Seq[Seq[BalanceRow]]): Seq[IncomeUpdate] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[BalanceRow]
    val query = StreamingIncome.incomeStream(input.toDS())
      .writeStream
      .format("memory")
      .queryName("income_out")
      .outputMode(OutputMode.Append)
      .start()
    try {
      batches.foreach { b =>
        input.addData(b)
        query.processAllAvailable()
      }
    } finally query.stop()
    spark.table("income_out").as[IncomeUpdate].collect().toSeq
      .sortBy(u => (u.user_id, u.epoch))
  }

  test("streaming matches batch kernel across micro-batch splits") {
    import spark.implicits._
    val rows = Seq(
      BalanceRow(1, 10, 100.0, 0.0), BalanceRow(1, 11, 110.0, 5.0),
      BalanceRow(1, 12, 108.0, 0.0), BalanceRow(1, 13, 140.0, 0.0),
      BalanceRow(2, 10, 50.0, 0.0), BalanceRow(2, 11, 60.0, 0.0),
      // user 2 then gaps: 11 -> 14 must halt processing
      BalanceRow(2, 14, 999.0, 0.0), BalanceRow(2, 15, 1000.0, 0.0))
    // Split mid-series for user 1 to prove state carries across batches.
    val got = runStream(Seq(rows.take(3), rows.drop(3)))

    val batch = IncomeKernel.cumulativeIncome(
      rows.toDF("user_id", "epoch", "balance", "withdrawal"))
      .orderBy("user_id", "epoch").collect()
      .map(r => IncomeUpdate(r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5))).toSeq

    assert(got == batch)
    assert(got.count(_.user_id == 2) == 2) // epochs 14,15 dropped by the gap halt
  }

  test("gap halt resumes once the backfiller delivers the contiguous epoch") {
    import spark.implicits._
    val live = Seq(
      BalanceRow(7, 10, 100.0, 0.0), BalanceRow(7, 11, 110.0, 0.0),
      // gap 11 -> 14: halt, rows 14..15 dropped
      BalanceRow(7, 14, 150.0, 0.0), BalanceRow(7, 15, 160.0, 0.0))
    // Backfill re-delivers the gap range AND the previously-dropped rows,
    // exactly what the reference's poll loop re-reads from storage.
    val backfill = Seq(
      BalanceRow(7, 12, 120.0, 0.0), BalanceRow(7, 13, 130.0, 0.0),
      BalanceRow(7, 14, 150.0, 0.0), BalanceRow(7, 15, 160.0, 0.0))
    val got = runStream(Seq(live, backfill))

    val full = (live.take(2) ++ backfill)
    val batch = IncomeKernel.cumulativeIncome(
      full.toDF("user_id", "epoch", "balance", "withdrawal"))
      .orderBy("user_id", "epoch").collect()
      .map(r => IncomeUpdate(r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5))).toSeq

    assert(got == batch, s"$got != $batch")
    assert(got.map(_.epoch) == Seq(10L, 11L, 12L, 13L, 14L, 15L))
  }

  test("property: random series with gaps, random batch splits == batch kernel") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      // Random per-user epoch series with occasional gaps; the batch kernel
      // cuts at the first gap, and the stream must agree wherever the batch
      // produces rows (ordered delivery, no backfill in this trial).
      val rows = (1L to 4L).flatMap { uid =>
        var epoch = 10L
        (0 until 12).map { _ =>
          epoch += (if (rnd.nextDouble() < 0.15) 3L else 1L) // 15% gap odds
          BalanceRow(uid, epoch,
            math.round(rnd.nextDouble() * 1e8) / 1e6,
            if (rnd.nextDouble() < 0.3) math.round(rnd.nextDouble() * 1e7) / 1e6 else 0.0)
        }
      }
      val cut1 = 1 + rnd.nextInt(rows.length - 2)
      val cut2 = cut1 + 1 + rnd.nextInt(rows.length - cut1 - 1)
      val sorted = rows.sortBy(r => (r.user_id, r.epoch))
      val got = runStream(Seq(
        sorted.take(cut1), sorted.slice(cut1, cut2), sorted.drop(cut2)))
      val batch = IncomeKernel.cumulativeIncome(
        rows.toDF("user_id", "epoch", "balance", "withdrawal"))
        .orderBy("user_id", "epoch").collect()
        .map(r => IncomeUpdate(r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getLong(5))).toSeq
      // The stream may emit FEWER rows than batch only if a batch boundary
      // split a would-be-contiguous run after a gap; with ordered global
      // delivery (we split the globally sorted list) both paths halt at the
      // same first gap, so outputs must be identical.
      assert(got == batch, s"trial $trial: ${got.size} vs ${batch.size}")
    }
  }

  test("streaming on fixture-derived balances equals the batch kernel") {
    import spark.implicits._
    val bal = WindowOps.balancesFromEvents(spark, sfDir)
      .as[BalanceRow].collect().toSeq.sortBy(b => (b.user_id, b.epoch))
    val (b1, b2) = bal.splitAt(bal.length / 2)
    val got = runStream(Seq(b1, b2))
    val batch = IncomeKernel.cumulativeIncome(
      bal.toDF("user_id", "epoch", "balance", "withdrawal"))
      .orderBy("user_id", "epoch").collect()
      .map(r => IncomeUpdate(r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5))).toSeq
    assert(got.size == batch.size)
    got.zip(batch).foreach { case (g, b) => assert(g == b, s"$g != $b") }
  }

  test("file-source pipeline processes TWO micro-batches and still equals batch") {
    import org.apache.spark.sql.functions.col
    val srcDir = java.nio.file.Files.createTempDirectory("graft_stream_src")
    val out = java.nio.file.Files.createTempDirectory("graft_stream_out").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_stream_cp").toString
    // Split the events into two landed files (ts as long micros, the
    // file-stream landing convention — Tables.eventsRawSchema) so every
    // user's series straddles the micro-batch boundary.
    val raw = graft.model.Tables.events(spark, sfDir)
      .withColumn("ts", org.apache.spark.sql.functions.expr("unix_micros(ts)"))
    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_split").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.move(part, srcDir.resolve(name))
    }
    land(raw.where(col("event_id") % 2 === 0), "a.parquet")
    land(raw.where(col("event_id") % 2 === 1), "b.parquet")

    val q = StreamingIncome.incomeFilePipeline(spark, srcDir.toString, out, cp)
    q.awaitTermination()
    val got = spark.read.parquet(s"$out/income")
      .selectExpr("user_id", "epoch", "earnings", "losses", "apr", "epochs_since_active")
      .orderBy("user_id", "epoch").collect().map(_.toSeq)
    val want = graft.ops.IncomeKernel.cumulativeIncome(
      WindowOps.balancesFromEvents(spark, sfDir))
      .orderBy("user_id", "epoch").collect().map(_.toSeq)
    assert(got.length == want.length, s"${got.length} != ${want.length}")
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }
  }

  test("file pipeline restarted from its checkpoint processes only new files") {
    import org.apache.spark.sql.functions.col
    val srcDir = java.nio.file.Files.createTempDirectory("graft_restart_src")
    val out = java.nio.file.Files.createTempDirectory("graft_restart_out").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_restart_cp").toString
    // Landed files carry ts as long micros (Tables.eventsRawSchema).
    val raw = graft.model.Tables.events(spark, sfDir)
      .withColumn("ts", org.apache.spark.sql.functions.expr("unix_micros(ts)"))
    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_restart_split").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.move(part, srcDir.resolve(name))
    }
    // Run 1: only half the events exist — the poll loop's first invocation.
    land(raw.where(col("event_id") % 2 === 0), "a.parquet")
    StreamingIncome.incomeFilePipeline(spark, srcDir.toString, out, cp)
      .awaitTermination()
    val afterFirst = spark.read.parquet(s"$out/income").count()
    // Run 2: a new file landed; the restarted query resumes from the
    // checkpointed file index and must consume ONLY the new file, ending
    // at exactly the batch-recompute answer over all data.
    land(raw.where(col("event_id") % 2 === 1), "b.parquet")
    StreamingIncome.incomeFilePipeline(spark, srcDir.toString, out, cp)
      .awaitTermination()
    val got = spark.read.parquet(s"$out/income")
      .selectExpr("user_id", "epoch", "earnings", "losses", "apr", "epochs_since_active")
      .orderBy("user_id", "epoch").collect().map(_.toSeq)
    val want = graft.ops.IncomeKernel.cumulativeIncome(
      WindowOps.balancesFromEvents(spark, sfDir))
      .orderBy("user_id", "epoch").collect().map(_.toSeq)
    assert(afterFirst > 0 && afterFirst != want.length,
      s"first run should be partial: $afterFirst vs ${want.length}")
    assert(got.length == want.length, s"${got.length} != ${want.length}")
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }
  }

  test("watermarked daily volume emits per-day sums") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val ds = input.toDS().toDF("ts", "user_id", "value")
    val query = StreamingIncome.dailyVolume(spark, ds)
      .writeStream.format("memory").queryName("daily_out")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData(Seq(
        (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, 10.0),
        (java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 1L, 5.0),
        (java.sql.Timestamp.valueOf("2024-01-02 09:00:00"), 1L, 7.0)))
      query.processAllAvailable()
    } finally query.stop()
    val out = spark.table("daily_out").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2))).sorted
    assert(out.toSeq == Seq(
      ("2024-01-01 00:00:00.0", 1L, 15.0),
      ("2024-01-02 00:00:00.0", 1L, 7.0)))
  }
}
