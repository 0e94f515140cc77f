package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Watermarked streaming dedup: first arrival survives, within-horizon
  * duplicates drop (across micro-batch boundaries), state expires past the
  * horizon.
  */
class StreamingDedupSpec extends SparkSpec {

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  test("dedup keeps first arrival, drops within-horizon dups, expires state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = input.toDS().toDF("ts", "doc_id", "text")
    val query = StreamingDedup.dedupStream(docs, horizon = "1 day")
      .select("doc_id")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      // Batch 1: two copies of "alpha" in ONE batch -> one survivor (id 1);
      // "beta" survives.
      input.addData(Seq((ts(1), 1L, "alpha"), (ts(1), 2L, "alpha"), (ts(1), 3L, "beta")))
      query.processAllAvailable()
      // Batch 2: "alpha" again within the 1-day horizon -> dropped (state
      // carried ACROSS the micro-batch boundary); "gamma" new -> kept.
      input.addData(Seq((ts(2), 4L, "alpha"), (ts(2), 5L, "gamma")))
      query.processAllAvailable()
      // Batch 3: push the watermark far past the horizon (watermarks only
      // advance at batch completion, so expiry needs its own batch).
      input.addData(Seq((ts(20), 6L, "delta")))
      query.processAllAvailable()
      // Batch 4: the "alpha" fingerprint state has expired — a re-arrival
      // is admitted again.
      input.addData(Seq((ts(21), 7L, "alpha")))
      query.processAllAvailable()
    } finally query.stop()
    val kept = spark.table("dedup_out").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L, 6L, 7L), s"got $kept")
  }

  test("streaming near-dup admission matches the batch incremental query") {
    import org.apache.spark.sql.functions.col
    import graft.operators.DedupOps
    val docs = graft.model.Tables.documents(spark, sfDir)
    val corpus = docs.where(col("doc_id") % 10 >= 2)
    val batchDocs = docs.where(col("doc_id") % 10 < 2)
    // Land the arriving docs as two parquet files -> two micro-batches.
    val srcDir = java.nio.file.Files.createTempDirectory("graft_neardup_src")
    val out = java.nio.file.Files.createTempDirectory("graft_neardup_out").toString + "/admitted"
    val cp = java.nio.file.Files.createTempDirectory("graft_neardup_cp").toString
    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_neardup_split").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.move(part, srcDir.resolve(name))
    }
    land(batchDocs.where(col("doc_id") % 20 < 2), "a.parquet")
    land(batchDocs.where(col("doc_id") % 20 >= 10), "b.parquet")
    val stream = spark.readStream.schema(batchDocs.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
    StreamingDedup.nearDupAdmission(stream, corpus, out, cp)
      .awaitTermination()
    val admitted = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // Cross-check against the ORACLED batch query: admitted = batch docs
    // minus those with a corpus near-dup.
    val dupDocs = DedupOps.nsDedupIncremental(spark, sfDir)
      .select("batch_doc").collect().map(_.getLong(0)).toSet
    val expected = batchDocs.select("doc_id").collect().map(_.getLong(0)).toSet -- dupDocs
    assert(admitted == expected,
      s"admitted ${admitted.size} vs expected ${expected.size}")
  }
}
