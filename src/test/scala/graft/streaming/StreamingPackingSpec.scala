package graft.streaming

import graft.SparkSpec
import graft.model.Tables
import graft.operators.{PackingOps, SamplingOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming sampling == batch sampling; streaming packing == batch
  * packing across micro-batch splits (state carries the running totals).
  */
class StreamingPackingSpec extends SparkSpec {

  private def fixtureDocs: Seq[(Long, String, String, Long)] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sortBy(_._1)

  test("streaming hash sample admits exactly the batch sample rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = fixtureDocs
    val (b1, b2) = docs.splitAt(docs.length / 2)
    val input = MemoryStream[(Long, String, String, Long)]
    val query = StreamingPacking.sampleStream(
      input.toDS().toDF("doc_id", "lang", "text", "n_chars"))
      .writeStream.format("memory").queryName("sample_out")
      .outputMode(OutputMode.Append).start()
    try {
      Seq(b1, b2).foreach { b => input.addData(b); query.processAllAvailable() }
    } finally query.stop()
    val got = spark.table("sample_out").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val want = SamplingOps.nsCorpusSampleHash(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.nonEmpty && got == want,
      s"stream admitted ${got.size} vs batch ${want.size}")
  }

  test("pack file pipeline continues chunk spans across a checkpointed restart") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft_pack_src")
    val out = java.nio.file.Files.createTempDirectory("graft_pack_out").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_pack_cp").toString
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_pack_split").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.move(part, srcDir.resolve(name))
    }
    val mid = raw.selectExpr("CAST(approx_percentile(doc_id, 0.5) AS BIGINT)")
      .first().getLong(0)
    land(raw.where(col("doc_id") <= mid).orderBy("doc_id"), "a.parquet")
    StreamingPacking.packFilePipeline(spark, srcDir.toString, out, cp)
      .awaitTermination()
    // restart: run 2 consumes ONLY b.parquet, with running totals from
    // the checkpointed state store
    land(raw.where(col("doc_id") > mid).orderBy("doc_id"), "b.parquet")
    StreamingPacking.packFilePipeline(spark, srcDir.toString, out, cp)
      .awaitTermination()
    val cols = Seq("doc_id", "lang", "toks", "cum_before",
      "first_chunk", "last_chunk", "n_chunks")
    val gotRows = spark.read.parquet(out).selectExpr(cols: _*)
      .collect().map(_.toSeq)
    assert(gotRows.length == gotRows.distinct.length, "duplicate packed rows")
    val want = PackingOps.nsPackChunks(spark, sfDir).selectExpr(cols: _*)
      .collect().map(_.toSeq).toSet
    assert(gotRows.toSet == want,
      s"sizes ${gotRows.length} vs ${want.size}")
  }

  test("streaming decontamination admits exactly the batch keep set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_decon_out").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_decon_cp").toString
    val docs = fixtureDocs
    val probe = Tables.documents(spark, sfDir).where(col("doc_id") % 50 === 0)
    val corpus = docs.filterNot(_._1 % 50 == 0)
    val (b1, b2) = corpus.splitAt(corpus.length / 2)
    val input = MemoryStream[(Long, String, String, Long)]
    val query = StreamingDecontaminate.admissionStream(
      input.toDS().toDF("doc_id", "lang", "text", "n_chars"), probe, out, cp,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      Seq(b1, b2).foreach { b => input.addData(b); query.processAllAvailable() }
    } finally query.stop()
    val got = spark.read.parquet(out).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val dropped = graft.operators.DedupOps.nsDecontaminate(spark, sfDir)
      .where(col("drop_doc")).select("doc_id").collect().map(_.getLong(0)).toSet
    val want = corpus.map(_._1).toSet -- dropped
    assert(dropped.nonEmpty, "fixture has no contaminated docs — test is vacuous")
    assert(got == want,
      s"admitted ${got.size} vs expected ${want.size}; " +
        s"extra=${(got -- want).take(5)} missing=${(want -- got).take(5)}")
  }

  test("streaming packing equals batch packing across a mid-shard split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = fixtureDocs
    // split at an arbitrary point: several langs straddle the boundary,
    // so chunk spans must continue from checkpointed running totals
    val (b1, b2) = docs.splitAt(docs.length / 3)
    val input = MemoryStream[(Long, String, String, Long)]
    val query = StreamingPacking.packStream(
      input.toDS().toDF("doc_id", "lang", "text", "n_chars"))
      .writeStream.format("memory").queryName("pack_out")
      .outputMode(OutputMode.Append).start()
    try {
      Seq(b1, b2).foreach { b => input.addData(b); query.processAllAvailable() }
    } finally query.stop()
    val cols = Seq("doc_id", "lang", "toks", "cum_before",
      "first_chunk", "last_chunk", "n_chunks")
    val got = spark.table("pack_out").selectExpr(cols: _*)
      .collect().map(_.toSeq).toSet
    val want = PackingOps.nsPackChunks(spark, sfDir).selectExpr(cols: _*)
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty && got == want,
      s"sizes ${got.size} vs ${want.size}; " +
        s"only-stream=${(got -- want).take(3)} only-batch=${(want -- got).take(3)}")
    // and at least one document genuinely straddles the batch boundary's
    // running total (its chunk span started in a chunk opened by batch 1)
    val batch1Ids = b1.map(_._1).toSet
    val crossers = spark.table("pack_out")
      .where(!col("doc_id").isInCollection(batch1Ids) && col("cum_before") % PackingOps.ChunkTokens =!= 0)
      .count()
    assert(crossers > 0, "no batch-2 doc continued a batch-1 chunk — split too clean to prove state carry")
  }
}
