package graft.streaming

import graft.SparkSpec
import graft.operators.SamplingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

/** Streaming DSIR admission == the batch query's keep set, and the pure
  * projection scoring == the exploded aggregation, row for row.
  */
class StreamingDsirSpec extends SparkSpec {

  test("projection scoring equals the batch query's exploded aggregation") {
    val docs = graft.model.Tables.documents(spark, sfDir)
    val (nGrams, llrU) = SamplingOps.dsirScoreCols(SamplingOps.dsirLlrTable(docs))
    val got = docs.select(col("doc_id"), nGrams.as("n_grams"), llrU.as("llr_u"))
      .where(col("n_grams") > 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1)
    val want = SamplingOps.nsCorpusDsir(spark, sfDir)
      .select("doc_id", "n_grams", "llr_u")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1)
    assert(got == want, s"projection != aggregation: got=${got.take(3)} want=${want.take(3)}")
  }

  test("streaming admission keeps exactly the batch keep set across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.model.Tables.documents(spark, sfDir)
    val rows = docs.select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    val input = MemoryStream[(Long, String)]
    val query = StreamingDsir.admissionStream(
      input.toDS().toDF("doc_id", "text"), docs)
      .select("doc_id")
      .writeStream.format("memory").queryName("dsir_out")
      .outputMode(OutputMode.Append).start()
    try {
      val (b1, b2) = rows.splitAt(rows.length / 2)
      Seq(b1, b2).foreach { b => input.addData(b); query.processAllAvailable() }
    } finally query.stop()
    val admitted = spark.table("dsir_out").as[Long].collect().toSet
    val want = SamplingOps.nsCorpusDsir(spark, sfDir)
      .where(col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(admitted == want,
      s"admitted ${admitted.size} vs batch keep ${want.size}: " +
        s"extra=${(admitted -- want).take(3)} missing=${(want -- admitted).take(3)}")
  }
}
