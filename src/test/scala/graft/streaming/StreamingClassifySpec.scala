package graft.streaming

import graft.SparkSpec
import graft.model.Tables
import graft.operators.IndexOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming model-scoring twin: a 2-batch stream scored under the
  * stored classifier artifact equals the batch serve query row for row —
  * micro-batch boundaries cannot move any score because every feature
  * derives from the scored document's own text and the weights are
  * frozen at wire-up.
  */
class StreamingClassifySpec extends SparkSpec {

  test("2-batch streamed scoring equals the stored-model batch scoring") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sfDir)
    val root = java.nio.file.Files.createTempDirectory("graft_cls_model").toString
    val out = java.nio.file.Files.createTempDirectory("graft_cls_out").toString + "/scored"
    val cp = java.nio.file.Files.createTempDirectory("graft_cls_cp").toString
    IndexOps.buildClassifierIndex(docs, root)

    val rows = docs.select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    val input = MemoryStream[(Long, String)]
    val (b1, b2) = rows.splitAt(rows.length / 2)
    input.addData(b1)
    val q1 = StreamingClassify.scoringStream(
      input.toDS().toDF("doc_id", "text"), root, out, cp)
    q1.processAllAvailable(); q1.stop()
    input.addData(b2)
    val q2 = StreamingClassify.scoringStream(
      input.toDS().toDF("doc_id", "text"), root, out, cp)
    q2.processAllAvailable(); q2.stop()

    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "logit", "keep", "label")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2),
          r.getBoolean(3))).toSet
    val got = key(spark.read.parquet(out))
    val want = key(IndexOps.queryClassifierIndex(spark, root, docs))
    assert(want.nonEmpty && got == want,
      s"streamed ${got.size} vs batch ${want.size}: " +
        s"extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
    // both micro-batches actually wrote (the second run resumed from the
    // checkpoint rather than reprocessing batch 1)
    val batchDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getName).toSet
    assert(batchDirs.size == 2, s"expected 2 batch dirs, got $batchDirs")
  }
}
