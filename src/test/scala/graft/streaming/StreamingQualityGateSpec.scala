package graft.streaming

import graft.SparkSpec
import graft.model.Tables
import graft.operators.TextOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

/** The stateless Gopher admission gate: streamed admission equals the
  * batch query's pass set, across micro-batch boundaries.
  */
class StreamingQualityGateSpec extends SparkSpec {

  test("streamed admission equals the batch gopher pass set across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val stream = input.toDS().toDF("doc_id", "text")
    val query = StreamingQualityGate.admissionStream(stream)
      .select("doc_id")
      .writeStream.format("memory").queryName("gate_out")
      .outputMode(OutputMode.Append).start()
    try {
      val (a, b) = docs.splitAt(docs.length / 2)
      input.addData(a.toSeq); query.processAllAvailable()
      input.addData(b.toSeq); query.processAllAvailable()
    } finally query.stop()
    val admitted = spark.table("gate_out").as[Long].collect().toSet
    val want = TextOps.nsTextGopher(spark, sfDir)
      .where(col("pass")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(want.nonEmpty && admitted == want,
      s"admitted=${admitted.size} want=${want.size}")
    // the gate actually rejects something
    assert(admitted.size < docs.length)
  }
}
