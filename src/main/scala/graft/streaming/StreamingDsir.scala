package graft.streaming

import graft.operators.SamplingOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Streaming DSIR admission — the ingest-time form of
  * [[SamplingOps.nsCorpusDsir]], completing the "every batch curation
  * stage has a streaming twin" family (dedup, SemDeDup, sampling,
  * packing, decontamination, and now importance resampling).
  *
  * STATELESS like [[StreamingPacking.sampleStream]]: the llr model is
  * trained ONCE on the historical corpus and baked into the stream as
  * 128 literals, so admission is a pure projection filter — no state
  * store, no watermark, replay-idempotent by determinism. That is the
  * production shape: DSIR models are trained offline on a reference
  * corpus and applied to the firehose; retraining per micro-batch would
  * let the selection distribution drift with arrival order.
  */
object StreamingDsir {

  /** Keep arriving documents the corpus-trained model scores target-like
    * (llr_u > 0, at least one gram). Output carries the score columns
    * for downstream mixing/audit.
    */
  def admissionStream(docStream: DataFrame, corpusDocs: DataFrame): DataFrame = {
    val (nGrams, llrU) = SamplingOps.dsirScoreCols(SamplingOps.dsirLlrTable(corpusDocs))
    docStream
      .withColumn("n_grams", nGrams)
      .withColumn("llr_u", llrU)
      .where(col("n_grams") > 0 && col("llr_u") > 0)
  }
}
