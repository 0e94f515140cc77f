package graft.streaming

import graft.operators.{IndexOps, TextOps}
import org.apache.spark.sql.DataFrame

/** Streaming model scoring — the ingest-time form of
  * [[graft.operators.IndexOps.queryClassifierIndex]]: every arriving
  * micro-batch is scored under the FROZEN stored classifier model, so
  * model-based quality filtering happens at the door (the learned
  * counterpart of [[StreamingQualityGate]]'s rule battery) instead of a
  * nightly batch pass.
  *
  * Model posture: the weight vector is read ONCE at stream wire-up —
  * loading a model is a deploy, not per-batch state, matching the
  * artifact's rebuild-only refresh contract (GD weights have no per-doc
  * merge algebra; picking up a retrained model = restart the stream on
  * the republished artifact). Driver state is the [[TextOps.ClsDim]]-row
  * vector, corpus-size-independent.
  *
  * Batch-boundary safety: every feature in the per-doc map derives from
  * that document's own text (the aggregations in the feature build group
  * by doc_id), and the margin is an in-row fold under frozen weights —
  * so scores are invariant to how ingest slices the corpus into
  * micro-batches (spec-pinned: 2-batch stream == one batch scoring).
  * Idempotency: each batch overwrites its own `batch_id=` directory, the
  * [[StreamingDecontaminate]] replay contract.
  */
object StreamingClassify {

  /** readStream docs → score under the model stored at `modelRoot`
    * (build it first with [[IndexOps.buildClassifierIndex]]) → write
    * (doc_id, logit, keep, label) to one overwrite-idempotent dir per
    * batch under `outPath`.
    */
  def scoringStream(
      docStream: DataFrame,
      modelRoot: String,
      outPath: String,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = IndexOps.readClassifierWeights(docStream.sparkSession, modelRoot)
    docStream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        TextOps.scoreClassifier(batch, w)
          .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}
