package graft.streaming

import graft.operators.IndexOps
import org.apache.spark.sql.DataFrame

/** Streaming index maintenance — the ingest-time form of
  * [[IndexOps.updateBm25Index]]: each micro-batch of newly-arrived
  * documents is merged into the STORED BM25 artifact as it lands, so the
  * retrieval index trails the corpus by one trigger interval instead of a
  * nightly rebuild. The reference analog is its per-poll MySQL upserts —
  * continuous maintenance of a served table — re-expressed over the
  * bucketed write-audit-publish artifact.
  *
  * Exactly-once posture: the underlying update is LWW-idempotent on the
  * (term, doc) key and touches only the buckets the batch's terms hash
  * into, so a foreachBatch replay after a crash re-delivers the same
  * postings into the same buckets and converges to the same artifact —
  * idempotent-by-merge rather than by batch-directory overwrite (state
  * lives IN the index; there is nothing to rebuild on restart).
  * Per-batch work: one batch-shingle pass + touched-bucket rewrites;
  * never a full-corpus pass.
  */
object StreamingIndex {

  /** readStream docs → merge each micro-batch into the stored BM25 index
    * at `indexRoot` (which must already exist — build it from the
    * historical corpus with [[IndexOps.buildBm25Index]] first, exactly
    * like the dedup admission twins index their history).
    */
  def bm25MaintenanceStream(
      docStream: DataFrame,
      indexRoot: String,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) IndexOps.updateBm25Index(batch, indexRoot)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Streaming navigable-graph maintenance — the ingest-time form of
    * [[IndexOps.updateGraphIndex]] (round-9): each micro-batch of newly
    * arrived vector ids is HNSW-inserted into the stored beam graph, so
    * ANN serving trails ingest by one trigger interval while NN-descent
    * never re-runs. Per-batch work: batch × (entry scan + walk bound)
    * beam searches + touched-bucket republish — batch-proportional.
    *
    * The driver-side id collect is bounded by the trigger's batch size
    * (the same bounded-collect contract as the decontamination bloom
    * probe); ids become the insert predicate against the embeddings
    * table the graph indexes.
    *
    * Replay contract (weaker than the LWW twins, honestly): graph
    * insertion is approximate by nature (HNSW — an inserted graph is
    * not byte-identical to a rebuild), so a crash-replayed batch
    * re-inserts nodes that are already in the graph. The result is
    * STRUCTURALLY convergent, not byte-stable: every replay yields a
    * valid degree-capped graph still containing the batch bidirection-
    * ally (spec-pinned), because insertion only ever re-ranks the
    * touched adjacency by exact cosine. Byte-exact once-only delivery
    * would need a batch-tag commit record as in StreamingPlatformDelta;
    * the serving contract (recall at the tuned ef) does not.
    */
  def graphMaintenanceStream(
      vecIdStream: DataFrame,
      dir: String,
      indexRoot: String,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecIdStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val ids = batch.select("vec_id").distinct()
            .collect().map(_.getLong(0)).toSeq // bounded by the trigger batch
          IndexOps.updateGraphIndex(batch.sparkSession, dir, indexRoot,
            org.apache.spark.sql.functions.col("vec_id").isin(ids: _*))
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
