package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the ingest-time form of
  * [[graft.operators.DedupOps.nsDedupExact]] for a continuous document
  * feed (the training-data-pipeline analog of the reference's idempotent
  * upsert sinks, /root/reference/src/utils/data_utils.py:10-15).
  *
  * Keeps the FIRST arrival of each content fingerprint and expires
  * fingerprint state once the event-time watermark passes the horizon.
  * Global exact dedup over an unbounded stream needs unbounded state;
  * bounding it to the watermark horizon is the production pattern — state
  * is O(documents per horizon), hash-partitioned by fingerprint across the
  * cluster, and a (rare) re-arrival beyond the horizon falls through to
  * the batch dedup downstream.
  */
object StreamingDedup {

  /** Drop duplicate documents (by normalized-text sha256) arriving within
    * `horizon` of the first occurrence. Input needs an event-time column
    * `ts`; output carries the fingerprint for downstream survivorship.
    */
  def dedupStream(docs: DataFrame, horizon: String = "1 day"): DataFrame =
    docs
      .withColumn("fp", sha2(regexp_replace(lower(col("text")), "\\s+", " "), 256))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming NEAR-dup admission: each arriving micro-batch of documents
    * is checked against the corpus's near-dup index (banded MinHash
    * signatures + shingle sets); documents with a near-dup in the index
    * are dropped, the rest land in `outPath` AND their signatures fold
    * into the index — so a near-dup of a document admitted in batch N is
    * rejected in batch N+1, not re-admitted. Admission math is the
    * oracled `ns_dedup_incremental`'s by construction (both run through
    * `matchAgainstIndex`). Per-batch work is O(batch + matching band
    * buckets), never O(corpus).
    *
    * Idempotency under foreachBatch's at-least-once contract: (1) each
    * batch overwrites its own `batch_id=` directory, so a replay replaces
    * rather than duplicates; (2) before matching, any index entries keyed
    * by the CURRENT batch's doc ids are anti-joined away — on a replay the
    * batch is matched exactly as on first delivery (its own prior
    * admissions can't self-reject it) and its index contribution is
    * rebuilt rather than doubled.
    *
    * Index growth per batch is two localCheckpoint'ed frames (base index +
    * admitted extension); the per-batch shingle frames are NOT cached
    * (`cacheShingles = false`), so an unbounded stream leaves no
    * accumulating CacheManager entries.
    */
  def nearDupAdmission(
      docStream: DataFrame,
      corpusDocs: DataFrame,
      outPath: String,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val dedup = graft.operators.DedupOps
    val (baseBanded, baseSets) = dedup.corpusIndexMaterialized(corpusDocs)
    // Admitted-documents extension of the index; grows per batch. Batches
    // run sequentially on the stream thread, so plain vars are safe.
    // On a RESTART the extension must be rebuilt from the sink: committed
    // batches never replay, so their admissions would otherwise vanish
    // from the index and their near-dups be re-admitted. The sink is the
    // committed truth (each batch dir is overwrite-idempotent), so the
    // rebuilt extension equals the pre-restart one.
    val session = corpusDocs.sparkSession
    // Restart semantics live in SinkState.priorSink: only a genuinely
    // absent/empty sink means first start; other read failures propagate.
    val prior = SinkState.priorSink(session, outPath)
    val (extB0, extS0) = prior.map(dedup.corpusIndexMaterialized)
      .getOrElse((baseBanded.limit(0), baseSets.limit(0)))
    var extBanded = extB0.localCheckpoint()
    var extSets = extS0.localCheckpoint()
    docStream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val curIds = batch.select("doc_id")
        val idxBanded = baseBanded.unionByName(extBanded)
          .join(curIds, Seq("doc_id"), "left_anti")
        val idxSets = baseSets.unionByName(extSets)
          .join(curIds, Seq("doc_id"), "left_anti")
        val dups = dedup
          .matchAgainstIndex(batch, idxBanded, idxSets, cacheShingles = false)
          .select(col("batch_doc").as("doc_id"))
        // left_anti is unaffected by duplicate right rows — no distinct.
        val sinkDir = s"$outPath/batch_id=$batchId"
        batch.join(dups, Seq("doc_id"), "left_anti")
          .write.mode("overwrite").parquet(sinkDir)
        // Fold the admitted documents into the index, reading back from
        // the sink (the committed truth a replay would regenerate). The
        // anti-join drops this batch's prior contribution on a replay;
        // localCheckpoint keeps the extension plan-free across batches.
        val admitted = batch.sparkSession.read.parquet(sinkDir)
        val (nb, ns) = dedup.corpusIndexMaterialized(admitted)
        extBanded = extBanded.join(curIds, Seq("doc_id"), "left_anti")
          .unionByName(nb).localCheckpoint()
        extSets = extSets.join(curIds, Seq("doc_id"), "left_anti")
          .unionByName(ns).localCheckpoint()
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}
