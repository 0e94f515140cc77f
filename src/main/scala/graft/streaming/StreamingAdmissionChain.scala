package graft.streaming

import graft.operators.{DedupOps, TextOps}
import graft.pipeline.Pipelines
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The COMPLETE ingest admission chain as one stream — the streaming twin
  * of the oracled [[Pipelines.corpusAdmission]] audit, staged cheapest
  * gate first so every early reject skips all later work:
  *
  *   1. Gopher quality rules   — stateless projection ([[StreamingQualityGate]])
  *   2. exact corpus duplicate — (doc_id, fp) probe vs corpus + admitted
  *   3. MinHash near-duplicate — banded index vs corpus + admitted
  *      ([[StreamingDedup.nearDupAdmission]]'s machinery)
  *   4. eval contamination     — broadcast probe-shingle scan
  *      ([[StreamingDecontaminate]]'s machinery)
  *
  * Admitted documents land in per-batch overwrite-idempotent dirs AND
  * fold into the exact-fp and near-dup index extensions, so a duplicate
  * of a batch-N admission is rejected in batch N+1. Per-batch admitted
  * sets equal [[Pipelines.admissionVerdicts]] run against
  * corpus + prior admissions (spec-pinned) — the chain early-exits where
  * the audit evaluates every gate, which changes work, not the set.
  *
  * WITHIN-batch duplicates are deliberately out of scope, exactly as in
  * [[StreamingDedup.nearDupAdmission]]: collapse within-stream dups
  * upstream with [[StreamingDedup.dedupStream]] (the watermarked exact
  * gate), then admit against history here.
  *
  * Replay/restart contract (shared with the other admission twins):
  * per-batch dirs overwrite; extension entries keyed by the CURRENT
  * batch's doc ids are anti-joined away before gating, so a replayed
  * batch can't self-reject; on restart every extension is rebuilt from
  * the sink — the committed truth ([[SinkState.priorSink]]).
  *
  * Scale posture: the static gates are metadata-scale broadcasts (probe
  * shingles) or materialized index frames (corpus fps, banded sigs +
  * sets — bucketed tables at 100 TB); per-batch work is O(batch +
  * matching band buckets), never O(corpus).
  */
object StreamingAdmissionChain {

  def admissionStream(
      docStream: DataFrame,
      corpusDocs: DataFrame,
      probeDocs: DataFrame,
      outPath: String,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val session = corpusDocs.sparkSession
    // Static gates, materialized once at stream start.
    val benchSh = DedupOps.shingles(probeDocs).select("sh").distinct()
      .localCheckpoint()
    val corpusFp = Pipelines.contentFp(corpusDocs).localCheckpoint()
    val (baseBanded, baseSets) = DedupOps.corpusIndexMaterialized(corpusDocs)
    // Admitted-documents extensions; rebuilt from the sink on restart.
    val prior = SinkState.priorSink(session, outPath)
    var extFp = prior.map(Pipelines.contentFp)
      .getOrElse(corpusFp.limit(0)).localCheckpoint()
    val (extB0, extS0) = prior.map(DedupOps.corpusIndexMaterialized)
      .getOrElse((baseBanded.limit(0), baseSets.limit(0)))
    var extBanded = extB0.localCheckpoint()
    var extSets = extS0.localCheckpoint()
    docStream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val curIds = batch.select("doc_id")
        // 1. Gopher: per-row rules, no state touched.
        val s1 = batch.join(
          TextOps.gopherProfile(batch).where(col("pass")).select("doc_id"),
          Seq("doc_id"), "left_semi")
        // 2. Exact dup vs corpus + admitted (minus this batch's own
        //    prior contribution — replay safety).
        val extFpNow = extFp.join(curIds, Seq("doc_id"), "left_anti")
        val dupFps = corpusFp.select("fp")
          .unionByName(extFpNow.select("fp")).distinct()
        val s2 = s1.join(
          Pipelines.contentFp(s1).join(dupFps, Seq("fp"), "left_semi")
            .select("doc_id"),
          Seq("doc_id"), "left_anti")
        // 3. Near-dup vs banded index + admitted extension.
        val idxBanded = baseBanded.unionByName(extBanded)
          .join(curIds, Seq("doc_id"), "left_anti")
        val idxSets = baseSets.unionByName(extSets)
          .join(curIds, Seq("doc_id"), "left_anti")
        val nearIds = DedupOps
          .matchAgainstIndex(s2, idxBanded, idxSets, cacheShingles = false)
          .select(col("batch_doc").as("doc_id"))
        val s3 = s2.join(nearIds, Seq("doc_id"), "left_anti")
        // 4. Contamination vs the broadcast probe shingles.
        val contamIds = DedupOps
          .contaminationProfile(DedupOps.shingles(s3), benchSh)
          .where(col("drop_doc")).select("doc_id")
        val admittedNow = s3.join(contamIds, Seq("doc_id"), "left_anti")
        val sinkDir = s"$outPath/batch_id=$batchId"
        admittedNow.write.mode("overwrite").parquet(sinkDir)
        // Fold the committed admissions into every extension (reading
        // back from the sink, which a replay would regenerate).
        val admitted = batch.sparkSession.read.parquet(sinkDir)
        extFp = extFpNow.unionByName(Pipelines.contentFp(admitted))
          .localCheckpoint()
        val (nb, ns) = DedupOps.corpusIndexMaterialized(admitted)
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
