package graft.streaming

import graft.operators.{DedupOps, TextOps}
import graft.pipeline.Pipelines
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The COMPLETE ingest admission chain as one stream — the streaming twin
  * of the oracled [[Pipelines.corpusAdmission]] audit, staged cheapest
  * gate first so every early reject skips all later work:
  *
  *   0. URL canonical duplicate — runs when the stream carries a `url`
  *      column and `corpusUrls` is supplied: the [[StreamingUrlDedup]]
  *      gate inline, FIRST because it is the cheapest (string
  *      normalization, no content read — a canonical match skips the
  *      fetch/parse entirely in a real crawler)
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
  * WITHIN-batch CONTENT duplicates are deliberately out of scope, exactly
  * as in [[StreamingDedup.nearDupAdmission]]: collapse within-stream dups
  * upstream with [[StreamingDedup.dedupStream]] (the watermarked exact
  * gate), then admit against history here. The URL gate is the one
  * exception — it applies the smallest-doc_id-per-canonical survivorship
  * WITHIN the batch too (an exact key, costless, and intra-batch URL
  * dups are routine for a crawler frontier), matching the batch audit's
  * min() rule.
  *
  * Replay/restart contract: per-batch dirs overwrite; extension entries
  * are tagged with the batch that ADMITTED them, and gating excludes
  * only entries tagged with the CURRENT batch id — so a replayed batch
  * can't self-reject, while a document redelivered in a LATER batch
  * still meets its earlier admission and is rejected (spec-pinned; the
  * doc-id-keyed exclusion the other twins use cannot tell those two
  * events apart). On restart every extension is rebuilt, tags included,
  * from the sink's batch_id partition dirs — the committed truth
  * ([[SinkState.priorSink]]).
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
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      corpusUrls: Option[DataFrame] = None,
      onAfterUrlGate: Option[DataFrame => Unit] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val session = corpusDocs.sparkSession
    val urlGated = corpusUrls.isDefined && docStream.columns.contains("url")
    // Static gates, materialized once at stream start.
    val benchSh = DedupOps.shingles(probeDocs).select("sh").distinct()
      .localCheckpoint()
    val corpusFp = Pipelines.contentFp(corpusDocs).localCheckpoint()
    // Gate-0 statics: corpus canonicals (sentinel id — see
    // StreamingUrlDedup) + the admitted-canonical extension. Option, not
    // a null sentinel: a missed urlGated guard fails to compile against
    // an Option instead of NPE-ing at stream start.
    val baseCanon: Option[DataFrame] =
      if (urlGated) Some(corpusUrls.get
        .select(DedupOps.canonicalUrl(col("url")).as("canonical")).distinct()
        .withColumn("doc_id", lit(-1L)).select("doc_id", "canonical")
        .localCheckpoint())
      else None
    val (baseBanded, baseSets) = DedupOps.corpusIndexMaterialized(corpusDocs)
    // Admitted-documents extensions, every row tagged with the batch that
    // admitted it (`src_batch`). Replay safety keys on THAT, not on the
    // current batch's doc ids: a replayed batch B sees the index minus
    // only its own prior contribution (src_batch = B), while a document
    // RE-SENT in a later batch still meets its earlier admission and is
    // rejected as the duplicate it is — checkpoint replay and cross-batch
    // redelivery are different events and get different treatment.
    // On restart the tags rebuild from the sink's batch_id partition dirs.
    val prior = SinkState.priorSink(session, outPath, keepBatchId = true)
    def withBatchTag(p: DataFrame, of: DataFrame): DataFrame =
      of.join(p.select(col("doc_id"),
        col("batch_id").cast("long").as("src_batch")), "doc_id")
    var extFp = prior.map(p => withBatchTag(p, Pipelines.contentFp(p)))
      .getOrElse(corpusFp.limit(0).withColumn("src_batch", lit(0L)))
      .localCheckpoint()
    var extCanon: Option[DataFrame] = baseCanon.map { bc =>
      // Restart rebuild GUARDED on the prior sink actually carrying a
      // `url` column: a URL-gated stream restarted over admitted output
      // written BEFORE URL gating existed must fall back to the empty
      // extension (those admissions have no canonicals to replay), not
      // throw AnalysisException at select("url") on stream start.
      prior.filter(_.columns.contains("url"))
        .map(p => withBatchTag(p, p.select(col("doc_id"),
          DedupOps.canonicalUrl(col("url")).as("canonical"))))
        .getOrElse(bc.limit(0).withColumn("src_batch", lit(0L)))
        .localCheckpoint()
    }
    val (extB0, extS0) = prior.map { p =>
      val (b, s) = DedupOps.corpusIndexMaterialized(p)
      (withBatchTag(p, b), withBatchTag(p, s))
    }.getOrElse((
      baseBanded.limit(0).withColumn("src_batch", lit(0L)),
      baseSets.limit(0).withColumn("src_batch", lit(0L))))
    var extBanded = extB0.localCheckpoint()
    var extSets = extS0.localCheckpoint()
    docStream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // 0. URL canonical dup vs corpus + admitted, with intra-batch
        //    min-doc_id survivorship — BEFORE any content gate touches
        //    the text (the onAfterUrlGate seam lets a spec pin that
        //    ordering). Replay-safe exactly like the other extensions.
        val s0 = (baseCanon, extCanon) match {
          case (Some(bc), Some(ec)) =>
            val canon = batch.withColumn(
              "canonical", DedupOps.canonicalUrl(col("url")))
            val firsts = canon.withColumn("_rn", row_number().over(
                org.apache.spark.sql.expressions.Window
                  .partitionBy("canonical").orderBy("doc_id")))
              .where(col("_rn") === 1).drop("_rn")
            val idx = bc.select("canonical").unionByName(
              ec.where(col("src_batch") =!= batchId).select("canonical"))
            firsts.join(idx, Seq("canonical"), "left_anti").drop("canonical")
          case _ => batch
        }
        onAfterUrlGate.foreach(f => f(s0))
        // 1. Gopher: per-row rules, no state touched.
        val s1 = s0.join(
          TextOps.gopherProfile(s0).where(col("pass")).select("doc_id"),
          Seq("doc_id"), "left_semi")
        // 2. Exact dup vs corpus + admitted. The batch's fingerprints are
        //    micro-scale, so they BROADCAST-probe the (executor-resident)
        //    fp frames — per-batch cost is a scan, never a corpus shuffle
        //    (the bucketed-artifact probe replaces even the scan at
        //    production scale).
        val extFpNow = extFp.where(col("src_batch") =!= batchId)
        val batchFp = Pipelines.contentFp(s1)
        val dupFp = corpusFp.select("fp").unionByName(extFpNow.select("fp"))
          .join(broadcast(batchFp.select("fp").distinct()), Seq("fp"), "left_semi")
        val s2 = s1.join(
          batchFp.join(broadcast(dupFp), Seq("fp"), "left_semi").select("doc_id"),
          Seq("doc_id"), "left_anti")
        // 3. Near-dup vs banded index + admitted extension.
        val idxBanded = baseBanded.unionByName(
          extBanded.where(col("src_batch") =!= batchId).drop("src_batch"))
        val idxSets = baseSets.unionByName(
          extSets.where(col("src_batch") =!= batchId).drop("src_batch"))
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
        // back from the sink, which a replay would regenerate), tagged
        // with this batch id.
        val admitted = batch.sparkSession.read.parquet(sinkDir)
        extFp = extFpNow
          .unionByName(Pipelines.contentFp(admitted)
            .withColumn("src_batch", lit(batchId)))
          .localCheckpoint()
        extCanon = extCanon.map(_.where(col("src_batch") =!= batchId)
          .unionByName(admitted.select(col("doc_id"),
              DedupOps.canonicalUrl(col("url")).as("canonical"))
            .withColumn("src_batch", lit(batchId)))
          .localCheckpoint())
        val (nb, ns) = DedupOps.corpusIndexMaterialized(admitted)
        extBanded = extBanded.where(col("src_batch") =!= batchId)
          .unionByName(nb.withColumn("src_batch", lit(batchId)))
          .localCheckpoint()
        extSets = extSets.where(col("src_batch") =!= batchId)
          .unionByName(ns.withColumn("src_batch", lit(batchId)))
          .localCheckpoint()
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}
