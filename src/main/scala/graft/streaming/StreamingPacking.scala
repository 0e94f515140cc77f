package graft.streaming

import graft.operators.{PackingOps, SamplingOps}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins for the corpus sampling + packing stages (SURVEY.md
  * §7.4 / §2.9) — the ingest-time forms of
  * [[graft.operators.SamplingOps.nsCorpusSampleHash]] and
  * [[graft.operators.PackingOps.nsPackChunks]], so a landing document
  * stream can be sampled and packed as it arrives instead of in a nightly
  * batch.
  *
  * Scale posture: sampling is STATELESS (the affine hash-threshold filter
  * needs no coordination — that is exactly why it is the declared 100 TB
  * path); packing keeps ONE Long of state per shard (the shard's running
  * token total), hash-partitioned by lang across the cluster.
  */
object StreamingPacking {

  case class DocToks(lang: String, doc_id: Long, toks: Long)
  case class PackedDoc(
      lang: String, doc_id: Long, toks: Long, cum_before: Long,
      first_chunk: Long, last_chunk: Long, n_chunks: Long)

  /** Hash-threshold sampling admission: keep ~20% of arriving documents,
    * deterministically (a replayed micro-batch re-admits exactly the same
    * rows — rand() could never). Stateless: works identically in batch
    * and streaming, no watermark, no state store.
    */
  def sampleStream(docs: DataFrame): DataFrame =
    docs
      .withColumn("sample_key",
        pmod(col("doc_id") * lit(SamplingOps.SampleKeyA)
          + lit(SamplingOps.SampleKeyB), lit(SamplingOps.SampleKeyP)))
      .where(col("sample_key") % 5 === 0)

  /** readStream → incremental packing → append parquet: the file-landed
    * exactly-once form (checkpointed file offsets AND state-store token
    * totals; one file per trigger so shard totals straddle micro-batch —
    * and, with a second invocation, RESTART — boundaries). The spec
    * proves a restarted pipeline continues chunk spans from the
    * checkpointed running totals with no duplicate rows.
    */
  def packFilePipeline(
      spark: org.apache.spark.sql.SparkSession,
      srcDir: String,
      outPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val stream = spark.readStream
      .schema(graft.model.Tables.documentsSchema)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    packStream(stream)
      .writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }

  /** Incremental concat-and-chunk packing: per-lang running token totals
    * live in the state store (8 bytes per shard); each arriving document
    * is assigned its global-within-shard chunk span immediately. Within a
    * micro-batch documents pack in doc_id order (deterministic); across
    * batches, in arrival order — the production ingest contract. The spec
    * proves stream == batch when arrival respects doc_id order, including
    * chunks straddling the micro-batch boundary.
    */
  def packStream(docs: DataFrame): Dataset[PackedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("lang"), col("doc_id"), PackingOps.bpeTokens.as("toks"))
      .where(col("toks") > 0)
      .as[DocToks]
      .groupByKey(_.lang)
      .flatMapGroupsWithState[Long, PackedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (lang: String, batch: Iterator[DocToks], state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          val out = batch.toSeq.sortBy(_.doc_id).map { d =>
            val before = cum
            cum += d.toks
            // Long '/' on non-negatives == floor division (`div`), same
            // arithmetic as the batch query and its oracle.
            val first = before / PackingOps.ChunkTokens
            val last = (before + d.toks - 1) / PackingOps.ChunkTokens
            PackedDoc(lang, d.doc_id, d.toks, before, first, last,
              last - first + 1)
          }
          state.update(cum)
          out.iterator
      }
  }
}
