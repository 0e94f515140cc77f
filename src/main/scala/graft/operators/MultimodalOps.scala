package graft.operators

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** North-star multimodal-column plumbing (builder brief): treat media as
  * opaque `binary` columns with typed metadata, and run decode /
  * feature-extraction as a partition-batched typed pipeline.
  *
  * The container has no image/audio codecs, so [[StubDecoder.decode]] is a
  * clearly-marked deterministic FAKE standing in for a real decoder; the
  * Spark-side contract — binary payload column, typed metadata, Dataset
  * encoder, per-partition batched map, explicit output schema — is real and
  * oracle-checked. Swapping in a real decoder changes only the stub body.
  *
  * Scale posture: decode runs via mapPartitions so a real codec would be
  * initialized once per partition (not per row), and payloads never pass
  * through a shuffle — features are extracted before any wide operation.
  */
object MultimodalOps {

  /** One media row: payload is the raw bytes, mime a typed tag. */
  case class MediaRecord(doc_id: Long, mime: String, payload: Array[Byte])

  /** Decoded features; in a real pipeline: dimensions, channels, frame
    * count, embedding, ...
    */
  case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Long,
      width: Long, height: Long, channels: Long)

  /** STUB: a real implementation would decode the payload (JPEG/PNG/WAV...)
    * and return true dimensions. This fake derives deterministic pseudo
    * dimensions from the byte length so the full pipeline is testable and
    * oracle-checkable offline.
    */
  object StubDecoder {
    def decode(r: MediaRecord): MediaFeatures = {
      val n = r.payload.length.toLong
      MediaFeatures(r.doc_id, r.mime, n,
        width = n % 640L, height = (n * 7L) % 480L, channels = 3L)
    }
  }

  /** documents.text bytes stand in for media payloads (binary column). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        lit("text/plain").as("mime"),
        col("text").cast("binary").as("payload"))

  /** Binary payload -> per-partition batched decode -> typed features. */
  def nsMultimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .as[MediaRecord]
      .mapPartitions { batch =>
        // Real decoders are initialized HERE, once per partition.
        batch.map(StubDecoder.decode)
      }
      .toDF()
      .select("doc_id", "mime", "n_bytes", "width", "height", "channels")
      .orderBy("doc_id")
  }

  /** Frame sampling (the video/audio chunking shape): each payload is cut
    * into fixed 32-byte "frames", every 4th frame is sampled, and a
    * deterministic stub feature is computed per sampled frame. The plumbing
    * — explode of a computed frame index sequence, per-frame feature row,
    * no payload through the shuffle — is the real contract; a codec would
    * replace the feature arithmetic only.
    */
  def nsMultimodalFrames(spark: SparkSession, dir: String): DataFrame = {
    val frameSize = 32L
    val sampleEvery = 4L
    mediaTable(spark, dir)
      .select(col("doc_id"), length(col("payload")).cast("long").as("n_bytes"))
      // Empty payloads emit no frames. Required for oracle parity too:
      // Spark's sequence(0, -1) yields a DESCENDING [0, -1] while DuckDB's
      // generate_series(0, -1) is empty.
      .where(col("n_bytes") > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0L), floor((col("n_bytes") - 1) / frameSize))))
      .where(pmod(col("frame_idx"), lit(sampleEvery)) === 0)
      .select(
        col("doc_id"),
        col("frame_idx"),
        (col("frame_idx") * frameSize).as("byte_offset"),
        pmod(col("n_bytes") * 31 + col("frame_idx") * 7, lit(256)).as("stub_feature"))
      .orderBy("doc_id", "frame_idx")
  }

  /** "Resize" (downsample) stub: keep every 2nd payload byte and compute
    * a position-weighted checksum over the kept bytes — the strided-byte
    * selection IS the plumbing a real resampler needs (the arithmetic is
    * the stub part, like [[StubDecoder]]). Pure per-row column
    * expressions; nothing wide anywhere.
    */
  def nsMultimodalResize(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .where(length(col("payload")) > 0)
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        ceil(length(col("payload")) / 2.0).cast("long").as("resized_bytes"),
        expr(
          "aggregate(sequence(1, length(payload), 2), CAST(0 AS BIGINT), " +
            "(acc, i) -> acc + CAST(ascii(substring(payload, i, 1)) AS BIGINT) * ((i % 97) + 1))")
          .as("resize_checksum"))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ns_multimodal_features" -> (nsMultimodalFeatures _),
    "ns_multimodal_frames" -> (nsMultimodalFrames _),
    "ns_multimodal_resize" -> (nsMultimodalResize _))

  val oracles: Map[String, String] = Map(
    "ns_multimodal_features" ->
      """SELECT doc_id, 'text/plain' AS mime,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
        |       CAST((octet_length(encode(text)) * 7) % 480 AS BIGINT) AS height,
        |       CAST(3 AS BIGINT) AS channels
        |FROM documents ORDER BY doc_id""".stripMargin,
    "ns_multimodal_frames" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, n_bytes,
        |         unnest(generate_series(0, CAST(floor((n_bytes - 1) / 32) AS BIGINT))) AS frame_idx
        |  FROM m)
        |SELECT doc_id, frame_idx,
        |       frame_idx * 32 AS byte_offset,
        |       (n_bytes * 31 + frame_idx * 7) % 256 AS stub_feature
        |FROM f WHERE frame_idx % 4 = 0 AND n_bytes > 0
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "ns_multimodal_resize" ->
      """WITH m AS (
        |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n_bytes
        |  FROM documents WHERE length(text) > 0),
        |k AS (
        |  SELECT doc_id, n_bytes,
        |         unnest(range(1, CAST(n_bytes + 1 AS BIGINT), 2)) AS i
        |  FROM m),
        |s AS (
        |  SELECT k.doc_id, k.n_bytes,
        |         CAST(SUM(CAST(ascii(substring(m.text, CAST(k.i AS INT), 1)) AS BIGINT)
        |              * ((k.i % 97) + 1)) AS BIGINT) AS resize_checksum
        |  FROM k JOIN m ON k.doc_id = m.doc_id GROUP BY k.doc_id, k.n_bytes)
        |SELECT doc_id, n_bytes,
        |       CAST(ceil(n_bytes / 2.0) AS BIGINT) AS resized_bytes,
        |       resize_checksum
        |FROM s ORDER BY doc_id""".stripMargin)
}
