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

  /** Decoded features; px_sum is the pixel-component byte sum for payloads
    * with a real codec, -1 for stub-decoded mimes.
    */
  case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Long,
      width: Long, height: Long, channels: Long, px_sum: Long)

  /** Mime-dispatched decode: REAL parsers ([[ImageCodecs]]) for PPM and
    * BMP — width/height/channels read from the actual header bytes, the
    * pixel statistic from walking the actual pixel array — and the
    * clearly-marked deterministic stub only for mimes with no offline
    * codec (JPEG/PNG/WAV need libs this container doesn't have; a real
    * deployment adds `case`s here, nothing else changes).
    */
  object Decoder {
    def decode(r: MediaRecord): MediaFeatures = r.mime match {
      case ImageFixtures.PpmMime =>
        val (w, h, c, s) = ImageCodecs.decodePpm(r.payload)
        MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong, w, h, c, s)
      case ImageFixtures.BmpMime =>
        val (w, h, c, s) = ImageCodecs.decodeBmp(r.payload)
        MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong, w, h, c, s)
      case _ => // STUB: pseudo dimensions from byte length, px_sum = -1
        val n = r.payload.length.toLong
        MediaFeatures(r.doc_id, r.mime, n, n % 640L, (n * 7L) % 480L, 3L, -1L)
    }
  }

  /** documents.text bytes stand in for media payloads (binary column). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        lit("text/plain").as("mime"),
        col("text").cast("binary").as("payload"))

  /** Mixed-mime corpus: every third document becomes a REAL generated BMP
    * (doc_id ≡ 0 mod 3) or PPM (≡ 1) payload ([[ImageFixtures]]); the rest
    * stay text. The generation is fixture machinery — the decode path sees
    * only the bytes.
    */
  def mixedMediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        (id % 3).toInt match {
          case 0 => MediaRecord(id, ImageFixtures.BmpMime, ImageFixtures.bmp(id))
          case 1 => MediaRecord(id, ImageFixtures.PpmMime, ImageFixtures.ppm(id))
          case _ => MediaRecord(id, "text/plain",
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      }
      .toDF()
  }

  /** Binary payload -> per-partition batched decode -> typed features.
    * PPM/BMP rows go through the real codecs; text rows through the stub.
    */
  def nsMultimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mixedMediaTable(spark, dir)
      .as[MediaRecord]
      .mapPartitions { batch =>
        // Real decoders are initialized HERE, once per partition.
        batch.map(Decoder.decode)
      }
      .toDF()
      .select("doc_id", "mime", "n_bytes", "width", "height", "channels", "px_sum")
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
    // Replays the ImageFixtures formulas symbolically: PPM n_bytes =
    // header ("P6\n<w> <h>\n255\n" = 9 + digits) + 3wh, BMP = 54 + padded
    // stride × h, px_sum = Σ (id·31 + i) % 256 over the 3wh pixel bytes —
    // so a hash-match proves the Spark-side codec parsed the REAL header
    // and pixels (and skipped BMP padding, which is 0xAB, not 0).
    "ns_multimodal_features" ->
      """WITH d AS (
        |  SELECT doc_id, text, doc_id % 3 AS m,
        |         CASE doc_id % 3 WHEN 1 THEN doc_id % 13 + 1
        |                         WHEN 0 THEN doc_id % 11 + 1 END AS w,
        |         CASE doc_id % 3 WHEN 1 THEN doc_id % 7 + 1
        |                         WHEN 0 THEN doc_id % 5 + 1 END AS h
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, unnest(generate_series(0, CAST(3*w*h - 1 AS BIGINT))) AS i
        |  FROM d WHERE m <> 2),
        |px AS (
        |  SELECT doc_id, CAST(SUM((doc_id*31 + i) % 256) AS BIGINT) AS px_sum
        |  FROM u GROUP BY doc_id)
        |SELECT d.doc_id,
        |       CASE d.m WHEN 1 THEN 'image/x-portable-pixmap'
        |                WHEN 0 THEN 'image/bmp' ELSE 'text/plain' END AS mime,
        |       CAST(CASE d.m
        |         WHEN 1 THEN 9 + length(CAST(d.w AS VARCHAR))
        |                     + length(CAST(d.h AS VARCHAR)) + 3*d.w*d.h
        |         WHEN 0 THEN 54 + ((3*d.w + 3) // 4 * 4) * d.h
        |         ELSE octet_length(encode(d.text)) END AS BIGINT) AS n_bytes,
        |       CAST(CASE WHEN d.m <> 2 THEN d.w
        |            ELSE octet_length(encode(d.text)) % 640 END AS BIGINT) AS width,
        |       CAST(CASE WHEN d.m <> 2 THEN d.h
        |            ELSE (octet_length(encode(d.text)) * 7) % 480 END AS BIGINT) AS height,
        |       CAST(3 AS BIGINT) AS channels,
        |       COALESCE(px.px_sum, CAST(-1 AS BIGINT)) AS px_sum
        |FROM d LEFT JOIN px ON d.doc_id = px.doc_id
        |ORDER BY d.doc_id""".stripMargin,
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
