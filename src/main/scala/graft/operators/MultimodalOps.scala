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

  /** Mime-dispatched decode: REAL parsers ([[ImageCodecs]]) for
    * PPM/BMP/PGM/PNG — width/height/channels read from the actual header
    * bytes, the pixel statistic from walking the actual (for PNG:
    * inflated + un-filtered) pixel array — and the clearly-marked
    * deterministic stub only for text/unknown mimes (JPEG decode is REAL,
    * see [[JpegCodecs]]/[[nsMultimodalJpeg]]; MPEG-1 Layer II and III
    * audio are REAL, see [[Mp3Codecs]]/[[Mp3L3Codecs]]; a real deployment
    * adds `case`s here, nothing else changes).
    */
  object Decoder {
    def decode(r: MediaRecord): MediaFeatures = r.mime match {
      case ImageFixtures.PngMime =>
        val (w, h, c, s) = ImageCodecs.decodePng(r.payload)
        MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong, w, h, c, s)
      case ImageFixtures.PpmMime =>
        val (w, h, c, s) = ImageCodecs.decodePpm(r.payload)
        MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong, w, h, c, s)
      case ImageFixtures.BmpMime =>
        val (w, h, c, s) = ImageCodecs.decodeBmp(r.payload)
        MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong, w, h, c, s)
      case ImageFixtures.PgmMime =>
        val (w, h, c, s) = ImageCodecs.decodePgm(r.payload)
        MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong, w, h, c, s)
      case _ => // STUB: pseudo dimensions from byte length, px_sum = -1
        val n = r.payload.length.toLong
        MediaFeatures(r.doc_id, r.mime, n, n % 640L, (n * 7L) % 480L, 3L, -1L)
    }
  }

  /** Mixed-mime corpus: every third document becomes a REAL generated BMP
    * (doc_id ≡ 0 mod 3) or PPM (≡ 1) payload ([[ImageFixtures]]); the
    * remaining class splits into grayscale P5 PGM (even ids) and text
    * (odd ids). The generation is fixture machinery — the decode path
    * sees only the bytes.
    */
  def mixedMediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        (id % 3).toInt match {
          case 0 => MediaRecord(id, ImageFixtures.BmpMime, ImageFixtures.bmp(id))
          case 1 => MediaRecord(id, ImageFixtures.PpmMime, ImageFixtures.ppm(id))
          case _ if id % 2 == 0 =>
            MediaRecord(id, ImageFixtures.PgmMime, ImageFixtures.pgm(id))
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
    mixedMediaTable(spark, dir)
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

  /** One resized row: out dims (-1 for non-image mimes), the number of
    * kept units (pixel components, or bytes for the byte-strided stub),
    * and a position-weighted checksum over exactly the kept data.
    */
  case class ResizedMedia(
      doc_id: Long, mime: String, n_bytes: Long,
      out_w: Long, out_h: Long, kept_units: Long, resize_checksum: Long)

  /** 2x strided down-sample on REAL decoded pixels: images decode through
    * [[ImageCodecs]] (BMP row padding already stripped by the codec),
    * keep every 2nd pixel per axis, and checksum the kept components
    * weighted by their INPUT position — nearest-neighbor decimation, the
    * first stage of any pyramid resampler. Non-image mimes keep the
    * byte-strided stub (every 2nd byte). Runs in the same per-partition
    * batched decode shape as [[nsMultimodalFeatures]].
    */
  object Resampler {
    def resize(r: MediaRecord): ResizedMedia = r.mime match {
      case ImageFixtures.PpmMime | ImageFixtures.BmpMime | ImageFixtures.PgmMime =>
        val (w, h, px, ch) = r.mime match {
          case ImageFixtures.PpmMime =>
            val (w, h, p) = ImageCodecs.ppmPixels(r.payload); (w, h, p, 3)
          case ImageFixtures.BmpMime =>
            val (w, h, p) = ImageCodecs.bmpPixels(r.payload); (w, h, p, 3)
          case _ =>
            val (w, h, p) = ImageCodecs.pgmPixels(r.payload); (w, h, p, 1)
        }
        val ow = (w + 1) / 2
        val oh = (h + 1) / 2
        var sum = 0L
        var oy = 0L
        while (oy < oh) {
          var ox = 0L
          while (ox < ow) {
            var c = 0
            while (c < ch) {
              val i = ((oy * 2) * w + ox * 2) * ch + c
              sum += (px(i.toInt) & 0xff).toLong * ((i % 97) + 1)
              c += 1
            }
            ox += 1
          }
          oy += 1
        }
        ResizedMedia(r.doc_id, r.mime, r.payload.length.toLong,
          ow, oh, ow * oh * ch, sum)
      case _ => // byte-strided stub for mimes with no offline codec
        val n = r.payload.length.toLong
        var sum = 0L
        var j = 1L
        while (j <= n) {
          sum += (r.payload((j - 1).toInt) & 0xff).toLong * ((j % 97) + 1)
          j += 2
        }
        ResizedMedia(r.doc_id, r.mime, n, -1L, -1L, (n + 1) / 2, sum)
    }
  }

  /** Mixed-mime 2x down-sample: real pixel decimation for PPM/BMP rows,
    * byte stride for text rows.
    */
  def nsMultimodalResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mixedMediaTable(spark, dir)
      .where(length(col("payload")) > 0)
      .as[MediaRecord]
      .mapPartitions(_.map(Resampler.resize))
      .toDF()
      .select("doc_id", "mime", "n_bytes", "out_w", "out_h",
        "kept_units", "resize_checksum")
      .orderBy("doc_id")
  }

  /** Decoded audio features — all BIGINT so the oracle replays exactly. */
  case class AudioFeatures(
      doc_id: Long, mime: String, n_bytes: Long, sample_rate: Long,
      n_samples: Long, duration_ms: Long, abs_sum: Long, peak: Long)

  /** Audio corpus: every fourth document (doc_id ≡ 1 mod 4) carries a REAL
    * generated mono PCM16 WAV payload ([[AudioFixtures]]); decode walks
    * the actual RIFF chunk list ([[AudioCodecs.decodeWav]]) in the same
    * per-partition batched shape as [[nsMultimodalFeatures]] — a real
    * audio library would replace only the statistics arithmetic. Payloads
    * never pass a shuffle; the only wide op is the output sort.
    */
  def nsMultimodalAudio(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .where(col("doc_id") % 4 === 1)
      .select(col("doc_id")).as[Long]
      .map(id => MediaRecord(id, AudioFixtures.WavMime, AudioFixtures.wav(id)))
      .mapPartitions(_.map { r =>
        val d = AudioCodecs.decodeWav(r.payload)
        AudioFeatures(r.doc_id, r.mime, r.payload.length.toLong, d.sampleRate,
          d.nSamples, d.nSamples * 1000L / d.sampleRate, d.absSum, d.peak)
      })
      .toDF()
      .select("doc_id", "mime", "n_bytes", "sample_rate", "n_samples",
        "duration_ms", "abs_sum", "peak")
      .orderBy("doc_id")
  }

  /** Decoded per-frame video features — all BIGINT for exact replay. */
  case class VideoFrameFeatures(
      doc_id: Long, frame_idx: Long, width: Long, height: Long,
      n_frames: Long, px_sum: Long)

  /** Video corpus: every doc_id ≡ 2 mod 5 carries a REAL generated AVI
    * (uncompressed 24-bit DIB frames, [[AviFixtures]]); decode walks the
    * actual RIFF chunk tree ([[VideoCodecs.decodeAvi]] — hdrl/strl
    * validation, movi frame chunks, DIB row-padding skip) and every 2nd
    * frame emits a feature row — frame sampling over REAL decoded
    * frames, completing the image/audio/video modality triple. Same
    * per-partition batched shape; payloads never cross a shuffle.
    */
  def nsMultimodalVideo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .where(col("doc_id") % 5 === 2)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        val d = VideoCodecs.decodeAvi(AviFixtures.avi(id))
        d.frameSums.zipWithIndex.collect { case (s, f) if f % 2 == 0 =>
          VideoFrameFeatures(id, f.toLong, d.width, d.height,
            d.frameSums.length.toLong, s)
        }
      })
      .toDF()
      .select("doc_id", "frame_idx", "width", "height", "n_frames", "px_sum")
      .orderBy("doc_id", "frame_idx")
  }

  /** Decoded PNG features — all BIGINT for exact replay; no payload-size
    * column because compressed byte counts depend on the Deflater
    * version, which an oracle cannot replay.
    */
  case class PngFeatures(
      doc_id: Long, mime: String, width: Long, height: Long,
      color_type: Long, bit_depth: Long, interlace: Long, channels: Long,
      px_sum: Long, n_idat: Long)

  /** PNG corpus: every doc_id ≡ 3 mod 4 carries a REAL generated PNG —
    * the first COMPRESSED format in the modality set (the others are
    * uncompressed containers), cycling ALL FIVE COLOR TYPES
    * (2 RGB / 6 RGBA / 3 palette / 0 grayscale / 4 gray+alpha by id%5,
    * with every 7th non-palette id at 16-bit depth — a real corpus's
    * PNGs span all of these): decode walks the chunk tree with CRC32
    * verification, inflates the multi-IDAT zlib stream with the JDK
    * Inflater, reverses the per-row scanline filters at the color type's
    * byte stride (none/sub/up/average/paeth — the generator cycles all
    * five, so an unfiltered read diverges from the oracle), and expands
    * palette indices through the PLTE chunk. color_type and bit_depth
    * are read from the actual IHDR bytes; channels from the decoded
    * pixel layout. Same per-partition batched shape as the other
    * modalities; payloads never cross a shuffle.
    */
  def nsMultimodalPng(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .where(col("doc_id") % 4 === 3)
      .select(col("doc_id")).as[Long]
      .map(id => MediaRecord(id, ImageFixtures.PngMime, ImageFixtures.png(id)))
      .mapPartitions(_.map { r =>
        val (w, h, c, s) = ImageCodecs.decodePng(r.payload)
        // IHDR depth/color-type bytes, re-read from the payload (not the
        // generator's parameters): sig 8 + len/type 8 + w/h 8, then
        // depth, then color.
        val bitDepth = (r.payload(8 + 8 + 8) & 0xff).toLong
        val colorType = (r.payload(8 + 8 + 9) & 0xff).toLong
        val interlace = (r.payload(8 + 8 + 12) & 0xff).toLong
        PngFeatures(r.doc_id, r.mime, w, h, colorType, bitDepth, interlace,
          c, s, ImageCodecs.pngIdatCount(r.payload))
      })
      .toDF()
      .select("doc_id", "mime", "width", "height", "color_type", "bit_depth",
        "interlace", "channels", "px_sum", "n_idat")
      .orderBy("doc_id")
  }

  /** Decoded JPEG features — all BIGINT for exact replay; no payload-size
    * column (entropy-coded byte counts are a property of the encoder's
    * code assignment, not of the image).
    */
  case class JpegFeatures(
      doc_id: Long, mime: String, width: Long, height: Long,
      n_components: Long, restart_interval: Long, n_restarts: Long,
      px_sum: Long)

  /** JPEG corpus: every doc_id ≡ 5 mod 6 carries a REAL generated
    * baseline JPEG — the first ENTROPY-CODED format in the modality set
    * (PNG is compressed but its pixels survive exactly; JPEG pixels only
    * exist through Huffman decode + dequantize + IDCT). The fixtures
    * author quantized coefficients restricted to DCT frequencies whose
    * basis values are exactly ±1/8 ([[JpegFixtures]]), so the decoded
    * pixels — and hence px_sum over the w×h grid — are exact integer
    * formulas the oracle replays, while the byte stream exercises the
    * full baseline profile: custom (non-Annex-K) Huffman tables read from
    * DHT, DC prediction chains with restart-marker resets (interval 1-3
    * by id), AC run-length with ZRL, byte stuffing, 4:2:0 subsampling
    * with partial edge MCUs, and the fixed-point YCbCr→RGB conversion.
    * Every other jpeg id ([[JpegFixtures.isProgressive]]) is a
    * PROGRESSIVE (SOF2) stream — multi-scan spectral selection +
    * successive approximation with EOB runs and refinement correction
    * bits — authored from the SAME coefficients, so the pixel formulas
    * are shared and only the restart columns differ (progressive
    * fixtures carry no DRI). Same per-partition batched shape; payloads
    * never cross a shuffle.
    */
  def nsMultimodalJpeg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .where(col("doc_id") % 6 === 5)
      .select(col("doc_id")).as[Long]
      .map(id => MediaRecord(id, JpegFixtures.JpegMime, JpegFixtures.jpeg(id)))
      .mapPartitions(_.map { r =>
        val d = JpegCodecs.decodeJpeg(r.payload)
        JpegFeatures(r.doc_id, r.mime, d.width, d.height, d.nComponents,
          d.restartInterval, d.nRestarts, d.pxSum)
      })
      .toDF()
      .select("doc_id", "mime", "width", "height", "n_components",
        "restart_interval", "n_restarts", "px_sum")
      .orderBy("doc_id")
  }

  /** Decoded ADPCM features — all BIGINT for exact replay. */
  case class AdpcmFeatures(
      doc_id: Long, mime: String, sample_rate: Long, n_blocks: Long,
      n_samples: Long, abs_sum: Long, peak: Long)

  /** Compressed-audio corpus: every doc_id ≡ 2 mod 7 carries a REAL
    * IMA-ADPCM WAV ([[AdpcmFixtures]] — extended fmt with
    * wSamplesPerBlock, fact chunk, the junk-LIST trap, per-block
    * headers). Decode runs the exact integer adaptation state machine
    * ([[AdpcmCodecs.decodeAdpcmWav]]); the oracle replays every step as
    * a recursive CTE over the nibble formulas, so a hash match proves
    * the 4-bit delta decode itself, not just the container walk. Same
    * per-partition batched shape; payloads never cross a shuffle.
    */
  def nsMultimodalAdpcm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .where(col("doc_id") % 7 === 2)
      .select(col("doc_id")).as[Long]
      .map(id => MediaRecord(id, AdpcmFixtures.AdpcmMime, AdpcmFixtures.adpcm(id)))
      .mapPartitions(_.map { r =>
        val d = AdpcmCodecs.decodeAdpcmWav(r.payload)
        AdpcmFeatures(r.doc_id, r.mime, d.sampleRate, d.nBlocks, d.nSamples,
          d.absSum, d.peak)
      })
      .toDF()
      .select("doc_id", "mime", "sample_rate", "n_blocks", "n_samples",
        "abs_sum", "peak")
      .orderBy("doc_id")
  }

  /** Decoded MPEG-1 Layer II features — all BIGINT for exact replay; no
    * payload-size column (frame sizes are bitrate-derived and replayed
    * via n_frames × the 32 kHz frame formula anyway).
    */
  case class Mp3Features(
      doc_id: Long, mime: String, n_frames: Long, bitrate_kbps: Long,
      sample_rate: Long, n_samples: Long, alloc_sum: Long, scf_sum: Long,
      deq_abs_sum: Long, v0_abs: Long, syn0_abs: Long)

  /** MPEG-audio corpus: every doc_id ≡ 4 mod 9 carries a REAL generated
    * MPEG-1 Layer II stream ([[Mp3Fixtures]] — 1-3 frames at 56/64/96
    * kbps mono 32 kHz, five signal subbands spanning all four allocation
    * regions, grouped and ungrouped sample codes, all four scfsi modes).
    * Decode parses the actual entropy layout bit by bit and runs the
    * fixed-point requantization + granule-0 polyphase matrixing/window
    * ([[Mp3Codecs]]); the oracle replays every one of those integers
    * from the fixture formulas through the SAME Q30 tables (the
    * generated-SQL pattern). Layer III has its own query below
    * ([[nsMultimodalMp3L3]]). Same per-partition batched shape; payloads
    * never cross a shuffle.
    */
  def nsMultimodalMp3(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .where(col("doc_id") % 9 === 4)
      .select(col("doc_id")).as[Long]
      .map(id => MediaRecord(id, Mp3Fixtures.Mp3Mime, Mp3Fixtures.mp3(id)))
      .mapPartitions(_.map { r =>
        val d = Mp3Codecs.decodeMp3(r.payload)
        Mp3Features(r.doc_id, r.mime, d.nFrames, d.bitrateKbps, d.sampleRate,
          d.nSamples, d.allocSum, d.scfSum, d.deqAbsSum, d.v0Abs, d.syn0Abs)
      })
      .toDF()
      .select("doc_id", "mime", "n_frames", "bitrate_kbps", "sample_rate",
        "n_samples", "alloc_sum", "scf_sum", "deq_abs_sum", "v0_abs", "syn0_abs")
      .orderBy("doc_id")
  }

  /** Decoded MPEG-1 Layer III features — all BIGINT for exact replay. */
  case class Mp3L3Features(
      doc_id: Long, mime: String, n_frames: Long, bitrate_kbps: Long,
      sample_rate: Long, n_samples: Long, side_sum: Long, scf_sum: Long,
      huff_abs_sum: Long, deq_abs_sum: Long, alias0_abs: Long,
      imdct0_abs: Long, v_abs: Long, syn_abs: Long)

  /** Layer III corpus: every doc_id ≡ 7 mod 9 carries a REAL generated
    * MPEG-1 Layer III stream ([[Mp3L3Fixtures]] — 1-3 frames at
    * 64/96/128 kbps mono 32 kHz with a live bit reservoir, long / start /
    * short / stop granules, eight Huffman tables incl. linbits escapes,
    * scfsi sharing, both count1 tables). Decode walks the reservoir and
    * Huffman layout bit by bit, requantizes every granule, and runs the
    * granule-0 alias→IMDCT→inversion→polyphase chain ([[Mp3L3Codecs]]);
    * the oracle replays all of it from the fixture formulas through the
    * SAME fixed-point tables, including the part2_3_length bit accounting.
    * Same per-partition batched shape; payloads never cross a shuffle.
    */
  def nsMultimodalMp3L3(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .where(col("doc_id") % 9 === 7)
      .select(col("doc_id")).as[Long]
      .map(id => MediaRecord(id, Mp3L3Fixtures.Mp3Mime, Mp3L3Fixtures.mp3l3(id)))
      .mapPartitions(_.map { r =>
        val d = Mp3L3Codecs.decodeMp3L3(r.payload)
        Mp3L3Features(r.doc_id, r.mime, d.nFrames, d.bitrateKbps,
          d.sampleRate, d.nSamples, d.sideSum, d.scfSum, d.huffAbsSum,
          d.deqAbsSum, d.alias0Abs, d.imdct0Abs, d.vAbs, d.synAbs)
      })
      .toDF()
      .select("doc_id", "mime", "n_frames", "bitrate_kbps", "sample_rate",
        "n_samples", "side_sum", "scf_sum", "huff_abs_sum", "deq_abs_sum",
        "alias0_abs", "imdct0_abs", "v_abs", "syn_abs")
      .orderBy("doc_id")
  }

  /** Decoded GIF features — all BIGINT for exact replay; no payload-size
    * column (LZW output length depends on the encoder's reset cadence,
    * not the image).
    */
  case class GifFeatures(
      doc_id: Long, mime: String, width: Long, height: Long,
      n_frames: Long, n_local: Long, interlaced: Long, delay_sum: Long,
      idx_sum: Long, px_sum: Long)

  /** GIF corpus: every doc_id ≡ 5 mod 7 carries a REAL generated GIF89a
    * animation ([[GifFixtures]] — 1-3 full frames, global + per-frame
    * local 16-color palettes, 4-pass interlace on every id%4==1 doc,
    * graphic-control delays, comment/application extensions, LZW with
    * mid-stream CLEAR resets split across 17-byte sub-blocks). Decode
    * walks the real block structure and entropy stream ([[GifCodecs]]);
    * the oracle replays the index and palette formulas symbolically, so
    * idx_sum pins the LZW decode + de-interlace and px_sum pins the
    * local-vs-global palette resolution. Same per-partition batched
    * shape; payloads never cross a shuffle.
    */
  def nsMultimodalGif(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .where(col("doc_id") % 7 === 5)
      .select(col("doc_id")).as[Long]
      .map(id => MediaRecord(id, GifFixtures.GifMime, GifFixtures.gif(id)))
      .mapPartitions(_.map { r =>
        val d = GifCodecs.decodeGif(r.payload)
        GifFeatures(r.doc_id, r.mime, d.width.toLong, d.height.toLong,
          d.frames.size.toLong,
          d.frames.count(_.localTable).toLong,
          if (d.frames.exists(_.interlaced)) 1L else 0L,
          d.frames.map(_.delayCs.toLong).sum,
          d.frames.map(f => f.indices.map(b => (b & 0xff).toLong).sum).sum,
          d.frames.map { f =>
            f.indices.map { b =>
              val e = (b & 0xff) * 3
              (f.palette(e) & 0xff).toLong + (f.palette(e + 1) & 0xff) +
                (f.palette(e + 2) & 0xff)
            }.sum
          }.sum)
      })
      .toDF()
      .select("doc_id", "mime", "width", "height", "n_frames", "n_local",
        "interlaced", "delay_sum", "idx_sum", "px_sum")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ns_multimodal_gif" -> (nsMultimodalGif _),
    "ns_multimodal_mp3" -> (nsMultimodalMp3 _),
    "ns_multimodal_mp3_l3" -> (nsMultimodalMp3L3 _),
    "ns_multimodal_adpcm" -> (nsMultimodalAdpcm _),
    "ns_multimodal_jpeg" -> (nsMultimodalJpeg _),
    "ns_multimodal_png" -> (nsMultimodalPng _),
    "ns_multimodal_features" -> (nsMultimodalFeatures _),
    "ns_multimodal_frames" -> (nsMultimodalFrames _),
    "ns_multimodal_resize" -> (nsMultimodalResize _),
    "ns_multimodal_audio" -> (nsMultimodalAudio _),
    "ns_multimodal_video" -> (nsMultimodalVideo _))

  /** Shared oracle CTE: 4-way mime class (0 bmp, 1 ppm, 2 text, 3 pgm)
    * with per-class dims and channel count — ONE definition for all three
    * multimodal oracles.
    */
  private val mimeClassCtes: String =
    """d0 AS (
      |  SELECT doc_id, text,
      |         CASE WHEN doc_id % 3 = 1 THEN 1 WHEN doc_id % 3 = 0 THEN 0
      |              WHEN doc_id % 2 = 0 THEN 3 ELSE 2 END AS m
      |  FROM documents),
      |d AS (
      |  SELECT doc_id, text, m,
      |         CASE m WHEN 1 THEN doc_id % 13 + 1 WHEN 0 THEN doc_id % 11 + 1
      |                WHEN 3 THEN doc_id % 9 + 1 END AS w,
      |         CASE m WHEN 1 THEN doc_id % 7 + 1 WHEN 0 THEN doc_id % 5 + 1
      |                WHEN 3 THEN doc_id % 4 + 1 END AS h,
      |         CASE m WHEN 3 THEN 1 ELSE 3 END AS ch
      |  FROM d0)""".stripMargin

  /** n_bytes per class: PNM header ("P6\n<w> <h>\n255\n" = 9 + digits) +
    * ch·w·h, BMP = 54 + padded stride × h, text = utf8 length.
    */
  private val nBytesSql: String =
    """CAST(CASE d.m
      |  WHEN 1 THEN 9 + length(CAST(d.w AS VARCHAR))
      |              + length(CAST(d.h AS VARCHAR)) + 3*d.w*d.h
      |  WHEN 3 THEN 9 + length(CAST(d.w AS VARCHAR))
      |              + length(CAST(d.h AS VARCHAR)) + d.w*d.h
      |  WHEN 0 THEN 54 + ((3*d.w + 3) // 4 * 4) * d.h
      |  ELSE octet_length(encode(d.text)) END AS BIGINT)""".stripMargin

  private val mimeSql: String =
    """CASE d.m WHEN 1 THEN 'image/x-portable-pixmap'
      |         WHEN 0 THEN 'image/bmp'
      |         WHEN 3 THEN 'image/x-portable-graymap'
      |         ELSE 'text/plain' END""".stripMargin

  val oracles: Map[String, String] = Map(
    // Replays the Layer II fixture formulas through the decoder's OWN
    // Q30 tables (generated SQL — both engines share one set of
    // constants): allocation indexes per region, scfsi-mode scale-factor
    // cadence, grouped base-n / ungrouped offset-binary sample codes,
    // fixed-point requantization over every granule, and the granule-0
    // cosine matrixing + window tap. A hash match proves the bit-level
    // entropy parse and the filterbank arithmetic.
    "ns_multimodal_gif" -> GifFixtures.oracleSql,
    "ns_multimodal_mp3" -> Mp3Fixtures.oracleSql,
    // Replays the Layer III fixture formulas through the decoder's OWN
    // fixed-point tables (generated SQL): side-info sums incl. a
    // symbolically recomputed part2_3_length (codebook length rule +
    // escape/sign accounting), scfsi-shared scalefactors, Huffman
    // pair/escape/sign values, count1 quadruples, power-law
    // requantization over every granule, and the granule-0
    // alias→IMDCT→window→inversion chain through TWO polyphase steps
    // (pinning the V-FIFO shift). A hash match proves the bit-reservoir
    // addressing and the whole entropy layout — any drift in any stage
    // diverges one of the eight sums.
    "ns_multimodal_mp3_l3" -> Mp3L3Oracle.sql,
    // Replays the ENTIRE IMA adaptation state machine as a recursive
    // CTE: per (doc, block), 64 recursion steps advance (pred, idx)
    // through the spec step/index tables (inlined literals) over the
    // fixture's nibble formula, clamping exactly as the decoder does.
    // The header predictor is output sample 0. A hash match proves the
    // Spark side unpacked low-nibble-first and ran the exact integer
    // adaptation — any table/clamp/order slip diverges within a few
    // samples.
    "ns_multimodal_adpcm" ->
      """WITH RECURSIVE a AS (
        |  SELECT doc_id, CAST(doc_id % 4 + 2 AS BIGINT) AS nb
        |  FROM documents WHERE doc_id % 7 = 2),
        |blk AS (
        |  SELECT doc_id, unnest(generate_series(0, nb - 1)) AS b FROM a),
        |r AS (
        |  SELECT doc_id, b, 0 AS j,
        |         (doc_id*31 + b*97) % 8192 - 4096 AS pred,
        |         (doc_id*7 + b*13) % 89 AS idx,
        |         ABS((doc_id*31 + b*97) % 8192 - 4096) AS acc,
        |         ABS((doc_id*31 + b*97) % 8192 - 4096) AS pk
        |  FROM blk
        |  UNION ALL
        |  SELECT doc_id, b, j + 1, np, ni, acc + ABS(np), GREATEST(pk, ABS(np))
        |  FROM (
        |    SELECT doc_id, b, j, acc, pk,
        |           GREATEST(-32768, LEAST(32767,
        |             pred + CASE WHEN n >= 8 THEN -d ELSE d END)) AS np,
        |           GREATEST(0, LEAST(88, idx + list_extract(
        |             [-1,-1,-1,-1,2,4,6,8,-1,-1,-1,-1,2,4,6,8], n + 1))) AS ni
        |    FROM (
        |      SELECT doc_id, b, j, pred, idx, acc, pk, n,
        |             s//8 + (n%2)*(s//4) + ((n//2)%2)*(s//2) + ((n//4)%2)*s AS d
        |      FROM (
        |        SELECT doc_id, b, j, pred, idx, acc, pk,
        |               (doc_id*31 + b*5 + j*11) % 16 AS n,
        |               list_extract([7,8,9,10,11,12,13,14,16,17,19,21,23,25,
        |                 28,31,34,37,41,45,50,55,60,66,73,80,88,97,107,118,
        |                 130,143,157,173,190,209,230,253,279,307,337,371,408,
        |                 449,494,544,598,658,724,796,876,963,1060,1166,1282,
        |                 1411,1552,1707,1878,2066,2272,2499,2749,3024,3327,
        |                 3660,4026,4428,4871,5358,5894,6484,7132,7845,8630,
        |                 9493,10442,11487,12635,13899,15289,16818,18500,
        |                 20350,22385,24623,27086,29794,32767], idx + 1) AS s
        |        FROM r WHERE j < 64) q1) q2) q3),
        |agg AS (
        |  SELECT doc_id, CAST(SUM(acc) AS BIGINT) AS abs_sum,
        |         CAST(MAX(pk) AS BIGINT) AS peak
        |  FROM r WHERE j = 64 GROUP BY doc_id)
        |SELECT a.doc_id,
        |       'audio/adpcm' AS mime,
        |       CAST(8000 AS BIGINT) AS sample_rate,
        |       a.nb AS n_blocks,
        |       CAST(a.nb * 65 AS BIGINT) AS n_samples,
        |       agg.abs_sum, agg.peak
        |FROM a JOIN agg USING (doc_id)
        |ORDER BY a.doc_id""".stripMargin,
    // Replays the JpegFixtures coefficient formulas symbolically. The
    // fixtures restrict coefficients to DCT frequencies (0,0)/(4,0)/
    // (0,4)/(4,4), whose 8×8 basis values are exactly ±1/8 with the sign
    // + at within-block coordinate c when c%4 ∈ {0,3} — so pixel values
    // are exact integers: luma = 128 + 2·F00 + sx·F40 + sy·F04 +
    // sx·sy·F44 (dequant 16/8), chroma = 128 + 3·G00 + 2·(signed ACs)
    // (dequant 24/16), RGB via the fixed-point floor formulas. Block
    // indexes follow MCU encode order (4 luma blocks per 4:2:0 MCU, 1
    // per grayscale MCU); chroma samples replicate 2×2 (nearest). A
    // hash-match therefore proves the Spark side Huffman-decoded the
    // real entropy stream (custom DHT tables, DC prediction with
    // restart resets, ZRL runs, byte stuffing), dequantized, ran the
    // IDCT, upsampled and color-converted exactly.
    "ns_multimodal_jpeg" ->
      """WITH a AS (
        |  SELECT doc_id,
        |         CAST(doc_id % 23 + 9 AS BIGINT) AS w,
        |         CAST(doc_id % 19 + 9 AS BIGINT) AS h,
        |         (doc_id % 4 = 1) AS gray,
        |         (doc_id % 8 >= 4) AS prog,
        |         CAST((doc_id // 6) % 3 + 1 AS BIGINT) AS dri
        |  FROM documents WHERE doc_id % 6 = 5),
        |ux AS (
        |  SELECT doc_id, w, h, gray, dri,
        |         unnest(generate_series(0, w - 1)) AS x
        |  FROM a),
        |u AS (
        |  SELECT doc_id, w, gray, x,
        |         unnest(generate_series(0, h - 1)) AS y
        |  FROM ux),
        |c1 AS (
        |  SELECT doc_id, gray,
        |         CASE WHEN gray THEN (y//8)*((w+7)//8) + (x//8)
        |              ELSE ((y//16)*((w+15)//16) + (x//16))*4
        |                   + ((y%16)//8)*2 + ((x%16)//8) END AS lb,
        |         (y//16)*((w+15)//16) + (x//16) AS cbk,
        |         CASE WHEN (x%8)%4 IN (0,3) THEN 1 ELSE -1 END AS sx,
        |         CASE WHEN (y%8)%4 IN (0,3) THEN 1 ELSE -1 END AS sy,
        |         CASE WHEN ((x%16)//2)%4 IN (0,3) THEN 1 ELSE -1 END AS scx,
        |         CASE WHEN ((y%16)//2)%4 IN (0,3) THEN 1 ELSE -1 END AS scy
        |  FROM u),
        |c2 AS (
        |  SELECT doc_id, gray,
        |         128 + 2*((doc_id*7 + lb*5) % 41 - 20)
        |             + sx*((doc_id*11 + lb*3) % 11 - 5)
        |             + sy*((doc_id*5 + lb*7) % 11 - 5)
        |             + sx*sy*((doc_id*3 + lb*11) % 11 - 5) AS yv,
        |         128 + 3*((doc_id*7 + cbk*5 + 17) % 21 - 10)
        |             + 2*(scx*((doc_id*11 + cbk*3 + 17) % 7 - 3)
        |                + scy*((doc_id*5 + cbk*7 + 17) % 7 - 3)
        |                + scx*scy*((doc_id*3 + cbk*11 + 17) % 7 - 3)) AS cb,
        |         128 + 3*((doc_id*7 + cbk*5 + 34) % 21 - 10)
        |             + 2*(scx*((doc_id*11 + cbk*3 + 34) % 7 - 3)
        |                + scy*((doc_id*5 + cbk*7 + 34) % 7 - 3)
        |                + scx*scy*((doc_id*3 + cbk*11 + 34) % 7 - 3)) AS cr
        |  FROM c1),
        |c3 AS (
        |  SELECT doc_id,
        |         CASE WHEN gray THEN yv
        |              ELSE GREATEST(0, LEAST(255, yv + CAST(floor(
        |                     (91881*(cr-128)+32768)/65536.0) AS BIGINT)))
        |                 + GREATEST(0, LEAST(255, yv - CAST(floor(
        |                     (22554*(cb-128)+46802*(cr-128)+32768)/65536.0) AS BIGINT)))
        |                 + GREATEST(0, LEAST(255, yv + CAST(floor(
        |                     (116130*(cb-128)+32768)/65536.0) AS BIGINT)))
        |         END AS v
        |  FROM c2),
        |px AS (SELECT doc_id, CAST(SUM(v) AS BIGINT) AS px_sum FROM c3 GROUP BY doc_id)
        |SELECT a.doc_id,
        |       'image/jpeg' AS mime,
        |       a.w AS width, a.h AS height,
        |       CAST(CASE WHEN a.gray THEN 1 ELSE 3 END AS BIGINT) AS n_components,
        |       CAST(CASE WHEN a.prog THEN 0 ELSE a.dri END AS BIGINT)
        |         AS restart_interval,
        |       CAST(CASE WHEN a.prog THEN 0 ELSE
        |              ((CASE WHEN a.gray THEN ((a.w+7)//8)*((a.h+7)//8)
        |                     ELSE ((a.w+15)//16)*((a.h+15)//16) END) - 1) // a.dri
        |            END AS BIGINT) AS n_restarts,
        |       px.px_sum
        |FROM a JOIN px USING (doc_id)
        |ORDER BY a.doc_id""".stripMargin,
    // Replays the PngFixtures formulas symbolically: w = id%11+1,
    // h = id%5+4, color type cycles 2/6/3/0/4 by id%5, bit depth 16 for
    // every 7th non-palette id (bpc = bytes per component). px_sum over
    // the UN-FILTERED decoded bytes: non-palette types sum
    // (id·31 + i) % 256 over chRaw·bpc·w·h raw stream bytes (16-bit
    // sample pairs are consecutive raw bytes by construction); palette
    // images sum the PLTE entry bytes (id·13 + idx·3 + c) % 256 for
    // idx = (id·31 + i) % 16 over the w·h indices — so a hash-match
    // proves the Spark side inflated the real zlib stream, reversed
    // every scanline filter at the right BYTE stride (the generator
    // cycles all five filter types per image), and expanded the palette
    // through the actual PLTE chunk.
    "ns_multimodal_png" ->
      """WITH a AS (
        |  SELECT doc_id,
        |         CAST(doc_id % 11 + 1 AS BIGINT) AS w,
        |         CAST(doc_id % 5 + 4 AS BIGINT) AS h,
        |         doc_id % 5 AS t,
        |         CASE WHEN doc_id % 5 <> 2 AND doc_id % 7 = 0
        |              THEN 2 ELSE 1 END AS bpc
        |  FROM documents WHERE doc_id % 4 = 3),
        |u AS (
        |  SELECT doc_id, t,
        |         unnest(generate_series(0,
        |           (CASE t WHEN 0 THEN 3 WHEN 1 THEN 4 WHEN 3 THEN 1
        |                   WHEN 4 THEN 2 ELSE 1 END)*bpc*w*h - 1)) AS i
        |  FROM a),
        |px AS (
        |  SELECT doc_id,
        |         CAST(SUM(CASE WHEN t <> 2 THEN (doc_id*31 + i) % 256
        |              ELSE (doc_id*13 + ((doc_id*31 + i) % 16)*3    ) % 256
        |                 + (doc_id*13 + ((doc_id*31 + i) % 16)*3 + 1) % 256
        |                 + (doc_id*13 + ((doc_id*31 + i) % 16)*3 + 2) % 256
        |              END) AS BIGINT) AS px_sum
        |  FROM u GROUP BY doc_id)
        |SELECT a.doc_id,
        |       'image/png' AS mime,
        |       a.w AS width, a.h AS height,
        |       CAST(CASE a.t WHEN 0 THEN 2 WHEN 1 THEN 6 WHEN 2 THEN 3
        |                     WHEN 3 THEN 0 ELSE 4 END AS BIGINT) AS color_type,
        |       CAST(a.bpc * 8 AS BIGINT) AS bit_depth,
        |       CAST(CASE WHEN a.doc_id % 13 = 11 THEN 1 ELSE 0 END AS BIGINT) AS interlace,
        |       CAST(CASE a.t WHEN 0 THEN 3 WHEN 1 THEN 4 WHEN 2 THEN 3
        |                     WHEN 3 THEN 1 ELSE 2 END AS BIGINT) AS channels,
        |       px.px_sum,
        |       CAST(2 AS BIGINT) AS n_idat
        |FROM a JOIN px USING (doc_id)
        |ORDER BY a.doc_id""".stripMargin,
    // Replays the ImageFixtures formulas symbolically: PNM n_bytes =
    // header + ch·w·h, BMP = 54 + padded stride × h, px_sum =
    // Σ (id·31 + i) % 256 over the ch·w·h pixel bytes — so a hash-match
    // proves the Spark-side codec parsed the REAL header and pixels
    // (and skipped BMP padding, which is 0xAB, not 0).
    "ns_multimodal_features" ->
      s"""WITH $mimeClassCtes,
        |u AS (
        |  SELECT doc_id, unnest(generate_series(0, CAST(ch*w*h - 1 AS BIGINT))) AS i
        |  FROM d WHERE m <> 2),
        |px AS (
        |  SELECT doc_id, CAST(SUM((doc_id*31 + i) % 256) AS BIGINT) AS px_sum
        |  FROM u GROUP BY doc_id)
        |SELECT d.doc_id,
        |       $mimeSql AS mime,
        |       $nBytesSql AS n_bytes,
        |       CAST(CASE WHEN d.m <> 2 THEN d.w
        |            ELSE octet_length(encode(d.text)) % 640 END AS BIGINT) AS width,
        |       CAST(CASE WHEN d.m <> 2 THEN d.h
        |            ELSE (octet_length(encode(d.text)) * 7) % 480 END AS BIGINT) AS height,
        |       CAST(CASE WHEN d.m = 3 THEN 1 ELSE 3 END AS BIGINT) AS channels,
        |       COALESCE(px.px_sum, CAST(-1 AS BIGINT)) AS px_sum
        |FROM d LEFT JOIN px ON d.doc_id = px.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // Frame cutting runs over the mixed-mime payloads too: n_bytes per
    // mime replays the generator formulas (same CASE as the features
    // oracle), so image payload sizes come from real headers+pixels.
    "ns_multimodal_frames" ->
      s"""WITH $mimeClassCtes,
        |mm AS (
        |  SELECT doc_id, $nBytesSql AS n_bytes
        |  FROM d),
        |f AS (
        |  SELECT doc_id, n_bytes,
        |         unnest(generate_series(0, CAST(floor((n_bytes - 1) / 32) AS BIGINT))) AS frame_idx
        |  FROM mm)
        |SELECT doc_id, frame_idx,
        |       frame_idx * 32 AS byte_offset,
        |       (n_bytes * 31 + frame_idx * 7) % 256 AS stub_feature
        |FROM f WHERE frame_idx % 4 = 0 AND n_bytes > 0
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // Image rows: replay the strided decimation symbolically — output
    // component k maps back to input index i = ((oy·2)·w + ox·2)·3 + c,
    // value (id·31 + i) % 256, weight (i % 97) + 1. Text rows keep the
    // original every-2nd-byte checksum. A hash-match proves the Spark
    // side decoded real pixels and strided them identically.
    "ns_multimodal_resize" ->
      s"""WITH $mimeClassCtes,
        |dd AS (
        |  SELECT * FROM d WHERE m <> 2 OR length(text) > 0),
        |i1 AS (
        |  SELECT doc_id, w, h, ch, (w + 1) // 2 AS ow, (h + 1) // 2 AS oh
        |  FROM dd WHERE m <> 2),
        |i2 AS (
        |  SELECT doc_id, w, ch, ow, oh,
        |         unnest(generate_series(0, CAST(oh*ow*ch - 1 AS BIGINT))) AS k
        |  FROM i1),
        |ipx AS (
        |  SELECT doc_id,
        |         CAST(SUM(((doc_id*31 + i) % 256) * ((i % 97) + 1)) AS BIGINT) AS checksum
        |  FROM (SELECT doc_id,
        |          ((k // (ow*ch)) * 2 * w + ((k % (ow*ch)) // ch) * 2) * ch + (k % ch) AS i
        |        FROM i2)
        |  GROUP BY doc_id),
        |t1 AS (
        |  SELECT doc_id, text, CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM dd WHERE m = 2),
        |t2 AS (
        |  SELECT doc_id, unnest(range(1, CAST(n + 1 AS BIGINT), 2)) AS j
        |  FROM t1),
        |tpx AS (
        |  SELECT t2.doc_id,
        |         CAST(SUM(CAST(ascii(substring(t1.text, CAST(t2.j AS INT), 1)) AS BIGINT)
        |              * ((t2.j % 97) + 1)) AS BIGINT) AS checksum
        |  FROM t2 JOIN t1 ON t2.doc_id = t1.doc_id GROUP BY t2.doc_id)
        |SELECT d.doc_id,
        |       $mimeSql AS mime,
        |       $nBytesSql AS n_bytes,
        |       CAST(COALESCE(i1.ow, -1) AS BIGINT) AS out_w,
        |       CAST(COALESCE(i1.oh, -1) AS BIGINT) AS out_h,
        |       CAST(CASE WHEN d.m <> 2 THEN i1.ow*i1.oh*i1.ch
        |            ELSE (octet_length(encode(d.text)) + 1) // 2 END AS BIGINT) AS kept_units,
        |       COALESCE(ipx.checksum, tpx.checksum) AS resize_checksum
        |FROM dd d LEFT JOIN i1 USING (doc_id) LEFT JOIN ipx USING (doc_id)
        |       LEFT JOIN tpx ON d.doc_id = tpx.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // Replays the AudioFixtures formulas symbolically: n = 64 + id % 57
    // samples, sample i = ((id·31 + i·7) % 8192) − 4096, n_bytes =
    // 60 + 2n (RIFF 12 + fmt 24 + junk LIST 16 + data 8 + 2n). A
    // hash-match proves the Spark-side codec walked the real chunk list
    // (the LIST trap shifts `data` off byte 44) and decoded the real
    // little-endian int16 samples.
    "ns_multimodal_audio" ->
      """WITH a AS (
        |  SELECT doc_id, CAST(64 + doc_id % 57 AS BIGINT) AS n
        |  FROM documents WHERE doc_id % 4 = 1),
        |s AS (
        |  SELECT doc_id, n,
        |         unnest(generate_series(0, n - 1)) AS i
        |  FROM a),
        |agg AS (
        |  SELECT doc_id,
        |         CAST(SUM(abs(((doc_id*31 + i*7) % 8192) - 4096)) AS BIGINT) AS abs_sum,
        |         CAST(MAX(abs(((doc_id*31 + i*7) % 8192) - 4096)) AS BIGINT) AS peak
        |  FROM s GROUP BY doc_id)
        |SELECT a.doc_id,
        |       'audio/wav' AS mime,
        |       CAST(60 + 2*a.n AS BIGINT) AS n_bytes,
        |       CAST(8000 AS BIGINT) AS sample_rate,
        |       a.n AS n_samples,
        |       a.n * 1000 // 8000 AS duration_ms,
        |       agg.abs_sum, agg.peak
        |FROM a JOIN agg USING (doc_id)
        |ORDER BY a.doc_id""".stripMargin,
    // Replays the AviFixtures formulas symbolically: (id%7+2) × (id%5+2)
    // frames, 8 + id%9 of them, pixel byte k of frame f =
    // (id·31 + f·7 + k) % 256, every 2nd frame sampled. A hash-match
    // proves the Spark-side codec walked the real hdrl/strl/movi tree
    // and summed only pixel bytes (DIB row padding is 0xAB, not 0).
    "ns_multimodal_video" ->
      """WITH a AS (
        |  SELECT doc_id,
        |         CAST(doc_id % 7 + 2 AS BIGINT) AS w,
        |         CAST(doc_id % 5 + 2 AS BIGINT) AS h,
        |         CAST(8 + doc_id % 9 AS BIGINT) AS nf
        |  FROM documents WHERE doc_id % 5 = 2),
        |f AS (
        |  SELECT doc_id, w, h, nf,
        |         unnest(generate_series(0, nf - 1, 2)) AS frame_idx
        |  FROM a),
        |k AS (
        |  SELECT doc_id, frame_idx,
        |         unnest(generate_series(0, 3*w*h - 1)) AS k
        |  FROM f),
        |s AS (
        |  SELECT doc_id, frame_idx,
        |         CAST(SUM((doc_id*31 + frame_idx*7 + k) % 256) AS BIGINT) AS px_sum
        |  FROM k GROUP BY doc_id, frame_idx)
        |SELECT f.doc_id, f.frame_idx, f.w AS width, f.h AS height,
        |       f.nf AS n_frames, s.px_sum
        |FROM f JOIN s USING (doc_id, frame_idx)
        |ORDER BY f.doc_id, f.frame_idx""".stripMargin)
}
