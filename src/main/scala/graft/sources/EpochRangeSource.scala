package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSourceV2: the Spark-native restatement of the reference's
  * REST extract scan (SURVEY.md §2.1 OP-01/OP-41 — extract_handler.py's
  * "one beacon-API call per epoch, ≤10 epochs per invocation" loop).
  *
  * The source models a range-addressable upstream (epochs `lo..hi`, a
  * fixed validator set per epoch, deterministic balances standing in for
  * the HTTP payload):
  *
  *  - PARTITION PLANNING: one `InputPartition` per ≤`epochsPerPartition`
  *    epoch sub-range — the work-chunking the reference encodes in SQS
  *    messages becomes Spark task planning;
  *  - FILTER PUSHDOWN (`SupportsPushDownFilters`): epoch range predicates
  *    narrow `[lo, hi]` BEFORE planning, so pruned epochs are never
  *    fetched at all — the analog of not issuing the REST call (at 100 TB:
  *    incremental extract reads only the catch-up window);
  *  - COLUMN PRUNING (`SupportsPushDownRequiredColumns`): readers
  *    materialize only requested fields.
  *
  * Usage: `spark.read.format("graft.sources.EpochRangeSource")
  *   .option("lo", 0).option("hi", 999).load()`.
  *
  * REPLAY MODE (`option("fixture", path)`): instead of the synthetic
  * generator, each partition reads its epoch slice from a RECORDED
  * archive file — one JSON line per epoch,
  * `{"epoch":N,"validators":[{"bls_key":"0x0001","balance":32.5},...]}`,
  * the persisted shape of the reference's per-epoch beacon REST payloads
  * (/root/reference/src/utils/archive.py:10-33). This makes the ingest
  * path generic: the same partition planning / pushdown / pruning
  * contract over real recorded bytes, no network required. Each reader
  * streams the file and keeps only its slice's epochs — a production
  * archive would shard into one object per epoch range so a slice reads
  * exactly its shard; the single-file form keeps the fixture
  * self-contained.
  */
class EpochRangeSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EpochRangeSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new EpochRangeTable(
      opts.getLong("lo", 0L),
      opts.getLong("hi", 99L),
      opts.getInt("keysPerEpoch", 16),
      opts.getInt("epochsPerPartition", 10),
      Option(opts.get("fixture")))
  }
}

object EpochRangeSource {
  val schema: StructType = StructType(Seq(
    StructField("bls_key", StringType, nullable = false),
    StructField("epoch", LongType, nullable = false),
    StructField("balance", DoubleType, nullable = false)))

  /** Deterministic stand-in for the REST payload balance. */
  def balanceOf(epoch: Long, key: Int): Double =
    32.0 + ((epoch * 31 + key * 7) % 1000) / 1000.0
}

private[sources] class EpochRangeTable(
    lo: Long, hi: Long, keysPerEpoch: Int, epochsPerPartition: Int,
    fixture: Option[String])
    extends Table with SupportsRead {

  require(keysPerEpoch > 0, s"keysPerEpoch must be positive, got $keysPerEpoch")
  require(epochsPerPartition > 0,
    s"epochsPerPartition must be positive, got $epochsPerPartition")

  override def name(): String = s"epoch_range($lo..$hi)"
  override def schema(): StructType = EpochRangeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EpochRangeScanBuilder(lo, hi, keysPerEpoch, epochsPerPartition, fixture)
}

private[sources] class EpochRangeScanBuilder(
    var lo: Long, var hi: Long, keysPerEpoch: Int, epochsPerPartition: Int,
    fixture: Option[String])
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = EpochRangeSource.schema
  private var pushed: Array[Filter] = Array.empty
  private var empty = false // strict bound at a Long extreme: nothing qualifies

  // Epoch range predicates tighten [lo, hi]; everything else stays post-scan.
  // One case list BOTH decides acceptance and applies the bound — parallel
  // accept/apply lists would drift (a filter claimed pushed but never
  // applied silently returns unfiltered rows). Strict bounds saturate
  // instead of wrapping at Long extremes.
  private def satInc(v: Long): Long = if (v == Long.MaxValue) v else v + 1
  private def satDec(v: Long): Long = if (v == Long.MinValue) v else v - 1

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val rejected = filters.filterNot { f =>
      val applied = f match {
        case GreaterThan("epoch", v: Long) =>
          if (v == Long.MaxValue) empty = true else lo = math.max(lo, satInc(v))
          true
        case GreaterThanOrEqual("epoch", v: Long) => lo = math.max(lo, v); true
        case LessThan("epoch", v: Long) =>
          if (v == Long.MinValue) empty = true else hi = math.min(hi, satDec(v))
          true
        case LessThanOrEqual("epoch", v: Long) => hi = math.min(hi, v); true
        case EqualTo("epoch", v: Long) =>
          lo = math.max(lo, v); hi = math.min(hi, v); true
        case _ => false
      }
      if (applied) pushed = pushed :+ f
      applied
    }
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"EpochRangeScan [$lo..$hi] pushed=${pushed.mkString(",")} read=${required.simpleString}"

    override def planInputPartitions(): Array[InputPartition] =
      if (empty || hi < lo) Array.empty
      else (lo to hi by epochsPerPartition).map { start =>
        EpochSlice(start, math.min(start + epochsPerPartition - 1, hi)): InputPartition
      }.toArray

    override def createReaderFactory(): PartitionReaderFactory =
      new EpochRangeReaderFactory(keysPerEpoch, required, fixture)
  }
}

private[sources] case class EpochSlice(lo: Long, hi: Long) extends InputPartition

private[sources] class EpochRangeReaderFactory(
    keysPerEpoch: Int, required: StructType, fixture: Option[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val slice = partition.asInstanceOf[EpochSlice]
    fixture match {
      case Some(path) => new FixtureReplayReader(slice, path, required)
      case None => new PartitionReader[InternalRow] {
        private var epoch = slice.lo - 1
        private var key = keysPerEpoch - 1
        // Projection resolved ONCE per reader — the per-row path only calls
        // the prebuilt generators, no per-row name matching.
        private val fieldGen: Array[() => Any] = required.fields.map(_.name match {
          case "bls_key" => () => UTF8String.fromString(f"0x$key%04d")
          case "epoch" => () => epoch
          case "balance" => () => EpochRangeSource.balanceOf(epoch, key)
        })
        override def next(): Boolean = {
          if (key + 1 < keysPerEpoch) { key += 1; true }
          else if (epoch + 1 <= slice.hi) { epoch += 1; key = 0; true }
          else false
        }
        override def get(): InternalRow =
          InternalRow.fromSeq(fieldGen.toIndexedSeq.map(_.apply()))
        override def close(): Unit = ()
      }
    }
  }
}

/** Replays a recorded per-epoch REST archive (JSON lines) for one epoch
  * slice: streams the file, parses only lines whose epoch falls in the
  * slice, and emits one row per validator entry. Jackson is Spark's own
  * bundled JSON parser — no extra dependency. Epochs ABSENT from the
  * archive produce no rows (a recorded archive has gaps where the
  * upstream had none to serve) — that is the point of replay mode: the
  * data comes from the file, not a formula.
  */
private[sources] class FixtureReplayReader(
    slice: EpochSlice, path: String, required: StructType)
    extends PartitionReader[InternalRow] {

  private val reader = java.nio.file.Files.newBufferedReader(
    java.nio.file.Path.of(path))
  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  private var curEpoch = 0L
  private var curKey: String = _
  private var curBalance = 0.0
  private var validators: java.util.Iterator[com.fasterxml.jackson.databind.JsonNode] = _

  // Projection resolved once per reader, like the synthetic path.
  private val fieldGen: Array[() => Any] = required.fields.map(_.name match {
    case "bls_key" => () => UTF8String.fromString(curKey)
    case "epoch" => () => curEpoch
    case "balance" => () => curBalance
  })

  override def next(): Boolean = {
    while (validators == null || !validators.hasNext) {
      val line = reader.readLine()
      if (line == null) return false
      if (line.nonEmpty) {
        val node = om.readTree(line)
        val ep = node.get("epoch").asLong()
        if (ep >= slice.lo && ep <= slice.hi) {
          curEpoch = ep
          validators = node.get("validators").elements()
        }
      }
    }
    val v = validators.next()
    curKey = v.get("bls_key").asText()
    curBalance = v.get("balance").asDouble()
    true
  }

  override def get(): InternalRow =
    InternalRow.fromSeq(fieldGen.toIndexedSeq.map(_.apply()))

  override def close(): Unit = reader.close()
}

/** Writes the deterministic recorded archive the replay tests/oracle use:
  * epochs 0..299 with every `epoch % 37 == 0` line MISSING (recorded
  * archives have gaps), 16 validators per present epoch, balances from a
  * formula the DuckDB oracle replays. The gaps + a second jitter term
  * (absent from the synthetic generator) make the oracle check fail
  * unless the rows genuinely come from parsing the file.
  */
object EpochFixture {
  val Epochs: Range = 0 to 299
  val Keys = 16

  def balance(epoch: Long, key: Int): Double =
    32.0 + ((epoch * 31 + key * 7) % 1000) / 1000.0 +
      ((epoch * 13 + key * 3) % 89) / 10000.0

  def present(epoch: Long): Boolean = epoch % 37 != 0

  private lazy val root = graft.ops.ProcessTmp.dir("graft_fixture")

  /** Write-once per process; returns the archive path. */
  def ensure(): String = synchronized {
    val p = java.nio.file.Path.of(root, "epoch_archive.jsonl")
    if (!java.nio.file.Files.exists(p)) {
      java.nio.file.Files.createDirectories(p.getParent)
      val sb = new StringBuilder
      for (epoch <- Epochs if present(epoch)) {
        val vals = (0 until Keys).map { k =>
          s"""{"bls_key":"0x${"%04d".format(k)}","balance":${balance(epoch, k)}}"""
        }.mkString(",")
        sb.append(s"""{"epoch":$epoch,"validators":[$vals]}""").append('\n')
      }
      java.nio.file.Files.writeString(p, sb.toString)
    }
    p.toString
  }
}
