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
      opts.getInt("epochsPerPartition", 10))
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
    lo: Long, hi: Long, keysPerEpoch: Int, epochsPerPartition: Int)
    extends Table with SupportsRead {

  require(keysPerEpoch > 0, s"keysPerEpoch must be positive, got $keysPerEpoch")
  require(epochsPerPartition > 0,
    s"epochsPerPartition must be positive, got $epochsPerPartition")

  override def name(): String = s"epoch_range($lo..$hi)"
  override def schema(): StructType = EpochRangeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EpochRangeScanBuilder(lo, hi, keysPerEpoch, epochsPerPartition)
}

private[sources] class EpochRangeScanBuilder(
    var lo: Long, var hi: Long, keysPerEpoch: Int, epochsPerPartition: Int)
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
      new EpochRangeReaderFactory(keysPerEpoch, required)
  }
}

private[sources] case class EpochSlice(lo: Long, hi: Long) extends InputPartition

private[sources] class EpochRangeReaderFactory(
    keysPerEpoch: Int, required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val slice = partition.asInstanceOf[EpochSlice]
    new PartitionReader[InternalRow] {
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
