package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DataSourceV2 contract: planning, pushdown-as-pruning, column pruning,
  * and value determinism.
  */
class EpochRangeSourceSpec extends SparkSpec {

  private def src(opts: (String, String)*): DataFrame = {
    val r = spark.read.format("graft.sources.EpochRangeSource")
    opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  test("full scan yields epochs x keys deterministic rows") {
    val df = src("lo" -> "0", "hi" -> "99", "keysPerEpoch" -> "8")
    assert(df.count() == 100L * 8)
    val row = df.where(col("epoch") === 5 && col("bls_key") === "0x0003")
      .select("balance").collect()
    assert(row.map(_.getDouble(0)).toSeq ==
      Seq(EpochRangeSource.balanceOf(5, 3)))
  }

  test("epoch range pushdown prunes input partitions (no fetch for pruned epochs)") {
    val df = src("lo" -> "0", "hi" -> "999", "epochsPerPartition" -> "10")
    // Unfiltered: 100 partitions of 10 epochs.
    assert(df.rdd.getNumPartitions == 100)
    // Catch-up window: only 2 partitions planned — the other 980 epochs
    // are never generated (the REST calls are never issued).
    val window = df.where(col("epoch") >= 980)
    assert(window.rdd.getNumPartitions == 2)
    assert(window.count() == 20L * 16)
    // Point lookup plans exactly one slice.
    val point = df.where(col("epoch") === 123)
    assert(point.rdd.getNumPartitions == 1)
    assert(point.count() == 16)
    // Contradictory range plans zero work.
    assert(df.where(col("epoch") > 5000).rdd.getNumPartitions == 0)
  }

  test("pushdown survives in the physical plan description") {
    val df = src("lo" -> "0", "hi" -> "999").where(col("epoch").between(10, 19))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("EpochRangeScan [10..19]"), plan)
  }

  test("residual (non-epoch) predicates still apply after the scan") {
    val df = src("lo" -> "0", "hi" -> "9")
      .where(col("epoch") >= 8 && col("bls_key") === "0x0001")
    assert(df.count() == 2)
  }

  test("column pruning: projected read returns only requested fields") {
    val df = src("lo" -> "0", "hi" -> "9").select("epoch")
    assert(df.schema.fieldNames.toSeq == Seq("epoch"))
    assert(df.distinct().count() == 10)
  }

  test("fixture replay: rows come from the recorded archive, gaps and all") {
    val path = EpochFixture.ensure()
    val df = src("lo" -> "0", "hi" -> "299", "epochsPerPartition" -> "25",
      "fixture" -> path)
    // 300 epochs minus the 9 recorded gaps (0, 37, ..., 296), 16 keys each
    val presentEpochs = EpochFixture.Epochs.count(e => EpochFixture.present(e.toLong))
    assert(df.count() == presentEpochs.toLong * EpochFixture.Keys)
    // gap epochs yield nothing — proof the data is read, not generated
    assert(df.where(col("epoch") === 37).count() == 0)
    // a spot value matches the recorded payload (jitter term included)
    val got = df.where(col("epoch") === 5 && col("bls_key") === "0x0003")
      .select("balance").collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(EpochFixture.balance(5, 3)))
    // epoch pushdown still prunes partitions in replay mode
    val window = df.where(col("epoch") >= 250)
    assert(window.rdd.getNumPartitions == 2)
    // column pruning still applies
    assert(df.select("epoch").schema.fieldNames.toSeq == Seq("epoch"))
  }
}
