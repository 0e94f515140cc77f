package graft.operators

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Sessionization + sampling semantics and plan-shape pins. */
class SessionOpsSpec extends SparkSpec {

  test("lag-based sessions match Spark's native session_window exactly") {
    val lagBased = SessionOps.nsSessionAgg(spark, sfDir)
      .select("user_id", "n_events", "start_us", "end_us", "total_value")
      .collect().map(_.toSeq).toSet
    val native = SessionOps.sessionWindowAgg(Tables.events(spark, sfDir))
      .select("user_id", "n_events", "start_us", "end_us", "total_value")
      .collect().map(_.toSeq).toSet
    assert(lagBased.nonEmpty, "no sessions produced")
    assert(lagBased == native,
      s"lag-based and session_window rollups diverge: " +
        s"only-lag=${(lagBased -- native).take(3)} only-native=${(native -- lagBased).take(3)}")
    // and sessions genuinely merge AND split on this data
    val rows = SessionOps.nsSessionAgg(spark, sfDir)
    assert(rows.where(col("n_events") > 1).count() > 0, "no multi-event session")
    assert(rows.groupBy("user_id").count().where(col("count") > 1).count() > 0,
      "no user with more than one session")
  }

  test("sessionization plan: ONE hash exchange feeds windows and the rollup") {
    val nodes = noAqeNodes(SessionOps.nsSessionAgg(spark, sfDir))
    val shuffles = nodes.collect { case e: ShuffleExchangeExec => e }
    val (range, hash) = shuffles.partition(
      _.outputPartitioning.toString.toLowerCase.contains("range"))
    // presentation sort = 1 range exchange; everything else — two window
    // functions AND the (user_id, session_id) aggregation — must share the
    // single hash exchange on user_id (grouping-key prefix reuse).
    assert(hash.size == 1,
      s"expected exactly one hash exchange, got ${hash.map(_.outputPartitioning)}; " +
        s"all nodes: ${nodes.map(_.nodeName)}")
    assert(hash.head.outputPartitioning.toString.contains("user_id"),
      s"hash exchange not keyed on user_id: ${hash.head.outputPartitioning}")
    assert(range.size <= 1, s"unexpected extra range exchanges: $range")
  }

  test("hash-threshold sample is shuffle-free before the presentation sort") {
    val df = SamplingOps.nsCorpusSampleHash(spark, sfDir)
    val nodes = noAqeNodes(df)
    val shuffles = nodes.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.forall(
      _.outputPartitioning.toString.toLowerCase.contains("range")),
      s"hash-threshold sample shuffles beyond the presentation sort: " +
        s"${shuffles.map(_.outputPartitioning)}")
    // the residue-class rate lands near 20% per stratum
    val total = Tables.documents(spark, sfDir).count().toDouble
    val kept = df.count().toDouble
    assert(kept / total > 0.1 && kept / total < 0.3,
      s"hash sample rate ${kept / total} implausibly far from 0.2")
  }

  test("exact stratified sample hits its per-language quota exactly") {
    val docs = Tables.documents(spark, sfDir)
    val quotas = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> math.ceil(r.getLong(1) * 0.2).toLong).toMap
    val got = SamplingOps.nsCorpusSampleExact(spark, sfDir)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == quotas, s"per-lang sample counts $got != quotas $quotas")
  }
}
