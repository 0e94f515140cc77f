package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

/** HLL++ approximate distinct counts stay within the configured error of
  * the exact counts. The query itself carries the tolerance check as its
  * `approx_ok` column (the oracle emits literal TRUE, so the DuckDB gate
  * anchors the sketch within +-5%); this spec checks the same bound
  * against an independently computed exact count.
  */
class ApproxDistinctSpec extends SparkSpec {
  test("approx_count_distinct within 5% of exact per group") {
    val out = AggOps.op31bApproxDistinct(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getBoolean(2),
      s"${r.getString(0)}: HLL outside 5% of exact ${r.getLong(1)}"))
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.map(r => r.getString(0) -> r.getLong(1)).toMap == exact)
  }
}
