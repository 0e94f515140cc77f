package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

/** HLL++ approximate distinct counts stay within the configured error of
  * the exact counts (no DuckDB oracle — sketches differ across engines).
  */
class ApproxDistinctSpec extends SparkSpec {
  test("approx_count_distinct within 5% of exact per group") {
    val approx = AggOps.op31bApproxDistinct(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n) <= math.max(1L, (n * 0.05).toLong),
        s"$k: approx $a vs exact $n")
    }
  }
}
