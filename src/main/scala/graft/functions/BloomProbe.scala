package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Session registration for Spark's own `bloom_filter_agg` /
  * [[BloomFilterMightContain]] pair — the machinery behind its runtime
  * row-level filtering. Both expressions exist in spark-catalyst but are
  * internal-only (not in the public function registry), so graft exposes
  * them as session temp functions for
  * [[graft.operators.DedupOps.nsDecontaminateBloom]]:
  *
  *   bloom_filter_agg(<xxhash64 value>, <est items>, <num bits>)
  *   might_contain(<filter bytes>, <xxhash64 value>)
  *
  * The probe's filter argument must be foldable (a binary literal here —
  * the expression deserializes the filter once at setup, not per row),
  * which is why the caller collects the one-row, size-capped aggregate
  * result to the driver instead of cross-joining it.
  */
object BloomProbe {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_filter_agg",
      (exprs: Seq[Expression]) =>
        new BloomFilterAggregate(exprs.head, exprs(1), exprs(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "might_contain",
      (exprs: Seq[Expression]) => BloomFilterMightContain(exprs.head, exprs(1)),
      "built-in")
  }
}
