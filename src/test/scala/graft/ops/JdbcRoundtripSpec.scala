package graft.ops

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

/** OP-05b contract: the embedded-Derby JDBC round-trip is value-exact and
  * the read side is a genuinely PARALLEL ranged scan (4 key slices), not a
  * single-connection pull. Both tests publish through the SAME
  * [[SourceSinkOps.publishCustomerDim]] the production query uses.
  */
class JdbcRoundtripSpec extends SparkSpec {

  test("jdbc round-trip aggregate equals the parquet-side aggregate") {
    val viaJdbc = SourceSinkOps.op05bJdbcRoundtrip(spark, sfDir).collect()
    val direct = Tables.customer(spark, sfDir)
      .filter(col("c_acctbal") > 0.0)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        round(min(col("c_acctbal")), 6).as("min_bal"),
        round(max(col("c_acctbal")), 6).as("max_bal"),
        round(sum(round(col("c_acctbal") * 100).cast("long")) / 100.0, 6)
          .as("sum_bal"))
      .orderBy("c_mktsegment")
      .collect()
    assert(viaJdbc.toSeq == direct.toSeq)
  }

  test("jdbc read is a 4-slice ranged parallel scan preserving all rows") {
    val src = Tables.customer(spark, sfDir)
    val bounds = src.agg(min("c_custkey"), max("c_custkey")).head
    val (url, props) = SourceSinkOps.publishCustomerDim(spark, sfDir)
    val back = spark.read
      .option("partitionColumn", "c_custkey")
      .option("lowerBound", bounds.getLong(0).toString)
      .option("upperBound", (bounds.getLong(1) + 1).toString)
      .option("numPartitions", "4")
      .jdbc(url, "customer_dim", props)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == src.count())
    // Every slice contributes: the ranges tile the key space, no slice
    // degenerates to the full table.
    val perSlice = back.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(perSlice.forall(_ > 0) && perSlice.sum == src.count())
  }
}
