package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Enforces the micro-unit BIGINT sum's declared overflow behavior
  * (the bound documented at op30): a group whose micro-unit total
  * crosses ±(2^63−1) must FAIL LOUD with the named promote-to-DECIMAL
  * error — never wrap silently the way Spark's non-ANSI sum(BIGINT)
  * does — while in-range groups, empty groups, and all-null groups
  * behave exactly like plain sum.
  */
class MicroUnitSumSpec extends SparkSpec {

  private def sumOf(rows: Seq[(String, java.lang.Long)]): Seq[(String, Any)] = {
    import spark.implicits._
    rows.toDF("g", "micro")
      .groupBy("g")
      .agg(AggOps.microUnitSumChecked(col("micro"), "spec").as("s"))
      .orderBy("g")
      .collect().map(r => (r.getString(0), r.get(1))).toSeq
  }

  test("in-range, null-only, and mixed-null groups match plain sum") {
    val got = sumOf(Seq(
      ("a", 5L), ("a", -2L), ("a", null),
      ("b", Long.MaxValue), // one row exactly at the bound: fine
      ("c", null), ("c", null)))
    assert(got == Seq(("a", 3L), ("b", Long.MaxValue), ("c", null)), got)
  }

  test("a group crossing +2^63-1 micro-units fails loud with the promote-to-DECIMAL error") {
    // Two rows of 2^62 + 1 sum to 2^63 + 2 > Long.MaxValue. Plain
    // non-ANSI sum(BIGINT) would wrap this to a negative total and the
    // query would "succeed" with garbage.
    val half = (1L << 62) + 1L
    val e = intercept[Exception](sumOf(Seq(("x", half), ("x", half))))
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("promote this aggregate to DECIMAL(38,0)")),
      s"expected the named overflow error, got: ${messages(e)}")
  }

  test("negative-direction overflow fails loud too") {
    val half = -((1L << 62) + 1L)
    val e = intercept[Exception](sumOf(Seq(("x", half), ("x", half))))
    assert(Option(e.getMessage).getOrElse("").contains("DECIMAL(38,0)") ||
      (e.getCause != null &&
        Option(e.getCause.getMessage).getOrElse("").contains("DECIMAL(38,0)")),
      s"expected the named overflow error, got: $e")
  }

  test("the shipped op30 sums still agree with plain sum on the fixture (no behavior drift in range)") {
    val plain = graft.model.Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(round(sum(expr("CAST(round(l_extendedprice * 1000000) AS BIGINT)")) / 1e6, 6)
        .as("sum_price"))
      .orderBy("l_returnflag", "l_linestatus")
      .collect().map(_.toSeq).toSeq
    val checked = AggOps.op30MultiAgg(spark, sfDir)
      .select("sum_price")
      .collect().map(_.toSeq).toSeq
    assert(plain.map(_.last) == checked.map(_.last))
  }
}
