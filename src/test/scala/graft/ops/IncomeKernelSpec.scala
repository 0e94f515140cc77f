package graft.ops

import graft.SparkSpec

/** Properties of the income kernel mirroring the reference's tests
  * (/root/reference/test/utils/financials_test.py:14-64) plus the
  * gap-cutoff semantics of validator_income_handler.py:103-133.
  * Randomized cases use a fixed seed (no scalatest+scalacheck bridge in
  * the offline cache, so the property loop is hand-rolled).
  */
class IncomeKernelSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Double, Double)]) =
    IncomeKernel.cumulativeIncome(
      rows.toDF("user_id", "epoch", "balance", "withdrawal"))
      .orderBy("user_id", "epoch")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5)))

  test("single gap-free series: earnings - losses telescopes to last - first + withdrawals") {
    val balances = Seq(100.0, 110.0, 95.0, 120.0, 120.0)
    val rows = balances.zipWithIndex.map { case (b, i) => (1L, i.toLong, b, 0.0) }
    val out = run(rows)
    assert(out.length == 5)
    val (earn, loss) = (out.last._3, out.last._4)
    assert(math.abs((earn - loss) - (120.0 - 100.0)) < 1e-9)
    assert(earn >= 0 && loss >= 0)
  }

  test("withdrawal is credited at the lower epoch of each delta") {
    // balance drops 100 -> 90 but 15 was withdrawn at epoch 0: delta = +5.
    val rows = Seq((1L, 0L, 100.0, 15.0), (1L, 1L, 90.0, 0.0))
    val out = run(rows)
    assert(out.last._3 == 5.0) // earnings
    assert(out.last._4 == 0.0) // losses
  }

  test("processing stops at the first epoch gap > 1") {
    val rows = Seq(
      (1L, 0L, 100.0, 0.0), (1L, 1L, 110.0, 0.0),
      (1L, 4L, 500.0, 0.0), (1L, 5L, 600.0, 0.0)) // gap 1 -> 4
    val out = run(rows)
    assert(out.map(_._2).toSeq == Seq(0L, 1L)) // epochs 4,5 excluded
    assert(out.last._3 == 10.0)
  }

  test("a key with no gap keeps all epochs; an independent gapped key is cut") {
    val rows = Seq(
      (1L, 0L, 10.0, 0.0), (1L, 1L, 20.0, 0.0), (1L, 2L, 30.0, 0.0),
      (2L, 0L, 10.0, 0.0), (2L, 3L, 99.0, 0.0))
    val out = run(rows)
    assert(out.count(_._1 == 1L) == 3)
    assert(out.count(_._1 == 2L) == 1) // only epoch 0 survives
  }

  test("property: earnings/losses non-negative, telescoping, count = rows") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 10) {
      val n = 2 + rng.nextInt(40)
      val bs = Seq.fill(n)(math.rint(rng.nextDouble() * 33e9) / 100)
      val rows = bs.zipWithIndex.map { case (b, i) => (7L, i.toLong, b, 0.0) }
      val out = run(rows)
      assert(out.length == bs.length)
      val (earn, loss) = (out.last._3, out.last._4)
      assert(earn >= -1e-9 && loss >= -1e-9)
      assert(math.abs((earn - loss) - (bs.last - bs.head)) < 1e-3)
      // epochs_since_active increments 0..n-1
      assert(out.map(_._6).toSeq == bs.indices.map(_.toLong))
    }
  }

  test("apr is zero at epoch 0 and proportional to earnings/epochs") {
    val rows = Seq((1L, 0L, 100.0, 0.0), (1L, 1L, 148.0, 0.0), (1L, 2L, 196.0, 0.0))
    val out = run(rows)
    assert(out.head._5 == 0.0)
    // apr(2 epochs) uses earnings=96 over 2 epochs
    val expected = BigDecimal(96.0 * IncomeKernel.EpochsPerYear / (2 * IncomeKernel.AprDenom))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out.last._5 - expected) < 1e-9)
  }
}
