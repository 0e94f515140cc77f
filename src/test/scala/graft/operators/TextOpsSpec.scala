package graft.operators

import graft.SparkSpec
import graft.model.Tables

/** Text-analysis semantics checks; the DuckDB oracle gate covers the
  * registered queries end-to-end, these pin the arithmetic independently.
  */
class TextOpsSpec extends SparkSpec {

  test("rarity scores match a brute-force corpus fold") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(docs.nonEmpty, "no documents at sf0.001")
    // Spark split(col, " ") keeps trailing empties (limit -1) — mirror it.
    val words = docs.map { case (id, t) => id -> t.toLowerCase.split(" ", -1).toSeq }
    val counts = words.flatMap(_._2).groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = words.map { case (id, ws) =>
      val cs = ws.map(counts)
      val rare = cs.count(_ <= 2).toLong
      val ratio = r6(rare.toDouble / ws.size)
      Seq[Any](id, ws.size.toLong, r6(cs.sum.toDouble / ws.size), ratio, ratio > 0.5)
    }.sortBy(_.head.asInstanceOf[Long]).toSeq
    val got = TextOps.nsTextRarity(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(got == want,
      s"rarity mismatch: got=${got.take(2)} want=${want.take(2)}")
  }

  test("rarity output is sane: ratios in [0,1], freq >= 1, every doc scored") {
    val rows = TextOps.nsTextRarity(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.length.toLong == nDocs, s"${rows.length} scored vs $nDocs docs")
    rows.foreach { r =>
      val (freq, ratio) = (r.getDouble(2), r.getDouble(3))
      assert(freq >= 1.0, s"mean_word_freq $freq < 1 for doc ${r.getLong(0)}")
      assert(ratio >= 0.0 && ratio <= 1.0, s"rare_ratio $ratio out of range")
      assert(r.getBoolean(4) == ratio > 0.5, "rare_heavy flag inconsistent")
    }
  }
}
