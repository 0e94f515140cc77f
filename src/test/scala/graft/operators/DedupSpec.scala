package graft.operators

import graft.SparkSpec

/** LSH dedup variants vs the exact-Jaccard truth on the sf0.001 fixtures
  * (which contain planted near-duplicates at jaccard >= 0.9 with a clean
  * separation gap — see SURVEY.md §7.4).
  */
class DedupSpec extends SparkSpec {

  private lazy val exactPairs: Set[(Long, Long)] =
    DedupOps.nsDedupJaccard(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exact jaccard finds the planted near-dup pairs") {
    assert(exactPairs.nonEmpty)
  }

  test("minhash LSH recovers exactly the exact-jaccard pairs (verified candidates)") {
    val minhashPairs = DedupOps.nsDedupMinhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // Verification filters candidates by true jaccard, so minhash ⊆ exact;
    // with >=0.9 planted similarity, 8 bands x 4 rows misses nothing.
    assert(minhashPairs == exactPairs)
  }

  test("simhash near-dup pairs cover the planted high-similarity pairs") {
    val simhashPairs = DedupOps.nsDedupSimhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // jaccard >= 0.9 implies near-identical token multisets -> hamming <= 3.
    val high = exactPairs // planted pairs are all >= 0.9 in the fixtures
    val recall = high.count(simhashPairs.contains).toDouble / high.size
    assert(recall >= 0.8, s"simhash recall $recall, pairs=${simhashPairs.size}")
  }

  test("exact dedup keeps one survivor per fingerprint") {
    val out = DedupOps.nsDedupExact(spark, sfDir).collect()
    assert(out.map(_.getString(0)).distinct.length == out.length)
    assert(out.map(_.getLong(2)).forall(_ >= 1))
  }
}
