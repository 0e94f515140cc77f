package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Soft-EM (forward-backward) unigram fit: the fixed-point expected
  * counts match an exact enumeration of ALL segmentations, and the
  * soft round genuinely differs from the superseded hard-EM (Viterbi
  * best-path) round on a corpus where the maximum-likelihood path
  * monopolizes the hard counts.
  */
class SoftEmSpec extends SparkSpec {

  private def docsDF(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("crafted"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  private def wfOf(docs: org.apache.spark.sql.DataFrame) =
    docs.select(explode(split(lower(col("text")), " ")).as("wd"))
      .where(col("wd") =!= "")
      .groupBy("wd").agg(count(lit(1)).as("freq"))

  /** Exact expected piece counts for one word under a logp_u vocab, by
    * enumerating every segmentation with double arithmetic.
    */
  private def bruteExpected(word: String, vocab: Map[String, Long]): Map[String, Double] = {
    // all segmentations as piece lists
    def segs(i: Int): Seq[List[String]] =
      if (i == word.length) Seq(Nil)
      else (1 to math.min(TextOps.UniMaxPiece, word.length - i)).flatMap { l =>
        val p = word.substring(i, i + l)
        if (vocab.contains(p)) segs(i + l).map(p :: _) else Nil
      }
    val all = segs(0)
    val weights = all.map(ps => math.exp(ps.map(vocab(_) / 1e6).sum))
    val z = weights.sum
    all.zip(weights).foldLeft(Map.empty[String, Double]) { case (m, (ps, w)) =>
      ps.foldLeft(m)((mm, p) => mm.updated(p, mm.getOrElse(p, 0.0) + w / z))
    }
  }

  test("fixed-point expected counts match exact enumeration") {
    val docs = docsDF(Seq(
      1L -> "banana bandana banana",
      2L -> "ananas banana cab",
      3L -> "ban ban nab an an"))
    val wf = wfOf(docs).cache()
    // Any valid (piece -> logp) model exercises the forward-backward DP
    // identically — use the hard-fit vocab over the same corpus.
    val model = TextOps.unigramVocabFrom(docs, soft = false)
    val vmap = model.map(v => v._1 -> v._3).toMap
    val usage = TextOps.emUsageSoft(wf, model)
    val freqs = wf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected usage per piece = sum over words freq(w) * E_w[count(p)]
    val expected = freqs.toSeq.filter(_._1.length <= TextOps.UniMaxWord)
      .foldLeft(Map.empty[String, Double]) { case (m, (w, f)) =>
        bruteExpected(w, vmap).foldLeft(m) { case (mm, (p, e)) =>
          mm.updated(p, mm.getOrElse(p, 0.0) + f * e)
        }
      }
    expected.foreach { case (p, e) =>
      val got = usage.getOrElse(p, 0L).toDouble / 1e6
      assert(math.abs(got - e) <= math.max(1e-3, e * 1e-3),
        s"piece '$p': fixed-point $got vs exact $e")
    }
    // and nothing extra got mass
    usage.keys.foreach { p =>
      assert(expected.contains(p), s"piece '$p' has usage but no exact mass")
    }
    wf.unpersist()
  }

  test("soft-EM keeps posterior-mass pieces the hard best path prunes") {
    // 'abxy' x4: every 2+-char substring is a candidate; the single-piece
    // path 'abxy' is the unique Viterbi argmax (fewest pieces under
    // equal seed logps), so HARD usage is zero for every other
    // multi-char piece -> pruned; the two-piece split 'ab|xy' still
    // carries p/(1+p)^3 ~ 7.5% posterior -> SOFT keeps it.
    val docs = docsDF(Seq(1L -> "abxy abxy abxy abxy"))
    val hard = TextOps.unigramVocabFrom(docs, soft = false)
    val soft = TextOps.unigramVocabFrom(docs, soft = true)
    val hardMulti = hard.collect { case (p, _, _) if p.length >= 2 => p }.toSet
    val softMulti = soft.collect { case (p, _, _) if p.length >= 2 => p }.toSet
    assert(hardMulti == Set("abxy"),
      s"hard-EM should keep only the ML-path piece: $hardMulti")
    assert(Set("ab", "xy", "abxy").subsetOf(softMulti),
      s"soft-EM lost posterior-mass pieces: $softMulti")
    // and the dominant path still dominates the soft scores
    val softScores = soft.map(v => v._1 -> v._2).toMap
    assert(softScores("abxy") > softScores("ab"),
      s"score order broken: ${softScores.filter(_._1.length >= 2)}")
  }
}
