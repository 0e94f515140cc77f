package graft.operators

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

/** The trained hashed quality classifier's contract: the distributed
  * integer-GD loop must reproduce a brute-force single-machine reference
  * EXACTLY (every arithmetic step is quantized integers, so there is one
  * right answer), be invariant to input partitioning (the order-free
  * gradient-sum discipline), and actually LEARN the Gopher gate it
  * distills (accuracy strictly above the majority prior — the failure
  * mode this pins was real: length-normalized word features alone
  * learned nothing but the prior, because the gate is mostly a
  * length-band rule; the one-hot stat bins are what make it learnable).
  */
class ClassifierSpec extends SparkSpec {

  private val RB = 31L
  private val RM = 1000000007L

  /** Plain-Scala replica of the training loop over collected rows. */
  private def reference(): (Array[Long], Map[Long, (Long, Boolean)]) = {
    def sdiv(a: Long, q: Long): Long = a / q // truncation toward zero
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val prof = TextOps.gopherProfile(Tables.documents(spark, sfDir))
      .select("doc_id", "n_words", "mwl_u", "sym_u", "alpha_u",
        "n_stop_distinct", "dup3_u", "pass").collect()
    val dim = TextOps.ClsDim
    val feats: Map[Long, (Long, Map[Int, Long])] = prof.map { r =>
      val id = r.getLong(0)
      val ws = docs(id).toLowerCase.split(" ", -1)
      val n = ws.length.toLong
      val wordCnt = ws.groupBy { w =>
        var acc = 0L
        w.foreach(ch => acc = (acc * RB + ch.toLong) % RM)
        (acc % TextOps.ClsBuckets).toInt
      }.map { case (b, g) => b -> (g.length.toLong * 1000000L) / n }
      val stats = Seq( // ClsBins order: words, mwl, stop, sym, alpha, dup3
        math.min(r.getLong(1) / 10, 12),
        math.min(r.getLong(2) / 1000000, 11),
        math.min(r.getLong(5), 4),
        math.min(r.getLong(3) / 50000, 4),
        math.min(r.getLong(4) / 100000, 10),
        math.min(r.getLong(6) / 15000, 4))
      val widths = Seq(13, 12, 5, 5, 11, 5)
      val binBuckets = stats.zip(widths.scanLeft(TextOps.ClsBuckets)(_ + _))
        .map { case (idx, base) => (base + idx).toInt }
      val xm = wordCnt ++ binBuckets.map(_ -> 1000000L).toMap +
        (TextOps.ClsBias -> 1000000L)
      id -> ((if (r.getBoolean(7)) 1000000L else 0L, xm))
    }.toMap
    val n = feats.size.toLong
    val w = Array.fill(dim)(0L)
    for (_ <- 1 to TextOps.ClsIters) {
      val g = Array.fill(dim)(0L)
      feats.values.foreach { case (y, xm) =>
        val m = sdiv(xm.map { case (b, x) => w(b) * x }.sum, 1000000L)
        val p = 500000L + sdiv(500000L * m, 1000000L + math.abs(m))
        val e = y - p
        xm.foreach { case (b, x) => g(b) += sdiv(e * x, 1000000L) }
      }
      for (b <- 0 until dim) w(b) += sdiv(g(b) * TextOps.ClsLrNum, n)
    }
    val scored = feats.map { case (id, (y, xm)) =>
      val m = sdiv(xm.map { case (b, x) => w(b) * x }.sum, 1000000L)
      id -> ((m, y == 1000000L))
    }
    (w, scored)
  }

  test("distributed training == brute-force integer reference, exactly") {
    val (refW, refScored) = reference()
    val got = TextOps.nsTextClassifyTrain(spark, sfDir).collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    assert(got.size == TextOps.ClsDim)
    val diffs = refW.indices.filter(b => got(b) != refW(b))
    assert(diffs.isEmpty,
      s"weights differ at buckets ${diffs.take(5)}: " +
        diffs.take(5).map(b => s"$b: got=${got(b)} ref=${refW(b)}").mkString(", "))
    // And the scored frame's keep/label agree with the reference margins.
    val scored = TextOps.nsTextClassifyTrained(spark, sfDir).collect()
    assert(scored.length == refScored.size)
    scored.foreach { r =>
      val (m, y) = refScored(r.getAs[Long]("doc_id"))
      assert(r.getAs[Boolean]("keep") == (m > 0))
      assert(r.getAs[Boolean]("label") == y)
    }
  }

  test("weights are invariant to input partitioning (order-free gradient sums)") {
    val base = TextOps.nsTextClassifyTrain(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    val shuffled = TextOps
      .trainClassifier(Tables.documents(spark, sfDir).repartition(13))
    shuffled._2.unpersist()
    val got = shuffled._1.zipWithIndex.map { case (wu, b) => (b.toLong, wu) }
      .toSeq.sortBy(_._1)
    assert(got == base, "repartitioned input changed the trained weights")
  }

  test("the model learns the gate: accuracy beats the majority prior") {
    val scored = TextOps.nsTextClassifyTrained(spark, sfDir)
      .select("keep", "label").collect()
    val n = scored.length.toDouble
    val acc = scored.count(r => r.getBoolean(0) == r.getBoolean(1)) / n
    val pos = scored.count(_.getBoolean(1)) / n
    val prior = math.max(pos, 1 - pos)
    assert(acc >= 0.85, s"trained accuracy $acc < 0.85")
    assert(acc > prior + 0.1,
      s"trained accuracy $acc does not beat the majority prior $prior — " +
        "the model learned nothing beyond the class balance")
  }

  test("the eval confusion table matches the per-doc scoring exactly") {
    val scored = TextOps.nsTextClassifyTrained(spark, sfDir)
      .select("keep", "label").collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)))
    val ev = TextOps.nsTextClassifyEval(spark, sfDir).collect().head
    val (n, tp, fp, fn, tn) = (ev.getLong(0), ev.getLong(1), ev.getLong(2),
      ev.getLong(3), ev.getLong(4))
    assert(tp + fp + fn + tn == n, "confusion cells must partition the corpus")
    assert(n == scored.length.toLong)
    assert(tp == scored.count(p => p._1 && p._2).toLong)
    assert(fp == scored.count(p => p._1 && !p._2).toLong)
    assert(fn == scored.count(p => !p._1 && p._2).toLong)
    assert(tn == scored.count(p => !p._1 && !p._2).toLong)
    assert(ev.getLong(5) == (tp + tn) * 1000000L / n) // acc_u
  }
}
