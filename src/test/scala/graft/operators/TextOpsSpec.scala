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

  test("unigram tokenizer: vocab covers all chars; encode matches a brute-force Viterbi") {
    val vocab = TextOps.nsTextUnigramTrain(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(vocab.nonEmpty)
    val logp = vocab.map(v => v._1 -> v._3).toMap
    // every corpus character is a piece (segmentability guarantee);
    // multi-char side respects the cap; logp is a proper log-prob (< 0)
    val docs = graft.model.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase)
    val allChars = docs.flatMap(_._2.split(" ").filter(_.nonEmpty).flatMap(_.toSeq)).toSet
    assert(allChars.forall(c => logp.contains(c.toString)))
    assert(vocab.count(_._1.length >= 2) <= 256)
    // post-EM scores are usage counts: multi pieces survive only with
    // usage > 0; chars always survive, possibly unused (score 0)
    vocab.foreach { case (p, s, lp) =>
      assert(lp < 0 && (if (p.length >= 2) s > 0 else s >= 0), s"$p") }
    // brute-force Viterbi per word (same tie-break: smallest split point)
    def viterbi(w: String): (Long, Long) = {
      val dp = Array.fill(w.length + 1)((Long.MinValue, 0L))
      dp(0) = (0L, 0L)
      for (i <- 1 to w.length) {
        for (j <- math.max(0, i - 6) until i) {
          logp.get(w.substring(j, i)).foreach { lp =>
            val cand = dp(j)._1 + lp
            if (cand > dp(i)._1) dp(i) = (cand, dp(j)._2 + 1)
          }
        }
      }
      dp(w.length)
    }
    val got = TextOps.nsTextUnigramEncode(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    docs.foreach { case (id, text) =>
      val ws = text.split(" ").filter(w => w.nonEmpty && w.length <= 20)
      if (ws.nonEmpty) {
        val encs = ws.map(viterbi)
        val want = (ws.length.toLong, encs.map(_._2).sum, encs.map(_._1).sum)
        assert(got(id) == want, s"doc $id: ${got(id)} != $want")
      }
    }
  }

  test("unigram soft-EM round: quantized expected counts + re-score, independently replayed") {
    // Brute-force the SEED fit (pre-EM): char scores over all positions,
    // multi scores floored at word freq >= 2, top-256 by (-score, piece).
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => r.getString(1).toLowerCase)
    val wordFreq = docs.flatMap(_.split(" ", -1).filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    def quantLn(rows: Seq[(String, Long)]): Map[String, Long] = {
      val total = rows.map(_._2).sum
      rows.map { case (p, s) =>
        p -> Math.round(Math.log(math.max(s * 1000000L / total, 1L) / 1e6) * 1e6)
      }.toMap
    }
    val charScore = wordFreq.toSeq.flatMap { case (w, f) => w.map(c => (c.toString, f)) }
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    val multiScore = wordFreq.toSeq.filter(_._2 >= 2L).flatMap { case (w, f) =>
      for (i <- 0 until w.length; l <- 2 to math.min(6, w.length - i))
        yield (w.substring(i, i + l), f)
    }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      .toSeq.sortBy { case (p, s) => (-s, p) }.take(256)
    val seedRows = charScore.toSeq ++ multiScore
    val seedLogp = quantLn(seedRows)
    // SOFT E-step replay: integer micro-unit forward/backward with the
    // SAME quantized LSE and posterior rounding as the operator — an
    // independent plain-Scala reimplementation, asserted EXACTLY equal.
    def lse(a: Long, b: Long): Long = {
      val hi = math.max(a, b); val d = hi - math.min(a, b)
      hi + (if (d >= TextOps.LseCutU) 0L
            else Math.round(Math.log(1 + Math.exp(-d / 1e6)) * 1e6))
    }
    def softUsage(w: String, lp: Map[String, Long]): Map[String, Long] = {
      val n = w.length
      val a = new Array[Long](n + 1)
      for (i <- 1 to n) {
        var acc = Option.empty[Long]
        for (j <- math.max(0, i - 6) until i)
          lp.get(w.substring(j, i)).foreach { p =>
            val t = a(j) + p
            acc = Some(acc.fold(t)(lse(_, t)))
          }
        a(i) = acc.get // chars always in vocab -> always defined
      }
      val b = new Array[Long](n + 1)
      for (j <- n - 1 to 0 by -1) {
        var acc = Option.empty[Long]
        for (l <- 1 to math.min(6, n - j))
          lp.get(w.substring(j, j + l)).foreach { p =>
            val t = p + b(j + l)
            acc = Some(acc.fold(t)(lse(_, t)))
          }
        b(j) = acc.get
      }
      val out = collection.mutable.Map[String, Long]().withDefaultValue(0L)
      for (j <- 0 until n; l <- 1 to math.min(6, n - j)) {
        val p = w.substring(j, j + l)
        lp.get(p).foreach { plp =>
          val t = math.min(0L, a(j) + plp + b(j + l) - a(n))
          val cu = if (t <= -TextOps.LseCutU) 0L
                   else Math.round(Math.exp(t / 1e6) * 1e6)
          if (cu > 0) out(p) += cu
        }
      }
      out.toMap
    }
    val usage = collection.mutable.Map[String, Long]().withDefaultValue(0L)
    wordFreq.filter(_._1.length <= 20).foreach { case (w, f) =>
      softUsage(w, seedLogp).foreach { case (p, u) => usage(p) += f * u }
    }
    // The trained table must BE the M-step over this expected usage.
    val em = TextOps.nsTextUnigramTrain(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    val emScores = em.map(v => v._1 -> v._2).toMap
    val wantKept = seedRows.collect {
      case (p, _) if p.length == 1 || usage(p) > 0L => (p, usage(p))
    }
    assert(emScores == wantKept.toMap,
      s"soft-EM usage scores diverge: ${(emScores.toSet -- wantKept.toSet).take(3)}")
    val wantLogp = quantLn(wantKept)
    em.foreach { case (p, _, l) => assert(l == wantLogp(p), s"logp($p)") }
    // Soft pruning fires only when NO segmentation leaves >= 0.5
    // micro-units of posterior on a piece — report rather than require.
    info(s"soft-pruned multi pieces on the fixture: " +
      s"${multiScore.map(_._1).count(p => !emScores.contains(p))}")
  }

  test("unigram EM round flips a near-tied segmentation (operator end to end on a crafted corpus)") {
    // Crafted near-tie: under the SEED scores the argmax for 'cccbb' is
    // [cc,cb,b] (asserted below); the EM round re-scores 'ccc' above the
    // 'cc|cb' path, so the encoder must serve the re-fit model's path.
    val dir = graft.ops.ProcessTmp.dir("graft_unigram_em") + "/fixture"
    val docs = Seq(
      (0L, Seq.fill(5)("ccc").mkString(" ")),
      (1L, "cccbb"), // freq 1: rides the others' piece table
      (2L, Seq.fill(5)("cbcaac").mkString(" ")),
      (3L, Seq.fill(9)("aacaa").mkString(" ")))
    import spark.implicits._
    docs.map { case (id, t) => (id, t, "en", "src1", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val em = TextOps.nsTextUnigramTrain(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    val emLogp = em.map(v => v._1 -> v._3).toMap
    assert(emLogp.contains("ccc"))
    // Brute Viterbi (same smallest-split tie-break) under a logp model,
    // returning (logp, pieces list).
    def seg(w: String, lp: Map[String, Long]): (Long, List[String]) = {
      val dp = Array.fill(w.length + 1)((Long.MinValue, -1))
      dp(0) = (0L, 0)
      for (i <- 1 to w.length; j <- math.max(0, i - 6) until i)
        lp.get(w.substring(j, i)).foreach { p =>
          if (dp(j)._1 + p > dp(i)._1) dp(i) = (dp(j)._1 + p, j)
        }
      var i = w.length
      var out = List.empty[String]
      while (i > 0) { val j = dp(i)._2; out = w.substring(j, i) :: out; i = j }
      (dp(w.length)._1, out)
    }
    // the seed fit, brute-forced from the crafted corpus
    val wf = Map("ccc" -> 5L, "cccbb" -> 1L, "cbcaac" -> 5L, "aacaa" -> 9L)
    val chars = wf.toSeq.flatMap { case (w, f) => w.map(c => (c.toString, f)) }
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    val multi = wf.toSeq.filter(_._2 >= 2L).flatMap { case (w, f) =>
      for (i <- 0 until w.length; l <- 2 to math.min(6, w.length - i))
        yield (w.substring(i, i + l), f)
    }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      .toSeq.sortBy { case (p, s) => (-s, p) }.take(256)
    val seedTotal = chars.values.sum + multi.map(_._2).sum
    def lp(s: Long): Long =
      Math.round(Math.log(math.max(s * 1000000L / seedTotal, 1L) / 1e6) * 1e6)
    val seedLogp = (chars.toSeq ++ multi).map { case (p, s) => p -> lp(s) }.toMap
    val (_, seedPath) = seg("cccbb", seedLogp)
    val (emDp, emPath) = seg("cccbb", emLogp)
    assert(seedPath == List("cc", "cb", "b"),
      s"crafted corpus no longer near-tied (seed path $seedPath) — regenerate it")
    assert(emPath != seedPath,
      s"EM round flipped nothing: both paths $seedPath")
    assert(emPath == List("ccc", "b", "b"), s"unexpected EM path $emPath")
    // and the ENCODER serves the re-fit model: doc 1 reports the EM path
    val enc = TextOps.nsTextUnigramEncode(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(enc(1L) == ((1L, emPath.length.toLong, emDp)),
      s"doc 1 not encoded on the EM'd path: ${enc(1L)} != (1, ${emPath.length}, $emDp)")
  }

  test("hot ngrams: top-k by df matches a brute-force fold; top-k is TakeOrdered, not a global sort") {
    val rows = TextOps.nsTextHotNgrams(spark, sfDir).collect()
    assert(rows.length == TextOps.HotNgramK)
    // brute force df over the raw text
    val docs = graft.model.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ").toSeq)
    val df = collection.mutable.Map[String, Long]().withDefaultValue(0L)
    docs.foreach { case (_, ws) =>
      if (ws.length >= 3) ws.sliding(3).map(_.mkString(" ")).toSet
        .foreach { s: String => df(s) += 1 }
    }
    val want = df.toSeq.sortBy { case (s, n) => (-n, s) }
      .take(TextOps.HotNgramK)
      .zipWithIndex.map { case ((s, n), i) => (i + 1L, s, n) }
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq == want)
    // the global top-k must be limit-pushed (TakeOrderedAndProject),
    // never a full sort of the df table
    val nodes = noAqeNodes(TextOps.nsTextHotNgrams(spark, sfDir))
    assert(nodes.exists(_.nodeName.contains("TakeOrderedAndProject")),
      s"no TakeOrderedAndProject in:\n${nodes.map(_.nodeName)}")
  }

  test("chunking matches a brute-force slide and covers every word") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val (cw, stride) = (32, 24)
    val want = docs.flatMap { case (id, t) =>
      val w = t.split(" ", -1)
      val extra = math.max(0, w.length - cw)
      (0 to ((extra + stride - 1) / stride)).map { i =>
        val chunk = w.slice(i * stride, i * stride + cw)
        Seq[Any](id, i.toLong, chunk.length.toLong, chunk.mkString(" "))
      }
    }.toSeq
    val got = TextOps.nsTextChunks(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(got == want, s"chunk mismatch: got=${got.take(2)} want=${want.take(2)}")
    // coverage + overlap invariants: consecutive chunks of one doc overlap
    // by cw-stride words unless the tail is short; union covers all words
    docs.foreach { case (id, t) =>
      val n = t.split(" ", -1).length
      val chunks = got.filter(_.head == id)
      val lastStart = (chunks.size - 1) * stride
      assert(lastStart + chunks.last(2).asInstanceOf[Long] == n.toLong,
        s"doc $id tail not covered")
    }
  }

  test("salient terms: top-5 per doc by tf/df, exact ranks, score consistent") {
    val rows = TextOps.nsTextSalient(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getLong(0))
    val nDocs = Tables.documents(spark, sfDir).count()
    byDoc.foreach { case (id, rs) =>
      assert(rs.map(_.getLong(1)).sorted.sameElements(1L to rs.length.toLong),
        s"doc $id ranks not 1..k")
      assert(rs.length <= 5)
      // scores non-increasing with rank; score == round(tf/df, 6)
      val sorted = rs.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(5) >= b.getDouble(5))
        case _ =>
      }
      sorted.foreach { r =>
        val expect = BigDecimal(r.getLong(3).toDouble / r.getLong(4))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getDouble(5) == expect, s"score drift on doc $id")
        assert(r.getLong(4) <= nDocs && r.getLong(4) >= 1L)
      }
    }
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

  test("bm25 retrieval matches a brute-force fold over the fixture corpus") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val words = docs.map { case (id, t) => id -> t.toLowerCase.split(" ", -1).toSeq }.toMap
    val tf = words.view.mapValues(_.groupBy(identity).map { case (w, o) => w -> o.size.toLong }).toMap
    val df = tf.values.flatMap(_.keys).groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    val nDocs = docs.length.toLong
    val nToks = words.values.map(_.size.toLong).sum
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // Same operation tree as BmTermScore; micro-unit fixed-point sum
    // (order-free by construction — no fold order to mirror).
    val expected = docs.map(_._1).filter(_ % 50 == 0).sorted.flatMap { q =>
      val qts = tf(q).keys.toSeq.filter(w => df(w) >= 2)
        .sortBy(w => (df(w), w)).take(12)
      val cands = docs.map(_._1).filter(_ != q).flatMap { d =>
        val shared = qts.filter(w => tf(d).contains(w))
        if (shared.isEmpty) None
        else {
          val dlen = words(d).size.toLong
          val micro = shared.map { w =>
            val idf = math.log(1.0 +
              ((nDocs.toDouble - df(w).toDouble) + 0.5) / (df(w).toDouble + 0.5))
            math.round(idf * ((tf(d)(w).toDouble * 2.2) / (tf(d)(w).toDouble +
              1.2 * (0.25 + 0.75 * ((dlen.toDouble * nDocs.toDouble) / nToks.toDouble))))
              * 1000000.0)
          }.sum
          Some((d, shared.size.toLong, micro))
        }
      }
      // Rank on the exact integer micro-unit sum, like the plan.
      cands.sortBy { case (d, _, m) => (-m, d) }.take(10).zipWithIndex.map {
        case ((d, n, m), i) =>
          Seq[Any](q, (i + 1).toLong, d, n, r6(m.toDouble / 1000000.0))
      }
    }.toSeq
    assert(expected.nonEmpty, "fixture produced no bm25 rows — test is vacuous")
    val got = TextOps.nsTextBm25(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(got == expected,
      s"bm25 mismatch: got=${got.take(3)} want=${expected.take(3)}")
  }

  test("bm25 df ceiling is transparent at max df and binding below it") {
    import org.apache.spark.sql.functions._
    // ceiling >= the corpus' max term df → the WAND-lite guard must not
    // change a single row vs the uncapped (registered) query.
    val maxDf = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("wd"))
      .distinct().groupBy("wd").count().agg(max("count")).first().getLong(0)
    val uncapped = TextOps.nsTextBm25(spark, sfDir).collect().map(_.toSeq).toSeq
    val capped = TextOps.bm25MoreLikeThis(spark, sfDir, maxDf).collect().map(_.toSeq).toSeq
    assert(uncapped.nonEmpty, "fixture produced no bm25 rows — test is vacuous")
    assert(capped == uncapped, "a non-binding ceiling changed the result")
    // Every fixture term is stopword-grade (df >= 2 by the query's own
    // floor), so a ceiling of 1 must exclude every retrieval term: the
    // guard binds and the query degenerates to empty, not to an error.
    assert(TextOps.bm25MoreLikeThis(spark, sfDir, 1L).isEmpty,
      "a binding ceiling should have excluded every posting list")
  }

  test("bpe merges match an independent list-based merge implementation") {
    val docs = Tables.documents(spark, sfDir).select("text")
      .collect().map(_.getString(0))
    val wc = docs.flatMap(_.toLowerCase.split(" ", -1))
      .groupBy(identity).map { case (w, o) => w -> o.size.toLong }
      // Same vocab bound as the operator: frequency floor, then top-V by
      // (freq DESC, word) — the driver-collect guard under test.
      .filter { case (_, f) => f >= TextOps.BpeWordMinFreq }
      .toSeq.sortBy { case (w, f) => (-f, w) }.take(TextOps.BpeMaxVocab).toMap
    // List-based greedy merge — NOT the anchored-string replace the
    // operator uses; agreement proves the replace encoding is faithful.
    def mergeOnce(syms: List[String], l: String, r: String): List[String] = syms match {
      case a :: b :: rest if a == l && b == r => (l + r) :: mergeOnce(rest, l, r)
      case a :: rest => a :: mergeOnce(rest, l, r)
      case Nil => Nil
    }
    var vocab = wc.toSeq.map { case (w, f) =>
      (f, w.codePoints.toArray.toList.map(cp => new String(Character.toChars(cp))))
    }
    val expected = Seq.newBuilder[(Long, String, String, String, Long)]
    for (rank <- 1 to 10) {
      val counts = vocab.flatMap { case (f, syms) =>
        syms.zip(syms.drop(1)).map(_ -> f)
      }.groupBy(_._1).map { case (p, o) => p -> o.map(_._2).sum }
      val ((l, r), cnt) = counts.minBy { case ((l, r), c) => (-c, l, r) }
      expected += ((rank.toLong, l, r, l + r, cnt))
      vocab = vocab.map { case (f, syms) => (f, mergeOnce(syms, l, r)) }
    }
    val got = TextOps.nsTextBpeTrain(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    assert(got == expected.result(), s"bpe mismatch: got=$got")
    // Best-pair counts are non-increasing across merges (BPE invariant).
    assert(got.map(_._5).sliding(2).forall(p => p.head >= p.last))
    // Later merges must build on earlier merged symbols at least once on
    // this corpus (the 'er' -> 'mer' behavior that makes BPE BPE).
    val mergedSyms = got.map(_._4).toSet
    assert(got.exists(m => mergedSyms.contains(m._2) || mergedSyms.contains(m._3)))
  }

  test("bpe encode matches a list-walk tokenizer applying the trained merges") {
    def mergeOnce(syms: List[String], l: String, r: String): List[String] = syms match {
      case a :: b :: rest if a == l && b == r => (l + r) :: mergeOnce(rest, l, r)
      case a :: rest => a :: mergeOnce(rest, l, r)
      case Nil => Nil
    }
    val merges = TextOps.nsTextBpeTrain(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getString(2))).toList
    val expected = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map { row =>
      val words = row.getString(1).toLowerCase.split(" ", -1).filter(_.nonEmpty)
      val tokens = words.map { w =>
        var syms = w.codePoints.toArray.toList.map(cp => new String(Character.toChars(cp)))
        for ((l, r) <- merges) syms = mergeOnce(syms, l, r)
        syms.length.toLong
      }.sum
      (row.getLong(0), words.length.toLong, tokens, words.map(_.length.toLong).sum)
    }.sortBy(_._1).toSeq
    val got = TextOps.nsTextBpeEncode(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, s"bpe encode mismatch: got=${got.take(3)} want=${expected.take(3)}")
    // Merging strictly compresses on this corpus: fewer tokens than chars,
    // at least one token per word.
    assert(got.forall { case (_, w, t, c) => t <= c && t >= w })
    assert(got.exists { case (_, _, t, c) => t < c })
  }

  test("bigram lm matches a brute-force count-and-score fold; fluent splits the corpus") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1).toLowerCase.split(" ", -1)))
      .filter(_._2.length >= 2)
    val trans = docs.flatMap { case (id, w) => w.zip(w.tail).map((id, _)) }
    val c12 = trans.groupBy(_._2).map { case (p, o) => p -> o.size.toLong }
    val c1 = trans.groupBy(_._2._1).map { case (w1, o) => w1 -> o.size.toLong }
    val expected = trans.groupBy(_._1).map { case (id, ts) =>
      val pus = ts.map { case (_, (w1, w2)) => c12((w1, w2)) * 1000000L / c1(w1) }
      val (n, sum) = (pus.size.toLong, pus.sum)
      (id, n, pus.min,
        // integer-floored micro-unit mean, then the one IEEE divide —
        // mirrors the operator's boundary-free formulation
        BigDecimal((sum / n).toDouble / 1000000.0)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        sum * 29 >= n * 1000000L)
    }.toSeq.sortBy(_._1)
    val got = TextOps.nsTextBigramLm(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toSeq
    assert(got == expected, s"bigram mismatch: got=${got.take(3)} want=${expected.take(3)}")
    assert(got.exists(_._5) && got.exists(!_._5), "fluent flag must split the corpus")
  }

  test("curriculum deciles match a brute-force global sort; histogram plan, no doc-row global window") {
    val got = TextOps.nsCorpusCurriculum(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got.nonEmpty)
    // brute force: rank by (score, doc_id), decile = (rank-1)*10/N + 1
    val n = got.size
    val want = got.map(r => (r._1, r._2, r._3)).sortBy(t => (t._3, t._1))
      .zipWithIndex.map { case ((id, nt, s), i) =>
        (id, nt, s, (i + 1).toLong, (i.toLong * 10) / n + 1)
      }.sortBy(_._1)
    assert(got.sortBy(_._1) == want,
      s"decile mismatch: got=${got.take(3)} want=${want.take(3)}")
    // deciles are contiguous in score order and balanced within 1
    val sizes = got.groupBy(_._5).map(_._2.size)
    assert(sizes.max - sizes.min <= 1, s"unbalanced deciles: $sizes")
    val byScore = got.sortBy(t => (t._3, t._1)).map(_._5)
    assert(byScore.sliding(2).forall(p => p.head <= p.last), "deciles not monotone in score")
    // plan pin: the only single-partition exchange feeds the score
    // HISTOGRAM (an aggregate), never raw doc rows
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val nodes = noAqeNodes(TextOps.nsCorpusCurriculum(spark, sfDir))
    val single = nodes.collect { case e: ShuffleExchangeExec
      if e.outputPartitioning.numPartitions == 1 => e }
    assert(single.nonEmpty, "expected the histogram offset window's 1-partition exchange")
    single.foreach { e =>
      assert(collectAllPlans(e).exists(_.nodeName.toLowerCase.contains("aggregate")),
        s"single-partition exchange feeds raw doc rows: ${e.child.nodeName}")
    }
  }

  test("collocations match a brute-force lift ranking with lexicographic ties") {
    val trans = Tables.documents(spark, sfDir).select("text")
      .collect().map(_.getString(0).toLowerCase.split(" ", -1))
      .filter(_.length >= 2)
      .flatMap(w => w.zip(w.tail))
    val c12 = trans.groupBy(identity).map { case (p, o) => p -> o.size.toLong }
    val c1 = trans.groupBy(_._1).map { case (w, o) => w -> o.size.toLong }
    val c2 = trans.groupBy(_._2).map { case (w, o) => w -> o.size.toLong }
    val expected = c12.toSeq.collect { case ((w1, w2), n) if n >= 5L =>
      val lift = n * 1000000L / c1(w1) * 1000000L / c2(w2)
      (w1, w2, n, c1(w1), c2(w2), lift)
    }.sortBy { case (w1, w2, _, _, _, lift) => (-lift, w1, w2) }
      .take(20).zipWithIndex
      .map { case ((w1, w2, n, a, b, l), i) => (i + 1L, w1, w2, n, a, b, l) }
    val got = TextOps.nsTextCollocations(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected, s"colloc mismatch: got=${got.take(3)} want=${expected.take(3)}")
    assert(got.size == 20 && got.head._7 >= got.last._7)
  }

  test("classifier matches a brute-force hash+weights fold; boundary is integer-exact") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (base, mod) = (31L, 1000000007L)
    def bucket(w: String): Int =
      (w.codePoints.toArray.foldLeft(0L)((acc, c) => (acc * base + c) % mod) % 64).toInt
    val expected = docs.map { case (id, t) =>
      val ws = t.toLowerCase.split(" ", -1).toSeq
      val zU = ws.map(w => TextOps.clsWeightsU(bucket(w))).sum - ws.size.toLong * 200000L
      Seq[Any](id, ws.size.toLong,
        // floor-div the micro-unit mean first, like the query (Long '/'
        // truncates toward zero, matching Spark div / DuckDB //)
        r6((zU / ws.size.toLong).toDouble / 1000000.0), zU > 0L)
    }.sortBy(_.head.asInstanceOf[Long]).toSeq
    val got = TextOps.nsTextClassify(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(got == expected,
      s"classify mismatch: got=${got.take(3)} want=${expected.take(3)}")
    // The fixture must exercise BOTH classes or the keep flag is vacuous.
    val keeps = got.map(_(3).asInstanceOf[Boolean])
    assert(keeps.contains(true) && keeps.contains(false))
  }

  test("classifier plan is a pure projection: no explode, no join, only the sort exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def build = TextOps.nsTextClassify(spark, sfDir)
    val nodes = noAqeNodes(build)
    assert(!nodes.exists(_.nodeName.contains("Generate")), nodes.map(_.nodeName).toString)
    assert(!nodes.exists(_.nodeName.toLowerCase.contains("join")))
    assert(!nodes.exists(_.nodeName.contains("Aggregate")))
    assert(nodes.count(_.isInstanceOf[ShuffleExchangeExec]) == 1,
      nodes.map(_.nodeName).toString) // presentation sort only
  }

  test("bm25 plan: postings materialized once, no re-explode, broadcast query side") {
    def build = TextOps.nsTextBm25(spark, sfDir)
    val nodes = noAqeNodes(build)
    // Every consumer reads the cached postings; the corpus explode lives
    // only inside the one cache-build plan.
    assert(!nodes.exists(_.nodeName.contains("Generate")),
      nodes.map(_.nodeName).toString)
    assert(nodes.count(_.nodeName.contains("InMemoryTableScan")) == 5,
      nodes.map(_.nodeName).toString)
    assert(nodes.count(_.nodeName.contains("BroadcastHashJoin")) >= 2)
    // Both rank filters (query-term top-12, result top-10) push map-side.
    assert(nodes.count(_.nodeName.contains("WindowGroupLimit")) >= 2)
    spark.sharedState.cacheManager.clearCache()
  }

  test("pii redaction matches a brute-force splice + regex fold") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text", "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(docs.nonEmpty)
    val email = "[a-z0-9._%-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phone = "\\+1-555-[0-9]{4}"
    val ip = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = docs.map { case (id, text, source) =>
      val raw = text + " contact user" + id + "@mail-" + source + ".com" +
        (if (id % 2 == 0) s" cc admin$id@example.org" else "") +
        (if (id % 3 != 0) f" call +1-555-${id % 10000}%04d" else "") +
        s" from 10.${id % 256}.0.1"
      def n(re: String) = re.r.findAllIn(raw).size.toLong
      val red = raw.replaceAll(email, "[EMAIL]")
        .replaceAll(phone, "[PHONE]").replaceAll(ip, "[IP]")
      Seq[Any](id, n(email), n(phone), n(ip),
        n(email) + n(phone) + n(ip), md5hex(red))
    }.sortBy(_.head.asInstanceOf[Long]).toSeq
    val got = TextOps.nsTextPii(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(got == want, s"pii mismatch: got=${got.take(2)} want=${want.take(2)}")
    // every doc carries exactly one spliced primary email and one IP
    assert(got.forall(r => r(1).asInstanceOf[Long] >= 1L &&
      r(3).asInstanceOf[Long] >= 1L))
  }

  test("gopher rules match a brute-force fold and gate in both directions") {
    val stops = Set("the", "a", "of", "and", "is", "to", "in", "that", "be", "have", "with")
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val want = docs.flatMap { case (id, t) =>
      val lt = t.toLowerCase
      val ws = lt.split(" ", -1).filter(_.nonEmpty)
      if (ws.isEmpty) None else {
        val nw = ws.length.toLong
        val mwl = ws.map(_.length.toLong).sum * 1000000L / nw
        val sym = lt.count(c => !(c.isDigit || c == ' ' || (c >= 'a' && c <= 'z'))).toLong * 1000000L / nw
        val alpha = ws.count(_.exists(c => c >= 'a' && c <= 'z')).toLong * 1000000L / nw
        val nstop = ws.filter(stops).distinct.length.toLong
        val dup3 =
          if (nw >= 3) {
            val sh = ws.sliding(3).map(_.mkString(" ")).toSeq
            (sh.size - sh.distinct.size).toLong * 1000000L / (nw - 2)
          } else 0L
        val rules = Seq(nw >= 20 && nw <= 90, mwl >= 3000000L && mwl <= 10000000L,
          sym <= 100000L, alpha >= 800000L, nstop >= 2L, dup3 <= 30000L)
        Some(Seq[Any](id, nw, mwl, sym, alpha, nstop, dup3) ++ rules :+ rules.forall(identity))
      }
    }.sortBy(_.head.asInstanceOf[Long]).toSeq
    val got = TextOps.nsTextGopher(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(got == want, s"gopher mismatch: got=${got.take(2)} want=${want.take(2)}")
    // the gate is exercised: both kept and dropped documents exist, and at
    // least two different rules fire somewhere
    val passes = got.count(_.last == true)
    assert(passes > 0 && passes < got.size, s"gate degenerate: $passes/${got.size}")
    val ruleCols = 7 until 13
    assert(ruleCols.count(i => got.exists(_(i) == false)) >= 2,
      "fewer than two rules ever fire on the fixture")
  }

  test("gopher plan is a pure projection: no explode, no join, no aggregate") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def build = TextOps.nsTextGopher(spark, sfDir)
    val nodes = noAqeNodes(build)
    assert(!nodes.exists(_.nodeName.contains("Generate")), nodes.map(_.nodeName).toString)
    assert(!nodes.exists(_.nodeName.toLowerCase.contains("join")))
    assert(!nodes.exists(_.nodeName.contains("Aggregate")))
    assert(nodes.count(_.isInstanceOf[ShuffleExchangeExec]) == 1,
      nodes.map(_.nodeName).toString) // presentation sort only
  }
}
