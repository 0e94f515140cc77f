package graft.pipeline

import graft.SparkSpec
import graft.ops.IncomeKernel
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end golden test (SURVEY.md §5c): hand-built balances +
  * withdrawals -> income kernel -> latest snapshot -> grouped leaderboard,
  * every number checked against hand-computed expectations.
  */
class PipelineGoldenSpec extends SparkSpec {

  test("corpus report: metrics internally consistent with the detailed operators") {
    val rows = Pipelines.corpusReport(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = graft.model.Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    assert(rows("n_docs") == nDocs)
    // tier histogram partitions the corpus
    val tierSum = rows.filterKeys(_.startsWith("n_quality_")).values.sum
    assert(tierSum == nDocs, s"tiers sum $tierSum != $nDocs")
    // dup count consistent with the components query
    val nComps = graft.operators.DedupOps.nsDedupComponents(spark, sfDir).count()
    assert(rows("n_dup_docs") == nDocs - nComps)
    // volume metrics positive and ordered sanely (chars >= tokens)
    assert(rows("n_ws_tokens") > 0 && rows("n_chars") > rows("n_ws_tokens"))
    assert(rows("n_langs") >= 1 && rows("n_gopher_pass") >= 0
      && rows("n_contaminated") >= 0)
    // Shared-scan refactor pin (round 7): every metric that now derives
    // from the ONE cached documents frame / ONE shared shingle pass must
    // equal its independently-computed published operator — the
    // exploded-cached-sets decontamination in particular must be
    // row-identical to the re-shingling form.
    val dedup = graft.operators.DedupOps
    val text = graft.operators.TextOps
    assert(rows("n_contaminated") ==
      dedup.nsDecontaminate(spark, sfDir).where(col("drop_doc")).count())
    assert(rows("n_gopher_pass") ==
      text.nsTextGopher(spark, sfDir).where(col("pass")).count())
    assert(rows("n_langs") ==
      text.nsTextLangId(spark, sfDir).select("predicted_lang").distinct().count())
    val tiers = text.nsTextQuality(spark, sfDir)
      .groupBy("tier").count().collect()
      .map(r => s"n_quality_${r.getString(0)}" -> r.getLong(1)).toMap
    tiers.foreach { case (k, v) => assert(rows(k) == v, s"$k: ${rows(k)} != $v") }
  }

  test("platform build manifest: doc set is exactly the stage intersection; chunk stream is contiguous") {
    val dedup = graft.operators.DedupOps
    val text = graft.operators.TextOps
    val rows = Pipelines.platformBuild(spark, sfDir).collect()
    assert(rows.nonEmpty, "empty manifest at sf0.001")
    val got = rows.map(_.getLong(0)).toSet
    // independently recompute each stage from the PUBLISHED queries
    val split = dedup.nsCorpusSplit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val surv = split.collect {
      case (id, comp, s) if s == "train" && id == comp && id % 50 != 0 => id
    }.toSet
    val gopher = text.nsTextGopher(spark, sfDir).where(col("pass"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val contam = dedup.nsDecontaminate(spark, sfDir).where(col("drop_doc"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val dsir = graft.operators.SamplingOps.nsCorpusDsir(spark, sfDir)
      .where(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
    val tokPos = graft.operators.PackingOps.nsPackBpe(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet // toks > 0 docs
    val want = surv.intersect(gopher).intersect(dsir).intersect(tokPos) -- contam
    assert(got == want,
      s"manifest set diverges: extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
    // component labels come straight from the split query
    val compOf = split.map(t => t._1 -> t._2).toMap
    rows.foreach(r => assert(r.getLong(2) == compOf(r.getLong(0))))
    // the packed stream is one contiguous global token stream in
    // (lang, doc_id) order: each cum_before is the previous cum + toks
    val ordered = rows.map(r => (r.getString(1), r.getLong(0), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    ordered.foldLeft(0L) { case (expect, (lang, id, toks, cum)) =>
      assert(cum == expect, s"stream gap at ($lang,$id): $cum != $expect")
      expect + toks
    }
  }

  test("balances -> income -> leaderboard matches hand-computed values") {
    import spark.implicits._
    // Two "indexes" (groups): users 1,2 in group A; user 3 in group B.
    //   user 1: 100 -> 110 (+10) -> 105 (-5, plus 20 withdrawn at epoch 1 => delta +15)
    //   user 2: 50 -> 45 (-5)
    //   user 3: 10 -> 10 -> 40 (+30)
    val balances = Seq(
      (1L, 0L, 100.0, 0.0), (1L, 1L, 110.0, 20.0), (1L, 2L, 105.0, 0.0),
      (2L, 0L, 50.0, 0.0), (2L, 1L, 45.0, 0.0),
      (3L, 0L, 10.0, 0.0), (3L, 1L, 10.0, 0.0), (3L, 2L, 40.0, 0.0))
      .toDF("user_id", "epoch", "balance", "withdrawal")

    val income = IncomeKernel.cumulativeIncome(balances)
    val w = Window.partitionBy("user_id").orderBy(col("epoch").desc)
    val latest = income.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select("user_id", "earnings", "losses")

    val got = latest.orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    // user 1: deltas +10, (105 + 20 - 110) = +15  => earnings 25, losses 0
    // user 2: delta  -5                            => earnings 0,  losses 5
    // user 3: deltas  0, +30                       => earnings 30, losses 0
    assert(got.toSeq == Seq((1L, 25.0, 0.0), (2L, 0.0, 5.0), (3L, 30.0, 0.0)))

    val dim = Seq((1L, "A"), (2L, "A"), (3L, "B")).toDF("user_id", "grp")
    val board = latest.join(dim, "user_id")
      .groupBy("grp")
      .agg(round(sum(col("earnings")), 6).as("sum_earn"),
        round(sum(col("losses")), 6).as("sum_loss"),
        count(lit(1)).as("n"))
      .orderBy(col("sum_earn").desc)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(board.toSeq == Seq(("B", 30.0, 0.0, 1L), ("A", 25.0, 5.0, 2L)))
  }

  test("corpus build: selected docs are high-quality survivors; per-lang streams pack contiguously") {
    val rows = Pipelines.corpusBuild(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    // every selected doc is a dedup survivor and not low-quality
    val survivors = graft.operators.DedupOps.nsDedupCorpus(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val lowQ = graft.operators.TextOps.nsTextQuality(spark, sfDir)
      .where(col("tier") === "low").select("doc_id").collect().map(_.getLong(0)).toSet
    rows.foreach { case (id, _, tier, _, _, _, _, _) =>
      assert(survivors(id), s"doc $id not a survivor")
      assert(!lowQ(id) && tier != "low", s"doc $id is low quality")
    }
    // the 50% per-lang quota holds, and packing is hole-free per stream
    rows.groupBy(_._2).foreach { case (lang, docs) =>
      val ranks = docs.map(_._5).sorted
      assert(ranks.toSeq == (1L to docs.length).toSeq, s"$lang ranks not dense")
      var expected = 0L
      docs.sortBy(_._1).foreach { case (_, _, _, toks, _, cumBefore, first, last) =>
        assert(cumBefore == expected, s"$lang: packing hole at $cumBefore")
        assert(first == cumBefore / graft.operators.PackingOps.ChunkTokens)
        assert(last >= first)
        expected += toks
      }
    }
  }
}
