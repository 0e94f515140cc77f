package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Packing/mixing invariants + plan pins. */
class PackingOpsSpec extends SparkSpec {

  test("pack chunks: per-lang streams are contiguous with no token holes") {
    val rows = PackingOps.nsPackChunks(spark, sfDir)
      .orderBy("lang", "doc_id")
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, docs) =>
      // cum_before is exactly the running total (no holes, no overlap)
      var expected = 0L
      docs.foreach { case (_, toks, cumBefore, first, last) =>
        assert(cumBefore == expected, s"$lang: hole at cum_before=$cumBefore")
        assert(first == cumBefore / PackingOps.ChunkTokens)
        assert(last == (cumBefore + toks - 1) / PackingOps.ChunkTokens)
        assert(last >= first)
        expected += toks
      }
      // the stream covers chunks 0..max with no skipped chunk index
      val covered = docs.flatMap(d => d._4 to d._5).toSet
      assert(covered == (0L to covered.max).toSet, s"$lang: chunk hole")
    }
    // and straddles actually occur at this budget (the operator is not
    // degenerate one-doc-per-chunk)
    assert(rows.exists(r => r._5 > r._4), "no document straddles a chunk")
  }

  test("corpus mix: prefix source counts track weights; per-source order is by sample key") {
    val rows = PackingOps.nsCorpusMix(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getLong(3), r.getLong(4), r.getLong(5)))
    val weights = rows.groupBy(_._1).map { case (s, rs) => s -> rs.head._2 }
    val totalW = weights.values.sum.toDouble
    // In a prefix where no source is exhausted, each source's share is
    // within ±2 rows of N·w/Σw (integer pos6 ties permit small jitter).
    val perSource = rows.map(_._1).groupBy(identity).map { case (s, g) => s -> g.size }
    val n = (perSource.values.min * totalW / weights.values.max).toInt.min(rows.length)
    val prefix = rows.take(n).groupBy(_._1).map { case (s, g) => s -> g.size }
    weights.foreach { case (s, w) =>
      val got = prefix.getOrElse(s, 0).toDouble
      val want = n * w / totalW
      assert(math.abs(got - want) <= 2.0,
        s"source $s (w=$w): $got rows in prefix $n, expected ~$want")
    }
    // rank_in_source is dense 1..|source| (the shuffled order is a permutation)
    rows.groupBy(_._1).foreach { case (s, g) =>
      assert(g.map(_._3).sorted.toSeq == (1L to g.size).toSeq, s"$s ranks not dense")
    }
  }

  test("temperature mix flattens the source distribution (α = 1/2)") {
    val rows = PackingOps.nsCorpusMixTemp(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // weights are exactly floor(sqrt(count))
    rows.groupBy(_._1).foreach { case (s, g) =>
      val (cnt, w) = (g.head._2, g.head._3)
      assert(w == math.floor(math.sqrt(cnt.toDouble)).toLong, s"$s weight")
      assert(g.size.toLong == cnt, s"$s count column inconsistent")
      // dense ranks per source
      assert(g.map(_._4).sorted.toSeq == (1L to g.size).toSeq, s"$s ranks")
    }
    val counts = rows.groupBy(_._1).map { case (s, g) => s -> g.head._2 }
    if (counts.size >= 2 && counts.values.toSet.size >= 2) {
      // In a prefix, the big:small share ratio must sit strictly between
      // 1 (fully flat) and the raw count ratio (no flattening): that IS
      // temperature sampling.
      val big = counts.maxBy(_._2)._1
      val small = counts.minBy(_._2)._1
      val n = rows.length / 2
      val prefix = rows.take(n).groupBy(_._1).map { case (s, g) => s -> g.size.toDouble }
      val shareRatio = prefix.getOrElse(big, 0.0) / prefix.getOrElse(small, 1.0)
      val countRatio = counts(big).toDouble / counts(small)
      assert(shareRatio < countRatio && shareRatio > 1.0 - 0.2,
        s"share $shareRatio not flattened vs count ratio $countRatio")
      // and close to the sqrt ratio, the α=1/2 prediction
      val sqrtRatio = math.sqrt(countRatio)
      assert(math.abs(shareRatio - sqrtRatio) / sqrtRatio < 0.35,
        s"share $shareRatio far from sqrt prediction $sqrtRatio")
    }
  }

  test("global packing equals the single-global-window brute force") {
    import org.apache.spark.sql.expressions.Window
    val got = PackingOps.nsPackChunksGlobal(spark, sfDir).collect().map(_.toSeq)
    // the semantics: ONE stream ordered by (lang, doc_id) — computed here
    // via the global window the production plan deliberately avoids
    val w = Window.orderBy("lang", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = graft.model.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), PackingOps.bpeTokens.as("toks"))
      .where(col("toks") > 0)
      .withColumn("cum_before", coalesce(sum("toks").over(w), lit(0L)))
      .select(col("doc_id"), col("lang"), col("toks"), col("cum_before"),
        expr(s"cum_before div ${PackingOps.ChunkTokens}").as("first_chunk"),
        expr(s"(cum_before + toks - 1) div ${PackingOps.ChunkTokens}").as("last_chunk"))
      .withColumn("n_chunks", col("last_chunk") - col("first_chunk") + 1)
      .orderBy("lang", "doc_id").collect().map(_.toSeq)
    assert(got.nonEmpty && got.toSeq == want.toSeq)
    // continuity: the stream starts at 0 and the last chunk covers the
    // global token total — no per-shard reset anywhere
    val totalToks = got.map(_(2).asInstanceOf[Long]).sum
    assert(got.head(3) == 0L, "stream must start at position 0")
    assert(got.map(_(5).asInstanceOf[Long]).max ==
      (totalToks - 1) / PackingOps.ChunkTokens,
      "global last chunk does not cover the token total")
  }

  test("bpe-budget packing: toks are the encode counts, algebra is the global pack") {
    import org.apache.spark.sql.expressions.Window
    val got = PackingOps.nsPackBpe(spark, sfDir).collect().map(_.toSeq)
    assert(got.nonEmpty)
    // toks column IS ns_text_bpe_encode's n_bpe_tokens, doc for doc
    val encodeToks = TextOps.nsTextBpeEncode(spark, sfDir)
      .select("doc_id", "n_bpe_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { r =>
      assert(r(2) == encodeToks(r(0).asInstanceOf[Long]),
        s"doc ${r(0)}: pack toks ${r(2)} != encode ${encodeToks(r(0).asInstanceOf[Long])}")
    }
    assert(got.length == encodeToks.count(_._2 > 0), "doc set mismatch")
    // same continuity contract as the global pack, on the BPE budgets
    val w = Window.orderBy("lang", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val merges = TextOps.trainBpeMerges(spark, sfDir)
    val want = graft.model.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), TextOps.bpeTokenCountCol(merges).as("toks"))
      .where(col("toks") > 0)
      .withColumn("cum_before", coalesce(sum("toks").over(w), lit(0L)))
      .select(col("doc_id"), col("lang"), col("toks"), col("cum_before"),
        expr(s"cum_before div ${PackingOps.ChunkTokens}").as("first_chunk"),
        expr(s"(cum_before + toks - 1) div ${PackingOps.ChunkTokens}").as("last_chunk"))
      .withColumn("n_chunks", col("last_chunk") - col("first_chunk") + 1)
      .orderBy("lang", "doc_id").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq, "bpe pack != single-global-window brute force")
  }

  test("select-then-pack: packs exactly the DSIR keep set under BPE budgets") {
    val got = PackingOps.pipeSelectPack(spark, sfDir).collect().map(_.toSeq)
    assert(got.nonEmpty)
    // doc set = DSIR keepers (that still have > 0 BPE tokens)
    val keep = SamplingOps.nsCorpusDsir(spark, sfDir)
      .where(col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val packed = got.map(_(0).asInstanceOf[Long]).toSet
    assert(packed.subsetOf(keep), s"packed docs outside the keep set: ${(packed -- keep).take(3)}")
    assert((keep -- packed).forall(_ => true)) // keepers may drop only via toks=0
    val all = PackingOps.nsPackBpe(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert((keep -- packed).forall(id => !all.contains(id)),
      "a keeper with tokens went missing from the pack")
    // toks match the full-corpus tokenizer (selection must not retrain it)
    got.foreach { r =>
      assert(r(2) == all(r(0).asInstanceOf[Long]),
        s"doc ${r(0)}: token budget differs from the full-corpus tokenizer")
    }
    // the packed stream is continuous from 0 over ONLY the kept docs
    val totalToks = got.map(_(2).asInstanceOf[Long]).sum
    assert(got.head(3) == 0L, "stream must start at 0")
    assert(got.map(_(5).asInstanceOf[Long]).max ==
      (totalToks - 1) / PackingOps.ChunkTokens, "last chunk must cover the kept total")
  }

  test("global packing: single-partition exchange carries shard aggregates, not doc rows") {
    val nodes = noAqeNodes(PackingOps.nsPackChunksGlobal(spark, sfDir))
    val shuffles = nodes.collect { case e: ShuffleExchangeExec => e }
    val single = shuffles.filter(_.outputPartitioning.numPartitions == 1)
    assert(single.nonEmpty,
      "expected the shard-offset window's single-partition exchange")
    single.foreach { e =>
      assert(collectAllPlans(e).exists(_.nodeName.toLowerCase.contains("aggregate")),
        s"single-partition exchange feeds on raw doc rows: ${e.child.nodeName}")
    }
    val hash = shuffles.filterNot(e => e.outputPartitioning.numPartitions == 1 ||
      e.outputPartitioning.toString.toLowerCase.contains("range"))
    assert(hash.nonEmpty &&
      hash.forall(_.outputPartitioning.toString.contains("lang")),
      s"doc rows must ride lang-hash exchanges only: ${hash.map(_.outputPartitioning)}")
    // tokenize-once: BOTH branches must read the cached token frame (the
    // regexp tokenization is the dominant cost; paid twice it doubled the
    // query in rehearsal) — i.e. two InMemoryTableScans, zero direct
    // parquet scans of documents in this plan
    val memScans = nodes.count(_.nodeName.toLowerCase.contains("inmemory"))
    val pqScans = nodes.count(_.nodeName.toLowerCase.startsWith("scan parquet"))
    assert(memScans >= 2 && pqScans == 0,
      s"branches re-tokenize instead of sharing the cached frame " +
        s"(inmemory=$memScans, parquet=$pqScans):\n${nodes.map(_.nodeName)}")
  }

  /** THE scale rule of the prefix-sum rewrite (r12 verdict finding #1):
    * doc rows must never ride a window/exchange whose partitioning is
    * `lang` alone (parallelism ceiling = |langs|; en ≈ 44 % of a real
    * corpus puts ~44 % of all rows in one task). A lang-only partition
    * spec is legal ONLY over an aggregated (metadata-scale) frame.
    */
  private def assertNoKeyOnlyDocWindow(
      nodes: Seq[org.apache.spark.sql.execution.SparkPlan],
      tag: String, key: String): Unit = {
    import org.apache.spark.sql.execution.window.WindowExec
    val windows = nodes.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, s"$tag: no window found — pin vacuous")
    windows.foreach { w =>
      val keyOnly = w.partitionSpec.size == 1 &&
        w.partitionSpec.head.references.toSeq.exists(_.name == key)
      if (keyOnly)
        assert(collectAllPlans(w.child)
          .exists(_.nodeName.toLowerCase.contains("aggregate")),
          s"$tag: $key-only window over raw doc rows (parallelism = |$key|):\n$w")
    }
    // And the doc-row prefix window actually exists in its parallel form:
    // a window partitioned by BOTH the key and the range column.
    assert(windows.exists(w => w.partitionSpec.size == 2 &&
      w.partitionSpec.flatMap(_.references.toSeq).map(_.name).contains(key)),
      s"$tag: no ($key, range) doc-row window — prefix scan missing")
  }

  test("pack/sample/mix plans: doc rows never ride low-cardinality-key-only windows or exchanges") {
    for ((tag, key, build) <- Seq[(String, String, () => org.apache.spark.sql.DataFrame)](
      ("ns_pack_chunks", "lang", () => PackingOps.nsPackChunks(spark, sfDir)),
      ("ns_pack_chunks_global", "lang", () => PackingOps.nsPackChunksGlobal(spark, sfDir)),
      ("ns_corpus_sample_exact", "lang", () => SamplingOps.nsCorpusSampleExact(spark, sfDir)),
      ("ns_corpus_mix", "source", () => PackingOps.nsCorpusMix(spark, sfDir)),
      ("ns_corpus_mix_temp", "source", () => PackingOps.nsCorpusMixTemp(spark, sfDir)))) {
      val nodes = noAqeNodes(build())
      assertNoKeyOnlyDocWindow(nodes, tag, key)
      // Exchange form of the same rule: a hash exchange on the key alone
      // may only carry aggregated rows.
      nodes.collect { case e: ShuffleExchangeExec => e }.foreach { e =>
        val p = e.outputPartitioning.toString
        if (p.contains(key) && !p.contains("_rg") && !p.toLowerCase.contains("range"))
          assert(collectAllPlans(e.child)
            .exists(_.nodeName.toLowerCase.contains("aggregate")),
            s"$tag: $key-only hash exchange of raw doc rows: $p")
      }
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("langPrefix equals the per-lang window form on adversarial id layouts") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    def check(rows: Seq[(Long, String, Long)], tag: String): Unit = {
      val docs = rows.toDF("doc_id", "lang", "toks").cache()
      // Explicit select: the (lang, _rg) join moves its keys to the
      // front; production callers re-project, so the pin does too.
      val got = PackingOps.langPrefix(docs, "cum")
        .select("doc_id", "lang", "toks", "cum")
        .orderBy("lang", "doc_id").collect().map(_.toSeq).toSeq
      val want = docs.withColumn("cum", coalesce(sum("toks").over(win), lit(0L)))
        .orderBy("lang", "doc_id").collect().map(_.toSeq).toSeq
      assert(got == want, s"$tag: prefix sums diverge from the window form")
      docs.unpersist()
    }
    // Dense interleaved ids, skewed lang mix (the en ≈ 44 % shape).
    check((0L until 400L).map(i =>
      (i, if (i % 9 < 4) "en" else s"l${i % 9}", i % 7 + 1)), "dense-skewed")
    // ALL ids clustered into one range (worst case for equal-width cuts:
    // the scan degenerates to per-lang serial but must stay exact).
    check((0L until 50L).map(i => (4000000000L + i, s"l${i % 3}", i + 1)),
      "clustered-high")
    // Sparse ids spanning the long domain + a single-language corpus.
    check(Seq((0L, "en", 3L), (1L << 40, "en", 5L), (1L << 55, "en", 7L),
      (1L << 62, "en", 11L)), "sparse-wide")
    // Empty frame: no rows, no failure.
    val empty = Seq.empty[(Long, String, Long)].toDF("doc_id", "lang", "toks").cache()
    assert(PackingOps.langPrefix(empty, "cum").collect().isEmpty)
    empty.unpersist()
  }

  test("mix: range-offset rank equals the per-source window form") {
    import org.apache.spark.sql.expressions.Window
    val bySource = Window.partitionBy("source").orderBy("sample_key", "doc_id")
    val got = PackingOps.nsCorpusMix(spark, sfDir).collect().map(_.toSeq).toSeq
    val want = graft.model.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("lang"), SamplingOps.sampleKeyCol)
      .withColumn("src_weight", (expr("substr(source, 4)").cast("long") % 3 + 1))
      .withColumn("rank_in_source", row_number().over(bySource).cast("long"))
      .withColumn("pos6", expr("rank_in_source * 6 div src_weight"))
      .select("doc_id", "source", "lang", "src_weight", "rank_in_source", "pos6")
      .orderBy("pos6", "source", "doc_id")
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == want,
      "range-offset mix rank diverges from the window form")
  }

  test("shard export writes one file per shard and reports exactly what landed") {
    val report = PackingOps.nsPackExport(spark, sfDir).collect()
    assert(report.length > 1, "fixture corpus must produce a multi-shard export")
    // Contiguous shard ids from 0; per-shard stream ranges don't overlap.
    val ids = report.map(_.getAs[Long]("shard_id"))
    assert(ids.toSeq == (0L until ids.length).toSeq, s"shard ids not contiguous: ${ids.toSeq}")
    report.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("stream_from") < b.getAs[Long]("stream_from"))
      case _ => ()
    }
    // The export layout on disk: ONE parquet file per shard_id partition
    // (the sized-shard semantic the trainer consumes).
    val root = new java.io.File(
      graft.ops.ProcessTmp.dir("graft_pack_export") + "/corpus")
    val shardDirs = Option(root.listFiles).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("shard_id="))
    assert(shardDirs.length == report.length,
      s"${shardDirs.length} shard dirs for ${report.length} report rows")
    shardDirs.foreach { d =>
      val files = d.listFiles.count(_.getName.endsWith(".parquet"))
      assert(files == 1, s"${d.getName} has $files parquet files, want 1")
    }
    // Doc counts on disk match the read-back report.
    val onDisk = spark.read.parquet(root.getPath).count()
    assert(onDisk == report.map(_.getAs[Long]("n_docs")).sum)
  }
}
