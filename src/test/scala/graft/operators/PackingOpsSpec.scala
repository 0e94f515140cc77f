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

  /** A key-alone partition spec is legal only when the rows below it are
    * already BOUNDED: an aggregated (metadata-scale) frame, a
    * WindowGroupLimit partial prune (the physical planner's local
    * top-cap-per-(key, partition) rewrite for literal rank filters —
    * ≤ cap × partitions rows per key reach the key-only stage), or the
    * remainder of a (key, range) pre-prune/pre-rank (the range-offset
    * form for quota-column selections).
    */
  private def boundedBelow(
      plan: org.apache.spark.sql.execution.SparkPlan, key: String): Boolean = {
    import org.apache.spark.sql.execution.window.WindowExec
    collectAllPlans(plan).exists {
      case w: WindowExec => w.partitionSpec.size == 2 &&
        w.partitionSpec.flatMap(_.references.toSeq).map(_.name).contains(key)
      case p => p.nodeName.toLowerCase.contains("aggregate") ||
        p.nodeName.toLowerCase.contains("windowgrouplimit")
    }
  }

  /** THE scale rule of the prefix-sum rewrite (r12 verdict finding #1):
    * doc rows must never ride a window/exchange whose partitioning is
    * `lang` alone (parallelism ceiling = |langs|; en ≈ 44 % of a real
    * corpus puts ~44 % of all rows in one task). A lang-only partition
    * spec is legal ONLY over a bounded frame ([[boundedBelow]]).
    */
  private def assertNoKeyOnlyDocWindow(
      nodes: Seq[org.apache.spark.sql.execution.SparkPlan],
      tag: String, key: String, expectRangeWindow: Boolean = true): Unit = {
    import org.apache.spark.sql.execution.window.WindowExec
    val windows = nodes.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, s"$tag: no window found — pin vacuous")
    windows.foreach { w =>
      val keyOnly = w.partitionSpec.size == 1 &&
        w.partitionSpec.head.references.toSeq.exists(_.name == key)
      if (keyOnly)
        assert(boundedBelow(w.child, key),
          s"$tag: $key-only window over raw doc rows (parallelism = |$key|):\n$w")
    }
    if (expectRangeWindow)
      // The doc-row prefix window actually exists in its parallel form:
      // a window partitioned by BOTH the key and the range column.
      assert(windows.exists(w => w.partitionSpec.size == 2 &&
        w.partitionSpec.flatMap(_.references.toSeq).map(_.name).contains(key)),
        s"$tag: no ($key, range) doc-row window — prefix scan missing")
    else
      // Literal-cap top-N form: the bound is the WindowGroupLimit
      // partial prune instead of a range window.
      assert(nodes.exists(_.nodeName.toLowerCase.contains("windowgrouplimit")),
        s"$tag: no WindowGroupLimit prune — top-N form unbounded")
  }

  test("pack/sample/mix plans: doc rows never ride low-cardinality-key-only windows or exchanges") {
    for ((tag, key, build) <- Seq[(String, String, () => org.apache.spark.sql.DataFrame)](
      ("ns_pack_chunks", "lang", () => PackingOps.nsPackChunks(spark, sfDir)),
      ("ns_pack_chunks_global", "lang", () => PackingOps.nsPackChunksGlobal(spark, sfDir)),
      ("ns_corpus_sample_exact", "lang", () => SamplingOps.nsCorpusSampleExact(spark, sfDir)),
      ("ns_corpus_mix", "source", () => PackingOps.nsCorpusMix(spark, sfDir)),
      ("ns_corpus_mix_temp", "source", () => PackingOps.nsCorpusMixTemp(spark, sfDir)),
      // Round-14 sweep completion (r13 verdict findings #1-3 + #5):
      ("ns_corpus_source_cap", "source", () => SamplingOps.nsCorpusSourceCap(spark, sfDir)),
      ("pipe_corpus_build", "predicted_lang",
        () => graft.pipeline.Pipelines.corpusBuild(spark, sfDir)),
      ("ns_corpus_topics", "topic", () => SimilarityOps.nsCorpusTopics(spark, sfDir)),
      ("ns_corpus_curriculum", "mean_p_u", () => TextOps.nsCorpusCurriculum(spark, sfDir)))) {
      val nodes = noAqeNodes(build())
      // source_cap is the literal-cap top-N: bounded by WindowGroupLimit,
      // not a range window (measured faster — see SamplingOps scaladoc).
      assertNoKeyOnlyDocWindow(nodes, tag, key,
        expectRangeWindow = tag != "ns_corpus_source_cap")
      // Exchange form of the same rule: a hash exchange on the key alone
      // may only carry bounded (aggregated or pre-pruned) rows.
      nodes.collect { case e: ShuffleExchangeExec => e }.foreach { e =>
        val p = e.outputPartitioning.toString
        if (p.contains(key) && !p.contains("_rg") && !p.toLowerCase.contains("range"))
          assert(boundedBelow(e.child, key),
            s"$tag: $key-only hash exchange of raw doc rows: $p")
      }
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("plan rule fires on a deliberately key-only doc-row window (negative canary)") {
    import org.apache.spark.sql.expressions.Window
    // The shape the rule exists to forbid: raw doc rows ranked under a
    // lang-only window with no aggregate and no (key, range) pre-prune.
    val bad = graft.model.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"))
      .withColumn("r", row_number().over(Window.partitionBy("lang").orderBy("doc_id")))
    val nodes = noAqeNodes(bad)
    intercept[org.scalatest.exceptions.TestFailedException] {
      assertNoKeyOnlyDocWindow(nodes, "negative-canary", "lang")
    }
    // The exchange form fires on the same plan: its lang-only shuffle
    // carries raw doc rows, so boundedBelow must reject it.
    val keyed = nodes.collect { case e: ShuffleExchangeExec => e }.filter { e =>
      val p = e.outputPartitioning.toString
      p.contains("lang") && !p.contains("_rg") && !p.toLowerCase.contains("range")
    }
    assert(keyed.nonEmpty, "canary plan lost its lang-only exchange")
    assert(keyed.exists(e => !boundedBelow(e.child, "lang")),
      "exchange rule failed to fire on raw doc rows")
    // And the rule's skip condition matches BOTH parallel kernels'
    // partitioning strings: langPrefix and rangedSampleRank each name
    // their range column `_rg`, so their doc-row exchanges are excluded
    // by the `_rg` guard, not by accident.
    import spark.implicits._
    val frame = (0L until 64L).map(i => (i, s"l${i % 3}", i % 7 + 1))
      .toDF("doc_id", "lang", "toks")
      .withColumn("sample_key", SamplingOps.sampleKeyCol).cache()
    for ((tag, df) <- Seq(
        ("langPrefix", PackingOps.langPrefix(frame, "cum")),
        ("rangedSampleRank", SamplingOps.rangedSampleRank(frame, "lang", "rk")))) {
      val exs = noAqeNodes(df).collect { case e: ShuffleExchangeExec => e }
        .map(_.outputPartitioning.toString)
        .filter(p => p.contains("lang") && p.contains("_rg"))
      assert(exs.nonEmpty, s"$tag: no (lang, _rg) exchange found — skip-guard mismatch")
    }
    frame.unpersist()
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
    // Ids clustered far from zero (the snowflake shape — the r14
    // min-anchored cut spreads these across parallel ranges; a
    // 0-anchored cut collapsed them into one).
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

  test("range cut stays parallel on clustered id spaces; interior collapse fails loud") {
    import spark.implicits._
    // The r13 verdict's pathological fixture: every id inside a
    // 2^10-wide band near 2^40. The min-anchored cut realizes ~512
    // parallel ranges (width 2), where a 0-anchored cut realized ONE.
    val lo = 1L << 40
    assert(PackingOps.prefixRangeWidth(lo, lo + 1023L) == 1L,
      "band-of-1024 must cut into unit-width (fully parallel) ranges")
    assert(PackingOps.prefixRangeWidth(0L, 1L << 40) == (1L << 40) / PackingOps.PrefixRanges + 1)
    // End-to-end on the band: correct AND quiet (no guard trip), with
    // > GuardMinRows rows so the guard is armed.
    val n = PackingOps.GuardMinRows + 2048
    val band = spark.range(n).select(
      (col("id") + lo).as("doc_id"),
      concat(lit("l"), (col("id") % 3).cast("string")).as("lang"),
      (col("id") % 7 + 1).as("toks")).cache()
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val got = PackingOps.langPrefix(band, "cum")
      .withColumn("_want", coalesce(sum("toks").over(win), lit(0L)))
      .where(col("cum") =!= col("_want")).count()
    assert(got == 0L, s"band layout diverges from the window form on $got rows")
    band.unpersist()
    // INTERIOR clustering the min/max anchor can't see: one outlier at 0
    // widens the cut so the whole band lands in a single range — the
    // guard must fail LOUD with its named error, not silently serialize.
    val clustered = spark.range(n).select(
      when(col("id") === 0, lit(0L)).otherwise(col("id") + lo).as("doc_id"),
      lit("en").as("lang"), lit(1L).as("toks")).cache()
    // Consume the offset column itself: a count()-only consumer prunes
    // the offset projection (and the guard with it) — the guard rides
    // the value every real caller reads.
    val ex = intercept[Exception] {
      PackingOps.langPrefix(clustered, "cum").select(sum("cum")).head()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(ex).contains("range cut collapsed"),
      s"expected the named occupancy error, got: ${messages(ex).take(400)}")
    clustered.unpersist()
    // Below the guard floor the same layout is legal (small fixtures fit
    // one range legitimately) — and still byte-exact.
    val small = (0L until 64L).map(i =>
      (if (i == 0) 0L else lo + i, "en", 1L)).toDF("doc_id", "lang", "toks").cache()
    val cums = PackingOps.langPrefix(small, "cum")
      .orderBy("doc_id").select("cum").collect().map(_.getLong(0)).toSeq
    assert(cums == (0L until 64L).toSeq)
    small.unpersist()
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
