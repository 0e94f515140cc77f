package graft.operators

import graft.model.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** North-star deduplication operators over `documents` (builder brief +
  * SURVEY.md §7.4): exact hash dedup, n-gram Jaccard near-dup, MinHash+LSH,
  * and SimHash.
  *
  * Scale posture: exact dedup and the LSH variants are linear-ish (hash →
  * bucket → within-bucket verify); only candidate pairs sharing a
  * bucket/shingle are ever joined, never the full cross product. At 100 TB
  * the shingle/band join partitions by the band hash, which is uniform by
  * construction.
  */
object DedupOps {

  /** Word-3-gram shingle set per doc (distinct), lowercased. The join key
    * is a 60-bit sha256-prefix fingerprint, not the string: an 8-byte
    * shuffle key instead of ~20-byte text (collision odds over ~10^6
    * distinct shingles are ~1e-7 — negligible vs the float
    * canonicalization tolerance). sha256 rather than xxhash64 so the
    * MinHash base fingerprint derived from it is REPRODUCIBLE in the
    * DuckDB oracle (`('0x' || substring(sha256(s), 1, 15))::BIGINT`).
    */
  /** One row per (doc, shingle OCCURRENCE) — the single definition of
    * tokenization + fingerprint that every dedup path shares; [[shingles]]
    * distincts it and [[shingleSetsOnePass]] set-aggregates it, so the
    * exact-Jaccard and MinHash paths cannot desynchronize.
    */
  /** One row per (doc, shingle occurrence) with the RAW shingle string —
    * the single tokenization definition; the dedup family fingerprints
    * it ([[explodedShingles]]), the hot-ngram table
    * ([[TextOps.nsTextHotNgrams]]) aggregates it directly.
    */
  private[graft] def wordShingles(docs: DataFrame): DataFrame =
    docs
      .withColumn("w", split(lower(col("text")), " "))
      .where(size(col("w")) >= 3)
      .select(col("doc_id"), explode(
        expr("transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"))
        .as("shingle"))

  private[operators] def explodedShingles(docs: DataFrame): DataFrame =
    wordShingles(docs)
      .select(col("doc_id"),
        conv(substring(sha2(col("shingle"), 256), 1, 15), 16, 10).cast("long").as("sh"))

  private[graft] def shingles(docs: DataFrame): DataFrame =
    explodedShingles(docs).distinct()

  /** The SAME per-doc distinct shingle set as [[shingleSetsOnePass]], as a
    * PURE PROJECTION (array_distinct over a transform) — zero exchanges,
    * but the fingerprinting runs in higher-order-function lambdas
    * (interpreted, not codegen). Measured at the 100k-doc rehearsal this
    * costs ~4x the wall of the explode→collect_set form even though that
    * one shuffles — kept as the documented (and spec-pinned, vs
    * [[shingleSetsOnePass]]) twin so the trade stays measured, NOT as a
    * recommended path. See [[nsDecontaminate]]'s scaladoc for numbers.
    */
  private[operators] def arrayShingles(docs: DataFrame): DataFrame =
    docs
      .withColumn("w", split(lower(col("text")), " "))
      .where(size(col("w")) >= 3)
      .select(col("doc_id"), array_distinct(expr(
        "transform(sequence(0, size(w)-3), i -> " +
          "CAST(conv(substring(sha2(concat_ws(' ', w[i], w[i+1], w[i+2]), 256), 1, 15), 16, 10) AS BIGINT))"))
        .as("shs"))

  /** Exact Jaccard over pairs that share >=1 shingle. The shingle
    * equality join IS the candidate pruning: disjoint docs never meet —
    * that join is the exact query's contract (LSH variants replace it
    * with banding). Everything else reuses the minhash family's one-pass
    * machinery: ONE wide explode→collect_set builds the per-doc sets
    * (cached, materialized by a single tiny count), candidate pairs come
    * from re-exploding the CACHED sets (a narrow map-side projection, not
    * a recompute of the shingle pass), and the shared
    * [[setIntersectVerify]] computes the exact Jaccard per DISTINCT pair
    * — the pre-r4 form shuffled every co-occurrence row into a per-pair
    * count and scanned the exploded frame three times (2.9 s vs 1.6 s at
    * sf0.1).
    */
  private[operators] def jaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val sets = shingleSetsOnePass(docs).cache()
    sets.count() // one sequential job materializes the single wide op
    val sh = sets.select(col("doc_id"), explode(col("shs")).as("sh"))
    val candidates = sh.as("a")
      .join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    setIntersectVerify(candidates, sets, sets, "doc_a", "doc_b", threshold)
  }

  /** Exact dedup: sha256 over normalized text; keep the smallest doc_id of
    * each fingerprint group (deterministic survivor pick).
    */
  def nsDedupExact(spark: SparkSession, dir: String): DataFrame = {
    val normalized = regexp_replace(lower(col("text")), "\\s+", " ")
    Tables.documents(spark, dir)
      .select(col("doc_id"), sha2(normalized, 256).as("fp"))
      .groupBy("fp")
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_doc_id")
  }

  /** n-gram Jaccard near-dup pairs (exact, shingle-join pruned). */
  def nsDedupJaccard(spark: SparkSession, dir: String): DataFrame =
    jaccardPairs(Tables.documents(spark, dir), 0.5)
      .orderBy("doc_a", "doc_b")

  // ---- MinHash + LSH ------------------------------------------------------

  private val NumHashes = 32
  private val Bands = 8 // x 4 rows per band
  private val Rows = NumHashes / Bands
  private[graft] val Prime = 4294967311L // smallest prime > 2^32
  // Deterministic affine hash parameters (a_i odd, from a fixed LCG).
  // a,b are capped at 30 bits: x < 2^32, so a*x + b < 2^62 — no long
  // overflow under ANSI arithmetic.
  private[graft] val hashParams: Seq[(Long, Long)] = {
    var state = 0x9e3779b97f4a7c15L
    def next(): Long = { state = state * 6364136223846793005L + 1442695040888963407L; state }
    Seq.fill(NumHashes)(((next() & 0x3fffffffL) | 1L, next() & 0x3fffffffL))
  }

  /** MinHash signatures: shingle fingerprint -> 32-bit base -> k affine
    * hashes -> per-doc min. One explode + one groupBy; the k mins are k
    * agg columns, not k passes.
    */
  private[operators] def minhashSignatures(sh0: DataFrame): DataFrame = {
    val sh = sh0
      .withColumn("x", col("sh").bitwiseAND(0xffffffffL))
    val mins: Seq[Column] = hashParams.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("x") * a + b, lit(Prime))).as(s"h$i")
    }
    sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** Band keys for LSH bucketing: struct(band, struct of the band's raw
    * min values) — positionally-named fields so the array of bands types
    * uniformly.
    */
  private def bandKeyCols: Seq[Column] = (0 until Bands).map { b =>
    struct(lit(b).as("band"),
      struct((b * Rows until (b + 1) * Rows).map(i =>
        col(s"h$i").as(s"r${i - b * Rows}")): _*).as("bh"))
  }

  /** Per-doc shingle sets in ONE pass: explode → collect_set, which dedups
    * inside the aggregation — no separate distinct() exchange and no second
    * groupBy for the signature. This is the ONLY wide operation of the
    * whole MinHash family; signatures derive from the set column without
    * another shuffle ([[signaturesFromSets]]), and c = |distinct shingles|
    * matches what a count over the distinct exploded frame would give.
    */
  private[operators] def shingleSetsOnePass(docs: DataFrame): DataFrame =
    explodedShingles(docs)
      .groupBy("doc_id")
      .agg(collect_set(col("sh")).as("shs"))
      .withColumn("c", size(col("shs")).cast("long"))

  /** MinHash signatures as a narrow projection over the set column: all k
    * affine-hash minima in ONE pass via the native
    * [[graft.functions.MinHashFromSet]] expression — zero exchanges (the
    * groupBy-min form costs a second shuffle of the exploded frame) and
    * one array traversal (the declarative k× array_min∘transform form
    * walks the set k times through interpreted lambdas). min over a set
    * equals min over occurrences, so this is byte-identical to
    * [[minhashSignatures]] (pinned by MinHashAggSpec). The two-step
    * select stays two-step in the optimized plan: CollapseProject does
    * not duplicate a non-trivial expression into its 32 consumers.
    */
  private[operators] def signaturesFromSets(sets: DataFrame): DataFrame = {
    graft.functions.MinHashFromSet.register(sets.sparkSession, hashParams, Prime)
    sets.select(col("doc_id"), expr("minhash_from_set(shs)").as("_sig"))
      .select(col("doc_id") +:
        (0 until NumHashes).map(i => col("_sig")(i).as(s"h$i")): _*)
  }

  /** The superseded declarative form of [[signaturesFromSets]] — kept as
    * the equivalence witness the specs compare against.
    */
  private[operators] def signaturesFromSetsDeclarative(sets: DataFrame): DataFrame = {
    val sigCols: Seq[Column] = hashParams.zipWithIndex.map { case ((a, b), i) =>
      array_min(expr(s"transform(shs, x -> pmod((x & 4294967295) * ${a}L + ${b}L, ${Prime}L))"))
        .as(s"h$i")
    }
    sets.select(col("doc_id") +: sigCols: _*)
  }

  /** Per-candidate-pair Jaccard verify by shingle-set intersection —
    * O(candidates), the scalable alternative to the all-pairs
    * co-occurrence join. `left`/`right` name the pair columns; the two
    * set frames may differ (batch-vs-corpus) or be the same frame. The
    * ONLY implementation of the verify math — every LSH variant and the
    * streaming admission path run through here, so the oracle-pinned
    * round-6 jaccard cannot drift between them.
    */
  private def setIntersectVerify(
      candidates: DataFrame, leftSets: DataFrame, rightSets: DataFrame,
      left: String, right: String, threshold: Double): DataFrame =
    candidates
      .join(leftSets.select(col("doc_id").as(left), col("shs").as("sa"), col("c").as("ca")), left)
      .join(rightSets.select(col("doc_id").as(right), col("shs").as("sb"), col("c").as("cb")), right)
      .withColumn("common", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("jaccard", round(col("common") / (col("ca") + col("cb") - col("common")), 6))
      .where(col("jaccard") >= threshold)
      .select(left, right, "jaccard")
      .orderBy(left, right)

  /** Same signature via the native one-pass aggregate
    * [[graft.functions.MinHashAgg]] (same hash family — byte-identical
    * output, pinned by DedupSpec). Kept alongside the declarative version:
    * the column form stays inside whole-stage codegen; the imperative form
    * is one primitive-array pass. Which wins is workload-dependent — both
    * satisfy the same oracle.
    */
  private[operators] def minhashSignaturesNative(sh0: DataFrame): DataFrame = {
    graft.functions.MinHashAgg.register(sh0.sparkSession, hashParams, Prime)
    sh0
      .withColumn("x", col("sh").bitwiseAND(0xffffffffL))
      .groupBy("doc_id").agg(expr("minhash_sig(x)").as("sig"))
      .select(col("doc_id") +: (0 until NumHashes).map(i => col("sig")(i).as(s"h$i")): _*)
  }

  /** Banded-candidate near-dup pairs: band the MinHash signatures,
    * bucket-join candidates (only pairs agreeing on a whole band ever
    * meet — a hash join keyed by band value, never all-pairs), then the
    * shared [[setIntersectVerify]]. The band key is the struct of the
    * band's raw min values (not a hash of them), so the whole pipeline is
    * reproducible in ANSI SQL — the DuckDB oracle replays fingerprint,
    * affine mins, band-join, and verify exactly. This is THE scalable
    * edge generator: [[nsDedupMinhash]] surfaces it directly and
    * [[nsDedupComponents]] feeds survivorship from it. Pass BOTH frames
    * cached AND materialized ([[materializedSetsAndSig]]): the self-join
    * scans `sig` twice and the verify scans `sets` twice, and branches of
    * one job race to compute an unmaterialized cache in parallel — the
    * whole shingle pass would run 2x.
    */
  private[operators] def minhashNearDupPairs(
      sets: DataFrame, sig: DataFrame, threshold: Double): DataFrame = {
    val banded = sig.select(col("doc_id"), explode(array(bandKeyCols: _*)).as("band_key"))
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band_key") === col("b.band_key") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // Scalable verify — never the all-pairs co-occurrence join (which
    // explodes quadratically inside hot shingle groups at 100 TB; that
    // join is the exact-jaccard query's contract, not this one's).
    // Set-intersection counts equal co-occurrence counts, so the same
    // oracle verifies both.
    setIntersectVerify(candidates, sets, sets, "doc_a", "doc_b", threshold)
  }

  /** Cached (sets, signatures) pair, eagerly materialized by ONE
    * sequential job (`sig.count()` computes sets → sig in order and
    * populates both caches). Without this, the downstream plan's parallel
    * branches each recompute the shingle pass before any of them manages
    * to populate the cache. Callers that outlive a query (components)
    * unpersist both; one-shot query entry points rely on Verify/Bench
    * clearing the cache manager after materialization.
    */
  private def materializedSetsAndSig(docs: DataFrame): (DataFrame, DataFrame) = {
    val sets = shingleSetsOnePass(docs).cache()
    val sig = signaturesFromSets(sets).cache()
    sig.count()
    (sets, sig)
  }

  def nsDedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val (sets, sig) = materializedSetsAndSig(Tables.documents(spark, dir))
    minhashNearDupPairs(sets, sig, 0.5)
  }

  /** Cross-source near-dup CONTAMINATION MATRIX — which sources copy
    * from which: every verified MinHash near-dup pair labeled with its
    * two documents' source tags, aggregated to (source_a, source_b) pair
    * counts and mean similarity. The off-diagonal cells are the curation
    * diagnostic (a wiki mirror inside the web crawl lights up
    * (web, wiki)); the diagonal is ordinary within-source duplication.
    *
    * Mean jaccard follows the boundary-free fixed-point discipline: the
    * 6dp-rounded pair jaccards become micro-unit Longs, the mean is a
    * single half-up integer division, and the OUTPUT stays an integer
    * micro-unit column — no float ever crosses the engines.
    *
    * Scale shape: pair-proportional on top of the banded pair
    * enumeration (never corpus-proportional); the source labels join on
    * the pair ids and the final matrix is |sources|² rows.
    */
  def nsDedupSourceMatrix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val src = docs.select(col("doc_id"), col("source"))
    nsDedupMinhash(spark, dir)
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("source_a")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("source_b")), "doc_b")
      .withColumn("j_u", round(col("jaccard") * 1e6).cast("long"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"), sum("j_u").as("sum_j_u"))
      .select(col("source_a"), col("source_b"), col("n_pairs"),
        expr("(sum_j_u * 2 + n_pairs) div (n_pairs * 2)").as("avg_jaccard_u"))
      .orderBy("source_a", "source_b")
  }

  /** Incremental dedup: an arriving BATCH of documents (ids with
    * doc_id % 10 < 2, a deterministic 20% stand-in for "new today")
    * checked against the INDEXED CORPUS (the other 80%) — the production
    * shape where the corpus signatures are a materialized index and only
    * the new batch computes fresh signatures. Candidates come from
    * band-bucket equality between batch and corpus (never batch x batch or
    * corpus x corpus), verified by shingle-set intersection. At 100 TB the
    * corpus side is bucketed by band hash on disk, so each new batch
    * touches only matching buckets.
    */
  def nsDedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val isBatch = col("doc_id") % 10 < 2
    // Built FROM the index API, so the oracled batch query and the
    // streaming admission path are equivalent by construction.
    val (banded, sets) = corpusIndex(docs.where(!isBatch))
    // The "batch" here is a fixed 20% OF THE CORPUS — corpus-
    // proportional, not request-sized — so no forced broadcast hint:
    // AQE broadcasts it while it fits and degrades to a shuffle join
    // (instead of an executor OOM) when it doesn't.
    matchAgainstIndex(docs.where(isBatch), banded, sets, batchIsSmall = None)
  }

  /** ONE shared shingle pass feeding BOTH corpus-health dedup metrics —
    * near-dup survivorship components AND the decontamination profile —
    * for the nightly report ([[graft.pipeline.Pipelines]]): the cached
    * per-doc shingle sets are built once ([[shingleSetsOnePass]], the
    * report's single wide operation over the corpus); components derive
    * their banded edges from the cached signatures, and the
    * decontamination scan re-derives its (doc, shingle) / probe frames by
    * EXPLODING THE CACHED SETS (a narrow map-side projection) instead of
    * re-shingling the corpus — per-doc distinct explode of a collect_set
    * is row-identical to the distinct exploded-shingle frame, so the
    * published decontamination oracle holds unchanged.
    *
    * Returns (components, contaminationProfile). The components frame is
    * eagerly materialized (the [[componentsFromEdges]] driver finish);
    * the contamination frame stays lazy over the CACHED sets, so callers
    * must evaluate it within the session (Verify/Bench clear the cache
    * manager after each query — the documented one-shot convention).
    * `evalSplit` marks the probe/eval side (the decontamination split).
    */
  private[graft] def healthSharedPass(
      docs: DataFrame, evalSplit: Column): (DataFrame, DataFrame) = {
    val sets = shingleSetsOnePass(docs).cache()
    val sig = signaturesFromSets(sets).cache()
    sig.count() // one sequential job materializes docs -> sets -> sig
    val pairs = minhashNearDupPairs(sets, sig, 0.5).select("doc_a", "doc_b")
    val comps = componentsFromEdges(docs.select("doc_id"), pairs)
    sig.unpersist() // edges are materialized; only the sets serve decon
    val corpusSh = sets.where(!evalSplit)
      .select(col("doc_id"), explode(col("shs")).as("sh"))
    val benchSh = sets.where(evalSplit)
      .select(explode(col("shs")).as("sh")).distinct()
    (comps, contaminationProfile(corpusSh, benchSh))
  }

  /** A corpus's near-dup INDEX: (banded signatures, shingle sets with
    * cardinalities) — what an incremental or streaming ingest joins
    * arriving documents against. Both frames derive from one cached
    * shingle pass. At scale they are materialized tables bucketed by band
    * key / doc id; a long-running consumer (streaming admission) should
    * cache them too.
    */
  private[graft] def corpusIndex(docs: DataFrame): (DataFrame, DataFrame) = {
    val (sets, sig) = materializedSetsAndSig(docs)
    val banded = sig.select(col("doc_id"), explode(array(bandKeyCols: _*)).as("band_key"))
    (banded, sets)
  }

  /** [[corpusIndex]] for LONG-LIVED consumers (streaming admission): both
    * frames are eagerly localCheckpoint'ed — plan-free, executor-resident —
    * and the intermediate shingle cache is released immediately, so holding
    * the index across an unbounded stream pins exactly two block sets and
    * nothing else. At 100 TB these are materialized tables bucketed by
    * band key / doc id; checkpointed frames are the local-mode analog.
    */
  private[graft] def corpusIndexMaterialized(docs: DataFrame): (DataFrame, DataFrame) = {
    val sets0 = shingleSetsOnePass(docs).cache()
    val banded = signaturesFromSets(sets0)
      .select(col("doc_id"), explode(array(bandKeyCols: _*)).as("band_key"))
      .localCheckpoint() // materializes the sets0 cache as a side effect
    val sets = sets0.localCheckpoint()
    sets0.unpersist()
    (banded, sets)
  }

  /** Near-dup matches of arriving `batchDocs` against a prebuilt corpus
    * index: band-bucket candidates (batch x corpus only), then the shared
    * [[setIntersectVerify]].
    */
  private[graft] def matchAgainstIndex(
      batchDocs: DataFrame,
      corpusBanded: DataFrame,
      corpusSets: DataFrame,
      threshold: Double = 0.5,
      cacheShingles: Boolean = true,
      batchIsSmall: Option[Boolean] = Some(true)): DataFrame = {
    // The batch set frame feeds both signatures and the verify. One-shot
    // batch callers cache+materialize it (Verify/Bench clear the cache
    // manager after each query); the long-running streaming admission
    // passes cacheShingles=false and gets an eager localCheckpoint —
    // blocks free on RDD GC, so no per-batch CacheManager entry
    // accumulates over an unbounded stream.
    val sets0 = shingleSetsOnePass(batchDocs)
    val sets =
      if (cacheShingles) { val s = sets0.cache(); s.count(); s }
      else sets0.localCheckpoint()
    val banded = signaturesFromSets(sets)
      .select(col("doc_id"), explode(array(bandKeyCols: _*)).as("band_key"))
    // Broadcast whichever side the caller declares REQUEST-sized, so the
    // big side is probed in place and never pays an exchange: the batch
    // for an arriving-docs probe (the default), the corpus for a tiny
    // stored index probed by a corpus-scale scan (fuzzy decontamination,
    // where the eval index is metadata-scale). A forced hint has no size
    // fallback, so callers whose "batch" is CORPUS-proportional (the 20%
    // incremental slice, the admission audit's candidate slice) pass
    // None and let AQE pick the build side from measured sizes instead —
    // a corpus-scale broadcast would OOM executors at large corpora.
    val (a, b) = batchIsSmall match {
      case Some(true)  => (broadcast(banded.as("a")), corpusBanded.as("b"))
      case Some(false) => (banded.as("a"), broadcast(corpusBanded.as("b")))
      case None        => (banded.as("a"), corpusBanded.as("b"))
    }
    val candidates = a
      .join(b, col("a.band_key") === col("b.band_key"))
      .select(col("a.doc_id").as("batch_doc"), col("b.doc_id").as("corpus_doc"))
      .distinct()
    setIntersectVerify(candidates, sets, corpusSets,
      "batch_doc", "corpus_doc", threshold)
  }

  /** The near-dup edges an ARRIVING BATCH adds to an indexed corpus —
    * batch↔corpus (band candidates against the stored banded table, the
    * [[matchAgainstIndex]] shape) PLUS batch↔batch (band self-join among
    * the arriving docs) — from ONE batch shingle pass. Returns
    * (batchSets, edges): the cached per-doc shingle sets (so the caller's
    * decontamination gate explodes them instead of re-shingling — the
    * [[healthSharedPass]] equivalence) and the verified (doc_a, doc_b)
    * pairs with doc_a always the batch side.
    *
    * Scale shape: every frame here is BATCH-proportional — the batch
    * shingles once, its band keys probe only matching stored buckets,
    * and the self-join is batch×batch banded. The corpus is never
    * re-shingled.
    */
  private[graft] def batchIndexAndEdges(
      batchDocs: DataFrame,
      corpusBanded: DataFrame,
      corpusSets: DataFrame,
      threshold: Double = 0.5): (DataFrame, DataFrame) =
    batchEdgesCore(batchDocs, _ => corpusBanded, _ => corpusSets, threshold)

  /** [[batchIndexAndEdges]] against the STORED index at `root`, with the
    * corpus reads BUCKET-PRUNED to what the batch can actually touch
    * (layout from [[graft.ops.ArtifactMeta]]):
    *
    *   - the banded probe reads only buckets the batch's own band keys
    *     hash into. Weak pruning by construction — ~bands×batch keys hit
    *     most buckets at moderate corpus sizes — but the candidate join
    *     BROADCASTS the batch side either way, so the stored table is
    *     scanned map-side, never shuffled (the round-10 delta sweep
    *     measured the old sort-merge shape shuffling the whole banded
    *     table per batch: 26→52 MB across 50k→100k docs).
    *   - the fat sets verify reads ONLY the buckets holding candidate
    *     corpus docs — candidate-proportional, not corpus-proportional
    *     (the full-scan form decoded every stored shingle array per
    *     batch; at 100k docs that scan dominated the delta wall).
    *
    * Driver state: two bucket-id collects, each bounded by the stored
    * bucket count (≤ [[graft.ops.ArtifactMeta.MaxBuckets]]).
    */
  private[graft] def batchIndexAndEdgesPruned(
      batchDocs: DataFrame, root: String,
      threshold: Double = 0.5): (DataFrame, DataFrame) = {
    val spark = batchDocs.sparkSession
    val bandedBuckets = graft.ops.ArtifactMeta.readBuckets(spark, root, "banded")
    val setsBuckets = graft.ops.ArtifactMeta.readBuckets(spark, root, "sets")
    batchEdgesCore(
      batchDocs,
      batchBanded => {
        val touched = batchBanded
          .select(pmod(xxhash64(col("band_key")), lit(bandedBuckets.toLong))
            .cast("int").as("bucket"))
          .distinct().collect().map(_.getInt(0)).toSeq
        val log = spark.read.parquet(s"$root/banded")
        // An empty batch (zero band keys): skip the read entirely rather
        // than planning a scan filtered to false (the sets loader's guard).
        (if (touched.isEmpty) log.where(lit(false))
         else log.where(col("bucket").isin(touched: _*)))
          .select("doc_id", "band_key")
      },
      candIds => {
        // Collect the candidate ids themselves (bounded: limit cap+1 —
        // the same driver-state class as the bucket collect). Inlining
        // them as a pushed IN filter matters at scale: a bucket-only
        // filter reads touched buckets WHOLE — ~500 scattered candidates
        // touch ~min(500, buckets) buckets × 512 rows ≈ 256k fat rows
        // shuffled into the verify, the corpus-proportional-until-the-
        // knee term the round-12 Zipf sweep isolated (byte-identical
        // across vocabularies, so structural, not band collisions). With
        // the id filter the scan prunes row groups INSIDE each bucket
        // (the log is sorted (bucket, doc_id)) and the verify's input is
        // exactly the candidate rows — batch-proportional at any corpus.
        val idArr = candIds.select("doc_id").distinct()
          .limit(VerifyInlineIds + 1)
          .collect().map(_.getLong(0))
        val log = spark.read.parquet(s"$root/sets")
        // No candidates (a fully-novel batch): skip the read entirely.
        (if (idArr.isEmpty) log.where(lit(false))
         else if (idArr.length <= VerifyInlineIds) {
           // floorMod, not %: the log is written with pmod (IndexOps), so
           // a negative doc_id must land on the same non-negative bucket
           // here — Scala % would compute a negative bucket, match no
           // stored rows, and silently drop that candidate's edges.
           val touched =
             idArr.map(id => Math.floorMod(id, setsBuckets.toLong).toInt)
               .distinct.toSeq
           log.where(col("bucket").isin(touched: _*)
             && col("doc_id").isin(idArr.map(Long.box).toSeq: _*))
         } else {
           // Adversarially wide candidate sets fall back to the
           // bucket-granular read rather than inlining an unbounded
           // literal list into the plan.
           val touched = candIds
             .select(pmod(col("doc_id"), lit(setsBuckets.toLong))
               .cast("int").as("bucket"))
             .distinct().collect().map(_.getInt(0)).toSeq
           log.where(col("bucket").isin(touched: _*))
         })
          .select("doc_id", "shs", "c")
      },
      threshold)
  }

  /** Cap on candidate ids inlined into the fat-sets scan as a pushed IN
    * filter — far above any sane batch's verified-candidate count, far
    * below an expression size that would strain codegen; Spark compiles
    * lists this long to an O(1) InSet probe.
    */
  private val VerifyInlineIds = 4096

  /** Shared core of the batch-vs-index edge probe. The corpus sides come
    * from LOADERS so the pruned path can derive each read from the frame
    * that bounds it: `corpusBandedFor` receives the batch's banded keys,
    * `corpusSetsFor` the MATERIALIZED candidate corpus-doc ids.
    */
  private def batchEdgesCore(
      batchDocs: DataFrame,
      corpusBandedFor: DataFrame => DataFrame,
      corpusSetsFor: DataFrame => DataFrame,
      threshold: Double): (DataFrame, DataFrame) = {
    val sets = shingleSetsOnePass(batchDocs).cache()
    val sig = signaturesFromSets(sets).cache()
    sig.count() // one sequential job materializes sets -> sig
    val bb = minhashNearDupPairs(sets, sig, threshold).select("doc_a", "doc_b")
    val banded = sig.select(col("doc_id"), explode(array(bandKeyCols: _*)).as("band_key"))
    // Broadcast the batch side: the stored banded table is scanned in
    // place (map-side hash probe), never shuffled — the corpus must not
    // pay an exchange for a batch-sized probe.
    val cands = broadcast(banded.as("a"))
      .join(corpusBandedFor(banded).as("b"), col("a.band_key") === col("b.band_key"))
      .select(col("a.doc_id").as("batch_doc"), col("b.doc_id").as("corpus_doc"))
      .distinct()
      // Pin: feeds both the sets-bucket collect (pruned path) and the
      // verify — without it the banded probe would run twice.
      .localCheckpoint()
    val corpusSets = corpusSetsFor(cands.select(col("corpus_doc").as("doc_id")))
    val bc = setIntersectVerify(cands, sets, corpusSets, "batch_doc", "corpus_doc", threshold)
      .select(col("batch_doc").as("doc_a"), col("corpus_doc").as("doc_b"))
    // Materialize the edge list EAGERLY (localCheckpoint) so (a) every
    // read of the caller's pre-update stored artifacts completes HERE,
    // before any index maintenance rewrites them, and (b) the signature
    // cache can be dropped immediately — `sig` feeds nothing past this
    // point, and leaving it pinned would hold executor memory for the
    // rest of a long Verify/Bench session. The returned `sets` stays
    // cached (the caller's decontamination gate explodes it); callers
    // unpersist it once their gates are materialized.
    val edges = bb.unionByName(bc).localCheckpoint()
    sig.unpersist()
    (sets, edges)
  }

  /** Oracle CTEs for the INCREMENTAL platform path: the full-corpus
    * closure over the verified edges (`comp` — the final labels a
    * consistent delta must reproduce) PLUS a prefix-restricted closure
    * over the SAME edge CTE (`pcomp` — the day-1 labels the stored
    * artifacts carry). `pred` renders the day-1/prefix predicate for a
    * given column reference.
    *
    * DuckDB-1.0 shape notes: plain CTEs inline PER REFERENCE, so every
    * multiply-referenced stage carries a MATERIALIZED hint — but a
    * MATERIALIZED hint in the same WITH clause as a top-level RECURSIVE
    * CTE trips an internal-error assertion, so each reachability closure
    * is wrapped in its own subquery-level `WITH RECURSIVE` inside a
    * materialized CTE body (the outer WITH is non-recursive).
    */
  private def reachClosureSql(nodePred: String, edgePred: String): String =
    s"""  WITH RECURSIVE redges AS (
       |    SELECT doc_a, doc_b FROM jacc $edgePred
       |    UNION ALL SELECT doc_b, doc_a FROM jacc $edgePred),
       |  rreach(doc_id, r) AS (
       |    SELECT doc_id, doc_id FROM documents $nodePred
       |    UNION
       |    SELECT rreach.doc_id, redges.doc_b
       |    FROM rreach JOIN redges ON rreach.r = redges.doc_a)
       |  SELECT doc_id, min(r) AS component FROM rreach GROUP BY doc_id""".stripMargin

  /** [[componentLabelCtes]] in the NON-RECURSIVE-outer form the big
    * composed oracles need: the shingle/candidate scaffold carries
    * MATERIALIZED hints (multiply-referenced stages otherwise inline per
    * reference in DuckDB) and the reachability closure is wrapped in a
    * subquery-level `WITH RECURSIVE` inside the `comp` body — because a
    * MATERIALIZED hint in the same WITH clause as a TOP-LEVEL recursive
    * CTE trips a DuckDB-1.0 internal assertion.
    */
  private[graft] def componentClosureCtes: String =
    // `sh` stays UN-hinted: the composed oracles embed the decontamination
    // oracle as a subquery with its own inner `sh` CTE, and DuckDB 1.0
    // hits an internal assertion ("Failed to cast physical operator")
    // when a MATERIALIZED outer CTE is shadowed by an inner one of the
    // same name.
    s"""${SqlRewrite.replaceStrict(shingleCte,
          "card AS (", "card AS MATERIALIZED (")},
       |$minhashCandCtes,
       |${SqlRewrite.replaceStrict(jaccCte, "jacc AS (", "jacc AS MATERIALIZED (")},
       |comp AS MATERIALIZED (
       |${reachClosureSql("", "")})""".stripMargin

  private[graft] def deltaComponentCtes(pred: String => String): String =
    s"""$componentClosureCtes,
       |pcomp AS MATERIALIZED (
       |${reachClosureSql(s"WHERE ${pred("doc_id")}",
                          s"WHERE (${pred("doc_a")}) AND (${pred("doc_b")})")})""".stripMargin

  /** Near-dup EDGES of an indexed corpus against ITSELF, from the stored
    * (banded, sets) frames — the band self-join + set-intersect verify of
    * [[minhashNearDupPairs]] run over the ARTIFACT instead of in-session
    * caches (banded rows are stored DISTINCT, so the candidate set is
    * identical). This is what lets a platform build derive survivorship
    * from the index it just published rather than re-shingling the corpus
    * ([[graft.pipeline.Pipelines]] pipe_platform_build).
    */
  private[graft] def pairsFromIndex(
      banded: DataFrame, sets: DataFrame, threshold: Double): DataFrame = {
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band_key") === col("b.band_key") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    setIntersectVerify(candidates, sets, sets, "doc_a", "doc_b", threshold)
  }

  /** The leakage-free 80/10/10 split label over a `component` column —
    * ONE definition of the affine bucket + thresholds, shared by
    * [[nsCorpusSplit]] and the platform-build composition.
    */
  private[graft] def splitCol: Column = {
    val bucket = pmod(
      pmod(col("component") * lit(SamplingOps.SampleKeyA)
        + lit(SamplingOps.SampleKeyB), lit(SamplingOps.SampleKeyP)),
      lit(100L))
    when(bucket < 80, "train").when(bucket < 90, "validation")
      .otherwise("test")
  }

  // ---- SimHash ------------------------------------------------------------

  private val SimBits = 64
  // 8 bands x 8 bits: any pair with hamming <= 7 shares at least one
  // untouched band (pigeonhole), so the <=6 output threshold has
  // guaranteed recall.
  private val SimBands = 8
  private val SimHammingMax = 6

  /** 64-bit SimHash per doc over word tokens (sha256-word bits, +/-1 vote
    * per bit weighted by term frequency).
    *
    * A tf-weighted vote per DISTINCT token equals a +/-1 vote per
    * OCCURRENCE, so the signature needs only ONE aggregation (doc_id ->
    * 64 bit-sums + a count), not a (doc_id, tok) tf pass first: bit j's
    * vote is 2*sum(bit_j) - n. One shuffle instead of two, and the
    * generated aggregate is 64 plain bit-sums instead of 64 conditionals.
    */
  private[operators] def simhashSignatures(docs: DataFrame): DataFrame = {
    // Token bits come from the first 16 hex chars of sha256(token),
    // parsed as two 32-bit words: bit j = word(j/32) >> (j%32) & 1.
    // 32-bit words keep every value far from 64-bit overflow AND are
    // replayable in the DuckDB oracle
    // (('0x' || substring(sha256(t), k, 8))::BIGINT).
    val toks = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
      .select(col("doc_id") +: (0 until SimBits / 32).map { k =>
        conv(substring(sha2(col("tok"), 256), 8 * k + 1, 8), 16, 10)
          .cast("long").as(s"wd$k")
      }: _*)
    val bitSums: Seq[Column] = (0 until SimBits).map { j =>
      sum(shiftright(col(s"wd${j / 32}"), j % 32).bitwiseAND(1L)).as(s"s$j")
    } :+ count(lit(1)).as("n")
    val votes = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until SimBits).map { j =>
      when(col(s"s$j") * 2 > col("n"), shiftleft(lit(1L), j)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    votes.select(col("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup: band the 64 bits into 8x8, bucket-join, verify by
    * hamming distance <= [[SimHammingMax]]. sha256-word token bits make
    * the whole pipeline reproducible in the DuckDB oracle; recall vs the
    * exact-Jaccard truth is additionally checked by DedupSpec.
    */
  def nsDedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val bandWidth = SimBits / SimBands
    val mask = (1L << bandWidth) - 1L
    val sig = simhashSignatures(Tables.documents(spark, dir)).cache()
    // Eager materialization: the plan below scans `sig` four times (band
    // self-join sides + two broadcast re-attaches); parallel branches of
    // one job would each recompute the 64-bit-sum aggregation before the
    // cache populates.
    sig.count()
    // Project-late: bucket-join and dedup on bare ids, then re-attach the
    // two signatures via broadcast joins for the hamming verify.
    val banded = sig.select(col("doc_id"),
      explode(array((0 until SimBands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * bandWidth).bitwiseAND(mask).as("bits"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bits").as("bits"))
    val a = banded.select(col("doc_id").as("doc_a"),
      col("band").as("a_band"), col("bits").as("a_bits"))
    val b = banded.select(col("doc_id").as("doc_b"),
      col("band").as("b_band"), col("bits").as("b_bits"))
    a.join(b, col("a_band") === col("b_band") && col("a_bits") === col("b_bits")
        && col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
      .join(broadcast(sig.select(col("doc_id").as("doc_a"), col("simhash").as("sim_a"))), "doc_a")
      .join(broadcast(sig.select(col("doc_id").as("doc_b"), col("simhash").as("sim_b"))), "doc_b")
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long"))
      .where(col("hamming") <= SimHammingMax)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  // ---- Connected components (dedup survivorship) --------------------------

  /** Connected components over the near-dup pair graph: every document gets
    * the min doc_id reachable through near-dup edges as its component id —
    * the survivorship key of a large-scale dedup (keep one doc per
    * component).
    *
    * Edges come from [[minhashNearDupPairs]] — band-bucket candidates +
    * set-intersect verify — NOT from the all-pairs shingle co-occurrence
    * join: one hot shingle (boilerplate text) makes that join quadratic,
    * and survivorship is the flagship deliverable that must survive 100 TB.
    * DedupSpec pins that no shingle-equality self-join appears in this
    * edge plan. The oracle replays the same banded candidates, so the
    * components are hash-checked against the LSH edge graph, not the
    * exact-Jaccard one.
    */
  def nsDedupComponents(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val (sets, sig) = materializedSetsAndSig(docs)
    val pairs = minhashNearDupPairs(sets, sig, 0.5).select("doc_a", "doc_b")
    // componentsFromEdges materializes the edge list eagerly (count +
    // contraction/collect), so the set/signature caches are consumed by
    // the time it returns — release them instead of pinning for the
    // session.
    val out = componentsFromEdges(docs.select("doc_id"), pairs)
    sets.unpersist(); sig.unpersist()
    out
  }

  /** Per-doc min-id component labels (doc_id, component) over an
    * undirected pair list — every node of `allNodes` gets a row
    * (singletons label themselves).
    *
    * Scale design (two-level): while the edge list is larger than
    * `driverMaxEdges`, run distributed CONTRACTION rounds — relabel every
    * node to the minimum id in its closed neighborhood, pointer-jump the
    * resulting min-forest to its roots (log-depth self-joins of the
    * node-sized label map), rewrite edges through the root labels, and
    * drop the (many) edges that collapse into self-loops. Each round
    * contracts every node to a LOCAL minimum, at least halving the
    * surviving node count along any chain, so even adversarially deep
    * graphs converge in O(log diameter) rounds; every frame involved is
    * proportional to the DUP GRAPH, not the corpus. Once the residual fits
    * (near-dup edges above a 0.5 Jaccard threshold are orders of magnitude
    * rarer than documents, so this is usually round 0), finish with a
    * driver union-find and broadcast the labels back. The (overwhelming)
    * singleton majority never enters any of this — it unions in at the
    * end. localCheckpoint truncates lineage each round — iterative plans
    * otherwise nest exponentially.
    */
  private[graft] def componentLabelsFromEdges(
      allNodes: DataFrame,
      pairs: DataFrame,
      driverMaxEdges: Long = 2L * 1000 * 1000): DataFrame = {
    val spark = allNodes.sparkSession
    var edges = pairs
      .select(least(col("doc_a"), col("doc_b")).as("u"),
        greatest(col("doc_a"), col("doc_b")).as("v"))
      .where(col("u") =!= col("v")).distinct().cache()
    // Composition of per-round relabelings for every original edge node;
    // null until the first contraction round runs (the common case).
    var mapping: DataFrame = null
    var n = edges.count()
    var round = 0
    while (n > driverMaxEdges) {
      require(round < 64, s"component contraction did not converge in $round rounds")
      val sym = edges.unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      // lbl(x) = min(x, min(N(x))) — a forest of min-pointers (lbl(x) <= x).
      var lbl = sym.groupBy(col("u").as("node"))
        .agg(min(col("v")).as("mn"))
        .select(col("node"), least(col("node"), col("mn")).as("lbl"))
        .localCheckpoint()
      // Pointer-jump to the forest roots: lbl := lbl(lbl) until fixpoint.
      // Depth halves per jump — O(log depth) node-map self-joins.
      var jumping = true
      while (jumping) {
        val next = lbl.as("x")
          .join(lbl.select(col("node").as("lbl"), col("lbl").as("lbl2")), Seq("lbl"))
          .select(col("node"), least(col("lbl"), col("lbl2")).as("lbl"),
            (col("lbl2") < col("lbl")).as("moved"))
          .localCheckpoint()
        jumping = next.where(col("moved")).limit(1).count() > 0
        lbl = next.select("node", "lbl")
      }
      val lu = lbl.select(col("node").as("u"), col("lbl").as("lu"))
      val lv = lbl.select(col("node").as("v"), col("lbl").as("lv"))
      val contracted = edges.join(lu, "u").join(lv, "v")
        .select(least(col("lu"), col("lv")).as("u"),
          greatest(col("lu"), col("lv")).as("v"))
        .where(col("u") =!= col("v")).distinct().localCheckpoint()
      mapping =
        if (mapping == null) lbl
        else {
          // mapping: orig -> label_k; lbl: label_k -> label_{k+1}. A label
          // absent from lbl had no remaining edges and stays as-is.
          val step = lbl.select(col("node").as("lbl"), col("lbl").as("next"))
          mapping.join(step, Seq("lbl"), "left_outer")
            .select(col("node"), coalesce(col("next"), col("lbl")).as("lbl"))
            .localCheckpoint()
        }
      edges.unpersist()
      edges = contracted
      val n2 = edges.count()
      require(n2 < n, s"component contraction stalled at $n edges")
      n = n2
      round += 1
    }
    // Driver finish: union-find with per-root minimum over the residual
    // edge list (<= driverMaxEdges rows — bounded memory by construction).
    val edgeArr = edges.select(col("u").cast("long"), col("v").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // The residual is on the driver now — release the executor cache so a
    // long-lived session (Verify/Bench run 79 queries in one) doesn't pin
    // it. localCheckpoint blocks from contraction rounds free on RDD GC.
    edges.unpersist()
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
      var c = x // path compression
      while (parent.getOrDefault(c, c) != c) { val nx = parent.get(c); parent.put(c, r); c = nx }
      r
    }
    edgeArr.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      // Union by id: the smaller id becomes the root, so every root IS the
      // minimum id of its set — the component label, with no second pass.
      if (ra != rb) { if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb) }
    }
    val resolved = edgeArr.flatMap { case (a, b) => Seq(a, b) }.distinct
      .map(x => (x, find(x)))
    import spark.implicits._
    val residualLabels = spark.createDataset(resolved.toSeq).toDF("lbl", "component")
    // Compose: orig node -> (contraction labels) -> union-find component.
    // A label with no residual edges is already its component's min id.
    // No cache: the common path is a driver-local dataset, and the
    // contraction path reads localCheckpoint blocks — both cheap to
    // re-evaluate, and an uncached frame leaves nothing pinned behind.
    val labels =
      if (mapping == null) residualLabels.select(col("lbl").as("doc_id"), col("component"))
      else mapping.join(broadcast(residualLabels), Seq("lbl"), "left_outer")
        .select(col("node").as("doc_id"), coalesce(col("component"), col("lbl")).as("component"))
    val singletons = allNodes.select("doc_id")
      .join(broadcast(labels.select("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("component"))
    labels.unionByName(singletons)
  }

  /** [[componentLabelsFromEdges]] aggregated to component rows — the
    * published components deliverable.
    */
  private[operators] def componentsFromEdges(
      allNodes: DataFrame,
      pairs: DataFrame,
      driverMaxEdges: Long = 2L * 1000 * 1000): DataFrame =
    componentLabelsFromEdges(allNodes, pairs, driverMaxEdges)
      .groupBy("component")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc_id"))
      .select(col("component"), col("n_docs"), col("keep_doc_id"))
      .orderBy("component")

  /** Near-dup survivorship of an ARBITRARY document subset: minhash
    * pairs within `docs` only (banding is per-doc deterministic, so the
    * pair set equals the full-corpus pairs restricted to the subset),
    * connected components, min-id representative per component. The
    * composition building block the crawl pipeline's survivorship stage
    * uses after its admission gates have shrunk the crawl.
    */
  private[operators] def survivorIdsOf(docs: DataFrame): DataFrame = {
    val (sets, sig) = materializedSetsAndSig(docs)
    val pairs = minhashNearDupPairs(sets, sig, 0.5).select("doc_a", "doc_b")
    val labels = componentLabelsFromEdges(docs.select("doc_id"), pairs)
    sets.unpersist(); sig.unpersist()
    labels.groupBy("component").agg(min("doc_id").as("doc_id")).select("doc_id")
  }

  /** The end-to-end dedup deliverable: the SURVIVING corpus. Each
    * near-dup component keeps its min-id document; the output row carries
    * how many near-duplicates the survivor displaced. This is the
    * composition a training-data pipeline actually ships (documents →
    * near-dup graph → survivorship → filtered corpus).
    */
  def nsDedupCorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val comps = nsDedupComponents(spark, dir)
    docs.join(comps, docs("doc_id") === comps("keep_doc_id"))
      .select(docs("doc_id"), col("lang"),
        (col("n_docs") - 1).as("n_dups_removed"))
      .orderBy("doc_id")
  }

  /** LEAKAGE-FREE train/validation/test split (80/10/10): the split key
    * is the near-dup COMPONENT label, not the document id, so an entire
    * near-duplicate family always lands in ONE split — the
    * split-integrity discipline of the dedup literature (a train doc
    * whose near-twin sits in test is a leak the doc-hash split can't
    * prevent). Singletons (the overwhelming majority) label themselves
    * and split exactly like a doc-hash would.
    *
    * Deterministic: the component label feeds the same affine hash as
    * every sampling query ([[SamplingOps.sampleKeyCol]]'s constants);
    * no rand(), replays are stable. Scale shape: the component machinery
    * is [[nsDedupComponents]]' (edge-proportional, never corpus-
    * proportional); the split assignment itself is a projection.
    */
  def nsCorpusSplit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val (sets, sig) = materializedSetsAndSig(docs)
    val pairs = minhashNearDupPairs(sets, sig, 0.5).select("doc_a", "doc_b")
    val labels = componentLabelsFromEdges(docs.select("doc_id"), pairs)
    sets.unpersist(); sig.unpersist()
    labels.withColumn("split", splitCol)
      .select("doc_id", "component", "split")
      .orderBy("doc_id")
  }

  /** Benchmark DECONTAMINATION — the eval-leak scan every pretraining
    * corpus runs: a probe set's distinct shingles (here the doc_id ≡ 0
    * mod 50 slice — in production, the benchmark/eval suites) are joined
    * against the corpus's shingles; any overlap is reported with its
    * ratio, and heavy overlap (≥ 10 shared shingles) is flagged for
    * drop. Shares [[shingles]] with the whole dedup family — one
    * tokenization definition, oracle in lockstep via the same CTE.
    *
    * Scale shape: eval sets are tiny vs the corpus, so the probe-side
    * distinct shingle set BROADCASTS; the corpus side streams through the
    * broadcast hash join and the (doc, shingle) distinct — a LINEAR,
    * uniformly-hashed shuffle, the same one-wide-operation posture as
    * [[shingleSetsOnePass]]. Two "shuffle-free" rewrites were measured
    * and REJECTED (100k-doc rehearsal, local[32]): per-doc in-array
    * distinct via interpreted HOF lambdas cut shuffle 172 MB → ~1 MB but
    * cost 4-8x the wall (sha256-in-lambda 18 s, string array_distinct
    * 34 s, vs 4.4 s here) — fingerprinting in codegen plus a linear
    * exchange beats interpreted per-row set algebra at every scale where
    * the exchange is not the bottleneck, and it parallelizes when it is.
    * No corpus-vs-corpus join anywhere.
    */
  def nsDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    contaminationProfile(
      shingles(docs.where(col("doc_id") % 50 =!= 0)),
      shingles(docs.where(col("doc_id") % 50 === 0)).select("sh").distinct())
      .orderBy("doc_id")
  }

  /** The decontamination core over (corpus shingles, distinct probe
    * shingles): per-doc overlap count/ratio + the drop flag. Shared by
    * the batch query above and the streaming admission twin
    * ([[graft.streaming.StreamingDecontaminate]]) — probe side always
    * broadcasts, no corpus-vs-corpus join anywhere.
    */
  private[graft] def contaminationProfile(
      corpusSh: DataFrame, benchSh: DataFrame): DataFrame = {
    val card = corpusSh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    corpusSh.join(broadcast(benchSh), "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_common"))
      .join(card, "doc_id")
      .select(col("doc_id"), col("n_common"), col("n_shingles"),
        round(col("n_common") / col("n_shingles"), 6).as("contamination_ratio"),
        (col("n_common") >= 10).as("drop_doc"))
  }

  /** FUZZY decontamination — the near-duplicate complement of
    * [[nsDecontaminate]]'s exact-overlap scan: a training document is
    * dropped when it is a MinHash near-duplicate (verified Jaccard >=
    * 0.5) of ANY eval-set document, catching paraphrase-grade leakage
    * that the shared-shingle count underweights (the eval-contamination
    * regime of Lee et al. 2022's dedup study). Built from the SAME index
    * machinery as [[nsDedupIncremental]]/streaming admission — the eval
    * set (tiny, like every real benchmark suite) is indexed once via
    * [[corpusIndex]], the training corpus streams against it band-first
    * ([[matchAgainstIndex]]: train x eval candidates only, NEVER
    * train x train), then one train-doc-keyed aggregation. At 100 TB the
    * eval index is metadata-scale (banded signatures + shingle sets of a
    * few thousand docs) and broadcast, so the whole pass adds one linear
    * scan over the corpus plus an O(matches) aggregation.
    */
  def nsDecontaminateFuzzy(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val isEval = col("doc_id") % 50 === 0
    val (evalBanded, evalSets) = corpusIndex(docs.where(isEval))
    matchAgainstIndex(docs.where(!isEval), evalBanded, evalSets,
      batchIsSmall = Some(false))
      .groupBy(col("batch_doc").as("doc_id"))
      .agg(
        count(lit(1)).as("n_eval_matches"),
        max("jaccard").as("max_jaccard"))
      .withColumn("drop_doc", lit(true))
      .orderBy("doc_id")
  }

  // ---- Bloom-prefiltered decontamination ----------------------------------

  /** Bloom sizing: capacity stays under Spark's
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits`
    * defaults, and `BloomBits / 8` bounds the driver-resident filter at
    * 1 MiB by CONSTRUCTION (the aggregate allocates `numBits` up front,
    * independent of how many shingles stream into it).
    */
  private[operators] val BloomItems = 1000000L
  private[operators] val BloomBits = 8388608L

  /** [[nsDecontaminate]] for the regime where the eval shingle set is too
    * big to broadcast as an exact hash relation: the probe side collapses
    * to a fixed-size BLOOM FILTER (Spark's own `bloom_filter_agg` /
    * `BloomFilterMightContain`, the machinery behind its runtime
    * row-level filtering) that prefilters corpus shingles MAP-SIDE, and
    * only the surviving candidates take the exact confirmation join —
    * pinned to sort-merge, NOT broadcast, because this variant exists
    * precisely for the beyond-broadcast regime. Bloom false positives
    * are removed by the confirmation join, so the result is row-for-row
    * [[nsDecontaminate]] (spec-pinned, and the oracle is the same SQL).
    *
    * Scale arithmetic: an exact broadcast of B eval shingles costs
    * ~16+ bytes/key in the hash relation; the bloom is `numBits/8` FIXED
    * (1 MiB here, 8 MiB at Spark's default cap) regardless of B, at a
    * false-positive rate that only degrades the PREFILTER selectivity,
    * never correctness. The corpus side sends only candidate shingles
    * into the confirm exchange — on uncontaminated data (the common
    * case) that is ~fpp of the corpus mass instead of all of it.
    *
    * The one-row filter collect is a documented bounded driver edge
    * (<= [[BloomBits]]/8 bytes by construction — same class as the Lloyd
    * centroid collects in [[SimilarityOps]]).
    */
  def nsDecontaminateBloom(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.BloomProbe.register(spark)
    val docs = Tables.documents(spark, dir)
    val evalSh = shingles(docs.where(col("doc_id") % 50 === 0))
      .select("sh").distinct()
    val corpusSh = shingles(docs.where(col("doc_id") % 50 =!= 0))
    val bloomBytes: Array[Byte] = evalSh
      .agg(expr(s"bloom_filter_agg(xxhash64(sh), ${BloomItems}L, ${BloomBits}L)"))
      .head.getAs[Array[Byte]](0)
    val candidates = corpusSh
      .where(call_function("might_contain", lit(bloomBytes), xxhash64(col("sh"))))
    val card = corpusSh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    candidates.join(evalSh.hint("MERGE"), "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_common"))
      .join(card, "doc_id")
      .select(col("doc_id"), col("n_common"), col("n_shingles"),
        round(col("n_common") / col("n_shingles"), 6).as("contamination_ratio"),
        (col("n_common") >= 10).as("drop_doc"))
      .orderBy("doc_id")
  }

  // ---- Cross-document repeated spans --------------------------------------

  private[operators] val SpanK = 50
  private[operators] val SpanDfCap = 64
  private[operators] val SpanThreshold = 20

  /** Cross-document repeated-span detection — the exact-substring
    * duplication signal (the Lee-et-al-style dedup complement to the
    * set-overlap families above): pairs of documents sharing at least
    * [[SpanThreshold]] DISTINCT [[SpanK]]-char character windows, hashed
    * with the SAME Rabin-Karp polynomial as [[TextOps.nsTextRollhash]]
    * (one polynomial contract across the text and dedup families).
    *
    * [[SpanK]] = 50 chars (~8 tokens), deliberately much longer than the
    * 16-char fingerprint k-gram: substring-dedup spans must be long
    * enough that a match means copied text, not a shared phrase — at 16
    * chars (~2 tokens) the span space is so small that incidental matches
    * grow QUADRATICALLY with the corpus (measured on the rehearsal corpus:
    * 2.9x shuffle bytes per 2x rows; at 50 chars the same sweep is linear
    * with max df 4).
    *
    * Shape, inside-out: an O(n)-per-doc `mapPartitions` pass emits each
    * doc's distinct window hashes by prefix-hash differencing (bounded
    * ring buffer, no per-window refold — the [[TextOps.nsTextRollhashFast]]
    * kernel); ONE exchange on the span hash groups each span's sorted doc
    * list; buckets wider than [[SpanDfCap]] docs are dropped whole
    * (boilerplate guard: a span present in d docs implies d²/2 pair rows,
    * so the cap bounds the fan-out at scale exactly like an LSH bucket
    * cap — at sf0.1 the hottest span sits in 297 docs); the surviving
    * buckets explode their ordered pairs in-place (≤ cap²/2 rows per
    * bucket, a<b by construction — no self-join, so the span pipeline is
    * computed ONCE), and pairs with >= [[SpanThreshold]] shared spans
    * surface. Plan = two data exchanges (span hash, then pair key) plus
    * the presentation sort, and NO join anywhere — pinned in DedupSpec.
    */
  def nsDedupSpans(spark: SparkSession, dir: String): DataFrame =
    spanPairs(Tables.documents(spark, dir))

  /** The span-pair core over any (doc_id, text) frame — see
    * [[nsDedupSpans]] for the shape. Separated so the spec can drive it
    * with randomized documents against a brute-force fold.
    */
  private[graft] def spanPairs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (base, mod, k) = (TextOps.RollBase, TextOps.RollMod, SpanK)
    val spans = docs
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val bk = (1 to k).foldLeft(1L)((acc, _) => acc * base % mod)
        it.flatMap { case (id, text) =>
          if (text == null) Iterator.empty
          else {
            val seen = new java.util.HashSet[Long]()
            var i = 0 // char (UTF-16) index
            var cnt = 0 // code points consumed
            var p = 0L // running prefix hash
            val ring = new Array[Long](k + 1)
            while (i < text.length) {
              val cp = text.codePointAt(i)
              ring(cnt % (k + 1)) = p
              p = (p * base + cp.toLong) % mod
              cnt += 1
              if (cnt >= k) {
                val pPrev = ring((cnt - k) % (k + 1))
                seen.add(((p - pPrev * bk % mod) % mod + mod) % mod)
              }
              i += Character.charCount(cp)
            }
            val out = new Array[(Long, Long)](seen.size)
            val jt = seen.iterator(); var j = 0
            while (jt.hasNext) { out(j) = (id, jt.next()); j += 1 }
            out.iterator
          }
        }
      }
      .toDF("doc_id", "h")
    spans
      .groupBy("h").agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .where(size(col("ds")).between(2, SpanDfCap))
      .select(explode(expr(
        "flatten(transform(ds, (a, i) -> transform(slice(ds, i + 2, size(ds)), b -> struct(a AS doc_a, b AS doc_b))))")).as("pr"))
      .select(col("pr.doc_a").as("doc_a"), col("pr.doc_b").as("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("shared_spans"))
      .where(col("shared_spans") >= SpanThreshold)
      .orderBy("doc_a", "doc_b")
  }

  private val LineWords = 3     // words per "line" (paragraph unit)
  private val LineBoilerDocs = 3 // a line in >= this many docs is boilerplate

  /** CCNet-style boilerplate-line removal (Wenzek et al. 2020, §4.1 of the
    * CCNet paper: drop paragraphs whose hash repeats across documents).
    * The fixture corpus is single-line, so a "line" here is each
    * consecutive [[LineWords]]-word group (last group may be shorter —
    * nothing is dropped before counting). A line appearing in >=
    * [[LineBoilerDocs]] distinct docs is boilerplate; the cleaned document
    * is the in-order concatenation of surviving lines, compared by md5.
    *
    * Scale posture: explode → one (line)-keyed agg for document frequency
    * → hash join back on line → one doc_id-keyed agg to rebuild. Both
    * shuffles are on uniform keys (line text / doc_id); no window over the
    * corpus, no driver collection. At 100 TB the df table is Zipf-shaped
    * but bounded by distinct-line cardinality, and the join stays a
    * shuffled hash join on the same key the agg just partitioned by, so
    * AQE reuses the exchange.
    */
  def nsDedupLines(spark: SparkSession, dir: String): DataFrame = {
    val lines = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("i", explode(expr(
        s"sequence(CAST(0 AS BIGINT), (size(w) + ${LineWords - 1}) div $LineWords - 1)")))
      .select(
        col("doc_id"), col("i"),
        expr(s"array_join(slice(w, CAST(i * $LineWords + 1 AS INT), $LineWords), ' ')")
          .as("line"))
    val df = lines.groupBy("line")
      .agg(countDistinct(col("doc_id")).as("dcnt"))
    lines.join(df, "line")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("dcnt") >= LineBoilerDocs, 1L).otherwise(0L)).as("n_boiler"),
        sum(when(col("dcnt") < LineBoilerDocs, size(split(col("line"), " ")).cast("long"))
          .otherwise(0L)).as("kept_words"),
        md5(array_join(
          expr(s"transform(array_sort(collect_list(CASE WHEN dcnt < $LineBoilerDocs THEN struct(i, line) END)), s -> s.line)"),
          " ").cast("binary")).as("cleaned_hash"))
      .orderBy("doc_id")
  }

  /** Canonicalize one URL column — the CommonCrawl-style URL-dedup
    * normalizer, as pure codegen column functions (no UDF): lowercase
    * scheme and host, strip the scheme's default port (:443 https, :80
    * http), drop the fragment, strip a trailing path slash (empty path
    * reads as "/"), drop `utm_*` tracking params, and SORT the surviving
    * query params so parameter order stops mattering. Exposed for the
    * spec's handcrafted messy-URL cases.
    *
    * Scheme-less / protocol-relative inputs (no `x://` prefix): every
    * regexp_extract returns "", which would collapse all such URLs onto
    * the single key "://" and wrongly reject unrelated documents at the
    * admission gate — so those fall back to the RAW url as their own
    * canonical (no normalization, but also no false merge).
    */
  /** Expression-level let-binding: evaluate `c` ONCE per row and hand the
    * bound value to `f` as a lambda variable. This expression tree holds
    * higher-order functions, so it evaluates INTERPRETED (no codegen, no
    * common-subexpression elimination) — without the binds every repeated
    * subterm re-runs its regex per reference (the r12 `ns_dedup_urls`
    * 1.46x regression: the scheme-less `when` re-evaluated the extract
    * chain). A single-element `transform` is the cheapest let the
    * expression language offers; the per-row array alloc is far below one
    * regex evaluation.
    */
  private def bound(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  private[graft] def canonicalUrl(url: Column): Column =
    bound(regexp_replace(url, "#.*$", "")) { noFrag =>
      bound(lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))) { scheme =>
        val hostPort = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]+)", 1))
        // `when` branches evaluate lazily, so hostPort's regex runs once
        // per row (only the taken branch evaluates it).
        val host = when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
          .when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
          .otherwise(hostPort)
        val path = bound(
          regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]+([^?]*)", 1)) { rawPath =>
          when(rawPath === "" || rawPath === "/", lit("/"))
            .otherwise(regexp_replace(rawPath, "/$", ""))
        }
        val query = regexp_extract(noFrag, "\\?([^#]*)", 1)
        val params = bound(array_sort(filter(split(query, "&"),
          p => p =!= "" && !p.startsWith("utm_")))) { kept =>
          when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
            .otherwise(lit(""))
        }
        val canonical = concat(scheme, lit("://"), host, path, params)
        when(scheme === "", url).otherwise(canonical)
      }
    }

  /** URL-level dedup — the crawl pipeline's FIRST dedup rung (cheaper
    * than any content hash: a canonical-URL match skips the fetch/parse
    * entirely). Every document carries a synthesized messy URL (four
    * doc_ids share one logical URL, each dressed differently: uppercase
    * scheme+host, explicit default port, trailing slash, fragment,
    * shuffled param order, utm_ tracking params); the operator
    * CANONICALIZES the string with [[canonicalUrl]] and groups on the
    * result, keeping the smallest doc_id. The oracle rebuilds the messy
    * URL from the same doc_id formulas but states the canonical DIRECTLY
    * — a hash match proves the Spark-side normalizer actually undid
    * every dressing. Scale: one shuffle on the canonical string; a
    * 100 TB crawl would pre-partition by host so the group-by is
    * host-local and the min() map-side combines.
    */
  /** The synthesized messy URL for a doc_id — four consecutive ids share
    * one logical URL, each dressed differently (uppercase scheme+host,
    * explicit default port, trailing slash, fragment, shuffled params,
    * utm_ tracking). Shared by [[nsDedupUrls]], the batch admission
    * audit's URL rung, and the streaming chain specs so every consumer
    * sees the same fixture URLs.
    */
  private[graft] def synthUrl(docId: Column): Column = {
    // Exact integer `doc_id div 4` at ANY id: 4 is a power of two, so an
    // arithmetic shift IS the division (and floor-matches the oracle's
    // `//` for hypothetical negatives too). floor(docId / 4) went through
    // IEEE double division, which loses exactness above 2^53.
    val k = shiftright(docId.cast("long"), 2)
    val v = docId % 4
    def s(c: Column): Column = c.cast("string")
    concat(
      when(v === 1, "HTTPS").otherwise("https"), lit("://"),
      when(v === 1, concat(lit("EXAMPLE"), s(k % 50), lit(".ORG")))
        .otherwise(concat(lit("example"), s(k % 50), lit(".org"))),
      when(v === 3, ":443").otherwise(""),
      concat(lit("/a"), s(k % 7), lit("/b"), s(k % 3)),
      when(v === 2, "/").otherwise(""),
      lit("?"),
      when(v === 1, concat(lit("q="), s(k % 2), lit("&p="), s(k % 5)))
        .otherwise(concat(lit("p="), s(k % 5), lit("&q="), s(k % 2))),
      when(v === 3, concat(lit("&utm_source=s"), s(k % 3))).otherwise(""),
      when(v === 2, concat(lit("#sec"), s(k % 5))).otherwise(""))
  }

  /** Oracle-side twin of [[synthUrl]]+[[canonicalUrl]]: the CANONICAL form
    * stated directly from the doc_id formulas (no string parsing — a
    * hash match proves the Spark normalizer undid every dressing).
    * A SQL expression over a column/CTE field named by `k`.
    */
  private[graft] def synthCanonicalSql(k: String): String =
    s"'https://example' || CAST($k % 50 AS VARCHAR) || '.org/a' || " +
      s"CAST($k % 7 AS VARCHAR) || '/b' || CAST($k % 3 AS VARCHAR) || " +
      s"'?p=' || CAST($k % 5 AS VARCHAR) || '&q=' || CAST($k % 2 AS VARCHAR)"

  def nsDedupUrls(spark: SparkSession, dir: String): DataFrame = {
    val urls = Tables.documents(spark, dir)
      .select(col("doc_id"), synthUrl(col("doc_id")).as("url"))
      .withColumn("canonical", canonicalUrl(col("url")))
    val groups = urls.groupBy("canonical").agg(min("doc_id").as("keep_id"))
    urls.join(groups, "canonical")
      .select(col("doc_id"), col("url"), col("canonical"), col("keep_id"),
        (col("doc_id") =!= col("keep_id")).as("is_dup"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ns_dedup_urls" -> (nsDedupUrls _),
    "ns_decontaminate" -> (nsDecontaminate _),
    "ns_dedup_lines" -> (nsDedupLines _),
    "ns_dedup_exact" -> (nsDedupExact _),
    "ns_dedup_jaccard" -> (nsDedupJaccard _),
    "ns_dedup_minhash" -> (nsDedupMinhash _),
    "ns_dedup_simhash" -> (nsDedupSimhash _),
    "ns_dedup_components" -> (nsDedupComponents _),
    "ns_dedup_corpus" -> (nsDedupCorpus _),
    "ns_dedup_incremental" -> (nsDedupIncremental _),
    "ns_decontaminate_fuzzy" -> (nsDecontaminateFuzzy _),
    "ns_decontaminate_bloom" -> (nsDecontaminateBloom _),
    "ns_corpus_split" -> (nsCorpusSplit _),
    "ns_dedup_source_matrix" -> (nsDedupSourceMatrix _),
    "ns_dedup_spans" -> (nsDedupSpans _))

  /** Shared oracle CTE fragments (DuckDB): word-3-gram shingles and the
    * pair/cardinality scaffolding of the Jaccard verify.
    */
  private val shingleCte =
    """toks AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |         w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] || ' ' || w[CAST(i AS INT)+2] AS shingle
      |  FROM toks, unnest(range(1, len(w)-1)) AS t(i)
      |  WHERE len(w) >= 3),
      |card AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
      |p AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)""".stripMargin

  private def minColsSql: String =
    hashParams.zipWithIndex.map { case ((a, b), i) =>
      s"min((x*$a+$b)%$Prime) AS h$i"
    }.mkString(",\n         ")

  private def bandOrSql: String =
    (0 until Bands).map { band =>
      (band * Rows until (band + 1) * Rows)
        .map(i => s"a.h$i=b.h$i").mkString("(", " AND ", ")")
    }.mkString("\n    OR ")

  /** Shared MinHash candidate CTEs (follow [[shingleCte]]): sha256-prefix
    * base fingerprint, the 32 affine mins, and the 8x4 band join.
    */
  private def minhashCandCtes: String =
    s"""fp AS (
       |  SELECT doc_id,
       |         ('0x' || substring(sha256(shingle), 1, 15))::BIGINT & 4294967295 AS x
       |  FROM sh),
       |sig AS (
       |  SELECT doc_id,
       |         $minColsSql
       |  FROM fp GROUP BY doc_id),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND (
       |    $bandOrSql))""".stripMargin

  /** Generated MinHash oracle: banded candidates + exact-Jaccard verify. */
  private def minhashOracle: String =
    s"""WITH $shingleCte,
       |$minhashCandCtes,
       |pc AS (SELECT p.* FROM p JOIN cand USING (doc_a, doc_b))
       |SELECT doc_a, doc_b,
       |       round(common * 1.0 / (ca.c + cb.c - common), 6) AS jaccard
       |FROM pc
       |JOIN card ca ON doc_a = ca.doc_id
       |JOIN card cb ON doc_b = cb.doc_id
       |WHERE round(common * 1.0 / (ca.c + cb.c - common), 6) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Generated SimHash oracle: sha256-word bit votes, majority signature,
    * 8x8 band join, hamming verify — column-for-column the Spark plan.
    */
  private def simhashOracle: String = {
    val bandWidth = SimBits / SimBands
    val wordCols = (0 until SimBits / 32).map { k =>
      s"('0x' || substring(sha256(t), ${8 * k + 1}, 8))::BIGINT AS wd$k"
    }.mkString(",\n         ")
    val sumCols = (0 until SimBits).map { j =>
      s"sum((wd${j / 32} >> ${j % 32}) & 1) AS s$j"
    }.mkString(",\n         ")
    val bitCols = (0 until SimBits).map { j =>
      s"(CASE WHEN 2*s$j > n THEN 1 ELSE 0 END) AS v$j"
    }.mkString(",\n         ")
    val bandCols = (0 until SimBands).map { band =>
      (0 until bandWidth)
        .map(k => s"${1 << k}*v${band * bandWidth + k}").mkString(" + ") + s" AS b$band"
    }.mkString(",\n         ")
    val bandOr = (0 until SimBands).map(b => s"a.b$b=b.b$b").mkString(" OR ")
    val hamming = (0 until SimBits)
      .map(j => s"(CASE WHEN x.v$j <> y.v$j THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents),
       |wd AS (
       |  SELECT doc_id,
       |         $wordCols
       |  FROM tok),
       |sig AS (
       |  SELECT doc_id, count(*) AS n,
       |         $sumCols
       |  FROM wd GROUP BY doc_id),
       |bits AS (
       |  SELECT doc_id,
       |         $bitCols
       |  FROM sig),
       |band AS (
       |  SELECT doc_id,
       |         $bandCols
       |  FROM bits),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM band a JOIN band b ON a.doc_id < b.doc_id AND ($bandOr)),
       |ham AS (
       |  SELECT doc_a, doc_b, $hamming AS hamming
       |  FROM cand
       |  JOIN bits x ON doc_a = x.doc_id
       |  JOIN bits y ON doc_b = y.doc_id)
       |SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
       |FROM ham WHERE hamming <= $SimHammingMax
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Generated incremental-dedup oracle: batch-vs-corpus band join over
    * the same signatures, verified by the co-occurrence counts.
    */
  private def incrementalOracle: String =
    nearDupMatchesOracle("a.doc_id % 10 < 2", "b.doc_id % 10 >= 2")

  /** Generated batch-vs-corpus near-dup oracle, parameterized by the two
    * split predicates (`a.` = arriving side, `b.` = index side) — the
    * incremental query and the admission pipeline share it.
    */
  private[graft] def nearDupMatchesOracle(aPred: String, bPred: String): String =
    s"""WITH $shingleCte,
       |fp AS (
       |  SELECT doc_id,
       |         ('0x' || substring(sha256(shingle), 1, 15))::BIGINT & 4294967295 AS x
       |  FROM sh),
       |sig AS (
       |  SELECT doc_id,
       |         $minColsSql
       |  FROM fp GROUP BY doc_id),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS batch_doc, b.doc_id AS corpus_doc
       |  FROM sig a JOIN sig b
       |    ON ($aPred) AND ($bPred) AND (
       |    $bandOrSql)),
       |norm AS (
       |  SELECT batch_doc, corpus_doc,
       |         least(batch_doc, corpus_doc) AS doc_a,
       |         greatest(batch_doc, corpus_doc) AS doc_b
       |  FROM cand),
       |j AS (
       |  SELECT n.batch_doc, n.corpus_doc,
       |         round(common * 1.0 / (ca.c + cb.c - common), 6) AS jaccard
       |  FROM norm n
       |  JOIN p ON p.doc_a = n.doc_a AND p.doc_b = n.doc_b
       |  JOIN card ca ON n.batch_doc = ca.doc_id
       |  JOIN card cb ON n.corpus_doc = cb.doc_id)
       |SELECT batch_doc, corpus_doc, jaccard FROM j WHERE jaccard >= 0.5
       |ORDER BY batch_doc, corpus_doc""".stripMargin

  /** Generated fuzzy-decontamination oracle: train-vs-eval band join over
    * the same signatures, Jaccard-verified, aggregated per train doc.
    */
  /** Exact-overlap decontamination — shared by `ns_decontaminate` and the
    * bloom-prefiltered `ns_decontaminate_bloom` (whose confirm join makes
    * it result-identical by construction).
    */
  private def decontaminateOracle: String =
    s"""WITH $shingleCte,
       |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
       |corp AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 50 <> 0),
       |ccard AS (SELECT doc_id, count(*) AS n_shingles FROM corp GROUP BY 1),
       |ov AS (
       |  SELECT c.doc_id, count(*) AS n_common
       |  FROM corp c JOIN bench b ON c.shingle = b.shingle GROUP BY 1)
       |SELECT ov.doc_id, ov.n_common, ccard.n_shingles,
       |       round(ov.n_common * 1.0 / ccard.n_shingles, 6) AS contamination_ratio,
       |       ov.n_common >= 10 AS drop_doc
       |FROM ov JOIN ccard ON ov.doc_id = ccard.doc_id
       |ORDER BY ov.doc_id""".stripMargin

  private def fuzzyDecontaminateOracle: String =
    s"""WITH $shingleCte,
       |fp AS (
       |  SELECT doc_id,
       |         ('0x' || substring(sha256(shingle), 1, 15))::BIGINT & 4294967295 AS x
       |  FROM sh),
       |sig AS (
       |  SELECT doc_id,
       |         $minColsSql
       |  FROM fp GROUP BY doc_id),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS train_doc, b.doc_id AS eval_doc
       |  FROM sig a JOIN sig b
       |    ON a.doc_id % 50 <> 0 AND b.doc_id % 50 = 0 AND (
       |    $bandOrSql)),
       |norm AS (
       |  SELECT train_doc, eval_doc,
       |         least(train_doc, eval_doc) AS doc_a,
       |         greatest(train_doc, eval_doc) AS doc_b
       |  FROM cand),
       |j AS (
       |  SELECT n.train_doc, n.eval_doc,
       |         round(common * 1.0 / (ca.c + cb.c - common), 6) AS jaccard
       |  FROM norm n
       |  JOIN p ON p.doc_a = n.doc_a AND p.doc_b = n.doc_b
       |  JOIN card ca ON n.train_doc = ca.doc_id
       |  JOIN card cb ON n.eval_doc = cb.doc_id)
       |SELECT train_doc AS doc_id, CAST(count(*) AS BIGINT) AS n_eval_matches,
       |       max(jaccard) AS max_jaccard, TRUE AS drop_doc
       |FROM j WHERE jaccard >= 0.5
       |GROUP BY train_doc ORDER BY doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    // Rebuilds the messy URL from the same doc_id formulas but states the
    // CANONICAL form directly — the Spark side must parse + normalize the
    // string to agree.
    "ns_dedup_urls" ->
      s"""WITH u AS (
        |  SELECT doc_id, doc_id // 4 AS k, doc_id % 4 AS v FROM documents),
        |b AS (
        |  SELECT doc_id,
        |    CASE WHEN v = 1 THEN 'HTTPS' ELSE 'https' END || '://' ||
        |    CASE WHEN v = 1
        |         THEN 'EXAMPLE' || CAST(k % 50 AS VARCHAR) || '.ORG'
        |         ELSE 'example' || CAST(k % 50 AS VARCHAR) || '.org' END ||
        |    CASE WHEN v = 3 THEN ':443' ELSE '' END ||
        |    '/a' || CAST(k % 7 AS VARCHAR) || '/b' || CAST(k % 3 AS VARCHAR) ||
        |    CASE WHEN v = 2 THEN '/' ELSE '' END ||
        |    '?' ||
        |    CASE WHEN v = 1
        |         THEN 'q=' || CAST(k % 2 AS VARCHAR) || '&p=' || CAST(k % 5 AS VARCHAR)
        |         ELSE 'p=' || CAST(k % 5 AS VARCHAR) || '&q=' || CAST(k % 2 AS VARCHAR) END ||
        |    CASE WHEN v = 3 THEN '&utm_source=s' || CAST(k % 3 AS VARCHAR) ELSE '' END ||
        |    CASE WHEN v = 2 THEN '#sec' || CAST(k % 5 AS VARCHAR) ELSE '' END AS url,
        |    ${synthCanonicalSql("k")} AS canonical
        |  FROM u),
        |g AS (SELECT canonical, MIN(doc_id) AS keep_id FROM b GROUP BY canonical)
        |SELECT b.doc_id, b.url, b.canonical, g.keep_id,
        |       b.doc_id <> g.keep_id AS is_dup
        |FROM b JOIN g USING (canonical)
        |ORDER BY b.doc_id""".stripMargin,
    "ns_dedup_lines" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |l AS (SELECT doc_id, w,
         |        unnest(generate_series(0, (len(w) + ${LineWords - 1}) // $LineWords - 1)) AS i
         |      FROM d),
         |s AS (SELECT doc_id, i,
         |        array_to_string(list_slice(w, i * $LineWords + 1, i * $LineWords + $LineWords), ' ') AS line
         |      FROM l),
         |df AS (SELECT line, count(DISTINCT doc_id) AS dcnt FROM s GROUP BY line)
         |SELECT s.doc_id,
         |       CAST(count(*) AS BIGINT) AS n_lines,
         |       CAST(sum(CASE WHEN dcnt >= $LineBoilerDocs THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
         |       CAST(sum(CASE WHEN dcnt < $LineBoilerDocs THEN len(string_split(line, ' ')) ELSE 0 END) AS BIGINT) AS kept_words,
         |       md5(coalesce(array_to_string(list(line ORDER BY i) FILTER (WHERE dcnt < $LineBoilerDocs), ' '), '')) AS cleaned_hash
         |FROM s JOIN df USING (line)
         |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    "ns_decontaminate" -> decontaminateOracle,
    // The bloom variant's confirmation join removes every bloom false
    // positive, so its contract is EXACTLY the exact-overlap scan's.
    "ns_decontaminate_bloom" -> decontaminateOracle,
    "ns_dedup_minhash" -> minhashOracle,
    "ns_dedup_source_matrix" ->
      s"""SELECT sa.source AS source_a, sb.source AS source_b,
         |       CAST(count(*) AS BIGINT) AS n_pairs,
         |       CAST((CAST(SUM(CAST(round(p.jaccard * 1000000, 0) AS BIGINT)) AS BIGINT) * 2
         |             + count(*)) // (count(*) * 2) AS BIGINT) AS avg_jaccard_u
         |FROM ($minhashOracle) p
         |JOIN documents sa ON p.doc_a = sa.doc_id
         |JOIN documents sb ON p.doc_b = sb.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ns_dedup_simhash" -> simhashOracle,
    "ns_dedup_incremental" -> incrementalOracle,
    "ns_decontaminate_fuzzy" -> fuzzyDecontaminateOracle,
    "ns_dedup_exact" ->
      """WITH f AS (
        |  SELECT doc_id, sha256(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
        |  FROM documents)
        |SELECT fp, min(doc_id) AS keep_doc_id, count(*) AS n_copies
        |FROM f GROUP BY fp ORDER BY keep_doc_id""".stripMargin,
    "ns_dedup_jaccard" ->
      s"""WITH $shingleCte
        |SELECT doc_a, doc_b,
        |       round(common * 1.0 / (ca.c + cb.c - common), 6) AS jaccard
        |FROM p
        |JOIN card ca ON doc_a = ca.doc_id
        |JOIN card cb ON doc_b = cb.doc_id
        |WHERE round(common * 1.0 / (ca.c + cb.c - common), 6) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,
    "ns_dedup_spans" -> {
      val fold = s"(acc, x) -> (acc * ${TextOps.RollBase} + x) % ${TextOps.RollMod}"
      val k = SpanK
      s"""WITH c AS (
         |  SELECT doc_id,
         |         list_transform(string_split(text, ''), ch -> CAST(ascii(ch) AS BIGINT)) AS codes
         |  FROM documents),
         |w AS (
         |  SELECT doc_id,
         |         unnest(list_distinct(list_transform(range(1, len(codes) - ${k - 2}),
         |           i -> list_reduce(list_prepend(CAST(0 AS BIGINT), codes[i:i+${k - 1}]), $fold)))) AS h
         |  FROM c WHERE len(codes) >= $k),
         |f AS (SELECT doc_id, h FROM w QUALIFY count(*) OVER (PARTITION BY h) <= $SpanDfCap)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_spans
         |FROM f a JOIN f b ON a.h = b.h AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= $SpanThreshold
         |ORDER BY doc_a, doc_b""".stripMargin
    },
    "ns_dedup_components" -> componentsOracle,
    "ns_corpus_split" -> corpusSplitOracle,
    "ns_dedup_corpus" ->
      s"""SELECT d.doc_id, d.lang, CAST(c.n_docs - 1 AS BIGINT) AS n_dups_removed
         |FROM ($componentsOracle) c
         |JOIN documents d ON d.doc_id = c.keep_doc_id
         |ORDER BY d.doc_id""".stripMargin)

  /** Components over the LSH edge graph: the edge CTE is the banded
    * MinHash candidates verified at 0.5 — the same edges the Spark plan
    * derives — closed transitively by the recursive CTE.
    */
  /** The recursive reachability closure ending in a per-doc `comp`
    * (doc_id, component) CTE — shared by the components aggregate and
    * the leakage-free split oracle.
    */
  private def jaccCte: String =
    """jacc AS (
      |  SELECT p.doc_a, p.doc_b FROM p
      |  JOIN cand USING (doc_a, doc_b)
      |  JOIN card ca ON p.doc_a = ca.doc_id
      |  JOIN card cb ON p.doc_b = cb.doc_id
      |  WHERE round(common * 1.0 / (ca.c + cb.c - common), 6) >= 0.5)""".stripMargin

  private[graft] def componentLabelCtes: String =
    s"""$shingleCte,
      |$minhashCandCtes,
      |$jaccCte,
      |edges AS (
      |  SELECT doc_a, doc_b FROM jacc
      |  UNION ALL SELECT doc_b, doc_a FROM jacc),
      |reach(doc_id, r) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT reach.doc_id, edges.doc_b FROM reach JOIN edges ON reach.r = edges.doc_a),
      |comp AS (SELECT doc_id, min(r) AS component FROM reach GROUP BY doc_id)""".stripMargin

  private lazy val componentsOracle: String =
    s"""WITH RECURSIVE $componentLabelCtes
      |SELECT component, count(*) AS n_docs, min(doc_id) AS keep_doc_id
      |FROM comp GROUP BY component ORDER BY component""".stripMargin

  /** Split oracle: component labels, then the same affine bucket the
    * Spark plan computes on the component id.
    */
  private lazy val corpusSplitOracle: String = {
    import SamplingOps.{SampleKeyA, SampleKeyB, SampleKeyP}
    s"""WITH RECURSIVE $componentLabelCtes,
      |b AS (
      |  SELECT doc_id, component,
      |         ((component * $SampleKeyA + $SampleKeyB) % $SampleKeyP) % 100 AS k
      |  FROM comp)
      |SELECT doc_id, component,
      |       CASE WHEN k < 80 THEN 'train'
      |            WHEN k < 90 THEN 'validation'
      |            ELSE 'test' END AS split
      |FROM b ORDER BY doc_id""".stripMargin
  }
}
