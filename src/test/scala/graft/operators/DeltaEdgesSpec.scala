package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Crafted-corpus proof of the incremental component closure: an arriving
  * batch's edges against the stored index, contracted through the day-1
  * labels, must reproduce the FULL-graph labels exactly — including the
  * hard cases: a batch doc bridging two previously-separate day-1
  * components (merging them and REVOKING both old survivors), a
  * batch-batch pair, and singletons on both sides.
  */
class DeltaEdgesSpec extends SparkSpec {

  // Texts engineered at the 0.5 Jaccard threshold: tFull's shingle set
  // contains tHead's and tTail's (prefix/suffix of the word list), with
  // J(head, full) = J(tail, full) = 14/20 = 0.7 >= 0.5 but
  // J(head, tail) = 8/20 = 0.4 < 0.5 — so head-docs and tail-docs form
  // SEPARATE day-1 components that only the full-text batch doc bridges.
  private val words = (1 to 22).map(i => s"tok$i")
  private val tFull = words.mkString(" ") // 20 trigrams
  private val tHead = words.take(16).mkString(" ") // first 14 trigrams
  private val tTail = words.drop(6).mkString(" ") // last 14 trigrams
  private val tPair = (1 to 12).map(i => s"pair$i").mkString(" ")

  private def docsDF(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("crafted"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  test("contracted delta closure == full-graph closure (bridge, merge, revocation)") {
    val all = docsDF(Seq(
      20L -> tHead, 40L -> tHead, // day-1 component A, label 20
      30L -> tTail, 50L -> tTail, // day-1 component B, label 30
      60L -> ((1 to 9).map(i => s"solo$i").mkString(" ")), // day-1 singleton
      11L -> tFull, // batch: bridges A and B; 11 < 20 -> merge + revocations
      71L -> tPair, 81L -> tPair, // batch-batch pair, label 71
      61L -> ((1 to 9).map(i => s"other$i").mkString(" ")))) // batch singleton
    val isBatch = col("doc_id") % 10 === 1
    val prefix = all.where(!isBatch)
    val batch = all.where(isBatch)

    // Day-1 labels (the stored artifact's content).
    val pSets = DedupOps.shingleSetsOnePass(prefix).cache()
    val pSig = DedupOps.signaturesFromSets(pSets).cache()
    pSig.count()
    val prefPairs = DedupOps.minhashNearDupPairs(pSets, pSig, 0.5)
      .select("doc_a", "doc_b")
    val day1 = DedupOps.componentLabelsFromEdges(prefix.select("doc_id"), prefPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(day1 == Map(20L -> 20L, 40L -> 20L, 30L -> 30L, 50L -> 30L, 60L -> 60L),
      s"day-1 labels wrong (banding may have missed a crafted pair): $day1")

    // Delta: batch edges against the (in-session stand-in for the) stored
    // index, corpus endpoints projected through the day-1 labels,
    // closure over the contracted graph.
    val (banded, sets) = DedupOps.corpusIndex(prefix)
    val (_, edges) = DedupOps.batchIndexAndEdges(batch, banded, sets)
    val day1DF = {
      import spark.implicits._
      day1.toSeq.toDF("doc_id", "component")
    }
    val corpusSide = day1DF.join(broadcast(edges), day1DF("doc_id") === edges("doc_b"))
      .select(edges("doc_a"), day1DF("component").as("doc_b"))
    val deltaPairs = corpusSide.unionByName(edges.where(col("doc_b") % 10 === 1))
    val newLabels = DedupOps.componentLabelsFromEdges(batch.select("doc_id"), deltaPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Incremental final labels: day-1 labels relabeled through the
    // touched components, batch labels appended.
    val relabel = newLabels.collect { case (k, v) if k % 10 != 1 && v != k => k -> v }
    val finalInc = day1.map { case (d, c) => d -> relabel.getOrElse(c, c) } ++
      newLabels.filter(_._1 % 10 == 1)

    // Reference: the full-graph closure over ALL docs.
    val aSets = DedupOps.shingleSetsOnePass(all).cache()
    val aSig = DedupOps.signaturesFromSets(aSets).cache()
    aSig.count()
    val fullPairs = DedupOps.minhashNearDupPairs(aSets, aSig, 0.5)
      .select("doc_a", "doc_b")
    val full = DedupOps.componentLabelsFromEdges(all.select("doc_id"), fullPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(finalInc == full,
      s"incremental labels diverge from the full closure: inc=$finalInc full=$full")
    // The crafted expectations themselves: the bridge merged A, B and the
    // batch doc into ONE component labeled by the smaller batch id (so
    // day-1 survivors 20 and 30 are both displaced), the batch pair kept
    // its min id, and singletons labeled themselves.
    assert(full(11L) == 11L && full(20L) == 11L && full(30L) == 11L
      && full(40L) == 11L && full(50L) == 11L, s"bridge merge failed: $full")
    assert(full(71L) == 71L && full(81L) == 71L, s"batch pair failed: $full")
    assert(full(60L) == 60L && full(61L) == 61L, s"singletons failed: $full")
  }
}
