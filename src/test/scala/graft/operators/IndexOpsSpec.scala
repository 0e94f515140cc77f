package graft.operators

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

/** Persisted-index contract: a query served from the written artifact is
  * row-identical to the in-session query, both after a full build and
  * after incremental maintenance.
  */
class IndexOpsSpec extends SparkSpec {

  private def tmpRoot(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("bm25 served from the stored index equals the in-session query") {
    val want = TextOps.nsTextBm25(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(want.nonEmpty, "fixture produced no bm25 rows — test is vacuous")
    val got = IndexOps.nsTextBm25Indexed(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(got == want, s"index-served mismatch: got=${got.take(3)} want=${want.take(3)}")
  }

  test("incremental index update converges to the full-build answer") {
    val docs = Tables.documents(spark, sfDir)
    val isBatch = col("doc_id") % 10 < 2 // the ns_dedup_incremental 20% batch
    val root = tmpRoot("graft_bm25_incr")
    IndexOps.buildBm25Index(docs.where(!isBatch), root)
    val partial = IndexOps.queryBm25Index(spark, root).collect()
    IndexOps.updateBm25Index(docs.where(isBatch), root)
    val got = IndexOps.queryBm25Index(spark, root).collect().map(_.toSeq).toSeq
    val want = TextOps.nsTextBm25(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(partial.length != got.length || partial.map(_.toSeq).toSeq != got,
      "the 80% build already equaled the full corpus — update untested")
    assert(got == want, s"post-update mismatch: sizes ${got.size} vs ${want.size}")
    // Side stats converged too: the stored 1-row stats equal a recount of
    // the stored doclen table.
    val stats = spark.read.parquet(s"$root/stats").select("n_docs", "n_toks").first()
    val re = spark.read.parquet(s"$root/doclen")
      .agg(count(lit(1)), sum("dlen")).first()
    assert(stats.getLong(0) == re.getLong(0) && stats.getLong(1) == re.getLong(1))
  }

  test("re-delivering the same batch is idempotent (LWW on the term/doc key)") {
    val docs = Tables.documents(spark, sfDir)
    val isBatch = col("doc_id") % 10 < 2
    val root = tmpRoot("graft_bm25_idem")
    IndexOps.buildBm25Index(docs.where(!isBatch), root)
    IndexOps.updateBm25Index(docs.where(isBatch), root)
    val once = IndexOps.queryBm25Index(spark, root).collect().map(_.toSeq).toSeq
    IndexOps.updateBm25Index(docs.where(isBatch), root) // replayed delivery
    val twice = IndexOps.queryBm25Index(spark, root).collect().map(_.toSeq).toSeq
    assert(once == twice, "a replayed batch changed the served answer")
    val postings = spark.read.parquet(s"$root/postings")
    assert(postings.groupBy("wd", "doc_id").count().where(col("count") > 1).isEmpty,
      "replay duplicated posting rows")
  }

  test("ivf served from the stored index equals the in-session query") {
    val want = SimilarityOps.nsSimIvfTopk(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(want.nonEmpty)
    val got = IndexOps.nsSimIvfIndexed(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(got == want, s"ivf index-served mismatch: got=${got.take(3)} want=${want.take(3)}")
  }

  test("incremental ivf update converges to a full assign under the same model") {
    import graft.model.Tables
    val emb = SimilarityOps.embeddings(spark, sfDir)
    val isBatch = col("vec_id") % 10 < 2
    val root = tmpRoot("graft_ivf_incr")
    IndexOps.buildIvfIndex(emb.where(!isBatch), root)
    val partial = spark.read.parquet(s"$root/assignments").count()
    IndexOps.updateIvfIndex(emb.where(isBatch), root)
    // stored assignments == assigning EVERY vector against the stored
    // (80%-corpus) centroid model — the batch must not have re-clustered
    val cents = spark.read.parquet(s"$root/centroids")
      .select(col("cent_id").cast("int"), col("embedding"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    val want = emb.withColumn("cluster",
      SimilarityOps.centroidRanking(SimilarityOps.centLits(cents))(0)("cent_id").cast("int"))
      .select("vec_id", "cluster")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = spark.read.parquet(s"$root/assignments")
      .select(col("vec_id"), col("cluster").cast("int"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(partial < got.size, "update added nothing — test is vacuous")
    assert(got == want, s"stored assignment diverges from the model: " +
      s"${(got.toSet -- want.toSet).take(3)}")
    // replay idempotency: re-delivering the batch changes nothing
    IndexOps.updateIvfIndex(emb.where(isBatch), root)
    val again = spark.read.parquet(s"$root/assignments")
      .select(col("vec_id"), col("cluster").cast("int"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(again == got, "replayed batch mutated the index")
    assert(Tables.embeddings(spark, sfDir).count() == got.size)
  }

  test("ivf index query reads only probed clusters (partition pruning)") {
    val root = tmpRoot("graft_ivf_prune")
    IndexOps.buildIvfIndex(SimilarityOps.embeddings(spark, sfDir), root)
    // A single-cluster filter over the stored assignments must prune to
    // one partition directory in the scan.
    val one = spark.read.parquet(s"$root/assignments").where(col("cluster") === 3)
    val scan = one.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("cluster"), s"no partition filter in scan: $scan")
    assert(one.count() > 0)
  }
}
