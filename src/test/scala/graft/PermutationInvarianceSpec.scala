package graft

import org.apache.spark.sql.functions._

/** Permutation invariance for float-emitting queries — the failure class
  * the sf1 decade sweep caught by luck of scale (op21/op30 summation
  * order, the classifier's logit-rounding midpoint): a 6dp-rounded
  * DOUBLE aggregate over enough rows is order-dependent in its last
  * digit unless the plan quantizes to integers first, and partition
  * order is exactly what a cluster does not guarantee.
  *
  * The spec rewrites every fixture table into two PERMUTED copies (rows
  * hash-scattered across a different partition count and re-ordered
  * within partitions) and asserts each query's collected output is
  * byte-identical across all three layouts. Compared as sorted row
  * strings: ties in a non-total ORDER BY may legally reorder, but every
  * VALUE — including every rounded double — must survive any input
  * order.
  *
  * Query list = the op/pipe/ops registered queries whose output schema
  * carries a double (derived from a Verify dump's parquet schemas),
  * minus the external-source scans (REST/GraphQL/JDBC — no parquet
  * input to permute), plus the ns-side aggregators that previously bit
  * at sf1 (classifier, bigram LM) and the session/jaccard reducers.
  */
class PermutationInvarianceSpec extends SparkSpec {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** One permuted copy: every table's rows hash-scattered (seeded) over a
    * partition count different from the session default, re-sorted
    * WITHIN partitions by the same hash — a deterministic but thoroughly
    * different physical row order.
    */
  private def permute(seed: Int, parts: Int): String = {
    val dst = graft.ops.ProcessTmp.dir(s"graft_perm$seed")
    tables.foreach { t =>
      val src = s"$sfDir/$t.parquet"
      if (new java.io.File(src).exists()) {
        val df = spark.read.parquet(src)
        val h = xxhash64(lit(seed) +: df.columns.map(c => col(c).cast("string")): _*)
        df.withColumn("_h", h)
          .repartition(parts, col("_h"))
          .sortWithinPartitions("_h")
          .drop("_h")
          .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      }
    }
    dst
  }

  private lazy val permA = permute(1, 7)
  private lazy val permB = permute(2, 3)

  // Derivation: queries whose Verify output schema carries double/float
  // (r11 dump), restricted to the op/pipe/ops families that read the
  // parquet fixtures, plus the four ns aggregators named above.
  private val queries = Seq(
    "op11_project_rename", "op13_range_filter", "op15_semi_join",
    "op17_broadcast_semi_join", "op18_sign_split", "op19_spike_filter",
    "op20_groupwise_max", "op21_nested_join", "op22_composite_key_join",
    "op23_join_min_marker", "op26_left_outer_default", "op28_grouped_sum",
    "op29_grouped_avg", "op30_multi_agg", "op32_grouped_mean",
    "op33_mean_of_means", "op34_two_level_agg", "op35_trailing_delta",
    "op36_lag_delta", "op37_delta_split_sums", "op38_cumulative_income",
    "op39_apr_scalar", "op43_top_n", "op44_topk_multi_metric",
    "op45_sorted_group_output", "op50_math_units", "op53_domain_formula",
    "op53b_rate_formulas", "op53c_nav_slippage", "ops_bucketed_join",
    "ops_salted_sum", "pipe_apr_between_epochs", "pipe_average_index_apr",
    "pipe_daily_apr", "pipe_epoch_wise_apr", "pipe_income_snapshot",
    "pipe_index_apr_average", "pipe_index_deth_earned",
    "pipe_index_epoch_apr", "pipe_index_leaderboard",
    "pipe_index_redemption_rate", "pipe_index_validators",
    "pipe_leaderboard", "pipe_lsd_wise_apr", "pipe_mev_watch",
    "pipe_top_indexes", "pipe_training_corpus", "pipe_user_income",
    "pipe_user_income_mev", "pipe_user_income_node_runner",
    "pipe_validator_lsd_score", "pipe_validator_slot_withdrawals",
    "pipe_withdrawals_slot_range",
    "ns_text_classify_trained", "ns_text_bigram_lm", "ns_dedup_jaccard",
    "ns_session_agg")

  private def run(q: String, dir: String): Seq[String] = {
    val rows = SparkEntry.queries(q)(spark, dir).collect()
      .map(_.toString).toSeq.sorted
    spark.sharedState.cacheManager.clearCache()
    rows
  }

  test("float-emitting op/pipe queries are byte-identical under input permutation") {
    val bad = queries.flatMap { q =>
      val base = run(q, sfDir)
      assert(base.nonEmpty, s"$q returned no rows at sf0.001 — test is vacuous")
      val diffs = Seq("permA" -> permA, "permB" -> permB).collect {
        case (name, dir) if run(q, dir) != base => name
      }
      if (diffs.isEmpty) None else Some(s"$q (${diffs.mkString(",")})")
    }
    assert(bad.isEmpty,
      s"input-order-dependent output (distributed float hazard): $bad")
  }
}
