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
  * Query list = DERIVED, not hand-maintained: every registered query
  * whose constructed output schema carries a float/double anywhere
  * (including inside arrays/structs), minus the external-source scans
  * (REST/GraphQL/JDBC — no parquet input to permute, identified as the
  * SourceSinkOps registry). A new float-emitting query joins the gate
  * the moment it is registered; an anchor assertion keeps a derivation
  * bug from silently shrinking coverage below the round-11 hand list.
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

  private def hasFloat(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case DoubleType | FloatType => true
      case s: StructType => s.fields.exists(f => hasFloat(f.dataType))
      case a: ArrayType => hasFloat(a.elementType)
      case m: MapType => hasFloat(m.keyType) || hasFloat(m.valueType)
      case _ => false
    }
  }

  /** DERIVED query list: construct every registered query against the
    * fixture dir and keep those whose schema carries a float anywhere.
    * External-source scans (the SourceSinkOps registry: REST, GraphQL,
    * JDBC, queue/file cursors) have no parquet input to permute and are
    * excluded as a family.
    */
  private lazy val queries: Seq[String] = {
    val external = graft.ops.SourceSinkOps.queries.keySet
    val derived = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(external)
      .filter { q =>
        val keep = hasFloat(SparkEntry.queries(q)(spark, sfDir).schema)
        spark.sharedState.cacheManager.clearCache()
        keep
      }
    // Coverage floor: the round-11 hand list must stay a subset — a
    // derivation bug (schema probe failing, registry rename) fails here
    // instead of silently ungating queries.
    val anchors = Set(
      "op21_nested_join", "op30_multi_agg", "op38_cumulative_income",
      "pipe_user_income", "pipe_index_epoch_apr", "ops_salted_sum",
      "ns_text_classify_trained", "ns_text_bigram_lm", "ns_dedup_jaccard",
      "ns_session_agg")
    val missing = anchors -- derived.toSet
    assert(missing.isEmpty, s"derivation lost anchor queries: $missing")
    assert(derived.size >= 56,
      s"derived float-query list shrank below the r11 hand list: ${derived.size}")
    derived
  }

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
