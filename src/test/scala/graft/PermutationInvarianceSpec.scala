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
  * bug from silently shrinking coverage below the round-11 hand list,
  * and a canary test feeds the filter a throwaway registry to prove a
  * new float query would be picked up.
  *
  * Cost/robustness shape (r12 advice): many constructors are EAGER
  * (cache().count(), BPE merge training, physical shard publishes), so
  * the schema probe and the base run share ONE construction per query —
  * probing first and re-running would pay each eager constructor twice —
  * and a constructor that throws is reported BY NAME instead of killing
  * the whole gate opaquely.
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

  /** The derivation FILTER, factored over an arbitrary registry so the
    * canary test can exercise it without constructing real queries:
    * gate = registered, not an external-source scan, float anywhere in
    * the schema.
    */
  private def floatGate(
      names: Seq[String],
      external: Set[String],
      schemaOf: String => org.apache.spark.sql.types.StructType): Seq[String] =
    names.sorted.filterNot(external).filter(q => hasFloat(schemaOf(q)))

  private def clearState(): Unit =
    spark.sharedState.cacheManager.clearCache()

  private def run(q: String, dir: String): Seq[String] = {
    val rows = SparkEntry.queries(q)(spark, dir).collect()
      .map(_.toString).toSeq.sorted
    clearState()
    rows
  }

  test("float-emitting op/pipe queries are byte-identical under input permutation") {
    val external = graft.ops.SourceSinkOps.queries.keySet
    val failures = scala.collection.mutable.ListBuffer[String]()
    val derived = scala.collection.mutable.ListBuffer[String]()
    val bad = SparkEntry.queries.keys.toSeq.sorted.filterNot(external).flatMap { q =>
      scala.util.Try {
        // ONE construction serves the schema probe AND the base run.
        val df = SparkEntry.queries(q)(spark, sfDir)
        if (!hasFloat(df.schema)) { clearState(); None }
        else {
          derived += q
          val base = df.collect().map(_.toString).toSeq.sorted
          clearState()
          assert(base.nonEmpty, s"$q returned no rows at sf0.001 — test is vacuous")
          val diffs = Seq("permA" -> permA, "permB" -> permB).collect {
            case (name, dir) if run(q, dir) != base => name
          }
          if (diffs.isEmpty) None else Some(s"$q (${diffs.mkString(",")})")
        }
      } match {
        case scala.util.Success(r) => r
        case scala.util.Failure(e) =>
          clearState()
          failures += s"$q: ${Option(e.getMessage).getOrElse(e.toString).take(300)}"
          None
      }
    }
    assert(failures.isEmpty,
      s"query constructors/runs threw (gate cannot vouch for them): $failures")
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
    assert(bad.isEmpty,
      s"input-order-dependent output (distributed float hazard): $bad")
  }

  test("canary: a newly registered float query joins the gate; non-float and external ones do not") {
    import org.apache.spark.sql.types._
    val schemas = Map(
      "zz_canary_float" -> StructType(Seq(StructField("k", LongType),
        StructField("score", DoubleType))),
      "zz_canary_nested_float" -> StructType(Seq(StructField("k", LongType),
        StructField("v", ArrayType(StructType(Seq(
          StructField("w", FloatType))))))),
      "zz_canary_int" -> StructType(Seq(StructField("k", LongType))),
      "zz_canary_external" -> StructType(Seq(StructField("x", DoubleType))))
    val gated = floatGate(schemas.keys.toSeq, Set("zz_canary_external"), schemas)
    assert(gated == Seq("zz_canary_float", "zz_canary_nested_float"),
      s"derivation filter mis-gates a new query: $gated")
    // And the real registry goes through the SAME filter function: spot
    // anchor op30 via a construct-free schema stub to keep this cheap.
    val real = floatGate(Seq("op30_multi_agg", "op31_distinct"),
      graft.ops.SourceSinkOps.queries.keySet,
      q => SparkEntry.queries(q)(spark, sfDir).schema)
    clearState()
    assert(real == Seq("op30_multi_agg"), s"real-registry filter drifted: $real")
  }
}
