package graft.operators

import graft.model.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling + distribution profiling over
  * `documents` (builder brief + SURVEY.md §7.4): the data-mixing step of
  * a pretraining pipeline — draw a per-language quota reproducibly, and
  * profile the length distribution that feeds curriculum/quality cuts.
  *
  * Determinism comes from an affine hash of `doc_id`, NOT rand(): under
  * task retries / speculative execution a rand()-based sample is not
  * stable, and an oracle could never replay it. Same principle as the
  * content-hash salts in [[graft.ops.Skew]].
  */
object SamplingOps {

  /** Affine sample key: (doc_id * knuth + 97) mod p. Multiplier is
    * Knuth's 2654435761 with a prime modulus; both engines compute it in
    * 64-bit exactly for any doc_id below ~3.5e9 (the fixtures' ids are
    * dense from 0, and at larger scale the key column would be hashed
    * first — documented, not hidden).
    */
  private[graft] val SampleKeyA = 2654435761L
  private[graft] val SampleKeyB = 97L
  private[graft] val SampleKeyP = 1000000007L
  private[graft] val sampleKeyCol: Column =
    pmod(col("doc_id") * lit(SampleKeyA) + lit(SampleKeyB), lit(SampleKeyP)).as("sample_key")

  /** Exact stratified 20% sample: per-language quota = ceil(0.2 · |lang|),
    * taken in sample-key order. One exchange on `lang` feeds the count
    * window, the rank window, and nothing else. Languages are few and
    * skewed (en ≈ 44%): at 100 TB the per-lang rank would be taken via
    * per-partition pre-rank + offset merge, or the hash-threshold variant
    * below — which needs NO shuffle at all — replaces it.
    */
  def nsCorpusSampleExact(spark: SparkSession, dir: String): DataFrame = {
    val byLang = Window.partitionBy("lang")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"), sampleKeyCol)
      .withColumn("sample_rank",
        row_number().over(byLang.orderBy("sample_key", "doc_id")).cast("long"))
      .withColumn("quota", ceil(count(lit(1)).over(byLang) * 0.2))
      .where(col("sample_rank") <= col("quota"))
      .select("doc_id", "lang", "source", "n_chars", "sample_key", "sample_rank")
      .orderBy("lang", "sample_rank")
  }

  /** Stateless hash-threshold sample (the 100 TB path): keep documents
    * whose sample key falls in a fixed residue class — ~20% per stratum
    * with zero coordination, zero shuffle (scan → filter → project; the
    * only exchange in the plan is the presentation sort). The trade:
    * per-stratum counts are binomial around the quota instead of exact.
    */
  def nsCorpusSampleHash(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"), sampleKeyCol)
      .where(col("sample_key") % 5 === 0)
      .orderBy("doc_id")

  /** Per-language length quantiles (exact linear-interpolation
    * percentiles), plus an in-query accuracy gate on the sketch path:
    * `approx_percentile` (single streaming pass, bounded memory — what
    * 100 TB actually runs) is gated by RANK, not value: at accuracy
    * 10000 its rank error is ≤ ⌈n/10000⌉, so the sketch value must lie
    * between the order statistics bracketing the interpolated position,
    * widened by that slack. (A value-relative gate is data-dependent —
    * adjacent order stats can sit arbitrarily far apart — and flaked at
    * sf0.001.) The oracle pins the gate TRUE — the op31b HLL pattern.
    * Exact `percentile`/collect_list buffer each group's values (fine
    * for a per-language profile: group count = |langs|); the sketch is
    * the scale path precisely because it does not.
    */
  def nsTextQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val qArr = Array(0.25, 0.5, 0.75, 0.9)
    val qs = "array(0.25D, 0.5D, 0.75D, 0.9D)"
    val n = size(col("vals"))
    val pos = element_at(lit(qArr), col("qi") + 1) * (n - 1)
    val slack = ceil(n / 10000.0)
    val loIdx = greatest(floor(pos) - slack, lit(0)).cast("int")
    val hiIdx = least(ceil(pos) + slack, (n - 1).cast("long")).cast("int")
    val approx = element_at(col("approx_qs"), col("qi") + 1)
    Tables.documents(spark, dir)
      .groupBy("lang")
      .agg(
        expr(s"percentile(n_chars, $qs)").as("exact_qs"),
        expr(s"approx_percentile(n_chars, $qs, 10000)").as("approx_qs"),
        array_sort(collect_list(col("n_chars"))).as("vals"))
      .select(col("lang"), posexplode(col("exact_qs")).as(Seq("qi", "qv")),
        col("approx_qs"), col("vals"))
      .select(
        col("lang"),
        element_at(lit(qArr), col("qi") + 1).as("q"),
        round(col("qv"), 6).as("n_chars_q"),
        (approx >= element_at(col("vals"), loIdx + 1)
          && approx <= element_at(col("vals"), hiIdx + 1)).as("approx_rank_ok"))
      .orderBy("lang", "q")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ns_corpus_sample_exact" -> (nsCorpusSampleExact _),
    "ns_corpus_sample_hash" -> (nsCorpusSampleHash _),
    "ns_text_quantiles" -> (nsTextQuantiles _))

  val oracles: Map[String, String] = Map(
    "ns_corpus_sample_exact" ->
      s"""WITH h AS (
        |  SELECT doc_id, lang, source, n_chars,
        |         (doc_id * ${SampleKeyA} + ${SampleKeyB}) % ${SampleKeyP} AS sample_key
        |  FROM documents),
        |r AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY lang
        |              ORDER BY sample_key, doc_id) AS BIGINT) AS sample_rank,
        |         count(*) OVER (PARTITION BY lang) AS cnt
        |  FROM h)
        |SELECT doc_id, lang, source, n_chars, sample_key, sample_rank
        |FROM r WHERE sample_rank <= ceil(cnt * 0.2)
        |ORDER BY lang, sample_rank""".stripMargin,
    "ns_corpus_sample_hash" ->
      s"""SELECT doc_id, lang, source, n_chars,
        |       (doc_id * ${SampleKeyA} + ${SampleKeyB}) % ${SampleKeyP} AS sample_key
        |FROM documents
        |WHERE (doc_id * ${SampleKeyA} + ${SampleKeyB}) % ${SampleKeyP} % 5 = 0
        |ORDER BY doc_id""".stripMargin,
    "ns_text_quantiles" ->
      """WITH q AS (
        |  SELECT lang, quantile_cont(n_chars, [0.25, 0.5, 0.75, 0.9]) AS qs
        |  FROM documents GROUP BY lang)
        |SELECT lang,
        |       unnest([0.25, 0.5, 0.75, 0.9]) AS q,
        |       round(unnest(qs), 6) AS n_chars_q,
        |       TRUE AS approx_rank_ok
        |FROM q ORDER BY lang, q""".stripMargin)
}
