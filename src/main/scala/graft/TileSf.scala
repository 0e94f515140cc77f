package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tiles the driver fixture tables N× with disjoint key ranges to make a
  * larger scale factor from an existing one (e.g. sf1 = 10 × sf0.1) for the
  * sf-decade correctness + bench sweep (round-10 verdict item 6).
  *
  * Each copy c offsets every entity key by c × stride, where the stride is a
  * power of ten larger than the source key range AND a multiple of every
  * modulus the query constants use (50 for the decontamination holdout,
  * 10/5000 for the delta batches, 20 for the similarity query set) — so each
  * copy hits the fixture predicates exactly as the source does and per-family
  * row counts scale cleanly by N. Foreign keys move with their dimension
  * (o_custkey with c_custkey, l_partkey with p_partkey, ...). The enumerated
  * dimensions nation/region are NOT tiled — they stay the broadcast-sized
  * join side they'd be at 100 TB. Text/embedding payloads are tiled verbatim:
  * cross-copy exact duplicates are the realistic web-corpus regime (the dedup
  * family sees 10× clusters, not 10× independent corpora).
  *
  * Usage: runMain graft.TileSf <srcSfDir> <dstDir> [copies=10]
  */
object TileSf {

  /** Key columns to offset per table, with the per-copy stride. */
  private val plan: Seq[(String, Seq[(String, Long)])] = Seq(
    "region"     -> Seq.empty,
    "nation"     -> Seq.empty,
    "customer"   -> Seq("c_custkey" -> 1000000L),
    "supplier"   -> Seq("s_suppkey" -> 100000L),
    "part"       -> Seq("p_partkey" -> 1000000L),
    "orders"     -> Seq("o_orderkey" -> 10000000L, "o_custkey" -> 1000000L),
    "lineitem"   -> Seq("l_orderkey" -> 10000000L, "l_partkey" -> 1000000L,
                        "l_suppkey" -> 100000L),
    "events"     -> Seq("event_id" -> 10000000L, "user_id" -> 10000000L),
    "documents"  -> Seq("doc_id" -> 100000L),
    "embeddings" -> Seq("vec_id" -> 100000L))

  private def tile(df: DataFrame, keys: Seq[(String, Long)], copies: Int): DataFrame =
    if (keys.isEmpty) df
    else {
      // One scan, explode over the copy index; long arithmetic only.
      val copyIdx = explode(sequence(lit(0L), lit(copies - 1L))).as("_copy")
      keys.foldLeft(df.select(col("*"), copyIdx)) { case (acc, (k, stride)) =>
        acc.withColumn(k, col(k) + col("_copy") * stride)
      }.drop("_copy")
    }

  def run(spark: SparkSession, src: String, dst: String, copies: Int): Unit =
    for ((table, keys) <- plan) {
      // events.ts is TIMESTAMP(NANOS) in the driver fixtures; Tables.events
      // normalizes to TimestampType, and the tiled copy is written as plain
      // TIMESTAMP(MICROS) — Tables.events passes that through unchanged.
      val in =
        if (table == "events") graft.model.Tables.events(spark, src)
        else spark.read.parquet(s"$src/$table.parquet")
      val out = tile(in, keys, copies)
      // Keep per-table file counts sane: facts get one file per copy,
      // dims stay single-file.
      val parts = if (keys.isEmpty) 1 else copies
      out.repartition(parts).write.mode("overwrite")
        .parquet(s"$dst/$table.parquet")
    }

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, dst, copies)
    println(s"""{"tiled":"$dst","copies":$copies}""")
    spark.stop()
  }
}
