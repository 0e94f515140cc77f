package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract of the coalesced GROUP-REPLACE log (MergeSink.publishLogSeq /
  * resolveKeyLog / compactKeyLog): each seq>0 generation carries the
  * COMPLETE replacement row-group for every key it touches; resolution
  * keeps untouched base groups plus each touched key's highest
  * generation; compaction folds to a seq=0 with an identical resolved
  * view and no leftover generations.
  */
class KeyLogSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("resolveKeyLog: group replace, multi-generation, multi-row groups") {
    import spark.implicits._
    val path = s"${tmp("graft_keylog")}/t"
    // Base: keys 1..4, two rows each (an adjacency-like shape).
    val base = (1 to 4).flatMap(k => Seq((k.toLong, s"a$k"), (k.toLong, s"b$k")))
      .toDF("k", "v").withColumn("bucket", pmod(col("k"), lit(4)).cast("int"))
    MergeSink.publishLogSeq(base, path, 0, 2, Seq("bucket", "k"))
    // Gen 1 replaces key 2 with THREE rows and key 3 with ONE row.
    val g1 = Seq((2L, "x2"), (2L, "y2"), (2L, "z2"), (3L, "x3"))
      .toDF("k", "v").withColumn("bucket", pmod(col("k"), lit(4)).cast("int"))
    MergeSink.publishLogSeq(g1, path, MergeSink.nextSeq(spark, path), 1,
      Seq("bucket", "k"))
    // Gen 2 replaces key 2 again (the winner) and adds NEW key 9.
    val g2 = Seq((2L, "w2"), (9L, "n9"))
      .toDF("k", "v").withColumn("bucket", pmod(col("k"), lit(4)).cast("int"))
    MergeSink.publishLogSeq(g2, path, MergeSink.nextSeq(spark, path), 1,
      Seq("bucket", "k"))
    def view: Set[(Long, String)] =
      MergeSink.resolveKeyLog(spark, path, Seq("k"))
        .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = Set(1L -> "a1", 1L -> "b1", 4L -> "a4", 4L -> "b4", // untouched base
      3L -> "x3",                                                  // gen-1 replace
      2L -> "w2",                                                  // gen-2 beats gen-1
      9L -> "n9")                                                  // gen-2 insert
    assert(view == want, s"resolved view wrong: $view")
    // Compaction: identical view, single seq=0, coalesced files.
    MergeSink.compactKeyLog(spark, path, Seq("k"), 2, Seq("bucket", "k"))
    assert(view == want, "compaction changed the resolved view")
    val seqDirs = new java.io.File(path).listFiles.map(_.getName)
      .filter(_.startsWith("seq=")).toSeq
    assert(seqDirs == Seq("seq=0"), s"compaction left $seqDirs")
    // A resolve over the folded log is a pure base read (no winners).
    assert(MergeSink.resolveKeyLog(spark, path, Seq("k")).count() == 7)
  }

  test("publishLogSeq: empty generation is a no-op; bucket pruning survives the coalesced layout") {
    import spark.implicits._
    val path = s"${tmp("graft_keylog2")}/t"
    val base = (0L until 64L).map(k => (k, k * 7))
      .toDF("k", "v").withColumn("bucket", pmod(col("k"), lit(16)).cast("int"))
    MergeSink.publishLogSeq(base, path, 0, 4, Seq("bucket", "k"))
    val files0 = new java.io.File(s"$path/seq=0").listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(files0 <= 4, s"seq=0 has $files0 files — not coalesced")
    // Empty append: no new seq directory, no schema throw.
    MergeSink.publishLogSeq(base.where(lit(false)), path,
      MergeSink.nextSeq(spark, path), 1, Seq("bucket", "k"))
    assert(new java.io.File(path).listFiles.map(_.getName)
      .count(_.startsWith("seq=")) == 1, "empty generation published a seq dir")
    // The bucket filter pushes into the scan of the coalesced files.
    val pruned = spark.read.parquet(path).where(col("bucket") === 3)
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(scan.contains("bucket"), s"bucket predicate not pushed: $scan")
    assert(pruned.count() == 4)
  }
}
