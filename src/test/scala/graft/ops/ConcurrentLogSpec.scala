package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multi-writer contract of the claimed append log (MergeSink.claimSeq /
  * appendLogSeq) and the pinned compaction fold (compactKeyLog /
  * compactLog with concurrent appenders).
  *
  * The hazards these pin:
  *   - list-then-publish (the old nextSeq protocol) lets two racing
  *     deltas pick the SAME generation; the publish lock serializes the
  *     swaps but cannot know the stagings differ, so the second swap
  *     retires the first's generation to `_trash` — a silent lost update;
  *   - the old compaction deleted every `seq>0` directory it saw AT
  *     DELETE TIME, so a generation appended while the fold ran was
  *     dropped (the previously documented single-compactor caveat).
  */
class ConcurrentLogSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  private def seqDirs(path: String): Seq[String] =
    Option(new java.io.File(path).listFiles).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith("seq=")).toSeq.sorted

  private def claimFiles(path: String): Seq[String] =
    Option(new java.io.File(path, "_claims").listFiles).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith("seq=")).toSeq.sorted

  test("claimSeq: one claimant per number under contention") {
    val path = s"${tmp("graft_occ")}/t"
    val n = 8
    val barrier = new java.util.concurrent.CyclicBarrier(n)
    val got = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Int]())
    val threads = (1 to n).map { _ =>
      new Thread(() => {
        barrier.await()
        got.add(MergeSink.claimSeq(spark, path))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val seqs = got.toArray(new Array[Integer](0)).map(_.toInt).toSeq
    assert(seqs.size == n && seqs.distinct.size == n,
      s"claim collision: $seqs")
    // Every claim left its marker (nothing published yet).
    assert(claimFiles(path).size == n, s"claims on disk: ${claimFiles(path)}")
  }

  test("racing appenders: both generations survive, distinct seqs, claims released") {
    import spark.implicits._
    val path = s"${tmp("graft_occ2")}/t"
    val base = (1L to 8L).map(k => (k, s"base$k"))
      .toDF("k", "v").withColumn("bucket", pmod(col("k"), lit(4)).cast("int"))
    MergeSink.publishLogSeq(base, path, 0, 2, Seq("bucket", "k"))
    def payload(tag: String) = (1L to 4L).map(k => (100L + k, s"$tag$k"))
      .toDF("k", "v").withColumn("bucket", pmod(col("k"), lit(4)).cast("int"))
    val dfA = payload("a"); val dfB = payload("b")
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    var err: Option[Throwable] = None
    def appender(df: org.apache.spark.sql.DataFrame) = new Thread(() => {
      try { barrier.await(); MergeSink.appendLogSeq(df, path, 1, Seq("bucket", "k")) }
      catch { case t: Throwable => err = Some(t) }
    })
    val (ta, tb) = (appender(dfA), appender(dfB))
    ta.start(); tb.start(); ta.join(); tb.join()
    err.foreach(throw _)
    // The lost-update shape: under list-then-publish both writers pick
    // seq=1 and one payload vanishes. With claims: three generations,
    // EVERY row of both payloads present.
    assert(seqDirs(path) == Seq("seq=0", "seq=1", "seq=2"),
      s"generations: ${seqDirs(path)}")
    val vs = spark.read.parquet(path).select("v")
      .collect().map(_.getString(0)).toSet
    (1 to 4).foreach { k =>
      assert(vs.contains(s"a$k") && vs.contains(s"b$k"),
        s"lost update: a$k/b$k missing from $vs")
    }
    assert(claimFiles(path).isEmpty,
      s"successful publishes must release their claims: ${claimFiles(path)}")
  }

  test("compactKeyLog: a generation appended during the fold survives and wins its keys") {
    import spark.implicits._
    val path = s"${tmp("graft_occ3")}/t"
    def gen(rows: Seq[(Long, String)]) = rows
      .toDF("k", "v").withColumn("bucket", pmod(col("k"), lit(4)).cast("int"))
    MergeSink.publishLogSeq(gen((1L to 4L).map(k => (k, s"base$k"))), path, 0, 2,
      Seq("bucket", "k"))
    MergeSink.appendLogSeq(gen(Seq(2L -> "g1")), path, 1, Seq("bucket", "k"))
    // The seam fires after the fold is pinned and published, before the
    // folded generations are retired — exactly where a concurrent delta
    // lands in the worst case for the old listing-at-delete-time code.
    MergeSink.compactKeyLog(spark, path, Seq("k"), 2, Seq("bucket", "k"),
      onAfterPin = () =>
        MergeSink.appendLogSeq(gen(Seq(2L -> "hook2", 9L -> "hook9")), path, 1,
          Seq("bucket", "k")))
    val view = MergeSink.resolveKeyLog(spark, path, Seq("k"))
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = Set(1L -> "base1", 3L -> "base3", 4L -> "base4", // fold
      2L -> "hook2", 9L -> "hook9")                             // concurrent delta
    assert(view == want, s"resolved view after concurrent append: $view")
    // The fold retired ONLY the generations it listed; the concurrent
    // generation's directory is still on disk for the next fold.
    val dirs = seqDirs(path)
    assert(dirs.size == 2 && dirs.head == "seq=0", s"generations: $dirs")
  }

  test("compactLog: same pinning for the row-log variant") {
    import spark.implicits._
    val path = s"${tmp("graft_occ4")}/t"
    def day(n: Int, rows: Seq[(Long, String)]) = rows
      .toDF("k", "state").withColumn("seq", lit(n))
    day(0, (1L to 3L).map(k => (k, "base")))
      .write.partitionBy("seq").mode("append").parquet(path)
    day(1, Seq(2L -> "revoked"))
      .write.partitionBy("seq").mode("append").parquet(path)
    MergeSink.compactLog(spark, path, Seq("k"), "seq",
      onAfterPin = () => day(7, Seq(3L -> "hooked"))
        .write.partitionBy("seq").mode("append").parquet(path))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("seq").desc)
    val resolved = spark.read.parquet(path)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).select("k", "state")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(resolved == Set(1L -> "base", 2L -> "revoked", 3L -> "hooked"),
      s"resolved after concurrent day append: $resolved")
    assert(seqDirs(path).contains("seq=7"),
      s"concurrent day dropped by the fold: ${seqDirs(path)}")
  }

  test("stale orphan claims are swept by compaction; fresh ones are kept") {
    import spark.implicits._
    val path = s"${tmp("graft_occ5")}/t"
    val base = (1L to 4L).map(k => (k, s"v$k"))
      .toDF("k", "v").withColumn("bucket", pmod(col("k"), lit(4)).cast("int"))
    MergeSink.publishLogSeq(base, path, 0, 1, Seq("bucket", "k"))
    val fresh = MergeSink.claimSeq(spark, path)  // a live writer, mid-flight
    val stale = MergeSink.claimSeq(spark, path)  // a writer that crashed long ago
    val staleFile = new java.io.File(s"$path/_claims/seq=$stale")
    assert(staleFile.setLastModified(
      System.currentTimeMillis() - MergeSink.ClaimStaleMs - 60000L))
    MergeSink.compactKeyLog(spark, path, Seq("k"), 1, Seq("bucket", "k"))
    val left = claimFiles(path)
    assert(left == Seq(s"seq=$fresh"),
      s"claim GC wrong (fresh=$fresh stale=$stale): $left")
  }
}
