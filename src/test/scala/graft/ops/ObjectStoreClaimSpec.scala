package graft.ops

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Contract test for the claim protocol on OBJECT-STORE semantics, via a
  * fake [[ClaimStore]] that models exactly what a bucket gives you:
  *
  *   - conditional create (PUT If-None-Match) — atomic PER KEY (here:
  *     `ConcurrentHashMap.newKeySet().add`, the same linearizable
  *     contract);
  *   - NO directories (mkdirs is a no-op), NO atomic rename;
  *   - LIST that lags writes arbitrarily: `listMarkers` serves a
  *     SNAPSHOT that only advances when the test calls `settle()` —
  *     the worst case (never settled) makes every claimant start its
  *     walk from the published max and discover contention only through
  *     conditional-put failures;
  *   - `retainOnPublish = true`: markers survive the publish and are
  *     reclaimed only by compaction's folded-generation GC.
  */
class ObjectStoreClaimSpec extends SparkSpec {

  private final class FakeObjectStore extends ClaimStore {
    val keys: java.util.Set[String] =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    @volatile private var snapshot: Set[String] = Set.empty
    def createExclusive(p: Path): Boolean = keys.add(p.toString)
    def delete(p: Path): Unit = { keys.remove(p.toString); () }
    def listMarkers(dir: Path): Seq[String] = {
      val prefix = dir.toString + "/"
      snapshot.filter(_.startsWith(prefix))
        .map(_.stripPrefix(prefix)).toSeq
    }
    def mkdirs(dir: Path): Unit = ()
    def retainOnPublish: Boolean = true
    def settle(): Unit = {
      snapshot = { import scala.jdk.CollectionConverters._; keys.asScala.toSet }
    }
    def markerNames: Set[String] = {
      import scala.jdk.CollectionConverters._
      keys.asScala.map(_.split('/').last).toSet
    }
  }

  /** The fuzz variant: `listMarkers` serves an ARBITRARY stale view per
    * call — each live marker is independently visible with probability
    * 3/4, and a deleted marker may linger visible (list-after-delete
    * staleness) with probability 1/4 — driven by a SEEDED rng, so every
    * failing schedule replays. Safety must never rest on the list:
    * `createExclusive` stays linearizable per key, exactly the S3/GCS
    * conditional-put contract.
    */
  private final class FuzzObjectStore(rnd: scala.util.Random) extends ClaimStore {
    val keys: java.util.Set[String] =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    private val ghosts: java.util.Set[String] =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    def createExclusive(p: Path): Boolean = keys.add(p.toString)
    def delete(p: Path): Unit = {
      if (keys.remove(p.toString) && rnd.nextBoolean()) ghosts.add(p.toString)
      ()
    }
    def listMarkers(dir: Path): Seq[String] = {
      import scala.jdk.CollectionConverters._
      val prefix = dir.toString + "/"
      val live = keys.asScala.toSeq.sorted.filter(_ => rnd.nextInt(4) > 0)
      val stale = ghosts.asScala.toSeq.sorted.filter(_ => rnd.nextInt(4) == 0)
      (live ++ stale).filter(_.startsWith(prefix)).map(_.stripPrefix(prefix))
    }
    def mkdirs(dir: Path): Unit = ()
    def retainOnPublish: Boolean = true
    def markerNames: Set[String] = {
      import scala.jdk.CollectionConverters._
      keys.asScala.map(_.split('/').last).toSet
    }
  }

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("eight contenders on the fake store: one claimant per number even with a never-settling list") {
    val path = s"${tmp("graft_os1")}/t"
    val store = new FakeObjectStore // list NEVER settles: worst-case lag
    val n = 8
    val barrier = new java.util.concurrent.CyclicBarrier(n)
    val got = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Int]())
    val threads = (1 to n).map { _ =>
      new Thread(() => {
        barrier.await()
        got.add(MergeSink.claimSeq(spark, path, store = Some(store)))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val seqs = got.toArray(new Array[Integer](0)).map(_.toInt).toSeq
    assert(seqs.size == n && seqs.distinct.size == n,
      s"claim collision on the fake object store: $seqs")
    assert(store.markerNames == seqs.map(s => s"seq=$s").toSet)
    // A second wave AFTER the list settles starts past the first wave's
    // numbers instead of walking through them.
    store.settle()
    val next = MergeSink.claimSeq(spark, path, store = Some(store))
    assert(next == seqs.max + 1, s"settled-list claim picked $next")
  }

  test("publish RETAINS the marker, so a lag-blinded contender can never re-claim a published number") {
    import spark.implicits._
    val path = s"${tmp("graft_os2")}/t"
    val store = new FakeObjectStore
    val df = (1L to 4L).map(k => (k, s"v$k"))
      .toDF("k", "v").withColumn("bucket", pmod(col("k"), lit(2)).cast("int"))
    MergeSink.publishLogSeq(df, path, 0, 1, Seq("bucket", "k"))
    val gen = MergeSink.appendLogSeq(df, path, 1, Seq("bucket", "k"),
      store = Some(store))
    // retainOnPublish: the marker survives the publish...
    assert(store.markerNames == Set(s"seq=$gen"),
      s"marker released on a lagging-list store: ${store.markerNames}")
    // ...so the exact re-claim a lagging list would attempt (contender
    // sees neither the marker nor the generation, walks up from the
    // base) hits the conditional put and LOSES:
    assert(!store.createExclusive(
      new Path(s"$path/_claims", s"seq=$gen")),
      "a published generation's number was re-claimable")
    // Racing appenders still get distinct generations with markers kept.
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val gens = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Int]())
    val ts = (1 to 2).map { _ =>
      new Thread(() => {
        barrier.await()
        gens.add(MergeSink.appendLogSeq(df, path, 1, Seq("bucket", "k"),
          store = Some(store)))
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    val gs = gens.toArray(new Array[Integer](0)).map(_.toInt).toSeq
    assert(gs.distinct.size == 2, s"generation collision: $gs")
    assert(store.markerNames == (gs :+ gen).map(s => s"seq=$s").toSet)
  }

  test("fuzz: 1200 randomized list-lag schedules — claims stay collision-free, published numbers unreachable") {
    // Store-level fuzz of the claim WALK (no Spark publishes, so 1200
    // schedules run in seconds): under arbitrary per-call list staleness
    // the walk must terminate, never hand two claimants one number, and
    // never hand anyone a number whose marker is retained (= published
    // on a lagging-list store).
    for (seed <- 0 until 1200) {
      val rnd = new scala.util.Random(seed)
      val store = new FuzzObjectStore(rnd)
      val path = s"${tmp(s"graft_osf")}/t"
      // Pre-existing state: a random set of retained markers (published
      // generations + crashed claimants) and a few deleted ones whose
      // ghosts may still pollute listings.
      val retained = (1 to 8).filter(_ => rnd.nextBoolean())
      retained.foreach(n => store.createExclusive(
        new Path(s"$path/_claims", s"seq=$n")))
      (9 to 11).filter(_ => rnd.nextBoolean()).foreach { n =>
        val p = new Path(s"$path/_claims", s"seq=$n")
        store.createExclusive(p); store.delete(p)
      }
      val got = (1 to 3).map(_ =>
        MergeSink.claimSeq(spark, path, store = Some(store)))
      assert(got.distinct.size == 3, s"seed=$seed: duplicate claims $got")
      got.foreach { s =>
        assert(!retained.contains(s),
          s"seed=$seed: re-claimed a retained (published) number $s")
        assert(store.markerNames.contains(s"seq=$s"),
          s"seed=$seed: claim $s left no marker")
      }
    }
  }

  test("fuzz: randomized lag through real append + compact cycles keeps retention and the resolved view exact") {
    import spark.implicits._
    for (seed <- 0 until 6) {
      val rnd = new scala.util.Random(1000 + seed)
      val store = new FuzzObjectStore(rnd)
      val path = s"${tmp(s"graft_osg")}/t"
      def df(tag: String) = (1L to 4L).map(k => (k, s"$tag$k"))
        .toDF("k", "v").withColumn("bucket", pmod(col("k"), lit(2)).cast("int"))
      MergeSink.publishLogSeq(df("base"), path, 0, 1, Seq("bucket", "k"))
      val gens = (0 until 2 + rnd.nextInt(2)).map(i =>
        i -> MergeSink.appendLogSeq(df(s"d$i"), path, 1, Seq("bucket", "k"),
          store = Some(store)))
      // Distinct generations; every published one keeps its marker
      // (retainOnPublish) no matter what the lagging list showed.
      assert(gens.map(_._2).distinct.size == gens.size, s"seed=$seed: $gens")
      assert(store.markerNames == gens.map(g => s"seq=${g._2}").toSet,
        s"seed=$seed: markers ${store.markerNames} != ${gens.map(_._2)}")
      gens.foreach { case (_, g) =>
        assert(!store.createExclusive(new Path(s"$path/_claims", s"seq=$g")),
          s"seed=$seed: published generation $g re-claimable")
      }
      MergeSink.compactKeyLog(spark, path, Seq("k"), 1, Seq("bucket", "k"),
        store = Some(store))
      assert(store.markerNames.isEmpty,
        s"seed=$seed: compaction left markers ${store.markerNames}")
      val last = s"d${gens.last._1}"
      val v = MergeSink.resolveKeyLog(spark, path, Seq("k"))
        .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(v == (1L to 4L).map(k => k -> s"$last$k").toMap, s"seed=$seed: $v")
    }
  }

  test("compaction's folded-generation GC is what reclaims retained markers") {
    import spark.implicits._
    val path = s"${tmp("graft_os3")}/t"
    val store = new FakeObjectStore
    def df(tag: String) = (1L to 4L).map(k => (k, s"$tag$k"))
      .toDF("k", "v").withColumn("bucket", pmod(col("k"), lit(2)).cast("int"))
    MergeSink.publishLogSeq(df("base"), path, 0, 1, Seq("bucket", "k"))
    val g1 = MergeSink.appendLogSeq(df("a"), path, 1, Seq("bucket", "k"),
      store = Some(store))
    val g2 = MergeSink.appendLogSeq(df("b"), path, 1, Seq("bucket", "k"),
      store = Some(store))
    assert(store.markerNames == Set(s"seq=$g1", s"seq=$g2"))
    MergeSink.compactKeyLog(spark, path, Seq("k"), 1, Seq("bucket", "k"),
      store = Some(store))
    assert(store.markerNames.isEmpty,
      s"compaction left retained markers: ${store.markerNames}")
    // The fold's resolved view survived the GC: last writer per key.
    val v = MergeSink.resolveKeyLog(spark, path, Seq("k"))
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v == (1L to 4L).map(k => k -> s"b$k").toMap, v)
  }
}
