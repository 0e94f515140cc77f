package graft.ops

import graft.SparkSpec

/** The artifact-layout catalog: corpus-scaled bucket sizing and the
  * persisted meta table every stored index's update path reads back.
  */
class ArtifactMetaSpec extends SparkSpec {

  test("bucketsFor holds a fixed target bucket size between the floor and ceiling") {
    import ArtifactMeta._
    // floor: tiny corpora keep the pre-round-10 fixed layout
    assert(bucketsFor(0) == MinBuckets)
    assert(bucketsFor(500) == MinBuckets)
    assert(bucketsFor(MinBuckets * DocsPerBucket) == MinBuckets)
    // growth: smallest power of two at <= target rows per bucket
    assert(bucketsFor(MinBuckets * DocsPerBucket + 1) == MinBuckets * 2)
    assert(bucketsFor(5000) == 16)    // the sf0.1 corpus
    assert(bucketsFor(100000) == 256) // the rehearsal-sweep ceiling
    // every non-capped answer really holds the target
    for (rows <- Seq(1000L, 12345L, 99999L, 500000L)) {
      val b = bucketsFor(rows)
      assert(rows <= b.toLong * DocsPerBucket, s"rows=$rows buckets=$b over target")
      assert(b == MinBuckets || rows > (b / 2).toLong * DocsPerBucket,
        s"rows=$rows buckets=$b not minimal")
    }
    // ceiling: directory count stops growing past MaxBuckets
    assert(bucketsFor(Long.MaxValue / 2) == MaxBuckets)
  }

  test("meta round-trips, sibling writers publish independently, missing keys fail loud") {
    val root = graft.ops.ProcessTmp.dir("graft_meta_spec") + "/r1"
    ArtifactMeta.write(spark, root, Map("buckets.banded" -> 32L, "buckets.sets" -> 32L))
    // a sibling builder under the same root (the platform build's labels
    // entry) must not clobber the dedup builder's entries
    ArtifactMeta.write(spark, root, Map("buckets.labels" -> 64L))
    assert(ArtifactMeta.readBuckets(spark, root, "banded") == 32)
    assert(ArtifactMeta.readBuckets(spark, root, "sets") == 32)
    assert(ArtifactMeta.readBuckets(spark, root, "labels") == 64)
    intercept[Exception] { ArtifactMeta.readLong(spark, root, "beam_ef") }
    intercept[IllegalStateException] {
      ArtifactMeta.readLong(spark, root + "_absent", "buckets.banded")
    }
  }
}
