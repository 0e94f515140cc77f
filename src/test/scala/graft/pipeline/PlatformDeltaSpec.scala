package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The incremental platform build's consistency contract: the delta over
  * the stored day-1 artifacts must reproduce EXACTLY what a full rebuild
  * under the frozen day-1 models (BPE merges + DSIR llr) produces —
  * survivor set, component labels and token counts — while packing as an
  * APPEND (chunk ids continue the stored stream; revoked day-1 rows keep
  * their chunk range as a tombstoned hole).
  */
class PlatformDeltaSpec extends SparkSpec {

  private lazy val root = graft.ops.ProcessTmp.dir("graft_delta_spec")

  test("delta over stored artifacts == full rebuild under frozen day-1 models") {
    val day1Root = s"$root/day1"
    val delta = Pipelines.platformDeltaAt(spark, sfDir, day1Root)
      .collect()
    // The delta's artifact maintenance must not have touched the frozen
    // models: the full-frozen rebuild below reads them from day1Root.
    val full = Pipelines.platformBuildCore(spark, sfDir, s"$root/full",
        lit(true), frozenFrom = Some(day1Root))
      .select("doc_id", "component", "toks")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val live = delta.filter(_.getAs[String]("state") != "revoked")
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("component"), r.getAs[Long]("toks")))).toMap
    assert(live == full,
      s"live delta rows != frozen full rebuild: " +
        s"only-delta=${(live.keySet -- full.keySet).toSeq.sorted.take(5)} " +
        s"only-full=${(full.keySet -- live.keySet).toSeq.sorted.take(5)} " +
        s"diff=${live.collect { case (k, v) if full.get(k).exists(_ != v) => k }.take(5)}")
    // State sanity: appended rows are batch docs, base/revoked are day-1
    // docs; a revoked row points at the smaller-id component that
    // displaced it, a base row is its own component.
    delta.foreach { r =>
      val (id, comp, st) = (r.getAs[Long]("doc_id"),
        r.getAs[Long]("component"), r.getAs[String]("state"))
      st match {
        case "appended" => assert(id % 10 == 1 && comp == id, s"appended $id")
        case "base"     => assert(id % 10 != 1 && comp == id, s"base $id")
        case "revoked"  => assert(id % 10 != 1 && comp < id, s"revoked $id -> $comp")
        case other      => fail(s"unknown state $other")
      }
    }
    // Append continuity: day-1 rows keep their stored packing (they pack
    // the day-1 stream from 0); the appended segment starts exactly at
    // the day-1 token total and packs contiguously (lang-major,
    // doc_id-minor) after it.
    val day1Rows = delta.filter(_.getAs[String]("state") != "appended")
    val day1Total = day1Rows.map(_.getAs[Long]("toks")).sum
    val appended = delta.filter(_.getAs[String]("state") == "appended")
      .sortBy(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id")))
    var cum = day1Total
    appended.foreach { r =>
      assert(r.getAs[Long]("cum_before") == cum,
        s"append discontinuity at doc ${r.getAs[Long]("doc_id")}: " +
          s"${r.getAs[Long]("cum_before")} != $cum")
      cum += r.getAs[Long]("toks")
    }
    // And the day-1 segment itself is contiguous from 0 in the same
    // order (the stored manifest's packing, untouched by the delta).
    var cumBase = 0L
    day1Rows.sortBy(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id")))
      .foreach { r =>
        assert(r.getAs[Long]("cum_before") == cumBase,
          s"day-1 discontinuity at doc ${r.getAs[Long]("doc_id")}")
        cumBase += r.getAs[Long]("toks")
      }
    // The refreshed stats artifact carries the post-delta total.
    val stored = spark.read.parquet(s"$day1Root/stats")
      .select("total_toks").head().getLong(0)
    assert(stored == cum, s"stats artifact $stored != appended end $cum")
  }
}
