package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}

/** The marker-namespace primitive the multi-writer claim protocol
  * ([[MergeSink.claimSeq]] / [[MergeSink.appendLogSeq]] / compaction GC)
  * rests on, factored per backend because each backend's TRUE atomic is
  * different:
  *
  *   - POSIX local FS: `O_CREAT|O_EXCL` (`java.io.File.createNewFile`) —
  *     Hadoop's `RawLocalFileSystem.create(overwrite=false)` is
  *     check-then-create and loses races (measured by
  *     `ConcurrentLogSpec`'s barrier test);
  *   - HDFS: `create(overwrite=false)` — atomic in the NameNode;
  *   - object stores: CONDITIONAL PUT (`PUT If-None-Match: *` on S3/GCS,
  *     `If-None-Match` on ABFS) — atomic PER KEY, but the namespace has
  *     no directories, no atomic rename, and LIST may lag recent writes.
  *
  * The protocol is written so only `createExclusive` carries safety:
  * `listMarkers` is ADVISORY (it picks the starting number for the claim
  * walk; a lagging list just costs extra conditional-put retries, each
  * of which is per-key strongly consistent). The one rule that changes
  * per backend is `retainOnPublish`: on a store whose list can lag,
  * releasing the marker of a just-published generation opens a window
  * where a contender that sees neither the marker (deleted — per-key
  * reads are strong) nor the generation directory (list lag) re-claims
  * the number and overwrites the publish. Such stores RETAIN markers at
  * publish; compaction GCs them once the fold has absorbed their
  * generations (the marker for a folded generation is dead by
  * construction on every backend — its publish completed).
  *
  * `ObjectStoreClaimSpec` runs the barrier races against a fake store
  * with exactly these semantics (conditional create, no directories,
  * arbitrarily lagging list, no rename).
  */
private[graft] trait ClaimStore {

  /** Create a marker at `p` iff absent, ATOMICALLY; true iff THIS caller
    * created it. The only operation whose correctness the claim
    * protocol's safety depends on.
    */
  def createExclusive(p: Path): Boolean

  /** Best-effort delete of one marker (never a range — other writers'
    * outstanding claims share the directory).
    */
  def delete(p: Path): Unit

  /** Marker NAMES under `dir`. Advisory only: may lag recent writes on
    * eventually-consistent listings.
    */
  def listMarkers(dir: Path): Seq[String]

  /** Prepare the marker namespace (no-op on stores without directories). */
  def mkdirs(dir: Path): Unit

  /** Whether claim markers must be RETAINED at publish time instead of
    * released — true for backends whose LIST can lag writes (see the
    * class doc for the re-claim window this closes).
    */
  def retainOnPublish: Boolean
}

/** The POSIX/HDFS backend: listing is strongly consistent, so markers
  * are released as soon as their generation is published.
  */
private[graft] final class HadoopClaimStore(fs: FileSystem) extends ClaimStore {
  def createExclusive(p: Path): Boolean = MergeSink.hadoopCreateExclusive(fs, p)
  def delete(p: Path): Unit =
    try { fs.delete(p, false); () }
    catch { case _: java.io.IOException => () }
  def listMarkers(dir: Path): Seq[String] =
    if (!fs.exists(dir)) Nil else fs.listStatus(dir).map(_.getPath.getName).toSeq
  def mkdirs(dir: Path): Unit = { fs.mkdirs(dir); () }
  def retainOnPublish: Boolean = false
}
