package graft.ops

/** Per-process temp directories for operators that materialize local state
  * (the embedded Derby db, bucketed external-table data): unique per JVM
  * pid so concurrent sbt sessions never contend, and removed by a shutdown
  * hook so a long-lived box doesn't accumulate one directory per
  * Verify/Bench run. Call from a `lazy val` — each call registers one
  * shutdown hook.
  */
object ProcessTmp {
  def dir(prefix: String): String = {
    val path = java.nio.file.Path.of(
      sys.props("java.io.tmpdir"), s"${prefix}_${ProcessHandle.current().pid()}")
    sys.addShutdownHook {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles).foreach(_.foreach(rm)); p.delete(); ()
      }
      rm(path.toFile)
    }
    path.toString
  }
}
