package graft

/** Test seam for the maintenance protocols' own filesystem mutations.
  *
  * [[graft.operators.Similarity.ivfCompact]]/[[graft.operators.Similarity
  * .ivfCompactRecover]]/[[graft.operators.Similarity.migrateLegacyTrash]]
  * and [[graft.streaming.IndexIngest]]'s sync/marker maintenance acquire
  * their Hadoop `FileSystem` through [[fs]] instead of
  * `Path.getFileSystem` directly. In production nothing is installed and
  * this is exactly the old call. `CrashMatrixSpec` (VERDICT r12 item 4)
  * installs a kill-at-the-Nth-mutation `FilterFileSystem` here and
  * mechanically enumerates EVERY rename/create/delete/mkdirs boundary of
  * the protocols — the hand-enumerated crash interleavings kept missing
  * cases (r11 found duplication, r12's first fix would have lost data on
  * a crash-mid-restore re-crash; both were found by review, not by a
  * spec).
  *
  * Scope: only the protocols' DRIVER-SIDE mutations route through the
  * seam. Spark's internal job writes (the staging parquet jobs) resolve
  * their own FileSystem and are governed by Spark's commit protocol; the
  * matrix treats a kill during staging as "crash before any live
  * mutation", which the protocols already model (staging is
  * reader-invisible and recovery deletes it).
  *
  * PATH-SCOPED installation (r14 verdict item 6, completing the r13
  * ADVICE): an installed wrapper only ever sees FileSystems resolved for
  * paths carrying the installer's `pathMarker` — protocols operating
  * anywhere else get the raw FileSystem, untouched. The seam therefore
  * cannot leak injected crashes across concurrently running suites even
  * if forked-test parallelism is enabled; installers additionally scope
  * their wrapper's own behavior by path (belt and braces —
  * CrashMatrixSpec's KillingFs also checks its `graft_cm_` marker).
  */
object FsSeam {

  @volatile private var installed:
      Option[(String,
        org.apache.hadoop.fs.FileSystem => org.apache.hadoop.fs.FileSystem)] =
    None

  /** Install `wrap`, applied ONLY to paths whose string form contains
    * `pathMarker` (a directory-name marker the installing test owns).
    * One installation at a time — tests restore with [[uninstall]]. */
  private[graft] def install(pathMarker: String,
      wrap: org.apache.hadoop.fs.FileSystem => org.apache.hadoop.fs.FileSystem): Unit = {
    require(pathMarker.nonEmpty, "pathMarker must be non-empty")
    installed = Some((pathMarker, wrap))
  }

  private[graft] def uninstall(): Unit = installed = None

  /** True while a crash-injection wrapper is installed FOR `p`'s scope.
    * Protocols with an ATOMIC fast path the seam cannot see (java.nio
    * hard links in the ingest sync) switch to their seam-visible portable
    * path under instrumentation, so the crash matrix enumerates and kills
    * the TEARABLE variant — the atomic link is strictly safer than what
    * the matrix proves convergent. */
  private[graft] def instrumented(p: org.apache.hadoop.fs.Path): Boolean =
    installed.exists { case (marker, _) => p.toString.contains(marker) }

  private[graft] def fs(p: org.apache.hadoop.fs.Path,
      conf: org.apache.hadoop.conf.Configuration):
      org.apache.hadoop.fs.FileSystem = {
    val raw = p.getFileSystem(conf)
    installed match {
      case Some((marker, wrap)) if p.toString.contains(marker) => wrap(raw)
      case _ => raw
    }
  }
}
