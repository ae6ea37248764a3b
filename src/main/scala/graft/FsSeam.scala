package graft

/** Test seam for the maintenance protocols' own filesystem mutations.
  *
  * [[graft.operators.Similarity.ivfCompact]]/[[graft.operators.Similarity
  * .ivfCompactRecover]]/[[graft.operators.Similarity.migrateLegacyTrash]]
  * and [[graft.streaming.IndexIngest]]'s sync/marker maintenance acquire
  * their Hadoop `FileSystem` through [[fs]] instead of
  * `Path.getFileSystem` directly. In production [[wrap]] is `identity`
  * and this is exactly the old call. `CrashMatrixSpec` (VERDICT r12
  * item 4) installs a kill-at-the-Nth-mutation `FilterFileSystem` here
  * and mechanically enumerates EVERY rename/create/delete/mkdirs boundary
  * of the protocols — the hand-enumerated crash interleavings kept
  * missing cases (r11 found duplication, r12's first fix would have lost
  * data on a crash-mid-restore re-crash; both were found by review, not
  * by a spec).
  *
  * Scope: only the protocols' DRIVER-SIDE mutations route through the
  * seam. Spark's internal job writes (the staging parquet jobs) resolve
  * their own FileSystem and are governed by Spark's commit protocol; the
  * matrix treats a kill during staging as "crash before any live
  * mutation", which the protocols already model (staging is
  * reader-invisible and recovery deletes it).
  */
object FsSeam {
  private val identityWrap:
      org.apache.hadoop.fs.FileSystem => org.apache.hadoop.fs.FileSystem =
    identity

  /** PROCESS-GLOBAL mutable state (r13 ADVICE): an installed wrapper sees
    * every FileSystem this JVM's graft protocols resolve, across suites.
    * Installers MUST scope their own behavior by path (CrashMatrixSpec's
    * KillingFs only ticks under its `graft_cm_` directories) so a wrapped
    * FileSystem is a pass-through for everyone else — sbt's forked test JVM
    * runs suites sequentially today, but the seam must not depend on it. */
  @volatile private[graft] var wrap:
      org.apache.hadoop.fs.FileSystem => org.apache.hadoop.fs.FileSystem =
    identityWrap

  /** True while a crash-injection wrapper is installed. Protocols with an
    * ATOMIC fast path the seam cannot see (java.nio hard links in the
    * ingest sync) switch to their seam-visible portable path under
    * instrumentation, so the crash matrix enumerates and kills the
    * TEARABLE variant — the atomic link is strictly safer than what the
    * matrix proves convergent. */
  private[graft] def instrumented: Boolean = wrap ne identityWrap

  private[graft] def fs(p: org.apache.hadoop.fs.Path,
      conf: org.apache.hadoop.conf.Configuration):
      org.apache.hadoop.fs.FileSystem =
    wrap(p.getFileSystem(conf))
}
