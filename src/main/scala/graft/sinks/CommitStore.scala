package graft.sinks

import java.nio.file.{Files, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** The commit primitive behind [[SnapshotLake]]: an atomic *conditional PUT*
  * (publish-iff-absent) plus list/get/delete over a directory of small
  * metadata objects (manifests).
  *
  * This is the exact capability contract a table format needs from its
  * storage: S3 conditional PUT (`If-None-Match: *`), GCS `x-goog-if-
  * generation-match: 0`, Azure `If-None-Match: *`, HDFS `create(..,
  * overwrite=false)` all satisfy `putIfAbsent` natively. The lake's commit
  * protocol (see [[SnapshotLake]]) is written against THIS interface only,
  * so porting to object storage means implementing these four methods over
  * the store's HTTP API — no change to the protocol.
  *
  * Two local backends are provided, both passing the same concurrent-commit
  * specs (`SnapshotLakeSpec`):
  *  - [[PosixLinkCommitStore]] — `link(2)` as the arbiter; the fast path on
  *    any POSIX filesystem.
  *  - [[LeaseLockCommitStore]] — mutual exclusion via atomic `mkdir` leases
  *    with expiry + fencing, modeling a store with NO atomic
  *    create-exclusive on objects (the pre-conditional-PUT object-store
  *    world, where Delta on S3 used a DynamoDB lock table in exactly this
  *    shape).
  */
trait CommitStore {

  /** Atomically publish `body` under `dir/name` iff no object exists there.
    * Returns false (and publishes nothing) when the name is taken. This is
    * the single linearization point of a snapshot commit.
    */
  def putIfAbsent(dir: Path, name: String, body: String): Boolean

  /** Read a published object's content. */
  def get(dir: Path, name: String): String = Files.readString(dir.resolve(name))

  /** Names of published objects in `dir` (no order guarantee). Internal
    * lock/lease artifacts (dot-prefixed) are never listed.
    */
  def list(dir: Path): Seq[String] = {
    if (!Files.exists(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filterNot(_.startsWith(".")).toSeq
      finally s.close()
    }
  }

  /** Remove a published object (used by vacuum/retention only — never by
    * the commit path; commits are append-only).
    */
  def delete(dir: Path, name: String): Unit =
    Files.deleteIfExists(dir.resolve(name))

  /** Atomically REPLACE `dir/name` with `body`: a reader sees the old
    * object or the new one, never a torn mix — and never a MISSING object,
    * which is what a delete-then-putIfAbsent sequence exposes in its crash
    * window. For DERIVED state only (checkpoint sidecars rebuilt under the
    * single-maintenance-writer contract); the commit slot's arbiter stays
    * [[putIfAbsent]]. Default: tmp write + rename(2) (ATOMIC_MOVE replaces
    * an existing target on POSIX); object-store backends map this to their
    * atomic whole-object PUT-overwrite.
    */
  def replace(dir: Path, name: String, body: String): Unit = {
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".$name.${java.util.UUID.randomUUID}.tmp")
    Files.writeString(tmp, body)
    // REPLACE_EXISTING alongside ATOMIC_MOVE: POSIX rename(2) replaces
    // regardless, but the existing-target case under ATOMIC_MOVE alone
    // is implementation-specific per the Files.move contract — spelling
    // it out keeps the promised overwrite semantics on any provider
    Files.move(tmp, dir.resolve(name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }
}

/** `link(2)`-arbitered conditional PUT: write the full body to a hidden tmp
  * file, then hard-link it onto the target name. `link` FAILS if the target
  * exists — unlike `rename(2)`, which silently REPLACES on POSIX (an
  * exists()-then-move sequence is a TOCTOU race where both contenders "win"
  * and one commit vanishes). Correct on any POSIX local FS; NOT portable to
  * object storage (no link op) — that is what [[LeaseLockCommitStore]] and
  * the real conditional-PUT backends are for.
  */
object PosixLinkCommitStore extends CommitStore {
  override def putIfAbsent(dir: Path, name: String, body: String): Boolean = {
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".$name.${java.util.UUID.randomUUID}.tmp")
    Files.writeString(tmp, body)
    try {
      Files.createLink(dir.resolve(name), tmp)
      Files.delete(tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp); false
    }
  }
}

/** Lease-lock emulation of conditional PUT for stores without an atomic
  * create-exclusive object op. Per-name mutual exclusion:
  *
  *  1. ACQUIRE: atomically `mkdir dir/.lock-<name>` (mkdir is the one
  *     create-exclusive primitive nearly every store has) and record a
  *     lease `<holderId> <expiryMs>` inside it.
  *  2. Under the lease: if the target exists → lose (false); else stage the
  *     body to a tmp object.
  *  3. FENCE: re-read the lease. A holder paused past its expiry may have
  *     been evicted by a stealer (step 4) — if the lease no longer names
  *     this holder, abort without publishing (the zombie-writer guard).
  *  4. STEAL: an acquirer finding an EXPIRED lease evicts it by atomically
  *     renaming the lock dir to a unique tombstone — rename-on-dir is the
  *     arbiter, so exactly one stealer wins; the tombstone is then deleted.
  *
  * The fence (3) shrinks the zombie window; the final publish then closes
  * it entirely where the FS has any exclusive-create primitive (hard link
  * here; conditional PUT on a real object store) — a zombie past its lease
  * simply loses the link race, so the lease carries liveness/throughput,
  * not safety. Only on link-less filesystems does the fallback REPLACE-move
  * run, and there a detected mid-publish lease loss is surfaced as an error
  * rather than a silent lost commit (correctness of that path alone rests
  * on TTL > worst-case pause, Chubby/ZooKeeper-style). A holder that
  * crashes before writing its lease is recovered by age: a lease missing
  * for longer than the TTL is treated as expired, so the name cannot wedge.
  * `leaseMs` defaults to 60 s — orders of magnitude above any manifest
  * write.
  */
final class LeaseLockCommitStore(leaseMs: Long = 60000L,
    acquireTimeoutMs: Long = 120000L,
    // Test seams for the link-less fallback path, which is unreachable on a
    // POSIX filesystem (createLink succeeds): `linklessForTest` models a
    // store with no exclusive-create primitive; `pauseBeforeFallbackMove`
    // injects the worst-case GC/IO pause between the fence and the publish
    // move, the window the clobber detection below exists for.
    private[graft] val linklessForTest: Boolean = false,
    private[graft] val pauseBeforeFallbackMove: () => Unit = () => ())
    extends CommitStore {

  private def deleteTree(p: Path): Unit = {
    if (Files.exists(p)) {
      val w = Files.walk(p)
      try w.sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.deleteIfExists(q))
      finally w.close()
    }
  }

  override def putIfAbsent(dir: Path, name: String, body: String): Boolean = {
    Files.createDirectories(dir)
    val lock = dir.resolve(s".lock-$name")
    val leaseFile = lock.resolve("lease")
    val me = java.util.UUID.randomUUID.toString
    val deadline = System.currentTimeMillis() + acquireTimeoutMs
    var held = false
    while (!held) {
      try {
        Files.createDirectory(lock) // atomic create-exclusive
        Files.writeString(leaseFile,
          s"$me ${System.currentTimeMillis() + leaseMs}")
        held = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          // Held by someone. Expired → steal via atomic dir rename (one
          // winner); live → brief backoff and retry.
          val expired =
            try Files.readString(leaseFile).split(' ')(1).toLong <
              System.currentTimeMillis()
            catch {
              case _: Exception =>
                // Lease unreadable: either mid-create (live) or the holder
                // crashed between mkdir and the lease write — which would
                // otherwise wedge this name FOREVER ("live" on every pass).
                // Disambiguate by age: a lock dir whose lease has been
                // missing longer than the full TTL cannot be mid-create
                // (that window is milliseconds), so treat it as expired.
                try Files.getLastModifiedTime(lock).toMillis + leaseMs <
                  System.currentTimeMillis()
                catch { case _: Exception => false } // dir gone: retry loop
            }
          if (expired) {
            val tomb = dir.resolve(s".dead-$name-${java.util.UUID.randomUUID}")
            try { Files.move(lock, tomb); deleteTree(tomb) }
            catch { case _: Exception => () } // lost the steal race — fine
          } else Thread.sleep(5)
          if (System.currentTimeMillis() > deadline)
            throw new IllegalStateException(
              s"commit lock for $name not acquirable within ${acquireTimeoutMs}ms")
      }
    }
    try {
      if (Files.exists(dir.resolve(name))) false
      else {
        val tmp = dir.resolve(s".$name.$me.tmp")
        Files.writeString(tmp, body)
        // FENCE: only publish if the lease still names this holder — a
        // stealer replacing the lock dir invalidates a paused writer here.
        val mine =
          try Files.readString(leaseFile).startsWith(me)
          catch { case _: Exception => false }
        if (mine) publish(tmp, dir.resolve(name), leaseFile, me, body)
        else { Files.deleteIfExists(tmp); false }
      }
    } finally {
      // Release only if still the holder — never free a stealer's lock.
      val stillMine =
        try Files.readString(leaseFile).startsWith(me)
        catch { case _: Exception => false }
      if (stillMine) deleteTree(lock)
    }
  }

  /** Final publish of the staged body. Preferred path is create-exclusive
    * (`link(2)`): even a writer paused PAST its lease cannot overwrite a
    * stealer's already-published manifest — the link fails and the zombie
    * returns false, so the lease is needed only for liveness/throughput,
    * never for safety. This removes the classic fence-to-publish window
    * entirely where the store has any exclusive-create primitive (every
    * real object store's conditional PUT qualifies).
    *
    * Fallback (link-less filesystems only): ATOMIC_MOVE — which REPLACES an
    * existing target — bracketed by clobber checks, since a writer paused
    * past its lease between the fence and the move can land ON TOP of a
    * stealer's already-published manifest:
    *
    *  1. PRE-MOVE EXISTS CHECK: a target that appeared since the
    *     under-lease absence check means someone else published — return
    *     false without moving (the pause-past-lease interleaving loses
    *     cleanly instead of clobbering).
    *  2. POST-MOVE LEASE + CONTENT RE-CHECK: after the move, the lease must
    *     still name this holder AND the target must hold exactly the staged
    *     body. Either failing means a racer interleaved inside the
    *     check-to-move window — surfaced as an error rather than a silent
    *     lost commit.
    *
    * The un-detectable residue shrinks to a racer landing between the
    * post-move re-read and return; TTL must exceed worst-case GC/IO pause
    * for that path (Chubby-style), exactly as documented on the class.
    */
  private def publish(tmp: Path, target: Path, leaseFile: Path,
      holder: String, body: String): Boolean =
    try {
      if (linklessForTest)
        throw new UnsupportedOperationException("modeled link-less store")
      Files.createLink(target, tmp)
      Files.delete(tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp); false
      case _: UnsupportedOperationException =>
        pauseBeforeFallbackMove()
        if (Files.exists(target)) { // someone published during our pause
          Files.deleteIfExists(tmp)
          false
        } else {
          Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
          val stillMine =
            try Files.readString(leaseFile).startsWith(holder)
            catch { case _: Exception => false }
          val contentMine =
            try Files.readString(target) == body
            catch { case _: Exception => false }
          if (!stillMine || !contentMine) throw new IllegalStateException(
            s"lease or content check failed after publish of $target — " +
              "possible clobber of a concurrent writer's manifest; " +
              "manual inspection required")
          true
        }
    }
}
