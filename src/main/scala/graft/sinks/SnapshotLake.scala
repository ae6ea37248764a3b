package graft.sinks

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, hex, hll_sketch_agg, hll_sketch_estimate, hll_union_agg, input_file_name, lit, max, min, not, unhex}

/** Manifest-based snapshot versioning for a plain-parquet lake table — the
  * format-agnostic core of what a table format (Delta/Iceberg) provides:
  * atomic commits, snapshot-isolated reads, time travel, optimistic
  * concurrency. The Delta path proper is availability-gated
  * ([[LakeWriter.deltaAvailable]]); this gives the append-mode lake an ACID
  * story with no extra jars.
  *
  * Layout:
  * {{{
  *   <table>/data/<commit-uuid>/part-*.parquet   immutable data files
  *   <table>/_manifests/v00000000017.json        file list of snapshot 17
  * }}}
  *
  * Commit protocol: stage data files (invisible to readers — readers only
  * open files listed in a manifest), then publish the manifest with one
  * conditional PUT ([[CommitStore.putIfAbsent]] — the only atomic primitive
  * the protocol needs). Version allocation is optimistic: losing a race to
  * vN means retry at vN+1 — nothing is overwritten, latest-wins is never
  * violated, and a crashed writer leaves only unreferenced files that
  * [[vacuum]] reclaims. Readers pin a manifest once and are isolated from
  * every later commit.
  *
  * Storage portability: every manifest operation goes through a
  * [[CommitStore]]; the default is the POSIX `link(2)` backend, and the
  * same protocol runs unchanged over [[LeaseLockCommitStore]] (or, on real
  * object storage, a conditional-PUT-backed impl — S3 `If-None-Match: *`).
  * Data files need only plain write + list + delete, which every store has.
  *
  * Scale: the manifest holds file PATHS (one line per file, not per row);
  * at 100 TB the file count is what matters — keep file sizes at the
  * row-group sweet spot ([[LakeWriter.compact]]) so manifests stay in the
  * thousands of entries.
  */
object SnapshotLake {

  /** JVM-wide count of lost OCC races (a commit attempt whose manifest CAS
    * failed and re-listed to retry at the new head). Telemetry only — the
    * commit loop's correctness never depends on it; the 50-way concurrent
    * commit throughput probe reads it to attribute contention
    * (VERDICT r10 item 6). */
  private[graft] val casRetries = new java.util.concurrent.atomic.AtomicLong(0L)

  private def manifestDir(table: String): Path = Paths.get(table, "_manifests")
  private def manifestName(v: Long): String = f"v$v%011d.json"
  // self-contained checkpoint sidecar: the full (path, rows) entry list of
  // one version — chain-cut target for delta-manifest resolution (r15)
  private def checkpointName(v: Long): String = f"c$v%011d.json"
  private def statsName(v: Long): String = f"s$v%011d.json"
  private def ndvName(v: Long, suffix: String = ""): String =
    f"n$v%011d$suffix.json"
  // commit-written bloom sidecar; buildBloomIndex appends a suffixed name so
  // a later index build never collides with (or needs to mutate) an existing
  // sidecar — readers union every published bloom sidecar at-or-before v
  private def bloomName(v: Long, suffix: String = ""): String =
    f"b$v%011d$suffix.json"

  /** Committed versions, ascending; empty for a nonexistent table. */
  def versions(table: String, store: CommitStore = PosixLinkCommitStore): Seq[Long] =
    store.list(manifestDir(table))
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.substring(1, n.length - 5).toLong).sorted

  // ─────────────────── manifest format v2 (r15) ───────────────────
  //
  // Two on-disk manifest forms share the `v<version>.json` CAS slot:
  //
  //  FULL (the legacy form, still written for small tables and every
  //  overwrite/compact/restore — self-contained):
  //    {"version":7,"ts":…,"dedup":"…","cols":[…],"n":3,"files":[
  //    "data/u/p.parquet\t120",
  //    …
  //    ]}
  //
  //  DELTA (appends/rewrites once the base holds ≥ DeltaManifestThreshold
  //  files — O(changed files) bytes per commit instead of O(table files),
  //  the Iceberg manifest-list indirection reduced to this store's
  //  line-oriented format):
  //    {"version":7,…,"base":6,"depth":3,"n":102400,"removes":[
  //    "data/u/old.parquet"
  //    ],"adds":[
  //    "data/u/new.parquet\t120"
  //    ]}
  //
  // Entries optionally carry the file's ROW COUNT after a tab (written at
  // commit time from the freshly staged footers), making [[countRows]]
  // O(manifest) instead of an O(files) footer walk. Every `depth %
  // ManifestCheckpointEvery == 0` commit also publishes an ADVISORY
  // self-contained checkpoint sidecar `c<version>.json`; resolution
  // prefers a checkpoint, else folds the delta chain down to the nearest
  // full/checkpointed node (bounded by the cadence). [[vacuum]] publishes
  // MANDATORY chain-cut checkpoints before dropping manifests a retained
  // chain passes through. Legacy cumulative manifests parse as FULL form
  // with no row counts — both formats stay readable forever.

  /** Base file count above which append/rewrite commits switch from the
    * self-contained FULL manifest to the DELTA form. Below it the full
    * form costs microseconds and keeps every small table's history
    * self-contained (robust to out-of-band manifest deletion); above it
    * the cumulative form's O(V·F̄) total bytes is the measured
    * metadata-scale killer (METADATA_SCALE.json r14: 1.5 GB at 10⁵ files
    * × 10³ versions). */
  private[graft] val DeltaManifestThreshold = 512

  /** Delta-chain length at which a commit publishes a checkpoint sidecar —
    * bounds resolution at O(ManifestCheckpointEvery) small reads plus one
    * O(F) checkpoint read. */
  private[graft] val ManifestCheckpointEvery = 64

  private def cleanLine(l: String): String =
    l.trim.stripPrefix("\"").stripSuffix("\"").stripSuffix("\",")

  /** Entry line codec: `path` or `path\trows` inside the JSON string (the
    * stats sidecars' raw-tab convention). */
  private def fmtEntry(e: (String, Option[Long])): String =
    e._2.fold(e._1)(r => e._1 + "\t" + r)

  private def parseEntryLine(l: String): (String, Option[Long]) = {
    val t = l.indexOf('\t')
    if (t < 0) (l, None)
    else (l.substring(0, t),
      scala.util.Try(l.substring(t + 1).trim.toLong).toOption)
  }

  private def parseFullBody(txt: String): Seq[(String, Option[Long])] =
    txt.linesIterator.drop(1).map(cleanLine).filter(_.nonEmpty)
      .filterNot(_ == "]}").map(parseEntryLine).toSeq

  private val DeltaSectionBreak = "],\"adds\":["

  private def parseDeltaBody(
      txt: String): (Seq[String], Seq[(String, Option[Long])]) = {
    val removes = Seq.newBuilder[String]
    val adds = Seq.newBuilder[(String, Option[Long])]
    var inAdds = false
    txt.linesIterator.drop(1).foreach { raw =>
      if (raw.trim == DeltaSectionBreak) inAdds = true
      else {
        val c = cleanLine(raw)
        if (c.nonEmpty && c != "]}") {
          if (inAdds) adds += parseEntryLine(c)
          else removes += c
        }
      }
    }
    (removes.result(), adds.result())
  }

  private def headerLineOf(table: String, v: Long, store: CommitStore): String =
    store.get(manifestDir(table), manifestName(v)).linesIterator.next()

  private def headerLong(header: String, key: String): Option[Long] =
    ("\"" + key + "\":(\\d+)").r.findFirstMatchIn(header)
      .map(_.group(1).toLong)

  /** Delta-form discriminator. `"files":[` is checked FIRST: a
    * caller-supplied dedup key may contain a literal `"base":N`, and the
    * full form always ends its header with the files marker, so the order
    * makes the decision immune to header-embedded strings. */
  private def headerBase(header: String): Option[Long] =
    if (header.contains("\"files\":[")) None else headerLong(header, "base")

  private def colsFromHeader(header: String): Option[Seq[String]] =
    """"cols":\[([^\]]*)\]""".r.findFirstMatchIn(header)
      .map(_.group(1).split(",").toSeq.filter(_.nonEmpty)
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")))

  /** Resolve version `v`'s full (path, rowCount) entry list: prefer the
    * self-contained checkpoint sidecar, else fold the delta chain down to
    * the nearest full/checkpointed node. `cache`/`publishedNames` let
    * multi-version callers (vacuum's live-set union) share work across
    * versions — resolution then costs O(total deltas), not O(V · chain).
    */
  private[graft] def manifestEntries(table: String, v: Long,
      store: CommitStore,
      cache: scala.collection.mutable.Map[Long, Seq[(String, Option[Long])]] = null,
      publishedNames: Set[String] = null): Seq[(String, Option[Long])] = {
    if (cache != null && cache.contains(v)) return cache(v)
    val names =
      if (publishedNames != null) publishedNames
      else store.list(manifestDir(table)).toSet
    var deltas = List.empty[(Seq[String], Seq[(String, Option[Long])])]
    var cur = v
    var base: Seq[(String, Option[Long])] = null
    while (base == null) {
      if (cache != null && cache.contains(cur)) base = cache(cur)
      else if (names.contains(checkpointName(cur)))
        base = parseFullBody(
          store.get(manifestDir(table), checkpointName(cur)))
      else {
        val txt =
          try store.get(manifestDir(table), manifestName(cur))
          catch {
            case e: Exception if cur != v => throw new IllegalStateException(
              s"manifest chain of $table v$v is broken at v$cur (manifest " +
                "missing — deleted out of band? vacuum publishes chain-cut " +
                "checkpoints before dropping manifests); restore the " +
                "missing manifest or rebuild the table", e)
          }
        headerBase(txt.linesIterator.next()) match {
          case Some(b) => deltas ::= parseDeltaBody(txt); cur = b
          case None => base = parseFullBody(txt)
        }
      }
    }
    var acc = base
    deltas.foreach { case (removes, adds) =>
      if (removes.nonEmpty) {
        val rm = removes.toSet
        acc = acc.filterNot(e => rm(e._1))
      }
      acc = acc ++ adds
    }
    if (cache != null) cache.update(v, acc)
    acc
  }

  private def readManifest(table: String, v: Long,
      store: CommitStore): Seq[String] =
    manifestEntries(table, v, store).map(_._1)

  private def headerPrefix(v: Long, dedup: Option[String],
      cols: Option[Seq[String]]): String = {
    val dk = dedup.map(k => s""""dedup":"$k",""").getOrElse("")
    // Committed union-schema column NAMES, recorded on the header line when
    // the writer knows them (r13 ADVICE): rewrite paths that must not open
    // refuted — possibly corrupt — footers (merge with zero candidates) read
    // the target column set HERE, an O(1) metadata read, instead of donating
    // it from one arbitrary footer (which silently dropped evolved columns).
    // Names with JSON-meta characters are not recorded (reader falls back);
    // absent on legacy manifests.
    val cs = cols.filter(_.forall(c => !c.contains('"') && !c.contains('\\')))
      .map(_.map("\"" + _ + "\"").mkString(""""cols":[""", ",", "],"))
      .getOrElse("")
    // wall-clock commit time enables AS OF TIMESTAMP reads; version order
    // stays the source of truth (clock skew cannot reorder history)
    val ts = s""""ts":${System.currentTimeMillis()},"""
    s"""{"version":$v,$ts$dk$cs"""
  }

  private def writeFullManifestAtomic(table: String, v: Long,
      entries: Seq[(String, Option[Long])], store: CommitStore,
      dedup: Option[String] = None,
      cols: Option[Seq[String]] = None): Boolean = {
    val body = entries.map(e => "\"" + fmtEntry(e) + "\"")
      .mkString(headerPrefix(v, dedup, cols) +
        s""""n":${entries.size},"files":[""" + "\n", ",\n", "\n]}")
    store.putIfAbsent(manifestDir(table), manifestName(v), body)
  }

  private def writeDeltaManifestAtomic(table: String, v: Long, base: Long,
      depth: Long, n: Long, removes: Seq[String],
      adds: Seq[(String, Option[Long])], store: CommitStore,
      dedup: Option[String], cols: Option[Seq[String]]): Boolean = {
    val sb = new StringBuilder
    sb ++= headerPrefix(v, dedup, cols)
    sb ++= s""""base":$base,"depth":$depth,"n":$n,"removes":["""
    sb += '\n'
    if (removes.nonEmpty) {
      sb ++= removes.map("\"" + _ + "\"").mkString(",\n"); sb += '\n'
    }
    sb ++= DeltaSectionBreak
    sb += '\n'
    if (adds.nonEmpty) {
      sb ++= adds.map(e => "\"" + fmtEntry(e) + "\"").mkString(",\n")
      sb += '\n'
    }
    sb ++= "]}"
    store.putIfAbsent(manifestDir(table), manifestName(v), sb.toString)
  }

  private def checkpointBody(v: Long,
      entries: Seq[(String, Option[Long])]): String =
    entries.map(e => "\"" + fmtEntry(e) + "\"")
      .mkString(s"""{"checkpoint":$v,"n":${entries.size},"files":[""" +
        "\n", ",\n", "\n]}")

  /** Publish (idempotently — the slot is a conditional PUT) version `v`'s
    * self-contained checkpoint sidecar. */
  private def publishCheckpoint(table: String, v: Long, store: CommitStore,
      entries: Seq[(String, Option[Long])]): Boolean =
    store.putIfAbsent(manifestDir(table), checkpointName(v),
      checkpointBody(v, entries))

  /** Cadence checkpoint after a won commit — ADVISORY (the commit is
    * durable; a failure here only lengthens later chain walks, bounded by
    * vacuum's mandatory chain-cut). */
  private def maybeCheckpoint(table: String, v: Long,
      store: CommitStore): Unit =
    try {
      val d = headerLong(headerLineOf(table, v, store), "depth").getOrElse(0L)
      if (d > 0 && d % ManifestCheckpointEvery == 0)
        publishCheckpoint(table, v, store, manifestEntries(table, v, store))
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[lake] advisory checkpoint publish failed for " +
        s"$table v$v (commit IS durable; chain walks stay longer): $e")
    }

  /** The manifest-publication CAS loop shared by the staged commit path
    * and the pre-staged (driver-side micro-stage) path: allocates the next
    * version optimistically, re-basing on each lost race; appends extend
    * the base as a DELTA once the base is large ([[DeltaManifestThreshold]]),
    * else stay FULL; overwrites are always FULL. Returns the committed
    * version and `true`, or — for a race lost to a concurrent attempt of
    * the SAME dedup key — the winner's version and `false` (the caller's
    * staged files are orphaned; it must not publish sidecars for them).
    */
  private def publishManifest(table: String, append: Boolean,
      store: CommitStore, dedup: Option[String], baseVersion: Option[Long],
      entries: Seq[(String, Option[Long])],
      dataCols: Seq[String]): (Long, Boolean) = {
    var done = false
    var v = -1L
    while (!done) {
      if (v >= 0) casRetries.incrementAndGet() // a lost race, retrying
      val prev = versions(table, store)
      v = if (prev.isEmpty) 0L else prev.max + 1
      // `baseVersion` pins the append base to a specific snapshot (the
      // branch-head shape WAP needs) instead of the global latest; it stays
      // fixed across OCC retries — append-relative-to-a-pinned-snapshot,
      // Iceberg's serializable-from-snapshot isolation.
      val baseV = baseVersion.getOrElse(if (prev.isEmpty) -1L else prev.max)
      if (!append || prev.isEmpty)
        done = writeFullManifestAtomic(table, v, entries, store, dedup,
          Some(dataCols))
      else {
        val h = headerLineOf(table, baseV, store)
        // Union-schema names: an append extends the base's recorded set. A
        // legacy base with no recorded set stays unrecorded — writing just
        // the data columns would UNDERSTATE the union and poison readers.
        val cols = colsFromHeader(h)
          .map(pc => pc ++ dataCols.filterNot(pc.toSet))
        lazy val baseEntries = manifestEntries(table, baseV, store)
        val baseN = headerLong(h, "n").getOrElse(baseEntries.size.toLong)
        done =
          if (baseN < DeltaManifestThreshold)
            writeFullManifestAtomic(table, v, baseEntries ++ entries, store,
              dedup, cols)
          else
            writeDeltaManifestAtomic(table, v, baseV,
              headerLong(h, "depth").getOrElse(0L) + 1,
              baseN + entries.size, Nil, entries, store, dedup, cols)
      }
      // losing the version race to a concurrent attempt of the SAME dedup
      // key (two zombie retries) must converge on its version, not publish
      // the data twice under v+1
      if (!done && dedup.isDefined) {
        dedupVersion(table, dedup.get, store).foreach { winner =>
          return (winner, false) // staged files orphaned; vacuum reclaims
        }
      }
    }
    maybeCheckpoint(table, v, store)
    (v, true)
  }

  /** Rewrite-of-`base` publication at exactly `base + 1` (the compaction /
    * COW / MERGE single-slot CAS — no internal retry): full vs delta form
    * by base size, like [[publishManifest]]. `removes` must be ⊆ the
    * base's paths. */
  private def writeRewriteManifestAtomic(table: String, base: Long,
      baseEntries: Seq[(String, Option[Long])], removes: Set[String],
      adds: Seq[(String, Option[Long])], store: CommitStore,
      dedup: Option[String], cols: Option[Seq[String]]): Boolean = {
    val ok =
      if (baseEntries.size < DeltaManifestThreshold)
        writeFullManifestAtomic(table, base + 1,
          baseEntries.filterNot(e => removes(e._1)) ++ adds, store, dedup,
          cols)
      else
        writeDeltaManifestAtomic(table, base + 1, base,
          headerLong(headerLineOf(table, base, store), "depth")
            .getOrElse(0L) + 1,
          baseEntries.size.toLong - removes.size + adds.size,
          removes.toSeq.sorted, adds, store, dedup, cols)
    if (ok) maybeCheckpoint(table, base + 1, store)
    ok
  }

  /** Row-count entries for freshly staged files, read from the parquet
    * footers the write just produced (page-cache-hot; bounded-parallel).
    * A file whose footer can't be read records no count — [[countRows]]
    * falls back to walking just that file. */
  private def stagedEntries(spark: SparkSession, table: String,
      staged: Seq[String]): Seq[(String, Option[Long])] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    parFiles(staged) { f =>
      f -> (try {
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(s"$table/$f"), conf))
        try Some(reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum)
        finally reader.close()
      } catch { case scala.util.control.NonFatal(_) => None })
    }
  }

  /** Column NAMES of the union schema committed at version `v`, when the
    * committing writer recorded them (absent on legacy manifests and when a
    * column name contains JSON-meta characters). Header-line metadata only —
    * no footer is opened, so this is safe even when every data file of the
    * snapshot is refuted-and-corrupt. */
  def manifestCols(table: String, v: Long,
      store: CommitStore = PosixLinkCommitStore): Option[Seq[String]] =
    colsFromHeader(headerLineOf(table, v, store))

  /** The version already carrying `dedupKey`, newest-first scan (early exit
    * on hit; retried batches are usually the LAST commit). The idempotency
    * index for [[commitAppendIdempotent]]. At 100 TB-scale manifest counts,
    * the newest manifest would carry a per-writer high-water map instead of
    * scanning (batch ids are monotonic per stream) — the scan here keeps the
    * manifest format single-purpose and is O(retained versions) small reads.
    */
  def dedupVersion(table: String, dedupKey: String,
      store: CommitStore = PosixLinkCommitStore): Option[Long] =
    versions(table, store).reverseIterator.find { v =>
      store.get(manifestDir(table), manifestName(v))
        .linesIterator.next().contains(s""""dedup":"$dedupKey"""")
    }

  /** The dedup/idempotency tag recorded on version `v`'s manifest, if
    * any — public so delta-driven maintainers
    * ([[graft.operators.IncrementalAgg]]) can recover their own high-water
    * mark from the commit they wrote, with no extra state store. */
  def commitTag(table: String, v: Long,
      store: CommitStore = PosixLinkCommitStore): Option[String] =
    """"dedup":"([^"]*)"""".r
      .findFirstMatchIn(store.get(manifestDir(table), manifestName(v))
        .linesIterator.next())
      .map(_.group(1))

  /** Version `v`'s data files as table-relative paths — the public face of
    * the manifest for integrations that resolve their own scan (the
    * [[graft.sources.SnapshotLakeSource]] DataSource V2 connector). */
  def manifestFiles(table: String, v: Long,
      store: CommitStore = PosixLinkCommitStore): Seq[String] = {
    val vs = versions(table, store)
    require(vs.contains(v), s"version $v not in committed set $vs at $table")
    readManifest(table, v, store)
  }

  /** Wall-clock commit time of version `v` (absent only on manifests
    * written before timestamps were recorded). */
  def commitTimestamp(table: String, v: Long,
      store: CommitStore = PosixLinkCommitStore): Option[Long] =
    """"ts":(\d+)""".r
      .findFirstMatchIn(store.get(manifestDir(table), manifestName(v))
        .linesIterator.next())
      .map(_.group(1).toLong)

  /** AS OF TIMESTAMP read: the newest version committed at or before
    * `tsMillis`. Version order is authoritative — the scan takes the max
    * version whose recorded time qualifies, so a skewed clock on one
    * writer can hide that one commit from timestamp addressing but can
    * never resurrect an overwritten snapshot out of order. */
  def readAsOf(spark: SparkSession, table: String, tsMillis: Long,
      store: CommitStore = PosixLinkCommitStore): DataFrame =
    read(spark, table, Some(versionAt(table, tsMillis, store)), store)

  /** AS OF TIMESTAMP resolution: the newest version committed at or before
    * `tsMillis` — shared by [[readAsOf]] and the DataSource V2 connector
    * so the two cannot drift. */
  def versionAt(table: String, tsMillis: Long,
      store: CommitStore = PosixLinkCommitStore): Long = {
    val vs = versions(table, store)
    require(vs.nonEmpty, s"no committed snapshots at $table")
    val ok = vs.filter(commitTimestamp(table, _, store).exists(_ <= tsMillis))
    require(ok.nonEmpty,
      s"no snapshot at $table committed at or before ts=$tsMillis " +
        s"(earliest: ${vs.headOption.flatMap(commitTimestamp(table, _, store))})")
    ok.max
  }

  /** RESTORE TABLE TO VERSION: re-publish `toVersion`'s exact file list as
    * a NEW commit at head — the rollback that keeps history append-only
    * (the bad commits stay readable for forensics; nothing is deleted, so
    * a concurrent reader never loses its snapshot). Data files are
    * immutable and carried by reference: restore is an O(manifest)
    * metadata operation, no data is copied at any scale. Same CAS
    * contract as every other commit. */
  def restore(table: String, toVersion: Long,
      store: CommitStore = PosixLinkCommitStore,
      expectedBase: Option[Long] = None): Option[Long] = {
    val vs = versions(table, store)
    require(vs.contains(toVersion),
      s"version $toVersion not in committed set $vs at $table")
    val base = expectedBase.getOrElse(vs.max)
    require(vs.contains(base), s"version $base not in committed set $vs")
    // always FULL form: a restore's file set is an OLD version's — writing
    // it self-contained keeps the restored head independent of the
    // restored-from chain (vacuum may drop toVersion's manifest later)
    if (writeFullManifestAtomic(table, base + 1,
      manifestEntries(table, toVersion, store), store,
      Some(s"restore-of-v$toVersion"),
      manifestCols(table, toVersion, store))) Some(base + 1)
    else None
  }

  /** Stage `df` as immutable data files; returns their table-relative
    * paths. With `partitionCols` the staged layout is Hive-partitioned on
    * them (the columns are DIRECTORY metadata only — they are removed from
    * file contents, so callers duplicating a data column into a partition
    * alias keep the data schema unchanged): the cell-aligned commit shape
    * [[graft.streaming.IndexIngest]] uses so its layout sync can publish
    * committed files by copy instead of a second Spark re-stage job
    * (VERDICT r13 item 2). */
  private def stage(df: DataFrame, table: String,
      partitionCols: Seq[String] = Nil,
      clusteredByPartitionCols: Boolean = false): Seq[String] = {
    val commitId = java.util.UUID.randomUUID.toString
    val dataDir = Paths.get(table, "data", commitId)
    // committer algorithm v2 (task-side renames, no sequential driver-side
    // job-commit merge): v2's partial-output visibility hazard does not
    // apply here BY CONSTRUCTION — the staging dir is a private UUID and
    // readers resolve files through the manifest, which is only CAS-
    // published after the write returns. Matters for wide dynamic-
    // partition stages (the cell-aligned ingest commit writes one dir per
    // touched cell; v1 renamed each sequentially on the driver).
    val w = df.write
    if (partitionCols.isEmpty) w.parquet(dataDir.toString)
    else {
      // Concurrent output writers for the dynamic-partition stage (r15,
      // ingest p50 residual): the sort-based fallback writer pays a full
      // local sort plus a serial per-directory writer switch inside every
      // task — measured 2.3 s vs 0.8 s on the 10× ingest micro-batch.
      // With a concurrent-writer budget, each task keeps up to N open
      // writers and streams rows as they come (no sort, no exchange
      // needed to align tasks with directories); Spark falls back to
      // sorting only the overflow if a task ever exceeds the budget, so
      // wide production layouts degrade gracefully instead of OOMing.
      // Session-scoped conf, ref-counted (NOT a plain save/restore): the
      // single-writer protocol is per TABLE, so two commits to different
      // tables may stage concurrently on one session — a naive restore
      // could strip the conf mid-write of the other commit, or leak the
      // writer budget into user queries permanently. Every staged write
      // wants the same value, so first-in saves the user's setting and
      // last-out restores it.
      //
      // GATED BY REGIME (r15 ADVICE): the 512-writer budget is only safe
      // when the caller has clustered the frame by the partition columns
      // (each task then touches ~1 directory and holds ~1 open writer —
      // the ingest micro-batch overflow shape, which repartitions by cell
      // before committing). On a generic staged commit whose input is NOT
      // clustered, a task can legitimately see hundreds of distinct
      // partition values, and 512 open parquet writers × row-group buffers
      // per task is an executor-OOM hazard at the 100 TB shape — those
      // commits keep Spark's default sort-based fallback writer (one
      // writer per task, spillable sort), the pre-r15 behavior.
      if (clusteredByPartitionCols) {
        ConcurrentWritersConf.enter(df.sparkSession)
        try w.partitionBy(partitionCols: _*).parquet(dataDir.toString)
        finally ConcurrentWritersConf.exit(df.sparkSession)
      } else w.partitionBy(partitionCols: _*).parquet(dataDir.toString)
    }
    val s = Files.walk(dataDir)
    try s.iterator().asScala
      .filter(_.toString.endsWith(".parquet"))
      .map(p => Paths.get(table).relativize(p).toString.replace('\\', '/'))
      .toSeq.sorted
    finally s.close()
  }

  /** Ref-counted flip of `spark.sql.maxConcurrentOutputFileWriters` for
    * the dynamic-partition staged writes, keyed per session: first
    * enter saves the session's own setting and applies the writer
    * budget; the matching last exit restores it. Correct under
    * concurrent staged commits to different tables on one session,
    * where a plain save/restore pair races (one commit's finally
    * could unset the conf while the other's write is mid-flight, or
    * re-save the budget value as "the user's setting" and leak it). */
  private object ConcurrentWritersConf {
    private val key = "spark.sql.maxConcurrentOutputFileWriters"
    private val states =
      scala.collection.mutable.Map.empty[SparkSession, (Int, Option[String])]
    def enter(spark: SparkSession): Unit = synchronized {
      states.get(spark) match {
        case Some((d, saved)) => states(spark) = (d + 1, saved)
        case None =>
          states(spark) = (1, spark.conf.getOption(key))
          spark.conf.set(key, "512")
      }
    }
    def exit(spark: SparkSession): Unit = synchronized {
      states.get(spark) match {
        case Some((1, saved)) =>
          states.remove(spark)
          saved match {
            case Some(p) => spark.conf.set(key, p)
            case None => spark.conf.unset(key)
          }
        case Some((d, saved)) => states(spark) = (d - 1, saved)
        case None => () // unbalanced exit — nothing to restore
      }
    }
  }

  /** Append commit: new snapshot = previous file list + staged files.
    * `statsCols` (numeric columns) additionally records per-file min/max in
    * a stats sidecar for [[readRange]] file skipping; `bloomCols` (any
    * equality-comparable columns) records per-file bloom filters for
    * point-lookup skipping ([[pruneByBlooms]]). */
  def commitAppend(df: DataFrame, table: String,
      store: CommitStore = PosixLinkCommitStore,
      statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil,
      ndvCols: Seq[String] = Nil): Long =
    commit(df, table, append = true, store, statsCols = statsCols,
      bloomCols = bloomCols, ndvCols = ndvCols)

  /** Overwrite commit: new snapshot = staged files only (logical replace —
    * old versions stay readable). */
  def commitOverwrite(df: DataFrame, table: String,
      store: CommitStore = PosixLinkCommitStore,
      statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil,
      ndvCols: Seq[String] = Nil): Long =
    commit(df, table, append = false, store, statsCols = statsCols,
      bloomCols = bloomCols, ndvCols = ndvCols)

  /** Idempotent append: commits `df` at most once per `dedupKey`, returning
    * the (new or previously committed) version. The exactly-once primitive
    * for streaming sinks: Structured Streaming's foreachBatch re-runs a
    * micro-batch after a crash/restart with the SAME batchId — keying the
    * commit on it turns at-least-once re-delivery into exactly-once lake
    * contents (Delta's `txnAppId`/`txnVersion` contract). A retry that finds
    * its key already published stages nothing and commits nothing; a crash
    * AFTER publish but before the checkpoint advances leaves only this
    * no-op. Keys must be `"`-free (they are embedded in the manifest
    * header).
    */
  def commitAppendIdempotent(df: DataFrame, table: String, dedupKey: String,
      store: CommitStore = PosixLinkCommitStore,
      statsCols: Seq[String] = Nil,
      stagePartitionCols: Seq[String] = Nil,
      stageClusteredByPartitionCols: Boolean = false): Long = {
    require(!dedupKey.contains('"'), "dedupKey must not contain quotes")
    dedupVersion(table, dedupKey, store)
      .getOrElse(commit(df, table, append = true, store, Some(dedupKey),
        statsCols, stagePartitionCols = stagePartitionCols,
        stageClusteredByPartitionCols = stageClusteredByPartitionCols))
  }

  /** Idempotent overwrite — [[commitAppendIdempotent]]'s replace-mode twin,
    * for sinks that maintain a DERIVED table per micro-batch (e.g. a
    * stream-maintained SCD2 dimension): replaying batch N converges on its
    * already-committed version instead of double-applying.
    */
  def commitOverwriteIdempotent(df: DataFrame, table: String, dedupKey: String,
      store: CommitStore = PosixLinkCommitStore): Long = {
    require(!dedupKey.contains('"'), "dedupKey must not contain quotes")
    dedupVersion(table, dedupKey, store)
      .getOrElse(commit(df, table, append = false, store, Some(dedupKey)))
  }

  /** Idempotent append of files the CALLER already staged (the r15
    * driver-side micro-stage fast path — [[stageDriverSide]]): same CAS
    * loop, same dedup-key exactly-once contract as
    * [[commitAppendIdempotent]], no sidecars. `entries` are table-relative
    * (path, rowCount) pairs under `data/`; `dataCols` is the staged files'
    * data schema (for the manifest's recorded union). */
  private[graft] def commitPrestagedIdempotent(table: String,
      dedupKey: String, entries: Seq[(String, Option[Long])],
      dataCols: Seq[String],
      store: CommitStore = PosixLinkCommitStore,
      dedupPrechecked: Boolean = false): Long = {
    require(!dedupKey.contains('"'), "dedupKey must not contain quotes")
    // `dedupPrechecked`: the caller has ALREADY established the key's
    // absence by a cheaper scheme (the ingest's monotonic-batchId bounded
    // scan) — skip the O(versions) full header scan here; the CAS loop's
    // lost-race convergence check still consults dedupVersion, so a
    // zombie retry racing this commit converges exactly as before.
    val hit =
      if (dedupPrechecked) None else dedupVersion(table, dedupKey, store)
    hit.getOrElse(
      publishManifest(table, append = true, store, Some(dedupKey), None,
        entries, dataCols)._1)
  }

  /** DRIVER-SIDE micro-stage (r15): write a COLLECTED, bounded row set as
    * per-partition-directory parquet files directly under a fresh private
    * staging UUID — Spark's own write support, no job, no committer. The
    * distributed staged write pays a measured ~0.8-2.3 s of fixed cost per
    * micro-batch (task scheduling + a globally serialized ~9 ms per-file
    * create/close — `tools/ProfileStageWrite`), which dwarfs the data at
    * micro-batch sizes; driver-writing the same bytes costs ~1 ms per file
    * on an IO pool. Callers gate by row count
    * ([[graft.streaming.IndexIngest]] collects via a LIMIT-guarded probe
    * and falls back to the distributed path above the threshold — the
    * broadcast-threshold regime idiom, applied to writes), so memory stays
    * bounded at any corpus scale. Crash safety is the staging contract:
    * files under the UUID are reader-invisible until a manifest CAS
    * publishes them; a torn driver write is an orphan [[vacuum]] reclaims.
    * Returns (relative path, rowCount) entries ready for
    * [[commitPrestagedIdempotent]].
    */
  private[graft] def stageDriverSide(spark: SparkSession, table: String,
      schema: org.apache.spark.sql.types.StructType,
      rows: Array[org.apache.spark.sql.catalyst.InternalRow],
      partitionCols: Seq[String]): Seq[(String, Option[Long])] = {
    import org.apache.spark.sql.execution.datasources.parquet.GraftParquetDirect
    val commitId = java.util.UUID.randomUUID.toString
    GraftParquetDirect.writeGrouped(spark, schema, rows, partitionCols) {
      (rel, write) =>
        val dir = Paths.get(table, "data", commitId)
          .resolve(rel.replace('/', java.io.File.separatorChar))
        Files.createDirectories(dir)
        val n = write(new org.apache.hadoop.fs.Path(
          dir.resolve("part-00000.parquet").toString))
        (s"data/$commitId/$rel/part-00000.parquet", Some(n))
    }
  }

  private def commit(df: DataFrame, table: String, append: Boolean,
      store: CommitStore, dedup: Option[String] = None,
      statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil,
      baseVersion: Option[Long] = None, ndvCols: Seq[String] = Nil,
      stagePartitionCols: Seq[String] = Nil,
      stageClusteredByPartitionCols: Boolean = false): Long = {
    // Sidecar columns validate BEFORE anything durable happens (r13
    // review): the generation jobs run AFTER the manifest CAS, so a typo
    // raising there would read as a FAILED commit to the caller — whose
    // retry then double-appends durably-published data.
    val badSidecar = (statsCols ++ bloomCols ++ ndvCols).distinct
      .filterNot(df.columns.contains)
    require(badSidecar.isEmpty,
      s"sidecar column(s) ${badSidecar.mkString(", ")} not in the " +
        s"dataframe (columns: ${df.columns.mkString(", ")})")
    val staged =
      stage(df, table, stagePartitionCols, stageClusteredByPartitionCols)
    // Partition-alias columns are directory metadata, not file content —
    // they must not enter the recorded data schema.
    val dataCols = df.columns.filterNot(stagePartitionCols.contains).toSeq
    val (v, won) = publishManifest(table, append, store, dedup, baseVersion,
      stagedEntries(df.sparkSession, table, staged), dataCols)
    if (!won) return v // a same-key winner's version: OUR staged files are
    // orphaned — publishing sidecars describing them under the winner's
    // version would be wrong (and was never done pre-refactor)
    // Sidecars publish AFTER the manifest wins its version, so a sidecar
    // can never describe a losing writer's files under the winner's
    // version. They are ADVISORY both ways (r13 review): a crash in this
    // window leaves a snapshot that simply doesn't skip, and an EXCEPTION
    // here must not propagate either — the commit IS durable, and a
    // caller that saw it as failed would retry and double-append.
    try {
      if (statsCols.nonEmpty) {
        val lines = fileStatsLines(df.sparkSession, table, staged, statsCols)
        publishJsonSidecar(table, statsName(v),
          s"""{"stats":$v,"rows":[""", lines, store)
      }
      // NDV sidecar: per-file HLL sketches (Spark's DataSketches binary,
      // mergeable). O(files) sidecar lines answer approx-count-distinct at
      // ANY later point without a scan: union-of-sketches over file
      // subsets is exact sketch algebra (the property min/max lack).
      if (ndvCols.nonEmpty) {
        val lines = ndvSidecarLines(df.sparkSession, table, staged, ndvCols)
        publishJsonSidecar(table, ndvName(v),
          s"""{"ndv":$v,"rows":[""", lines, store)
      }
      if (bloomCols.nonEmpty) {
        val lines = bloomSidecarLines(df.sparkSession, table, staged,
          bloomCols, 8192, 5)
        publishBloomSidecar(table, bloomName(v), lines, store)
      }
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[lake] advisory sidecar publish failed for " +
        s"$table v$v (snapshot IS committed; reads just don't skip): $e")
    }
    v
  }

  /** Per-file min/max of `cols` over freshly staged files: one scan grouped
    * by input_file_name, collected driver-side (bounded by files-per-commit
    * × cols — the broadcast-build idiom, not a data-path collect). Values
    * are stored as doubles; all-null files record no entry (never pruned).
    */
  /** Per-file [min,max] sidecar lines. Fast path: parquet FOOTER metadata —
    * the stats are already in every file the write just produced, so
    * re-scanning the data to recompute them (a full read-back of the
    * commit) is pure waste; a footer read is O(files), not O(rows), which
    * is the difference between milliseconds and a second job at 100 TB
    * commit sizes. Falls back to the Spark aggregate when a column's
    * footer stats aren't plain numeric (decimal/binary logical types,
    * stats disabled by the writer).
    */
  private def fileStatsLines(spark: SparkSession, table: String,
      staged: Seq[String], cols: Seq[String]): Seq[String] =
    footerStatsLines(spark, table, staged, cols).getOrElse {
      val sdf = spark.read.parquet(staged.map(f => s"$table/$f"): _*)
      val aggs = cols.flatMap(c => Seq(
        min(col(c)).cast("double").as(s"mn_$c"),
        max(col(c)).cast("double").as(s"mx_$c")))
      val rows = sdf.groupBy(input_file_name().as("__f"))
        .agg(aggs.head, aggs.tail: _*).collect()
      rows.toSeq.flatMap { r =>
        val rel = "data/" + r.getString(0).split("/data/").last
        cols.zipWithIndex.flatMap { case (c, i) =>
          val mn = r.get(1 + 2 * i); val mx = r.get(2 + 2 * i)
          if (mn == null || mx == null) None
          else Some(s"$rel\t$c\t$mn\t$mx")
        }
      }
    }

  private def footerStatsLines(spark: SparkSession, table: String,
      staged: Seq[String], cols: Seq[String]): Option[Seq[String]] = try {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    // bounded-parallel footer reads ([[parFiles]]): commit-time cost stays
    // flat as numFiles grows; any per-file failure propagates out of the
    // pool un-wrapped and lands in the catch-all → Spark-aggregate fallback
    Some(parFiles(staged) { f =>
      val in = HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(s"$table/$f"), conf)
      val reader = ParquetFileReader.open(in)
      val (blocks, schema) = try {
        (reader.getFooter.getBlocks.asScala,
          reader.getFooter.getFileMetaData.getSchema)
      } finally reader.close()
      cols.flatMap { c =>
        // only PLAIN numeric primitives: an annotated INT64 (timestamp
        // micros, decimal) has footer stats in different UNITS than the
        // Spark-side cast-to-double the readers compare against — mispruned
        // files would silently drop rows, so anything annotated falls back
        val pt = schema.getType(Seq(c): _*).asPrimitiveType()
        if (pt.getLogicalTypeAnnotation != null)
          throw new IllegalStateException(s"annotated type for $c")
        import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
        pt.getPrimitiveTypeName match {
          case INT32 | INT64 | FLOAT | DOUBLE => ()
          case other =>
            throw new IllegalStateException(s"non-numeric $other for $c")
        }
        var mn = Double.PositiveInfinity
        var mx = Double.NegativeInfinity
        var seen = false
        blocks.foreach { b =>
          val cc = b.getColumns.asScala
            .find(_.getPath.toDotString == c)
            .getOrElse(throw new IllegalStateException(s"no footer column $c"))
          val st = cc.getStatistics
          if (st == null || st.isEmpty)
            throw new IllegalStateException(s"no footer stats for $c")
          if (st.hasNonNullValue) {
            (st.genericGetMin, st.genericGetMax) match {
              case (a: Number, b2: Number) =>
                mn = math.min(mn, a.doubleValue)
                mx = math.max(mx, b2.doubleValue)
                seen = true
              case _ =>
                throw new IllegalStateException(s"non-numeric stats for $c")
            }
          }
        }
        if (seen) Some(s"$f\t$c\t$mn\t$mx") else None
      }
    }.flatten)
  } catch { case _: Exception => None }

  /** Per-file [min,max] of `column` (cast-to-double space) merged from
    * every published stats sidecar at or before version `v` — a file's
    * stats are recorded by the commit that staged it, so the union covers
    * the whole manifest. A missing entry means "no stats: never prune".
    */
  private def sidecarStats(table: String, v: Long, column: String,
      store: CommitStore): Map[String, (Double, Double)] = {
    val vs = versions(table, store)
    val published = store.list(manifestDir(table)).toSet
    // parallel sidecar reads (MetadataScaleProbe r14): planning cost at
    // 10³ retained sidecars was dominated by the sequential get() loop.
    // parFiles preserves input order, so the toMap merge (later versions
    // win on a shared path) is unchanged.
    parFiles(vs.filter(sv => sv <= v && published.contains(statsName(sv)))
        .map(_.toString)) { sv =>
      store.get(manifestDir(table), statsName(sv.toLong)).linesIterator
        .drop(1)
        .map(_.trim.stripSuffix(",").stripPrefix("\"").stripSuffix("\""))
        .filter(l => l.nonEmpty && l != "]}")
        .flatMap(_.split('\t') match {
          case Array(p, c, mn, mx) if c == column =>
            try Some(p -> (mn.toDouble, mx.toDouble))
            catch { case _: NumberFormatException => None }
          case _ => None
        }).toSeq
    }.flatten.toMap
  }

  /** Data-skipping range read: `read(version).where(lo <= column <= hi)`
    * with files whose sidecar [min,max] misses [lo, hi] never opened — the
    * manifest-level analogue of parquet row-group pruning, and the payoff
    * of clustered layouts ([[graft.operators.Layout]] z-order, range
    * partitioning): at 100 TB a clustered table answers a selective range
    * from a handful of files instead of every footer.
    *
    * Conservative by construction: files with no stats for `column` (older
    * commits without `statsCols`, all-null files, compacted rewrites) are
    * always read; the predicate is applied either way, so the result is
    * EXACTLY the unpruned read's. Stats sidecars of vacuumed manifests are
    * dropped with them — their surviving files just stop skipping.
    */
  def readRange(spark: SparkSession, table: String, column: String,
      lo: Double, hi: Double, version: Option[Long] = None,
      store: CommitStore = PosixLinkCommitStore): DataFrame = {
    val vs = versions(table, store)
    require(vs.nonEmpty, s"no committed snapshots at $table")
    val v = version.getOrElse(vs.max)
    require(vs.contains(v), s"version $v not in committed set $vs")
    val files = readManifest(table, v, store)
    val stats = sidecarStats(table, v, column, store)
    val kept = files.filter(f =>
      stats.get(f).forall { case (mn, mx) => mx >= lo && mn <= hi })
    // compare in the same cast-to-double space the sidecar stats live in —
    // a no-op for double columns (SimplifyCasts), the epoch-seconds
    // convention for timestamps
    val pred = col(column).cast("double") >= lo &&
      col(column).cast("double") <= hi
    if (files.isEmpty) // delete-all / empty-overwrite snapshot: still a table
      emptyFrame(spark, table, v, store)
    else if (kept.isEmpty) // schema from any manifest file; zero rows by range
      spark.read.parquet(s"$table/${files.head}").where(pred && lit(false))
    else fastReadFiles(spark, table, v, kept, store).where(pred)
  }

  /** OPTIMIZE analogue: rewrite the LATEST snapshot's row set as
    * `targetFiles` well-sized files and commit it as a new version whose
    * manifest lists only the compacted files. The natural companion to the
    * streaming sink, whose per-micro-batch commits fragment the table into
    * small files; old versions stay readable (time travel is append-only)
    * and the fragments are reclaimed by [[vacuum]] once retention drops
    * their manifests.
    *
    * Concurrency: a compaction must never clobber a racing APPEND — if it
    * blindly took the next free version, an append landing between the
    * compaction's read and its commit would be silently dropped from the
    * compacted manifest. So the commit is a true optimistic CAS: publish at
    * exactly `base + 1` and, on losing that slot, return None WITHOUT
    * retrying internally (the appended data is not in the compacted set —
    * the caller re-runs compaction over the new latest snapshot). This is
    * the winning-transaction check of Delta/Iceberg OCC reduced to the
    * conditional PUT.
    */
  def compact(spark: SparkSession, table: String, targetFiles: Int = 1,
      store: CommitStore = PosixLinkCommitStore,
      expectedBase: Option[Long] = None): Option[Long] = {
    val vs = versions(table, store)
    require(vs.nonEmpty, s"no committed snapshots at $table")
    // expectedBase pins the snapshot the caller audited; default latest
    val base = expectedBase.getOrElse(vs.max)
    require(vs.contains(base), s"version $base not in committed set $vs")
    // mergeSchema: a REWRITE must see the union schema of a schema-evolved
    // snapshot (commitAppendEvolve) — a single-footer inference could pick
    // a pre-evolution file and permanently drop the evolved columns from
    // the rewritten head (r13 review)
    val df = read(spark, table, Some(base), store, mergeSchema = true)
    val staged = stage(df.coalesce(math.max(targetFiles, 1)), table)
    // FULL form: a compaction's output IS the whole snapshot
    if (writeFullManifestAtomic(table, base + 1,
      stagedEntries(spark, table, staged), store,
      Some(s"compact-of-v$base"), Some(df.columns.toSeq))) Some(base + 1)
    else None // lost the CAS to a concurrent commit: staged files await vacuum
  }

  /** Bin-packing auto-compaction policy — the OPTIMIZE a nightly ingest
    * loop calls blindly after every batch: it inspects the audited
    * snapshot's live file sizes and rewrites ONLY the files smaller than
    * `smallBytes`, bin-packed to `targetBytes` outputs, carrying every
    * adequately-sized file into the new manifest BY REFERENCE (a path
    * copy — zero I/O). Below `minSmallFiles` small files it publishes
    * nothing and returns None: steady state is free. Cost is O(small
    * bytes), never O(table) — at 100 TB a day's worth of streaming
    * micro-batch files rewrites in minutes while the petabyte bulk is
    * untouched, which is the difference between this and [[compact]]
    * (a full-snapshot rewrite for when layout itself must change).
    * Same OCC contract as [[compact]]: losing the CAS to a concurrent
    * commit publishes nothing (staged files await vacuum).
    */
  def autoCompact(spark: SparkSession, table: String,
      smallBytes: Long = 32L << 20, minSmallFiles: Int = 8,
      targetBytes: Long = 128L << 20,
      store: CommitStore = PosixLinkCommitStore,
      expectedBase: Option[Long] = None): Option[Long] = {
    require(smallBytes > 0 && targetBytes > 0 && minSmallFiles > 0,
      "thresholds must be positive")
    val vs = versions(table, store)
    require(vs.nonEmpty, s"no committed snapshots at $table")
    val base = expectedBase.getOrElse(vs.max)
    require(vs.contains(base), s"version $base not in committed set $vs")
    val baseEntries = manifestEntries(table, base, store)
    val sized = baseEntries.map(e => e -> Files.size(Paths.get(table, e._1)))
    val (small, big) = sized.partition(_._2 < smallBytes)
    if (small.size < minSmallFiles) return None
    val nOut = math.max(1,
      math.ceil(small.map(_._2).sum.toDouble / targetBytes).toInt)
    // mergeSchema: same evolved-snapshot rewrite contract as [[compact]]
    val df = spark.read.option("mergeSchema", "true")
      .parquet(small.map(f => s"$table/${f._1._1}"): _*)
    val staged = stage(df.coalesce(nOut), table)
    // partial rewrite: the small-file union may miss columns living only in
    // carried-by-reference big files — propagate the base's recorded set.
    // Delta form above the threshold: removes = the rewritten small files,
    // adds = the packed outputs (big files carried by reference implicitly)
    if (writeRewriteManifestAtomic(table, base, baseEntries,
      small.map(_._1._1).toSet, stagedEntries(spark, table, staged), store,
      Some(s"autocompact-of-v$base"), manifestCols(table, base, store)))
      Some(base + 1)
    else None
  }

  /** OPTIMIZE … ZORDER BY: rewrite the audited snapshot z-clustered on
    * `zCols` ([[graft.operators.Layout.zCluster]] — one approx-quantile
    * planning pass + a range shuffle) and publish it as a compaction-style
    * commit. Same OCC contract as [[compact]]: the caller's base is pinned,
    * losing the CAS publishes nothing and leaves the staged files for
    * vacuum. Stats sidecars land on exactly the z-columns, so manifest
    * [[readRange]] skipping composes with the layout — the full
    * Delta/Iceberg `OPTIMIZE ZORDER` story: pay one clustering rewrite,
    * then every selective range on any z-column prunes most files.
    */
  def optimizeZOrder(spark: SparkSession, table: String, zCols: Seq[String],
      bits: Int = 8, numFiles: Int = 16,
      store: CommitStore = PosixLinkCommitStore,
      expectedBase: Option[Long] = None): Option[Long] = {
    val vs = versions(table, store)
    require(vs.nonEmpty, s"no committed snapshots at $table")
    val base = expectedBase.getOrElse(vs.max)
    require(vs.contains(base), s"version $base not in committed set $vs")
    // mergeSchema: same evolved-snapshot rewrite contract as [[compact]]
    val df = read(spark, table, Some(base), store, mergeSchema = true)
    val staged = stage(
      graft.operators.Layout.zCluster(df, zCols, bits, numFiles), table)
    // FULL form: the clustered rewrite IS the whole snapshot
    if (writeFullManifestAtomic(table, base + 1,
        stagedEntries(spark, table, staged), store,
        Some(s"zorder-of-v$base"), Some(df.columns.toSeq))) {
      val v = base + 1
      // stats publish AFTER the manifest wins, same ADVISORY contract as
      // the commit path (r13 ADVICE): the optimize IS durably committed the
      // moment the CAS wins, so an IO failure here must not propagate — a
      // caller that saw a failure would retry against the already-advanced
      // head and misread the CAS-lost None as contention (or publish a
      // spurious extra version). The snapshot just doesn't skip.
      try {
        val lines = fileStatsLines(spark, table, staged, zCols)
        publishJsonSidecar(table, statsName(v),
          s"""{"stats":$v,"rows":[""", lines, store)
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[lake] advisory zorder stats publish failed " +
          s"for $table v$v (snapshot IS committed; reads just don't skip): $e")
      }
      Some(v)
    } else None
  }

  /** Copy-on-write row-level DELETE: rewrite ONLY the files that contain a
    * matching row, commit a new manifest of (untouched files + rewrites) —
    * Delta/Iceberg's DELETE shape. Locating touched files starts from the
    * stats sidecars: files whose [min,max] misses a necessary range window
    * of the predicate ([[predicateBounds]]) are never opened; the survivors
    * get one projection-only scan to `input_file_name` (no row data moves).
    * Untouched files — at 100 TB, almost all of them when the predicate is
    * aligned with the layout ([[graft.operators.Layout]] z-order, date
    * partitions) — are carried by reference. Old versions still time-travel
    * to the pre-delete rows; vacuum reclaims replaced files when their
    * manifests age out.
    *
    * Same optimistic-CAS contract as [[compact]]: publishes at exactly
    * `base + 1`, returns None on losing the slot (caller re-runs against
    * the new latest; staged rewrites await vacuum).
    */
  def deleteWhere(spark: SparkSession, table: String, predicate: Column,
      store: CommitStore = PosixLinkCommitStore,
      expectedBase: Option[Long] = None): Option[Long] =
    rewriteWhere(spark, table, predicate, identity, "delete", store,
      expectedBase)

  /** Copy-on-write row-level UPDATE: like [[deleteWhere]], but matching
    * rows are re-emitted through `set` (column → new expression) instead of
    * dropped. Non-matching rows in touched files are rewritten verbatim.
    */
  def updateWhere(spark: SparkSession, table: String, predicate: Column,
      set: Map[String, Column], store: CommitStore = PosixLinkCommitStore,
      expectedBase: Option[Long] = None): Option[Long] =
    rewriteWhere(spark, table, predicate,
      upd => {
        val changed = set.foldLeft(upd) { case (d, (c, e)) =>
          d.withColumn(c, e)
        }
        changed
      }, "update", store, expectedBase)

  /** Necessary [lo, hi] windows implied by `predicate`'s top-level
    * conjuncts: comparisons of a plain column attribute against a numeric
    * literal. Each returned window is a NECESSARY condition for the
    * predicate (it came off an AND chain), so a file whose stats miss any
    * window cannot contain a matching row. Strict bounds widen to closed
    * (conservative); Or/Not/casts/non-numeric literals yield nothing —
    * callers fall back to scanning. Values are in the same cast-to-double
    * space the stats sidecars record.
    */
  private[graft] def predicateBounds(
      predicate: Column): Seq[(String, Double, Double)] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
    import org.apache.spark.sql.types.NumericType
    // The Column→Expression converter yields UNRESOLVED trees for
    // builder-made columns ('<=' is an UnresolvedFunction, not
    // LessThanOrEqual), and typed comparison nodes for columns lifted off
    // an analyzed frame — normalize both shapes to (op, lhs, rhs).
    def cmp(e: Expression): Option[(String, Expression, Expression)] =
      e match {
        case EqualTo(a, b) => Some(("=", a, b))
        case GreaterThan(a, b) => Some((">", a, b))
        case GreaterThanOrEqual(a, b) => Some((">=", a, b))
        case LessThan(a, b) => Some(("<", a, b))
        case LessThanOrEqual(a, b) => Some(("<=", a, b))
        case f: UnresolvedFunction if f.arguments.length == 2 &&
          Set("=", "==", "<", "<=", ">", ">=")(f.nameParts.last) =>
          Some((if (f.nameParts.last == "==") "=" else f.nameParts.last,
            f.arguments(0), f.arguments(1)))
        case _ => None
      }
    def num(e: Expression): Option[Double] = e match {
      case Literal(v, _: NumericType) => v match {
        case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
        case n: java.lang.Number => Some(n.doubleValue)
        case _ => None
      }
      case _ => None
    }
    val inf = Double.PositiveInfinity
    predConjuncts(org.apache.spark.sql.GraftSqlBridge.expression(predicate))
      .flatMap(cmp).flatMap {
        case ("=", a, b) =>
          predAttr(a).zip(num(b)).map { case (c, v) => (c, v, v) } ++
            predAttr(b).zip(num(a)).map { case (c, v) => (c, v, v) }
        case (">" | ">=", a, b) =>
          predAttr(a).zip(num(b)).map { case (c, v) => (c, v, inf) } ++
            predAttr(b).zip(num(a)).map { case (c, v) => (c, -inf, v) }
        case ("<" | "<=", a, b) =>
          predAttr(a).zip(num(b)).map { case (c, v) => (c, -inf, v) } ++
            predAttr(b).zip(num(a)).map { case (c, v) => (c, v, inf) }
        case _ => Nil
      }
  }

  /** The manifest files a row matching `predicate` could live in, decided
    * from the stats sidecars: drop every file whose recorded [min,max]
    * misses a necessary range window of the predicate. Conservative —
    * unstatted files and windows the extractor can't read survive. This is
    * what turns a row-level DELETE on a range predicate from a full-table
    * locate scan into an O(matching files) one at 100 TB.
    */
  private[graft] def pruneByStats(table: String, v: Long,
      files: Seq[String], predicate: Column,
      store: CommitStore): Seq[String] = {
    val windows = predicateBounds(predicate)
    // one sidecar pass per DISTINCT column — a range conjunct emits two
    // windows on the same column, and each sidecarStats call re-reads
    // every retained sidecar file
    val statsByCol = windows.map(_._1).distinct
      .map(c => c -> sidecarStats(table, v, c, store)).toMap
    val prunedOut = windows
      .foldLeft(Set.empty[String]) { case (acc, (c, lo, hi)) =>
        val stats = statsByCol(c)
        acc ++ files.filter(f =>
          stats.get(f).exists { case (mn, mx) => mx < lo || mn > hi })
      }
    files.filterNot(prunedOut)
  }

  /** The k bloom bit positions of `value` under an (m, k) filter, as an
    * `array<int>` column. Classic double hashing (Kirsch–Mitzenmacher):
    * pos_i = (h1 + i·h2) mod m with two independent xxhash64 streams —
    * evaluated by Spark codegen on BOTH the build side (per row, map-side)
    * and the probe side (a literal on a 1-row frame), so the two can never
    * disagree on a hash scheme. Both hashes are reduced mod m BEFORE the
    * combination so the arithmetic stays < (k+1)·m — ANSI mode (Spark 4's
    * default) throws on signed long overflow, so the classic wrap-around
    * form h1 + i·h2 is not usable here.
    */
  private def bloomPositions(value: Column, m: Int, k: Int): Column = {
    import org.apache.spark.sql.functions.{pmod, sequence, transform, xxhash64}
    val h1 = pmod(xxhash64(value), lit(m.toLong))
    val h2 = pmod(xxhash64(lit("graft-bloom"), value), lit(m.toLong))
    transform(sequence(lit(0), lit(k - 1)),
      i => pmod(h1 + i.cast("long") * h2, lit(m.toLong)).cast("int"))
  }

  /** Per-file bloom sidecar lines for freshly staged files: one
    * column-pruned pass per column — explode each value into its k bit
    * positions, distinct, collect the SET BITS per file (bounded by m bits
    * per file regardless of row count or key cardinality, which is the
    * whole point: a fixed-size membership summary where min/max stats
    * carry no information because every file spans the full key range).
    * Null values are skipped — an equality probe against a literal can
    * never match a null row. Format per line:
    * `relpath \t column \t dataType \t m \t k \t base64(bitset)`.
    */
  private def bloomSidecarLines(spark: SparkSession, table: String,
      staged: Seq[String], cols: Seq[String], m: Int, k: Int): Seq[String] = {
    import org.apache.spark.sql.functions.{collect_set, explode}
    val sdf = spark.read.parquet(staged.map(f => s"$table/$f"): _*)
    cols.filter(sdf.columns.contains).flatMap { c =>
      val dt = sdf.schema(c).dataType.catalogString
      val rows = sdf.where(col(c).isNotNull)
        .select(input_file_name().as("__f"),
          explode(bloomPositions(col(c), m, k)).as("__p"))
        .distinct() // ≤ m rows per file survive the shuffle
        .groupBy(col("__f")).agg(collect_set(col("__p")).as("__ps"))
        .collect() // bounded: files × (≤ m set-bit ints)
      rows.toSeq.map { r =>
        val rel = "data/" + r.getString(0).split("/data/").last
        val bits = new java.util.BitSet(m)
        r.getSeq[Int](1).foreach(bits.set)
        val b64 = java.util.Base64.getEncoder.encodeToString(bits.toByteArray)
        s"$rel\t$c\t$dt\t$m\t$k\t$b64"
      }
    }
  }

  /** Shared JSON sidecar publisher (r13 review — the quote-wrap +
    * mkString + putIfAbsent block was hand-rolled four times and had
    * started to drift): `header` is the opening fragment before the first
    * line, e.g. `{"stats":7,"rows":[`. */
  private def publishJsonSidecar(table: String, name: String,
      header: String, lines: Seq[String], store: CommitStore): Boolean =
    store.putIfAbsent(manifestDir(table), name,
      lines.map(l => "\"" + l + "\"")
        .mkString(header + "\n", ",\n", "\n]}"))

  private def publishBloomSidecar(table: String, name: String,
      lines: Seq[String], store: CommitStore): Boolean =
    publishJsonSidecar(table, name, "{\"blooms\":[", lines, store)

  /** Build a bloom index over the files of snapshot `version` (default
    * latest) that don't already carry one for each of `columns`, publishing
    * a new sidecar. The CREATE BLOOMFILTER INDEX analogue for tables whose
    * commits didn't pass `bloomCols`: one column-pruned scan of the
    * unindexed files (at 100 TB you run it once, then every commit indexes
    * its own staged files incrementally). Returns the number of (file,
    * column) entries written; 0 means fully indexed already.
    */
  def buildBloomIndex(spark: SparkSession, table: String,
      columns: Seq[String], version: Option[Long] = None,
      bits: Int = 8192, hashes: Int = 5,
      store: CommitStore = PosixLinkCommitStore): Int = {
    val vs = versions(table, store)
    require(vs.nonEmpty, s"no committed snapshots at $table")
    val v = version.getOrElse(vs.max)
    require(vs.contains(v), s"version $v not in committed set $vs")
    val files = readManifest(table, v, store)
    val lines = columns.flatMap { c =>
      val have = sidecarBlooms(table, v, c, store).keySet
      val missing = files.filterNot(have)
      if (missing.isEmpty) Nil
      else bloomSidecarLines(spark, table, missing, Seq(c), bits, hashes)
    }
    if (lines.nonEmpty) {
      val suffix = "-" + java.util.UUID.randomUUID.toString.take(8)
      publishBloomSidecar(table, bloomName(v, suffix), lines, store)
    }
    lines.size
  }

  /** Per-file blooms for `column` merged from every bloom sidecar published
    * at or before version `v` (a file's bloom is recorded by the commit
    * that staged it, or by a later [[buildBloomIndex]]); later sidecars win
    * on re-index. A missing entry means "no bloom: never prune".
    */
  private[graft] def sidecarBlooms(table: String, v: Long, column: String,
      store: CommitStore): Map[String, (String, Int, Int, java.util.BitSet)] = {
    // same explicit sort key as [[sidecarSketches]] (r13 review): plain
    // lexicographic order puts a retrofit b<v>-<uuid>.json BEFORE its
    // version's commit sidecar b<v>.json ('-' < '.'), inverting the
    // documented later-sidecars-win rule
    val names = store.list(manifestDir(table))
      .filter(n => n.startsWith("b") && n.endsWith(".json") &&
        n.length >= 12 && n.substring(1, 12).forall(_.isDigit) &&
        n.substring(1, 12).toLong <= v)
      .sortBy(n => (n.substring(1, 12).toLong,
        n.length > "b00000000000.json".length, n))
    names.flatMap { n =>
      store.get(manifestDir(table), n).linesIterator.drop(1)
        .map(_.trim.stripSuffix(",").stripPrefix("\"").stripSuffix("\""))
        .filter(l => l.nonEmpty && l != "]}")
        .flatMap(_.split('\t') match {
          case Array(p, c, dt, m, kk, b64) if c == column =>
            try Some(p -> (dt, m.toInt, kk.toInt,
              java.util.BitSet.valueOf(
                java.util.Base64.getDecoder.decode(b64))))
            catch { case _: IllegalArgumentException => None }
          case _ => None
        })
    }.toMap
  }

  /** Equality constraints in `predicate`'s top-level conjuncts:
    * (column, literal values) pairs where the predicate requires the column
    * to equal ONE OF the values (a bare `=` yields one value; `IN` yields
    * its list). Each is a NECESSARY condition, so a file whose bloom
    * refutes every value for some conjunct cannot contain a matching row.
    * Anything else (Or/Not/expressions over the column) yields nothing —
    * callers fall back to scanning.
    */
  /** Top-level AND-conjuncts of a Column's Catalyst expression, and the
    * bare-attribute extractor — shared by stats pruning
    * ([[predicateBounds]]) and bloom pruning ([[equalityProbes]]) so the
    * two shape-normalizers cannot drift (r13 review: both had private
    * verbatim copies; a fix to one would silently miss the other).
    * Handles the resolved And node and the unresolved "and" function
    * form the Column DSL produces pre-analysis. */
  private def predConjuncts(
      e: org.apache.spark.sql.catalyst.expressions.Expression):
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      predConjuncts(l) ++ predConjuncts(r)
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.arguments.length == 2 &&
          f.nameParts.last.equalsIgnoreCase("and") =>
      predConjuncts(f.arguments(0)) ++ predConjuncts(f.arguments(1))
    case other => Seq(other)
  }

  private def predAttr(
      e: org.apache.spark.sql.catalyst.expressions.Expression):
      Option[String] = e match {
    case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
      Some(a.nameParts.last)
    case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
      Some(a.name)
    case _ => None
  }

  private[graft] def equalityProbes(
      predicate: Column): Seq[(String, Seq[Column])] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
    // wrap the literal EXPRESSION back into a Column (its value is the
    // Catalyst-internal representation — UTF8String for strings — so
    // re-lifting through lit() would mangle it)
    def litCol(e: Expression): Option[Column] = e match {
      case Literal(null, _) => None // `c = null` matches nothing; no probe
      case l: Literal => Some(org.apache.spark.sql.GraftSqlBridge.column(l))
      case _ => None
    }
    predConjuncts(org.apache.spark.sql.GraftSqlBridge.expression(predicate))
      .flatMap {
        case EqualTo(a, b) =>
          predAttr(a).zip(litCol(b)).map { case (c, v0) => (c, Seq(v0)) } ++
            predAttr(b).zip(litCol(a)).map { case (c, v0) => (c, Seq(v0)) }
        case f: UnresolvedFunction if f.arguments.length == 2 &&
          Set("=", "==")(f.nameParts.last) =>
          val Seq(a, b) = f.arguments
          predAttr(a).zip(litCol(b)).map { case (c, v0) => (c, Seq(v0)) } ++
            predAttr(b).zip(litCol(a)).map { case (c, v0) => (c, Seq(v0)) }
        case In(a, list) if list.nonEmpty =>
          val vals = list.flatMap(litCol)
          // every branch must be a literal, or the IN is not fully probeable
          if (vals.length == list.length)
            predAttr(a).map(c => (c, vals)).toSeq
          else Nil
        case f: UnresolvedFunction if f.nameParts.last.equalsIgnoreCase("in") &&
          f.arguments.length >= 2 =>
          val vals = f.arguments.tail.flatMap(litCol)
          if (vals.length == f.arguments.length - 1)
            predAttr(f.arguments.head).map(c => (c, vals)).toSeq
          else Nil
        case _ => Nil
      }
  }

  /** Drop files whose bloom sidecar refutes an equality conjunct of
    * `predicate` — the point-lookup / IN-list sibling of [[pruneByStats]].
    * Min/max stats carry no information when every file spans the key range
    * (high-cardinality ids under an unclustered layout — exactly the shape
    * of a GDPR-style `DELETE WHERE doc_id = x` on a 100 TB table); a 1 KiB
    * bloom per file answers "definitely absent" for ~any cardinality at a
    * false-positive rate set by (bits, hashes), and a false positive only
    * costs reading one extra file. Conservative by construction: unbloomed
    * files and unprobeable predicates always survive, and the caller
    * re-applies the full predicate to whatever is read.
    *
    * Probe values are evaluated through [[bloomPositions]] on a 1-row local
    * frame — a driver-side job bounded by (distinct sidecar configs ×
    * conjuncts), never by data.
    */
  private[graft] def pruneByBlooms(spark: SparkSession, table: String,
      v: Long, files: Seq[String], predicate: Column,
      store: CommitStore): Seq[String] = {
    val probes = equalityProbes(predicate)
    if (probes.isEmpty || files.isEmpty) return files
    probes.foldLeft(files) { case (fs, (c, vals)) =>
      val blooms = sidecarBlooms(table, v, c, store)
      if (blooms.isEmpty) fs
      else {
        val cfgs = fs.flatMap(blooms.get).map { case (dt, m, kk, _) =>
          (dt, m, kk)
        }.distinct
        // k positions per (value, sidecar config): cast the literal to the
        // INDEXED column type so the probe hashes the same representation
        // the build side hashed; an uncastable literal yields null → no
        // pruning under that config (conservative).
        //
        // Coercion-soundness guard (r13 review): the cast-side probe is
        // only valid when Spark's own comparison coerces the LITERAL
        // toward the column — i.e. the literal's type equals the indexed
        // type, or up-casts losslessly within the numeric family. Any
        // other pairing can coerce the COLUMN side instead (string col =
        // int literal compares as double, so "05" matches 5), and probing
        // cast("5") would refute a file holding the genuine non-canonical
        // match "05" — silently skipping a DELETE. Unsound values emit no
        // positions (ps.isEmpty → maybe-present → the file survives).
        def probeSound(v: Column, dtStr: String): Boolean =
          try {
            val lt = org.apache.spark.sql.GraftSqlBridge.expression(v)
              .dataType
            val ct = org.apache.spark.sql.types.DataType.fromDDL(dtStr)
            lt == ct || ((lt, ct) match {
              case (a: org.apache.spark.sql.types.NumericType,
                    b: org.apache.spark.sql.types.NumericType) =>
                org.apache.spark.sql.catalyst.expressions.Cast
                  .canUpCast(a, b)
              case _ => false
            })
          } catch { case _: Exception => false }
        val posFor: Map[(String, Int, Int), Seq[Seq[Int]]] = cfgs.flatMap {
          case (dt, m, kk) =>
            try {
              val sound = vals.map(probeSound(_, dt))
              val probeCols = vals.map(_.cast(dt))
              val posArrays = probeCols.zipWithIndex.map { case (pc, i) =>
                bloomPositions(pc, m, kk).as(s"p$i")
              }
              val nulls = probeCols.zipWithIndex.map { case (pc, i) =>
                pc.isNull.as(s"n$i")
              }
              val row = spark.range(1).select(posArrays ++ nulls: _*).head()
              val ps = vals.indices.map { i =>
                if (!sound(i) || row.getBoolean(vals.size + i))
                  Seq.empty[Int]
                else row.getSeq[Int](i)
              }
              Some((dt, m, kk) -> ps)
            } catch { case _: Exception => None }
        }.toMap
        fs.filter { f =>
          blooms.get(f) match {
            case Some((dt, m, kk, bitset)) =>
              posFor.get((dt, m, kk)) match {
                case Some(perValue) => perValue.exists(ps =>
                  ps.isEmpty || ps.forall(bitset.get)) // some value may match
                case None => true
              }
            case None => true // unindexed file: never prune
          }
        }
      }
    }
  }

  private def rewriteWhere(spark: SparkSession, table: String,
      predicate: Column, transformMatches: DataFrame => DataFrame,
      op: String, store: CommitStore,
      expectedBase: Option[Long]): Option[Long] = {
    val vs = versions(table, store)
    require(vs.nonEmpty, s"no committed snapshots at $table")
    val base = expectedBase.getOrElse(vs.max)
    require(vs.contains(base), s"version $base not in committed set $vs")
    val baseEntries = manifestEntries(table, base, store)
    val files = baseEntries.map(_._1)
    if (files.isEmpty) return Some(base) // empty snapshot: nothing to touch
    // Stats-pruned locate: only files whose sidecar [min,max] can satisfy
    // the predicate are scanned at all — the rest are carried by reference
    // without being opened. On a range predicate aligned with the layout
    // (z-order, date clustering) the locate cost drops from O(table) to
    // O(matching files); with no usable stats this is exactly the old
    // full-scan locate. Bloom sidecars then refute equality conjuncts the
    // min/max spans can't — the `DELETE WHERE id = x` point-locate shape.
    val candidates = pruneByBlooms(spark, table, base,
      pruneByStats(table, base, files, predicate, store), predicate, store)
    if (candidates.isEmpty) return Some(base) // stats refute every file
    // mergeSchema on BOTH scans: the predicate may reference an evolved
    // column absent from some candidate footers, and the rewrite must
    // carry the union schema of the touched files (r13 review)
    val snap = spark.read.option("mergeSchema", "true")
      .parquet(candidates.map(f => s"$table/$f"): _*)
    // one projection-only scan finds the touched files (bounded collect:
    // file names, not rows)
    val touched = snap.where(predicate)
      .select(input_file_name().as("__f")).distinct()
      .collect().map(r => "data/" + r.getString(0).split("/data/").last).toSet
    if (touched.isEmpty) return Some(base) // nothing matches: no-op version
    val touchedPaths = touched.toSeq.sorted.map(f => s"$table/$f")
    val touchedDf = spark.read.option("mergeSchema", "true")
      .parquet(touchedPaths: _*)
    val kept = touchedDf.where(!coalesce(predicate, lit(false)))
    val rewritten = op match {
      case "delete" => kept
      case _ => kept.unionByName(
        transformMatches(touchedDf.where(coalesce(predicate, lit(false)))))
    }
    val staged = stage(
      rewritten.coalesce(math.max(touched.size, 1)), table)
    // partial rewrite (untouched files carried by reference): extend the
    // base's recorded union with any column the rewrite introduced
    // (updateWhere `set` on a new name); a legacy base stays unrecorded
    val cols = manifestCols(table, base, store)
      .map(pc => pc ++ rewritten.columns.filterNot(pc.toSet))
    if (writeRewriteManifestAtomic(table, base, baseEntries, touched,
      stagedEntries(spark, table, staged), store,
      Some(s"$op-of-v$base"), cols)) Some(base + 1)
    else None
  }

  /** Source-column accessor for [[merge]] expressions: inside
    * `whenMatchedUpdate` values and the `whenMatchedDelete` condition,
    * target columns are referenced by plain name and source columns through
    * this wrapper (the merge join aliases source columns apart, so
    * same-named source/target columns never collide or ambiguate).
    */
  def mergeSource(name: String): Column = col(s"__src_$name")

  /** Copy-on-write row-level MERGE — the three-clause `MERGE INTO` of
    * Delta/Iceberg on the snapshot lake. Target rows whose `on` key matches
    * a source row are deleted when `whenMatchedDelete` holds, otherwise
    * updated through `whenMatchedUpdate` (column → expression; expressions
    * see target columns by name and source columns via [[mergeSource]] —
    * delete is evaluated first, mirroring a MERGE whose DELETE clause
    * precedes its UPDATE clause); source rows matching no target row are
    * inserted when `insertNotMatched`. NULL key values never match (plain
    * equi-join semantics, as in SQL MERGE) — a null-keyed source row
    * inserts.
    *
    * COW at 100 TB: the locate phase starts from the stats sidecars — the
    * source's GLOBAL key span is a necessary window for any match, so files
    * whose [min,max] misses it are carried by reference without being
    * opened, and (the same fact, used twice) the not-matched anti-join is
    * EXACT against just the candidate files: a pruned file's keys all fall
    * outside the source span, so it cannot hide a match for any source row.
    * A nightly upsert batch against a key-clustered table (z-order, range
    * partitioning) therefore opens O(files overlapping the batch), not
    * O(table), for locate, rewrite, AND insert-dedup. Both remaining scans
    * of the candidate set are column-pruned (keys only).
    *
    * The source must carry every target column when `insertNotMatched` (the
    * insert projects the target schema), and its `on` keys must be UNIQUE —
    * a target row matching two source rows has no deterministic result, so
    * that raises (the same error Delta's MERGE surfaces at runtime); the
    * check is one aggregation over the (batch-sized) source.
    *
    * Same optimistic-CAS contract as [[compact]]/[[deleteWhere]]: publishes
    * at exactly `base + 1`, returns None on losing the slot; old versions
    * still time travel; replaced files await [[vacuum]].
    */
  def merge(spark: SparkSession, table: String, source: DataFrame,
      on: Seq[String],
      whenMatchedUpdate: Map[String, Column] = Map.empty,
      whenMatchedDelete: Option[Column] = None,
      insertNotMatched: Boolean = true,
      store: CommitStore = PosixLinkCommitStore,
      expectedBase: Option[Long] = None,
      dedupKey: Option[String] = None): Option[Long] = {
    import org.apache.spark.sql.functions.when
    require(on.nonEmpty, "merge needs at least one key column")
    require(dedupKey.forall(!_.contains('"')),
      "dedupKey must not contain quotes")
    // exactly-once hook (the commitAppendIdempotent contract, for MERGE):
    // a replayed micro-batch keyed on its batchId converges on the version
    // its first run committed instead of re-applying the changes
    dedupKey.flatMap(k => dedupVersion(table, k, store)).foreach { v =>
      return Some(v) }
    val vs = versions(table, store)
    require(vs.nonEmpty, s"no committed snapshots at $table")
    val base = expectedBase.getOrElse(vs.max)
    require(vs.contains(base), s"version $base not in committed set $vs")
    val baseEntries = manifestEntries(table, base, store)
    val files = baseEntries.map(_._1)
    require(on.forall(source.columns.contains),
      s"merge keys $on not all present in source columns")
    // batch-sized aggregation; a duplicate source key would make the
    // matched-row rewrite nondeterministic. Rows with ANY null key are
    // exempt: they can never match a target row (equi-join semantics), so
    // several of them only ever insert — no nondeterminism to guard.
    val keyedSource =
      source.where(on.map(col(_).isNotNull).reduce(_ && _))
    require(keyedSource.groupBy(on.map(col): _*).count()
      .where(col("count") > 1).limit(1).isEmpty,
      s"merge source has duplicate keys on $on")
    def validateTarget(targetCols: Seq[String]): Unit = {
      require(on.forall(targetCols.contains),
        s"merge keys $on not all present in target columns $targetCols")
      require(whenMatchedUpdate.keySet.subsetOf(targetCols.toSet),
        "whenMatchedUpdate names non-target columns " +
          s"${whenMatchedUpdate.keySet -- targetCols} (a typo would " +
          "otherwise be silently ignored)")
      require(!insertNotMatched || targetCols.forall(source.columns.contains),
        "insertNotMatched requires the source to carry every target " +
          s"column; missing ${targetCols.filterNot(source.columns.contains)}")
    }

    def commitAt(removes: Set[String], adds: Seq[(String, Option[Long])],
        cols: Option[Seq[String]]): Option[Long] =
      if (writeRewriteManifestAtomic(table, base, baseEntries, removes, adds,
        store, Some(dedupKey.getOrElse(s"merge-of-v$base")), cols))
        Some(base + 1)
      else None

    val sourceIsEmpty = source.isEmpty // batch-sized probe, reused below

    if (files.isEmpty) { // empty snapshot: every source row inserts
      val targetCols = manifestCols(table, base, store).getOrElse(
        read(spark, table, Some(base), store).columns.toSeq)
      validateTarget(targetCols)
      if (!insertNotMatched || sourceIsEmpty) return Some(base)
      return commitAt(Set.empty,
        stagedEntries(spark, table,
          stage(source.select(targetCols.map(col): _*), table)),
        Some(targetCols))
    }
    if (sourceIsEmpty) return Some(base) // nothing to match, nothing to
    // insert: no-op rather than a junk empty-file commit per quiet batch

    // Necessary key windows from the source's own min/max — one tiny agg,
    // then the sidecar pruning shared with deleteWhere/readRange. Each
    // column's span is independent: an all-null key column just
    // contributes no constraint (its rows can only insert), never an NPE.
    val numericOn = on.filter(k => source.schema(k).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType])
    val spanPred: Option[Column] =
      if (numericOn.isEmpty) None
      else {
        val aggs = numericOn.flatMap(k => Seq(
          min(col(k).cast("double")), max(col(k).cast("double"))))
        val r = source.agg(aggs.head, aggs.tail: _*).collect()(0)
        val conjuncts = numericOn.zipWithIndex.collect {
          case (k, i) if !r.isNullAt(2 * i) =>
            col(k) >= r.getDouble(2 * i) && col(k) <= r.getDouble(2 * i + 1)
        }
        conjuncts.reduceOption(_ && _)
      }
    val candidates = spanPred match {
      case Some(p) => pruneByStats(table, base, files, p, store)
      case None => files
    }
    def candScan() =
      spark.read.option("mergeSchema", "true")
        .parquet(candidates.map(f => s"$table/$f"): _*)
    // Target schema: FIRST preference is the union-schema column set the
    // committing writer recorded on the base manifest ([[manifestCols]]) —
    // an O(1) header read that opens no footer, so it is correct even when
    // every file is refuted (merge must not open refuted files even for
    // metadata — the corrupt-out-of-span-file spec pins this) AND complete
    // even when an evolved column lives only in refuted files. Legacy
    // manifests without the field fall back to the candidate-footer union;
    // with zero candidates the last resort is a single arbitrary footer,
    // which on a schema-evolved legacy table can understate the set (an
    // insert-only merge whose keys miss every span would then drop evolved
    // columns from inserted rows — r13 ADVICE; recording cols at commit
    // time is the fix, the fallback only remains for pre-cols manifests).
    val recordedCols = manifestCols(table, base, store)
    val targetCols = recordedCols.getOrElse(
      (if (candidates.nonEmpty)
        spark.read.option("mergeSchema", "true")
          .parquet(candidates.map(f => s"$table/$f"): _*)
      else spark.read.parquet(s"$table/${files.head}"))
        .columns.toSeq)
    validateTarget(targetCols)

    // locate: one key-projected scan of the candidates (bounded collect —
    // file names, not rows). With NO matched clause at all (insert-only
    // merge, the "insert if absent" shape), a match changes nothing — skip
    // the locate AND the rewrite entirely and carry every file by
    // reference; only the anti-join insert below does any work.
    val matchedClausePresent =
      whenMatchedUpdate.nonEmpty || whenMatchedDelete.nonEmpty
    val touched: Set[String] =
      if (candidates.isEmpty || !matchedClausePresent) Set.empty
      else candScan()
        .select(on.map(col) :+ input_file_name().as("__f"): _*)
        .join(source.select(on.map(col): _*), on, "left_semi")
        .select(col("__f")).distinct()
        .collect().map(r => "data/" + r.getString(0).split("/data/").last)
        .toSet

    val srcPref = source.select(source.columns.map(c =>
      col(c).as(s"__src_$c")) :+ lit(true).as("__src__matched"): _*)
    val rewrittenTouched: Option[DataFrame] =
      if (touched.isEmpty) None
      else {
        val t = spark.read.option("mergeSchema", "true")
          .parquet(touched.toSeq.sorted.map(f => s"$table/$f"): _*)
        val joinCond = on.map(k => col(k) === col(s"__src_$k"))
          .reduce(_ && _)
        val joined = t.join(srcPref, joinCond, "left")
        val matched = col("__src__matched").isNotNull
        val delCond = whenMatchedDelete
          .map(c => matched && coalesce(c, lit(false)))
          .getOrElse(lit(false))
        Some(joined.where(!delCond).select(targetCols.map { c =>
          (if (whenMatchedUpdate.contains(c))
            when(matched, whenMatchedUpdate(c)).otherwise(col(c))
          else col(c)).as(c)
        }: _*))
      }
    val inserts: Option[DataFrame] =
      if (!insertNotMatched) None
      else {
        val unmatched =
          if (candidates.isEmpty) source
          else source.join(candScan().select(on.map(col): _*),
            on, "left_anti")
        Some(unmatched.select(targetCols.map(col): _*))
      }

    (rewrittenTouched ++ inserts).reduceOption(_ unionByName _) match {
      case None => Some(base) // no matched clause, inserts disabled: no-op
      case Some(newData) if touched.isEmpty && newData.isEmpty =>
        Some(base) // every source row already present, nothing rewritten:
      // no-op rather than committing an empty staged file
      case Some(newData) =>
        val staged = stage(
          newData.coalesce(math.max(touched.size, 1) + 1), table)
        // merge never adds columns (rewrites and inserts both select
        // targetCols), so the base's recorded union carries forward; a
        // legacy base stays unrecorded rather than risking an understated
        // candidate-only union
        commitAt(touched, stagedEntries(spark, table, staged), recordedCols)
    }
  }

  /** Stats-pruned filtered read: `read(version).where(predicate)` with
    * files the sidecar stats refute never opened — the general-predicate
    * sibling of [[readRange]]. Any conjunction containing single-column
    * numeric range comparisons prunes ([[predicateBounds]]); predicates it
    * can't decompose just fall back to reading everything, and the
    * predicate is applied either way, so the result is EXACTLY the
    * unpruned read's.
    */
  /** Metadata-only COUNT(*): the snapshot's row count summed from the
    * PER-FILE COUNTS the committing writer recorded in the manifest
    * entries (read at commit time from the freshly staged footers — r15,
    * closing the r14-measured 75 s footer walk at 10⁵ files) — O(manifest)
    * driver reads, zero data pages touched, zero Spark jobs (the no-job
    * property is spec-pinned). Every write path stages immutable files
    * through the manifest (append, overwrite, MERGE, COW delete/update,
    * compaction), so the sum is exact for any committed version, including
    * after row-level rewrites. Files committed BEFORE counts were recorded
    * fall back to a bounded-parallel footer walk of just those files;
    * [[buildRowCountIndex]] retrofits old tables once.
    */
  def countRows(spark: SparkSession, table: String,
      version: Option[Long] = None,
      store: CommitStore = PosixLinkCommitStore): Long = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val vs = versions(table, store)
    require(vs.nonEmpty, s"no committed snapshots at $table")
    val v = version.getOrElse(vs.max)
    require(vs.contains(v), s"version $v not in committed set $vs")
    val entries = manifestEntries(table, v, store)
    val (counted, uncounted) = entries.partition(_._2.isDefined)
    val conf = spark.sessionState.newHadoopConf()
    counted.iterator.map(_._2.get).sum +
      parFiles(uncounted.map(_._1)) { f =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(s"$table/$f"), conf))
        try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
        finally reader.close()
      }.sum
  }

  /** Retrofit per-file ROW COUNTS for a snapshot committed before counts
    * were recorded in manifest entries: one bounded-parallel footer walk
    * of just the uncounted files, published as the version's
    * self-contained checkpoint sidecar (resolution prefers it, so
    * [[countRows]] becomes O(manifest) from then on). Idempotent under the
    * single-maintenance-writer contract; returns the number of files whose
    * counts were newly computed (0 = already fully counted).
    */
  def buildRowCountIndex(spark: SparkSession, table: String,
      version: Option[Long] = None,
      store: CommitStore = PosixLinkCommitStore): Int = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val vs = versions(table, store)
    require(vs.nonEmpty, s"no committed snapshots at $table")
    val v = version.getOrElse(vs.max)
    require(vs.contains(v), s"version $v not in committed set $vs")
    val entries = manifestEntries(table, v, store)
    val missing = entries.count(_._2.isEmpty)
    if (missing == 0) return 0
    val conf = spark.sessionState.newHadoopConf()
    val filled = parFiles(entries.map(e => fmtEntry(e))) { line =>
      parseEntryLine(line) match {
        case (f, Some(r)) => (f, Some(r))
        case (f, None) =>
          val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(s"$table/$f"), conf))
          try (f, Some(reader.getFooter.getBlocks.asScala
            .map(_.getRowCount).sum))
          finally reader.close()
      }
    }
    // an earlier (count-less) checkpoint must not shadow the counted one.
    // Checkpoints are derived state under the single-maintenance-writer
    // contract, but they can also be a MANDATORY vacuum chain-cut — a
    // delete-then-publish sequence would open a crash window in which the
    // only self-contained record of `v` is gone and the delta chain walks
    // into vacuumed manifests. Atomic whole-object replace: readers see
    // the count-less checkpoint or the counted one, never neither.
    store.replace(manifestDir(table), checkpointName(v),
      checkpointBody(v, filled))
    missing
  }

  /** Bounded-parallel driver-side map over per-file metadata reads
    * (parquet footers, sidecars). O(files) metadata complexity is right,
    * but at 100× scale a manifest holds 10⁵–10⁶ files and sequential
    * ~1 ms footer opens serialize into minutes — a fixed 64-thread pool
    * (IO-bound; threads mostly block on the filesystem) keeps the same
    * result in join order, deterministically. Small lists skip the pool:
    * thread spin-up would dominate. Failures propagate with their
    * original exception (un-wrapped from the executor) so callers'
    * fallback semantics (e.g. [[footerStatsLines]]'s catch-all) are
    * unchanged.
    */
  private def parFiles[A](files: Seq[String])(f: String => A): Seq[A] =
    graft.util.Par.map(files, 64)(f)

  /** Per-file HLL sketch lines "relpath\tcol\thex(sketch)" — one scan
    * of the freshly staged files grouped by input_file_name (the
    * fileStatsLines fallback shape); lgK 12 ≈ ±1.6% standard error.
    */
  private def ndvSidecarLines(spark: SparkSession, table: String,
      staged: Seq[String], cols: Seq[String]): Seq[String] = {
    val sdf = spark.read.parquet(staged.map(f => s"$table/$f"): _*)
    val aggs = cols.map(c =>
      hex(hll_sketch_agg(col(c), 12)).as(s"sk_$c"))
    val rows = sdf.groupBy(input_file_name().as("__f"))
      .agg(aggs.head, aggs.tail: _*).collect()
    rows.toSeq.flatMap { r =>
      val rel = "data/" + r.getString(0).split("/data/").last
      cols.zipWithIndex.flatMap { case (c, i) =>
        Option(r.getString(1 + i)).map(hx => s"$rel\t$c\t$hx")
      }
    }
  }

  private def sidecarSketches(table: String, v: Long, column: String,
      store: CommitStore): Map[String, String] = {
    // commit-time sidecars AND suffixed retrofit sidecars
    // ([[buildNdvIndex]]). Last-writer-wins needs an explicit sort key:
    // lexicographic name order would put a retrofit n<v>-<uuid>.json BEFORE
    // its version's commit sidecar n<v>.json ('-' < '.'), inverting the
    // invariant — so order by (version, isRetrofit, name): within a
    // version, a retrofit re-index overrides the commit sidecar, and
    // multiple retrofits of one version tie-break deterministically by
    // name (they cover disjoint files by construction — each sketches only
    // the files it was pointed at — so the tie-break is belt-and-braces).
    store.list(manifestDir(table))
      .filter(n => n.startsWith("n") && n.endsWith(".json") &&
        n.length >= 12 && n.substring(1, 12).forall(_.isDigit) &&
        n.substring(1, 12).toLong <= v)
      .sortBy(n => (n.substring(1, 12).toLong,
        n.length > "n00000000000.json".length, n))
      .flatMap { name =>
        store.get(manifestDir(table), name).linesIterator.drop(1)
          .map(_.trim.stripSuffix(",").stripPrefix("\"").stripSuffix("\""))
          .filter(l => l.nonEmpty && l != "]}")
          .flatMap(_.split('\t') match {
            case Array(p, c, hexSketch) if c == column => Some(p -> hexSketch)
            case _ => None
          })
      }.toMap
  }

  /** Approximate COUNT(DISTINCT column) from the NDV sketch sidecars —
    * exact sketch algebra over O(files) metadata: the per-file HLL
    * sketches union losslessly (unlike min/max, a union of subsets IS the
    * sketch of the union), so any snapshot whose live files all carry
    * sketches answers without opening a data file. The union itself is one
    * tiny job over #files rows (Spark's own hll_union_agg / DataSketches).
    * Returns None when any live file lacks a sketch — partial metadata
    * would silently undercount. ±~1.6%% standard error at the lgK 12 the
    * writer uses. At 100 TB this is the NDV a join planner wants, priced
    * at a sidecar read instead of a corpus scan.
    */
  def approxDistinctFromSketches(spark: SparkSession, table: String,
      column: String, version: Option[Long] = None,
      store: CommitStore = PosixLinkCommitStore): Option[Long] = {
    val vs = versions(table, store)
    require(vs.nonEmpty, s"no committed snapshots at $table")
    val v = version.getOrElse(vs.max)
    require(vs.contains(v), s"version $v not in committed set $vs")
    val files = readManifest(table, v, store)
    val sketches = sidecarSketches(table, v, column, store)
    if (files.isEmpty || !files.forall(sketches.contains)) None
    else {
      import spark.implicits._
      val est = files.map(sketches).toDF("hex")
        .agg(hll_sketch_estimate(hll_union_agg(unhex(col("hex"))))
          .as("est"))
        .collect()(0).getLong(0)
      Some(est)
    }
  }

  /** Metadata-only MIN/MAX over the commit stats sidecars — the range twin
    * of [[countRows]]: a snapshot whose every live file carries stats for
    * `column` answers from O(files) sidecar lines with ZERO data scanned
    * (no Spark job at all). Returns None when ANY live file lacks stats
    * (older commits without `statsCols`, all-null files) — a partial
    * metadata answer would be silently wrong, so callers fall back to the
    * scan, the [[pruneByStats]] conservatism rule. Stats are stored as
    * doubles: exact for int/date/double columns, quantized above 2^53 —
    * callers needing exact wide-long extremes scan.
    */
  def minMaxFromStats(table: String, column: String,
      version: Option[Long] = None,
      store: CommitStore = PosixLinkCommitStore): Option[(Double, Double)] = {
    val vs = versions(table, store)
    require(vs.nonEmpty, s"no committed snapshots at $table")
    val v = version.getOrElse(vs.max)
    require(vs.contains(v), s"version $v not in committed set $vs")
    val files = readManifest(table, v, store)
    val stats = sidecarStats(table, v, column, store)
    if (files.nonEmpty && files.forall(stats.contains)) {
      val s = files.map(stats)
      Some((s.map(_._1).min, s.map(_._2).max))
    } else None
  }

  /** Retrofit NDV sketches for files committed without `ndvCols` — the
    * [[buildBloomIndex]] pattern: compute sketches for ONLY the live files
    * missing one and publish them as a suffixed sidecar at the audited
    * version. Incremental and idempotent: already-covered files are never
    * re-read; a second call writes nothing. Returns the sketch-line count
    * published.
    */
  def buildNdvIndex(spark: SparkSession, table: String,
      columns: Seq[String], version: Option[Long] = None,
      store: CommitStore = PosixLinkCommitStore): Int = {
    val vs = versions(table, store)
    require(vs.nonEmpty, s"no committed snapshots at $table")
    val v = version.getOrElse(vs.max)
    require(vs.contains(v), s"version $v not in committed set $vs")
    val files = readManifest(table, v, store)
    val lines = columns.flatMap { c =>
      val have = sidecarSketches(table, v, c, store).keySet
      val missing = files.filterNot(have)
      if (missing.isEmpty) Nil
      else ndvSidecarLines(spark, table, missing, Seq(c))
    }
    if (lines.nonEmpty) {
      val suffix = "-" + java.util.UUID.randomUUID.toString.take(8)
      publishJsonSidecar(table, ndvName(v, suffix),
        s"""{"ndv":$v,"rows":[""", lines, store)
    }
    lines.size
  }

  /** Metadata-only table profile — `ANALYZE TABLE` answered from the
    * lake's own sidecars: exact row count from parquet footers
    * ([[countRows]]), per-column [min, max] from the stats sidecars
    * ([[minMaxFromStats]]), approximate NDV from the sketch sidecars
    * ([[approxDistinctFromSketches]]). One row per requested column;
    * columns without FULL sidecar coverage report nulls for the uncovered
    * facets (the conservatism rule — never a partial guess). Zero data
    * files opened at any table size: the planner-statistics refresh a
    * 100 TB mirror needs, priced at a sidecar read.
    */
  def tableProfile(spark: SparkSession, table: String, columns: Seq[String],
      version: Option[Long] = None,
      store: CommitStore = PosixLinkCommitStore): DataFrame = {
    val n = countRows(spark, table, version, store)
    val rows = columns.map { c =>
      val mm = minMaxFromStats(table, c, version, store)
      val ndv = approxDistinctFromSketches(spark, table, c, version, store)
      (c, mm.map(_._1), mm.map(_._2), ndv, n)
    }
    import spark.implicits._
    rows.toDF("column", "min_value", "max_value", "ndv_est", "n_rows")
  }

  def readWhere(spark: SparkSession, table: String, predicate: Column,
      version: Option[Long] = None,
      store: CommitStore = PosixLinkCommitStore): DataFrame = {
    val vs = versions(table, store)
    require(vs.nonEmpty, s"no committed snapshots at $table")
    val v = version.getOrElse(vs.max)
    require(vs.contains(v), s"version $v not in committed set $vs")
    val files = readManifest(table, v, store)
    if (files.isEmpty) return emptyFrame(spark, table, v, store)
      .where(predicate)
    val kept = pruneByBlooms(spark, table, v,
      pruneByStats(table, v, files, predicate, store), predicate, store)
    if (kept.isEmpty) // schema from any manifest file; zero rows possible
      spark.read.parquet(s"$table/${files.head}")
        .where(predicate && lit(false))
    else fastReadFiles(spark, table, v, kept, store).where(predicate)
  }

  /** Memoized-inference read of a snapshot's file subset (r16, guide §1.4):
    * the manifest-recorded union columns guard schema evolution — mismatch
    * (or a legacy manifest) falls back to plain per-call inference. */
  private def fastReadFiles(spark: SparkSession, table: String, v: Long,
      kept: Seq[String], store: CommitStore): DataFrame =
    manifestCols(table, v, store) match {
      case Some(cols) => graft.sources.FastParquet.read(spark,
        kept.map(f => s"$table/$f"), Some(cols))
      case None => spark.read.parquet(kept.map(f => s"$table/$f"): _*)
    }

  /** Snapshot-isolated read of `version` (default: latest). The returned
    * frame reads exactly the manifest's files — later commits never change
    * what it sees.
    *
    * `mergeSchema` is the schema-evolution read: a long-lived table whose
    * appends GREW the schema (streaming sinks add columns over time) holds
    * files with different footers, and a plain read resolves to one file's
    * schema — columns absent there are silently dropped. With merge on,
    * the scan schema is the union across footers (old files null-fill new
    * columns), at the cost of reading every footer at planning time —
    * which is why it is an opt-in flag and not the default, exactly as in
    * the Spark parquet source.
    */
  def read(spark: SparkSession, table: String,
      version: Option[Long] = None,
      store: CommitStore = PosixLinkCommitStore,
      mergeSchema: Boolean = false): DataFrame = {
    val vs = versions(table, store)
    require(vs.nonEmpty, s"no committed snapshots at $table")
    val v = version.getOrElse(vs.max)
    require(vs.contains(v), s"version $v not in committed set $vs")
    val files = readManifest(table, v, store)
    if (files.isEmpty) emptyFrame(spark, table, v, store)
    else if (mergeSchema)
      spark.read.option("mergeSchema", "true")
        .parquet(files.map(f => s"$table/$f"): _*)
    // r16: snapshot data files are immutable and the manifest records the
    // committed union column set, so the inference of a donor-led file
    // list is memoizable (guide §1.4 — each plain read paid a ~60 ms
    // schema job). The recorded columns guard schema evolution: any
    // mismatch with the cached donor schema falls back to plain
    // inference; legacy manifests (no recorded cols) always read plain.
    else fastReadFiles(spark, table, v, files, store)
  }

  /** Empty frame carrying the table's schema, donated by the newest data
    * file in any version at-or-before `v` (data files are immutable, so any
    * of them records a valid snapshot schema). Zero-file snapshots are
    * producible — delete-all via [[deleteWhere]], an overwrite commit of an
    * empty frame — and must read back as empty, not throw on `files.head`.
    */
  private def emptyFrame(spark: SparkSession, table: String, v: Long,
      store: CommitStore): DataFrame = {
    val donor = versions(table, store).filter(_ <= v).sorted.reverse
      .iterator.flatMap(sv => readManifest(table, sv, store).headOption)
      .nextOption()
    donor match {
      case Some(f) => spark.read.parquet(s"$table/$f").where(lit(false))
      case None => throw new IllegalStateException(
        s"snapshot v$v at $table has no data files and no prior version " +
          "records a schema to donate an empty frame from")
    }
  }

  /** Change-data feed between two snapshots of an append-mode table: the
    * rows in files that version `to` references and `from` does not — i.e.
    * everything appended in `(from, to]`. File-level diffing is exact for
    * append/compaction histories because data files are immutable and
    * content-addressed by commit UUID (a compaction rewrites the file SET,
    * so `changesBetween` across a compaction reports the rewritten files;
    * pass `from`/`to` within one lineage — the normal CDC consumer tails
    * the log incrementally and never straddles a compaction).
    *
    * Scale: the diff is manifest arithmetic (two small file lists); only
    * the delta files are opened — the incremental-consumer shape (Delta
    * CDF / Iceberg incremental reads) that lets a downstream job process
    * 100 TB tables by reading only what each round appended.
    */
  def changesBetween(spark: SparkSession, table: String, from: Long, to: Long,
      store: CommitStore = PosixLinkCommitStore): DataFrame = {
    require(from <= to, s"from=$from must be <= to=$to")
    val vs = versions(table, store)
    require(vs.contains(from) && vs.contains(to),
      s"versions [$from, $to] not both in committed set $vs")
    val base = readManifest(table, from, store).toSet
    val delta = readManifest(table, to, store).filterNot(base)
    if (delta.isEmpty)
      read(spark, table, Some(to), store).where(lit(false))
    // r16: memoized inference, guarded by the recorded union columns at
    // `to` (delta files are the newest — on an evolved table their field
    // set matches the union; any mismatch reads plain). See [[read]].
    else fastReadFiles(spark, table, to, delta, store)
  }

  /** Delete data files referenced by NO manifest (crashed/lost commits).
    * Optionally drop manifests older than `retainVersions` first, making
    * their exclusively-owned files reclaimable. Returns deleted file count.
    *
    * `minAgeMs` protects IN-FLIGHT commits: a writer between stage() and
    * publish has unreferenced files that are not dead — only files older
    * than the threshold are reclaimed (the Delta/Iceberg retention rule).
    * The 1 h default assumes no commit stages longer than that; pass 0 only
    * when no writer can be running.
    */
  // ───────────────────── schema evolution (union-by-name) ─────────────────

  /** The table's merged (union-by-name) schema at a version: parquet FOOTER
    * metadata only — O(files), no data read. The schema a `mergeSchema`
    * read of that snapshot resolves to.
    */
  def tableSchema(spark: SparkSession, table: String,
      version: Option[Long] = None,
      store: CommitStore = PosixLinkCommitStore): org.apache.spark.sql.types.StructType =
    read(spark, table, version, store, mergeSchema = true).schema

  /** Append with SCHEMA EVOLUTION (Delta `mergeSchema` / Iceberg
    * union-by-name semantics): NEW columns are admitted — a `mergeSchema`
    * read resolves them as nulls on pre-evolution files — but a column that
    * already exists must keep its exact Spark type. A same-name type flip
    * would poison the snapshot (parquet footer merging throws at READ time,
    * after the bad commit is already durable), so it is rejected HERE,
    * before anything is staged. The incoming frame may also omit existing
    * columns (old files keep them; the new files null-fill on merged
    * reads) — the additive contract of an append-only lake.
    *
    * Scale: validation is one footer-metadata pass over the current
    * snapshot (O(files)); nothing about the data path changes.
    */
  def commitAppendEvolve(df: DataFrame, table: String,
      store: CommitStore = PosixLinkCommitStore,
      statsCols: Seq[String] = Nil): Long = {
    val vs = versions(table, store)
    if (vs.nonEmpty) {
      val cur = tableSchema(df.sparkSession, table, Some(vs.max), store)
      val curByName = cur.fields.map(f => f.name -> f.dataType).toMap
      val conflicts = df.schema.fields.flatMap { f =>
        curByName.get(f.name).collect {
          case t if t != f.dataType => s"${f.name}: $t -> ${f.dataType}"
        }
      }
      require(conflicts.isEmpty,
        s"schema evolution rejected at $table v${vs.max}: type changes " +
          conflicts.mkString("[", ", ", "]") +
          " (new columns are allowed; type flips are not)")
    }
    commit(df, table, append = true, store, statsCols = statsCols)
  }

  // ──────────────── branch refs + write-audit-publish ────────────────

  private def refPrefix(name: String) = s"r_$name."

  /** Current (seq, version) head of branch `name`'s ref log, if any. */
  private def refHead(table: String, name: String,
      store: CommitStore): Option[(Long, Long)] = {
    val pre = refPrefix(name)
    store.list(manifestDir(table))
      .filter(n => n.startsWith(pre) && n.endsWith(".json"))
      .map(_.stripPrefix(pre).stripSuffix(".json").toLong)
      .maxOption
      .map { seq =>
        val v = """"version":(\d+)""".r
          .findFirstMatchIn(store.get(manifestDir(table), s"$pre$seq.json"))
          .map(_.group(1).toLong)
          .getOrElse(throw new IllegalStateException(
            s"corrupt branch ref $name@$seq at $table"))
        (seq, v)
      }
  }

  /** The snapshot version branch `name` currently points at. */
  def branchVersion(table: String, name: String,
      store: CommitStore = PosixLinkCommitStore): Option[Long] =
    refHead(table, name, store).map(_._2)

  /** Point branch `name` at committed version `v`. A branch is its own
    * append-only mini-log (`r_<name>.<seq>.json`) over the SAME
    * conditional-PUT primitive as commits — an update is a putIfAbsent at
    * seq+1, so concurrent updaters serialize exactly like commits do
    * (collision → re-list → retry at the new tail) and the store never
    * needs object mutation. Branch refs are metadata-only: they never pin
    * data files against [[vacuum]] — publish (or re-point) branches before
    * vacuuming past the versions they reference.
    */
  @scala.annotation.tailrec
  def setBranch(table: String, name: String, v: Long,
      store: CommitStore = PosixLinkCommitStore): Unit = {
    require(name.matches("[A-Za-z0-9_-]+"), s"bad branch name: '$name'")
    require(versions(table, store).contains(v),
      s"cannot point branch '$name' at uncommitted version $v")
    val next = refHead(table, name, store).map(_._1 + 1).getOrElse(0L)
    val body = s"""{"branch":"$name","seq":$next,"version":$v,""" +
      s""""ts":${System.currentTimeMillis()}}"""
    if (!store.putIfAbsent(manifestDir(table), s"${refPrefix(name)}$next.json",
        body))
      setBranch(table, name, v, store)
  }

  /** Read the snapshot a branch points at (readers pin to a branch, not to
    * "latest", when unaudited versions may exist above it). */
  def readBranch(spark: SparkSession, table: String, name: String,
      store: CommitStore = PosixLinkCommitStore,
      mergeSchema: Boolean = false): DataFrame = {
    val v = branchVersion(table, name, store).getOrElse(
      throw new IllegalArgumentException(s"no branch '$name' at $table"))
    read(spark, table, Some(v), store, mergeSchema)
  }

  /** WRITE step of write-audit-publish: stage `df` as a normal immutable
    * commit but advance only `branch` — serving readers pinned to `main`
    * keep their last published snapshot, so unaudited data is never
    * visible to them. `baseBranch` pins what an append stacks on (the WAP
    * shape passes the serving branch, so a previously staged-but-rejected
    * audit version can never leak into the next cycle's base); None bases
    * on the table's latest version. Returns the staged version for the
    * audit query to inspect via [[read]]/[[readBranch]].
    */
  def commitToBranch(df: DataFrame, table: String, branch: String,
      append: Boolean = true,
      baseBranch: Option[String] = None,
      store: CommitStore = PosixLinkCommitStore,
      statsCols: Seq[String] = Nil): Long = {
    val base = baseBranch.map(b => branchVersion(table, b, store).getOrElse(
      throw new IllegalArgumentException(s"no base branch '$b' at $table")))
    val v = commit(df, table, append, store, statsCols = statsCols,
      baseVersion = base)
    setBranch(table, branch, v, store)
    v
  }

  /** PUBLISH step of write-audit-publish: fast-forward `toBranch` to
    * `fromBranch`'s audited version. Metadata-only (one ref write) — the
    * data files were already durable at the write step. Returns the
    * published version.
    */
  def publishBranch(table: String, fromBranch: String = "audit",
      toBranch: String = "main",
      store: CommitStore = PosixLinkCommitStore): Long = {
    val v = branchVersion(table, fromBranch, store).getOrElse(
      throw new IllegalArgumentException(s"no branch '$fromBranch' at $table"))
    setBranch(table, toBranch, v, store)
    v
  }

  /** Concurrency contract (r13 review): vacuum races CONSUMERS safely
    * (readers of retained versions; `minAgeMs` shields freshly staged
    * files of in-flight commits), but NOT a concurrent [[restore]] /
    * [[commitTag]]-to-an-old-version: a restore re-references a dropped
    * version's files by path, and a vacuum running in the same window
    * computes liveness from the retained manifests only — the restored
    * head could point at just-deleted files. Run vacuum and restore from
    * the same single maintenance writer (the posture every layout
    * maintenance op in this repo documents); they are mutually exclusive
    * by contract, not by lock. */
  def vacuum(table: String, retainVersions: Int = Int.MaxValue,
      minAgeMs: Long = 3600000L,
      store: CommitStore = PosixLinkCommitStore): Long = {
    val vs = versions(table, store)
    val dropped = vs.dropRight(retainVersions)
    if (dropped.nonEmpty) {
      // MANDATORY chain-cut checkpoints BEFORE any manifest deletion (r15
      // delta manifests): a retained delta whose resolution chain passes
      // through a to-be-dropped manifest must first be made
      // self-contained, or dropping the manifest would break every read of
      // the retained version. Ascending order lets later retained chains
      // stop at an earlier version's fresh checkpoint. A failure here
      // aborts the vacuum with nothing deleted — safe by construction.
      val droppedSet = dropped.toSet
      val retained = vs.filterNot(droppedSet)
      var names = store.list(manifestDir(table)).toSet
      val cache =
        scala.collection.mutable.Map[Long, Seq[(String, Option[Long])]]()
      def chainCrossesDropped(r: Long): Boolean = {
        var cur = r
        while (true) {
          if (cur != r) {
            if (droppedSet.contains(cur)) return true
            if (names.contains(checkpointName(cur))) return false
          }
          headerBase(headerLineOf(table, cur, store)) match {
            case Some(b) => cur = b
            case None => return false // reached a self-contained manifest
          }
        }
        false
      }
      retained.foreach { r =>
        if (!names.contains(checkpointName(r)) && chainCrossesDropped(r)) {
          publishCheckpoint(table, r, store,
            manifestEntries(table, r, store, cache, names))
          cache.filterInPlace((k, _) => k == r) // bound memory to O(F)
          names += checkpointName(r)
        }
      }
    }
    dropped.foreach { v =>
      store.delete(manifestDir(table), manifestName(v))
      store.delete(manifestDir(table), checkpointName(v)) // now chain-dead
      store.delete(manifestDir(table), statsName(v)) // advisory sidecar
      store.delete(manifestDir(table), ndvName(v)) // advisory sidecar
    }
    if (dropped.nonEmpty) {
      // bloom sidecars of dropped versions, including buildBloomIndex's
      // suffixed ones; like stats, advisory — a still-live file whose bloom
      // rode a dropped version's sidecar just stops skipping, never breaks
      val gone = dropped.toSet
      store.list(manifestDir(table))
        .filter(n => (n.startsWith("b") || n.startsWith("n")) &&
          n.endsWith(".json") &&
          n.length >= 12 && n.substring(1, 12).forall(_.isDigit) &&
          gone.contains(n.substring(1, 12).toLong))
        .foreach(store.delete(manifestDir(table), _))
    }
    // Live-set union across retained manifests: the shared resolution
    // cache makes this O(F + Σ retained deltas) — each retained version
    // resolves against its predecessor's cached entries instead of
    // re-reading the whole history (the r14 O(V·F̄) cumulative-union edge,
    // closed by the delta format rather than parallelized around).
    val cacheU =
      scala.collection.mutable.Map[Long, Seq[(String, Option[Long])]]()
    val namesU = store.list(manifestDir(table)).toSet
    // mutable accumulator, delta-aware: a version whose manifest is a
    // delta on the IMMEDIATELY PRECEDING retained version contributes
    // only its ADDS (its full set ⊆ predecessor's set ∪ adds — removes
    // never shrink a union), so the whole union costs O(F + Σ adds)
    // instead of the O(V·F̄) per-version re-insertion the r14 probe
    // measured as the one super-linear metadata edge
    val live = scala.collection.mutable.HashSet.empty[String]
    var prevUnioned = -1L
    versions(table, store).foreach { v =>
      val txt = store.get(manifestDir(table), manifestName(v))
      headerBase(txt.linesIterator.next()) match {
        case Some(b) if b == prevUnioned && prevUnioned >= 0 =>
          parseDeltaBody(txt)._2.foreach(e => live.add(e._1))
        case _ => // first version, full form, or a non-linear base:
          // resolve the whole set (cache keeps repeated walks cheap)
          manifestEntries(table, v, store, cacheU, namesU)
            .foreach(e => live.add(e._1))
          cacheU.filterInPlace((k, _) => k == v) // bound memory to O(F)
      }
      prevUnioned = v
    }
    val dataRoot = Paths.get(table, "data")
    if (!Files.exists(dataRoot)) return 0L
    val cutoff = System.currentTimeMillis() - minAgeMs
    val s = Files.walk(dataRoot)
    val all = try s.iterator().asScala
      .filter(p => p.toString.endsWith(".parquet")).toSeq finally s.close()
    val dead = all.filterNot(p =>
      live.contains(Paths.get(table).relativize(p).toString))
      .filter(p => Files.getLastModifiedTime(p).toMillis < cutoff)
    dead.foreach(p => Files.deleteIfExists(p))
    // remove commit dirs holding no live parquet (crashed commits leave
    // _SUCCESS/.crc markers behind — reclaim the whole directory); the same
    // age cutoff keeps mid-write staging dirs (no .parquet yet) alive
    val d = Files.list(dataRoot)
    try d.iterator().asScala.filter(Files.isDirectory(_))
      .filter(dir => Files.getLastModifiedTime(dir).toMillis < cutoff)
      .foreach { dir =>
        val c = Files.walk(dir)
        val hasLive = try c.iterator().asScala.exists(p =>
          p.toString.endsWith(".parquet")) finally c.close()
        if (!hasLive) {
          val w = Files.walk(dir)
          try w.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => Files.deleteIfExists(p))
          finally w.close()
        }
      }
    finally d.close()
    dead.size.toLong
  }
}
