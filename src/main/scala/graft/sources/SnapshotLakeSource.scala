package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.{DataSourceRegister, InsertableRelation}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.sinks.SnapshotLake

/** DataSource V2 connector for the snapshot lake — the fourth custom
  * Catalyst tier (after expressions, the optimizer rule, and the planner
  * strategy): `spark.read.format("snapshot-lake")` and SQL
  * `CREATE ... USING snapshot-lake` resolve a manifest-pinned snapshot
  * and hand the EXACT file list to Spark's own ParquetTable, so filter
  * pushdown, column pruning, vectorized reads and AQE all apply unchanged
  * — the connector contributes snapshot isolation, not a scan engine.
  *
  * Options:
  *   - `path` (required): the lake table directory
  *   - `versionAsOf`: pin a committed version (default: latest)
  *   - `timestampAsOf`: epoch millis; newest version committed at or
  *     before it (mutually exclusive with `versionAsOf`)
  *
  * Reads see exactly the chosen manifest's files — commits racing the
  * query never change what it sees (the same isolation
  * [[SnapshotLake.read]] gives the DataFrame API, now addressable from
  * pure SQL). Time travel uses options rather than `VERSION AS OF` syntax
  * because the latter requires a V2 catalog implementation; the option
  * spelling works in `CREATE TEMPORARY VIEW ... USING ... OPTIONS`.
  *
  * Writes (`INSERT INTO` / `INSERT OVERWRITE` on an unpinned view) go
  * through the V1 write bridge into [[SnapshotLake.commitAppend]] /
  * [[SnapshotLake.commitOverwrite]] — the OCC manifest protocol, NOT a
  * raw file drop: the delegate's own file-writing path is unreachable
  * because the wrapper exposes only this builder. Version-pinned views
  * reject writes (inserting "into the past" would silently target
  * whatever the head happens to be).
  *
  * A temporary view resolves its snapshot ONCE, at creation — reads
  * through it are stable under concurrent commits (including its own
  * inserts); re-create the view or issue a fresh `read.format` load to
  * observe a newer head. That is the isolation semantics a snapshot
  * store should give a named reader, made explicit.
  */
class SnapshotLakeSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "snapshot-lake"

  override def supportsExternalMetadata(): Boolean = true

  private case class Resolved(table: String, pinned: Boolean,
      paths: Seq[String])

  private def resolve(options: CaseInsensitiveStringMap): Resolved = {
    val table = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "snapshot-lake requires a 'path' option naming the table directory"))
    def longOpt(key: String): Option[Long] =
      Option(options.get(key)).map { v =>
        try v.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"snapshot-lake option '$key' must be a long, got '$v'")
        }
      }
    val vOpt = longOpt("versionAsOf")
    val tsOpt = longOpt("timestampAsOf")
    require(vOpt.isEmpty || tsOpt.isEmpty,
      "versionAsOf and timestampAsOf are mutually exclusive")
    val vs = SnapshotLake.versions(table)
    require(vs.nonEmpty, s"no committed snapshots at $table")
    // shared resolution with SnapshotLake.readAsOf (versionAt) so the SQL
    // and DataFrame surfaces cannot drift. Note: Spark calls inferSchema
    // and getTable as two separate provider calls, so an UNPINNED load
    // racing a concurrent commit may infer its schema from version N and
    // scan N+1 — the scan itself still reads exactly one manifest
    // (snapshot-consistent); pin versionAsOf for fully stable resolution.
    val v = vOpt.getOrElse(tsOpt match {
      case None => vs.max
      case Some(ts) => SnapshotLake.versionAt(table, ts)
    })
    val files = SnapshotLake.manifestFiles(table, v)
    require(files.nonEmpty,
      s"snapshot v$v at $table has no data files (connector reads need " +
        "at least one file to carry the schema)")
    Resolved(table, vOpt.isDefined || tsOpt.isDefined,
      files.map(f => s"$table/$f"))
  }

  private def delegate(options: CaseInsensitiveStringMap,
      schema: Option[StructType]): (ParquetTable, Resolved) = {
    val r = resolve(options)
    (ParquetTable("graft-snapshot-lake", SparkSession.active, options,
      r.paths, schema, classOf[ParquetFileFormat]), r)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    delegate(options, None)._1.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val (pt, r) = delegate(
      new CaseInsensitiveStringMap(properties), Some(schema))
    new SnapshotLakeTable(pt, r.table, r.pinned)
  }
}

/** Read-delegating, commit-protocol-writing table. The ParquetTable
  * delegate supplies scans (pushdown, pruning, vectorization); writes are
  * re-routed through the manifest commit so SQL inserts get the same
  * atomicity/isolation as the programmatic API. */
private[sources] class SnapshotLakeTable(delegate: ParquetTable,
    tablePath: String, pinned: Boolean)
    extends Table with SupportsRead with SupportsWrite {

  override def name(): String = s"snapshot-lake($tablePath)"

  override def schema(): StructType = delegate.schema

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = delegate.newScanBuilder(options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(!pinned,
      s"cannot INSERT into a version-pinned snapshot-lake view of " +
        s"$tablePath — writes always target the head; create an unpinned " +
        "view to write")
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, ow: Boolean): Unit = {
              if (overwrite || ow)
                SnapshotLake.commitOverwrite(data, tablePath)
              else SnapshotLake.commitAppend(data, tablePath)
              ()
            }
          }
      }
    }
  }
}
