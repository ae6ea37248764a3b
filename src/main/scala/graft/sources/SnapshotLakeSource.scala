package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.DataSourceRegister
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
  * The returned scan reads exactly the chosen manifest's files — commits
  * racing the query never change what it sees (the same isolation
  * [[SnapshotLake.read]] gives the DataFrame API, now addressable from
  * pure SQL). Time travel uses options rather than `VERSION AS OF` syntax
  * because the latter requires a V2 catalog implementation; the option
  * spelling works in `CREATE TEMPORARY VIEW ... USING ... OPTIONS`.
  */
class SnapshotLakeSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "snapshot-lake"

  override def supportsExternalMetadata(): Boolean = true

  private def resolvePaths(options: CaseInsensitiveStringMap): Seq[String] = {
    val table = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "snapshot-lake requires a 'path' option naming the table directory"))
    val vOpt = Option(options.get("versionAsOf")).map(_.toLong)
    val tsOpt = Option(options.get("timestampAsOf")).map(_.toLong)
    require(vOpt.isEmpty || tsOpt.isEmpty,
      "versionAsOf and timestampAsOf are mutually exclusive")
    val vs = SnapshotLake.versions(table)
    require(vs.nonEmpty, s"no committed snapshots at $table")
    val v = vOpt.getOrElse(tsOpt match {
      case None => vs.max
      case Some(ts) =>
        val ok = vs.filter(
          SnapshotLake.commitTimestamp(table, _).exists(_ <= ts))
        require(ok.nonEmpty,
          s"no snapshot at $table committed at or before ts=$ts")
        ok.max
    })
    val files = SnapshotLake.manifestFiles(table, v)
    require(files.nonEmpty,
      s"snapshot v$v at $table has no data files (connector reads need " +
        "at least one file to carry the schema)")
    files.map(f => s"$table/$f")
  }

  private def delegate(options: CaseInsensitiveStringMap,
      schema: Option[StructType]): ParquetTable =
    ParquetTable("graft-snapshot-lake", SparkSession.active, options,
      resolvePaths(options), schema, classOf[ParquetFileFormat])

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    delegate(options, None).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    delegate(new CaseInsensitiveStringMap(properties), Some(schema))
}
