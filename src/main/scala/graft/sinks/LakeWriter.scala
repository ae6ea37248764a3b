package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import graft.operators.Transforms

/** Lake sink layer — K1/K2/K3 of SURVEY.md §2.1.
  *
  * The reference writes append-mode partitioned Parquet under
  * `{SourceName}/{SourceSchema}/{SourceTable}/` and registers the result in
  * the Glue catalog (`sybaseiq_extractor.py:156-164,239-255`). Spark-native:
  * Hive-style `partitionBy` Parquet layout, which gives Catalyst static and
  * dynamic partition pruning at read time with no extra index.
  */
object WriteMode extends Enumeration {
  /** Append — the reference's only enabled mode (`MaxRetries: 0` +
    * idempotency hash make it effectively exactly-once).
    * OverwritePartitions — the safe version of the reference's dormant
    * overwrite-dedup path (`sybaseiq_extractor.py:183-204`, commented out
    * there over data-loss fears): Spark's dynamic partition overwrite only
    * replaces partitions present in the incoming data.
    */
  val Append, OverwritePartitions = Value
}

/** Table format for the lake layout, orthogonal to [[WriteMode]]. The north
  * star names "Parquet/Delta"; Delta adds ACID commits + compaction on the
  * append path. Delta requires its runtime jars + session extension — absent
  * in this sandbox (offline resolver), so the Delta path is implemented but
  * availability-gated: [[LakeWriter.deltaAvailable]] reports the classpath
  * probe and DeltaSinkSpec skips itself when the jars are missing.
  */
object LakeFormat extends Enumeration {
  val Parquet, Delta = Value
}

final case class WriteResult(path: String, partitionColumns: Seq[String],
    files: Long)

object LakeWriter {

  /** Cluster `df` on the partition columns ahead of a partitioned write:
    * AQE REBALANCE when available (well-sized files + automatic skew
    * split), hash repartition otherwise (the hint is a silent no-op
    * without AQE, which would reintroduce tasks × partitions files).
    */
  private def clusterForWrite(df: DataFrame,
      partCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    if (partCols.isEmpty) df
    else if (df.sparkSession.sessionState.conf.adaptiveExecutionEnabled)
      df.hint("rebalance", partCols.map(col): _*)
    else df.repartition(partCols.map(col): _*)
  }

  /** Classpath probe for the Delta datasource (io.delta:delta-spark). */
  lazy val deltaAvailable: Boolean =
    try {
      Class.forName("org.apache.spark.sql.delta.sources.DeltaDataSource")
      true
    } catch { case _: Throwable => false }

  /** Write `df` to `basePath/lakePathSuffix`, choosing the layout exactly as
    * the reference does (`sybaseiq_extractor.py:168-171,239-250`):
    *   - date-like S3 partition column → derive year/month/day (P5), layout K2
    *   - other column → single-column layout K3
    *   - none → unpartitioned K1 with size-tiered coalesce (X2)
    */
  def write(df: DataFrame, basePath: String, pathSuffix: String,
      s3PartitionColumn: Option[String], rowCount: Long,
      mode: WriteMode.Value = WriteMode.Append,
      format: LakeFormat.Value = LakeFormat.Parquet): WriteResult = {
    if (format == LakeFormat.Delta && !deltaAvailable)
      throw new IllegalStateException(
        "LakeFormat.Delta requested but the Delta datasource is not on the " +
          "classpath (io.delta:delta-spark jars + " +
          "io.delta.sql.DeltaSparkSessionExtension required)")
    val path = s"$basePath/$pathSuffix"
    val (out0, partCols) = s3PartitionColumn match {
      case Some(c) if Transforms.isDateLike(df, c) =>
        (Transforms.datePartColumns(c)(df), Seq("year", "month", "day"))
      case Some(c) =>
        (df, Seq(c))
      case None =>
        (Transforms.coalesceForSize(rowCount)(df), Nil)
    }
    // Cluster rows by the partition columns before a partitioned write: an
    // unclustered write opens one file per (task × live partition) — at 32
    // tasks over a year of days that is ~10⁴ near-empty files per load, the
    // classic small-files pathology (slow to write, slower to read). Under
    // AQE the REBALANCE hint is the right clustering: one well-sized file
    // per partition AND a skew-heavy partition (one hot day at 100 TB) is
    // split into advisory-sized tasks instead of funneling through one.
    // Plain hash repartition is the no-AQE fallback (the hint would be
    // silently ignored there, reintroducing the pathology).
    val out = clusterForWrite(out0, partCols)
    val writer = out.write.format(
      if (format == LakeFormat.Delta) "delta" else "parquet")
    val configured = mode match {
      case WriteMode.Append => writer.mode(SaveMode.Append)
      case WriteMode.OverwritePartitions =>
        writer.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
    }
    val withParts =
      if (partCols.nonEmpty) configured.partitionBy(partCols: _*) else configured
    withParts.save(path)
    val files = countParquetFiles(java.nio.file.Paths.get(path))
    WriteResult(path, partCols, files)
  }

  /** Latest-wins upsert — the MERGE analogue on plain partitioned Parquet
    * (with [[LakeFormat.Delta]] available this is a real `MERGE INTO`; this
    * path is the format-agnostic fallback). Affected partitions are read
    * back, merged (per-key latest by `versionCol`, incoming wins ties) and
    * rewritten via dynamic partition overwrite; untouched partitions are
    * never opened.
    *
    * "Affected" = partitions the incoming batch lands in, plus — when
    * `keysMayChangePartition` (default) — partitions still holding an older
    * version of an incoming key, found by a key semi-join over the existing
    * table (a full scan; set the flag false when the partition value is
    * derived from an immutable key attribute to keep the cost
    * O(incoming partitions)). Caveat, inherent to overwrite-based merge: a
    * partition whose LAST row moves away produces no output row for that
    * partition, so dynamic overwrite cannot clear it — fully-emptied
    * partitions need the Delta path (real deletes).
    */
  def upsertLatestWins(incoming: DataFrame, basePath: String,
      pathSuffix: String, keyCols: Seq[String], versionCol: String,
      s3PartitionColumn: Option[String] = None,
      keysMayChangePartition: Boolean = true): WriteResult = {
    import org.apache.spark.sql.functions.{broadcast, col, lit, row_number}
    import org.apache.spark.sql.expressions.Window
    val spark = incoming.sparkSession
    val path = s"$basePath/$pathSuffix"
    val (incPrepped, partCols) = s3PartitionColumn match {
      case Some(c) if Transforms.isDateLike(incoming, c) =>
        (Transforms.datePartColumns(c)(incoming), Seq("year", "month", "day"))
      case Some(c) => (incoming, Seq(c))
      case None => (incoming, Nil)
    }
    val exists = java.nio.file.Files.exists(java.nio.file.Paths.get(path))
    val merged =
      if (!exists) incPrepped.withColumn("__src", lit(1))
      else {
        val existing = spark.read.parquet(path)
          .select(incPrepped.columns.toIndexedSeq.map(col): _*)
        // Touch partitions the incoming batch lands in, plus (when keys can
        // move) partitions still holding an older version of an incoming
        // key — otherwise the old row survives in its old partition and
        // read-back returns two versions of the key.
        val affected =
          if (partCols.isEmpty) existing
          else {
            val incParts = incPrepped.select(partCols.map(col): _*).distinct()
            val parts =
              if (!keysMayChangePartition) incParts
              else incParts.union(
                existing.join(
                  broadcast(incPrepped.select(keyCols.map(col): _*).distinct()),
                  keyCols, "left_semi")
                  .select(partCols.map(col): _*)).distinct()
            existing.join(broadcast(parts), partCols, "left_semi")
          }
        affected.withColumn("__src", lit(0))
          .unionByName(incPrepped.withColumn("__src", lit(1)))
      }
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col("__src").desc)
    // Eager localCheckpoint breaks lineage from `path` so the dynamic
    // overwrite of the same location is legal; production-at-scale swaps a
    // staging dir or uses the Delta path instead of materializing.
    val latest = merged.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn", "__src")
      .localCheckpoint()
    // cluster by partition columns: see the write() rationale — the merge
    // window shuffles by KEY, so without this every task holds every live
    // partition and the overwrite lands tasks × partitions files
    val clustered = clusterForWrite(latest, partCols)
    val writer = clustered.write.format("parquet").mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
    (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer)
      .save(path)
    WriteResult(path, partCols, countParquetFiles(java.nio.file.Paths.get(path)))
  }

  /** Small-file compaction (the OPTIMIZE analogue for plain parquet): an
    * append-mode streaming tail or many small upserts fragment a partition
    * into files far below the row-group sweet spot; a periodic compaction
    * rewrites each affected leaf directory into its size-tiered file count
    * via a staging-dir rewrite: the replacement files are fully written
    * before the originals are removed, bounding the inconsistency window to
    * the delete+rename of one leaf (true atomic swap needs a table format —
    * that is the [[LakeFormat.Delta]] path; schedule plain-parquet
    * compaction when the partition is not being read). Returns
    * (filesBefore, filesAfter). At 100 TB compaction is per-partition
    * parallel and only rewrites leaves whose file count exceeds the target.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      maxRowsPerFile: Long = 10000000L): (Long, Long) = {
    import java.nio.file.{Files, Paths, Path, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    def parquetLeaves(root: Path): Seq[Path] = {
      val s = Files.walk(root)
      try s.iterator().asScala.filter(p => p.toString.endsWith(".parquet"))
        .map(_.getParent).toSet.toSeq
      finally s.close()
    }
    val root = Paths.get(path)
    val before = countParquetFiles(root)
    def listDir(dir: Path): Seq[Path] = {
      val s = Files.list(dir)
      try s.iterator().asScala.toSeq finally s.close()
    }
    parquetLeaves(root).foreach { leaf =>
      val files = listDir(leaf).filter(_.toString.endsWith(".parquet"))
      val df = spark.read.parquet(files.map(_.toString): _*)
      val rows = df.count()
      // rows-per-file target, capped by the X2 size tier (the tier is a
      // huge-table upper bound; a 6-row leaf should become 1 file, not 8)
      val target = math.min(Transforms.coalesceTier(rows).toLong,
        math.max(1L, (rows + maxRowsPerFile - 1) / maxRowsPerFile)).toInt
      if (files.size > target) {
        val staging = leaf.resolveSibling(leaf.getFileName.toString + "._compact")
        df.coalesce(target)
          .write.mode(SaveMode.Overwrite).parquet(staging.toString)
        files.foreach(Files.delete)
        listDir(staging)
          .filter(p => p.toString.endsWith(".parquet") || p.getFileName.toString == "_SUCCESS")
          .foreach(p => Files.move(p, leaf.resolve(p.getFileName),
            StandardCopyOption.REPLACE_EXISTING))
        val rest = Files.walk(staging)
        try rest.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
        finally rest.close()
      }
    }
    (before, countParquetFiles(root))
  }

  /** Bucketed catalog table — the co-located-join layout: both sides of a
    * recurring equi-join written with `bucketBy` on the join key (same
    * bucket count) join with NO shuffle exchange, the dominant saving for
    * repeated large-table joins at 100 TB. Bucketing requires a catalog
    * table (`saveAsTable`); sortBy within buckets removes the sort step of
    * sort-merge joins too.
    */
  def writeBucketed(df: DataFrame, db: String, table: String,
      bucketCol: String, numBuckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val spark = df.sparkSession
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    if (mode == SaveMode.Overwrite) {
      // A managed-table location can survive a previous session whose
      // in-memory catalog is gone; CREATE refuses to reuse it. Drop both
      // the catalog entry and any orphaned location.
      spark.sql(s"DROP TABLE IF EXISTS `$db`.`$table`")
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      val loc = java.nio.file.Paths.get(warehouse, s"$db.db", table)
      if (java.nio.file.Files.exists(loc)) {
        val s = java.nio.file.Files.walk(loc)
        try s.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally s.close()
      }
    }
    df.write.format("parquet")
      .mode(mode)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(s"`$db`.`$table`")
  }

  /** Register a landed path as a catalog table `{db}.{table}` — the
    * Spark-native analogue of the reference's Glue-catalog registration
    * (`sybaseiq_extractor.py:161-164` `enableUpdateCatalog` +
    * `setCatalogInfo`). External datasource table over the written layout;
    * partitioned layouts get explicit partition columns + RECOVER PARTITIONS
    * so catalog-driven partition pruning works immediately.
    */
  def registerInCatalog(spark: org.apache.spark.sql.SparkSession, db: String,
      table: String, path: String, partitionColumns: Seq[String]): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    spark.sql(s"DROP TABLE IF EXISTS `$db`.`$table`")
    val schema = spark.read.parquet(path).schema
    val partSet = partitionColumns.toSet
    val dataCols = schema.fields.filterNot(f => partSet(f.name))
      .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
    val partCols = schema.fields.filter(f => partSet(f.name))
      .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
    val ddl =
      if (partitionColumns.isEmpty)
        s"CREATE TABLE `$db`.`$table` ($dataCols) USING PARQUET LOCATION '$path'"
      else
        s"""CREATE TABLE `$db`.`$table` ($dataCols, $partCols)
           |USING PARQUET PARTITIONED BY (${partitionColumns.mkString(", ")})
           |LOCATION '$path'""".stripMargin
    spark.sql(ddl)
    if (partitionColumns.nonEmpty)
      spark.sql(s"ALTER TABLE `$db`.`$table` RECOVER PARTITIONS")
  }

  private def countParquetFiles(p: java.nio.file.Path): Long = {
    if (!java.nio.file.Files.exists(p)) 0L
    else {
      val s = java.nio.file.Files.walk(p)
      try s.filter(f => f.toString.endsWith(".parquet")).count()
      finally s.close()
    }
  }
}
