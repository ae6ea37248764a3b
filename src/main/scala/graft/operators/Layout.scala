package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional lake layout: Z-order (Morton) clustering so per-file
  * min/max statistics prune on EVERY z-column, not just a leading sort key.
  * A linear sort on column A gives perfect skipping on A and none on B; the
  * z-layout gives good (≈ sqrt-grid) skipping on each of the interleaved
  * columns — the standard layout trade for multi-predicate scans over
  * 100 TB of parquet (same idea as Delta OPTIMIZE ZORDER BY).
  *
  * Mechanics: each column is mapped to a 2^bits quantile bucket (boundaries
  * from `approxQuantile` — a sampling planning pass, exactly what Spark's
  * own RangePartitioner does), bucket bits are interleaved into one z-value,
  * and the frame is range-partitioned + sorted by it; every output file then
  * covers a compact z-range ⇒ a compact rectangle in column space.
  */
object Layout {

  /** Quantile-bucket index of `v` given sorted inner boundaries: the count
    * of boundaries <= v (0..boundaries.length). `v` must be a plain column
    * attribute — it is referenced per element inside the HOF lambda.
    */
  def bucketIdx(v: Column, boundaries: Seq[Double]): Column =
    size(filter(typedLit(boundaries), b => v >= b)).cast("long")

  /** Interleave the low `bits` bits of each id column (Morton code). */
  def interleaveBits(ids: Seq[Column], bits: Int): Column = {
    val n = ids.size
    val terms = for (b <- 0 until bits; i <- 0 until n)
      yield shiftright(ids(i), b).bitwiseAND(1L) * lit(1L << (b * n + i))
    terms.reduce(_ + _)
  }

  /** Z-value column over `zCols` of `df` (numeric/castable-to-double).
    * One sampling pass computes every column's bucket boundaries (the
    * multi-column `approxQuantile` overload) — the planning cost is one
    * scan regardless of how many columns interleave.
    */
  def zValue(df: DataFrame, zCols: Seq[String], bits: Int): Column = {
    val nb = 1 << bits
    val probs = (1 until nb).map(_.toDouble / nb).toArray
    // 0.01 relative error: bucket EDGES only need to be near-quantiles for
    // the layout to balance — skipping correctness never depends on them
    // (readRange re-checks the predicate) — and the loose summaries cost
    // measurably less than 0.001 on wide scans
    val allBounds = df.stat.approxQuantile(zCols.toArray, probs, 0.01)
    val ids = zCols.zip(allBounds).map { case (c, bounds) =>
      bucketIdx(col(c).cast("double"), bounds.toSeq)
    }
    interleaveBits(ids, bits)
  }

  /** The z-clustered frame: range-partitioned + sorted on the z-value, one
    * output partition per target file. Feed this to any sink — a plain
    * parquet write or a [[graft.sinks.SnapshotLake]] commit with
    * `statsCols = zCols`, which records per-file min/max over exactly the
    * columns the layout makes compact, so manifest-level `readRange`
    * skipping composes with the clustering.
    */
  def zCluster(df: DataFrame, zCols: Seq[String],
      bits: Int = 8, numFiles: Int = 16): DataFrame =
    df.withColumn("__z", zValue(df, zCols, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")

  /** Write `df` z-ordered on `zCols` into `numFiles` files at `path`. */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      bits: Int = 8, numFiles: Int = 16): Unit =
    zCluster(df, zCols, bits, numFiles)
      .write.mode("overwrite").parquet(path)

  /** Bucketed external table: hash-bucketed AND sorted on the join key, so
    * joins between tables bucketed the same way run with NO exchange and NO
    * sort — the data is pre-shuffled once at write time and every
    * subsequent join reuses that layout. At 100 TB this converts the
    * fact-to-fact join (the shuffle neither broadcast nor AQE can remove)
    * into a zip of co-located buckets; the price is paid once, at ingest.
    * Spark only honors bucket layouts through the catalog, hence
    * `saveAsTable` with an explicit external path rather than a bare
    * parquet write.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketCols: Seq[String], numBuckets: Int = 16): Unit =
    // repartition on the bucket key first — same Murmur3-pmod hash as the
    // bucket layout, so each task holds exactly one bucket and each bucket
    // lands as ONE file. Multi-file buckets would force Spark to re-sort
    // at read time (per-bucket order only holds within a file), forfeiting
    // half the layout's value.
    df.repartition(numBuckets, bucketCols.map(col): _*)
      .write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed catalog tables on their bucket key. With both
    * sides laid out by [[writeBucketed]] the plan contains no Exchange —
    * pinned by `LayoutSpec`. To ALSO elide the merge-join sorts, set
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` — sound
    * under [[writeBucketed]]'s one-file-per-bucket guarantee, which is
    * exactly why Spark gates scan-reported ordering behind that flag.
    */
  def bucketedEquiJoin(spark: org.apache.spark.sql.SparkSession,
      leftTable: String, rightTable: String, on: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), on)

  /** Candidate files for a `[lo, hi]` predicate on `c`, decided from
    * per-file min/max exactly as a parquet reader's row-group pruning does.
    * (Diagnostic used by tests/benchmarks to quantify skipping.)
    */
  def candidateFiles(spark: org.apache.spark.sql.SparkSession,
      path: String, c: String, lo: Double, hi: Double): Int = {
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    files.count { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
      !(r.isNullAt(0) || r.getDouble(1) < lo || r.getDouble(0) > hi)
    }
  }
}
