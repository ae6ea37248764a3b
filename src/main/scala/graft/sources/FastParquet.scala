package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-memoized parquet reads (r16 optimization, guide §1.4/§6 — fixed
  * per-call cost): every `spark.read.parquet(...)` pays a schema-inference
  * pass before the first action — measured ~50-80 ms per call on this
  * engine's small lake/sidecar tables (SchemaReadProbe: `read` 60 ms vs
  * 9 ms with an explicit schema), because inference lists the files and
  * reads a parquet footer inside a one-task Spark job. The lake and ANN
  * query paths issue dozens of such reads per query (manifest file lists,
  * centroid/codebook/meta sidecars, codes/vectors tables), so inference is
  * a dominant share of their wall at bench scale and pure overhead at any
  * scale — the file sets are immutable once written.
  *
  * This helper memoizes the INFERRED schema keyed by the read's donor file
  * (the first data file of the path list): the first read of a layout runs
  * Spark's own inference (bit-identical behavior), later reads pass the
  * cached schema explicitly and skip the inference job. Soundness:
  *   - data files here are immutable and content-addressed (lake commit
  *     UUID dirs, write-once ANN layouts, fixture tables), so a donor file
  *     determines its footer forever;
  *   - the cached value is exactly what `spark.read.parquet` returned for
  *     a list led by that donor — not a hand-built footer conversion, so
  *     there is no converter-parity risk;
  *   - heterogeneous-schema snapshots (schema evolution) are guarded by
  *     `expectCols`: when the caller knows the expected union column set
  *     (the lake manifest records it) and the cached schema's field set
  *     differs, the read falls back to plain inference. `mergeSchema`
  *     reads never come through here.
  */
object FastParquet {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  /** Donor file of a path list: the head if it is a parquet file, else the
    * lexicographically first `*.parquet` under it (recursing into Hive
    * partition dirs). None → caller falls back to plain inference. */
  private def donorOf(head: String): Option[String] = {
    val p = java.nio.file.Paths.get(head)
    if (!java.nio.file.Files.isDirectory(p)) {
      if (java.nio.file.Files.exists(p)) Some(head) else None
    } else {
      // bounded recursive descent: first .parquet in sorted order
      val s = java.nio.file.Files.walk(p, 4)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(f => f.toString.endsWith(".parquet") &&
            !java.nio.file.Files.isDirectory(f))
          .map(_.toString).foldLeft(Option.empty[String]) {
            case (None, f) => Some(f)
            case (Some(m), f) => Some(if (f < m) f else m)
          }
      } finally s.close()
    }
  }

  /** `spark.read.parquet(paths…)` with the inference memoized by donor
    * file. `expectCols`: the caller's known union column set (order
    * ignored) — a cached schema with a different field set falls back to
    * plain inference instead of silently dropping evolved columns. */
  def read(spark: SparkSession, paths: Seq[String],
      expectCols: Option[Seq[String]] = None): DataFrame = {
    donorOf(paths.head) match {
      case Some(d) =>
        var st = cache.get(d)
        if (st == null) {
          st = spark.read.parquet(paths: _*).schema
          if (cache.size > 8192) cache.clear() // bound long-session growth
          cache.put(d, st)
        }
        if (expectCols.forall(c => c.toSet == st.fieldNames.toSet))
          spark.read.schema(st).parquet(paths: _*)
        else spark.read.parquet(paths: _*)
      case None => spark.read.parquet(paths: _*)
    }
  }

  /** Single-path convenience. */
  def read(spark: SparkSession, path: String): DataFrame =
    read(spark, Seq(path))
}
