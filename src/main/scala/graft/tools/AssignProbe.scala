// lives in the operators package for access to the private[operators]
// assignment expressions it probes; kept under tools/ with its peers
package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Isolated cost probe for the IVF cell-assignment expression: times
  * `withCellAssignment` (hier argmax via probeCellsColHier — transform +
  * array_sort over centroid-struct literals, DotProduct inner loops) on a
  * synthetic unit-vector frame at at-scale parameters (nLists ∝ n), so
  * the measured seconds are the assignment term alone — no train, no
  * write, no shuffle. Guides whether a fused argmax Expression is worth
  * building over the composable form.
  */
object AssignProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val nLists = if (args.length > 1) args(1).toInt else 1024
    val d = if (args.length > 2) args(2).toInt else 64
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // deterministic pseudo-random unit-ish vectors and centroids
    def vec(seed: Column) = transform(sequence(lit(0), lit(d - 1)),
      i => (pmod(xxhash64(seed, i), lit(1000)).cast("double") - 500.0) / 500.0)
    val rows = spark.range(n)
      .select(col("id"), vec(col("id")).as("dv0"))
      .select(col("id"), col("dv0"),
        sqrt(aggregate(col("dv0"), lit(0.0), (a, x) => a + x * x)).as("nrm"))
      .select(col("id"),
        transform(col("dv0"), x => x / col("nrm")).as("dv"),
        lit(1.0).as("v_norm"))
      .localCheckpoint(true)
    val cents: Seq[(Long, Seq[Double], Double)] = (0L until nLists).map { c =>
      val v = (0 until d).map(i =>
        (((c * 7919 + i * 104729) % 1000) - 500).toDouble / 500.0)
      val norm = math.sqrt(v.map(x => x * x).sum)
      (c, v.map(_ / norm), 1.0)
    }
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val s = f
      System.err.println(
        f"[assign] $label%-18s ${(System.nanoTime() - t0) / 1e9}%8.2fs distinct=$s")
    }
    // warm + 2 measured passes of the full assignment expression
    (1 to 3).foreach { i =>
      time(s"hier run$i") {
        Similarity.withCellAssignment(rows, cents)
          .agg(approx_count_distinct(col("cell"))).head().getLong(0)
      }
    }
    spark.stop()
  }
}
