package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (r14, VERDICT r13 item 4): isolates the triangle
  * ESTIMATOR's own cost vs the exact census on the co-purchase graph at
  * an arbitrary corpus dir — the gate query runs both (the oracle needs
  * the exact census), so its timing can't show the budget knob's value.
  * Times, warm (second of two runs each): exact census, estimator at
  * p = 0.5 / 0.25 / 0.1.
  */
object TriEstProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_scale100"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.sources.TableCatalog.load(spark, dir, "lineitem")
      .where(col("l_orderkey") % 5 === 0)
      .select(col("l_orderkey"), col("l_partkey"))
    val edges = graft.operators.Graph.coOccurrenceEdges(
      li, "l_partkey", "l_orderkey").localCheckpoint(false)
    def t2(label: String)(body: => Long): Unit = {
      val xs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[tri-est] $label%-16s cold=${xs(0)._1}%7.2fs " +
        f"warm=${xs(1)._1}%7.2fs value=${xs(1)._2}")
    }
    t2("exact") {
      graft.operators.Graph.triangleStats(edges, "src", "dst")
        .select(col("n_triangles")).head().getLong(0)
    }
    Seq(0.5, 0.25, 0.1).foreach { p =>
      t2(s"estimate p=$p") {
        graft.operators.Graph
          .triangleStatsEstimate(edges, "src", "dst", p = p)
          .select(col("n_triangles_est")).head().getLong(0)
      }
    }
    spark.stop()
  }
}
