package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Stage attribution for the prefix-filter set-similarity join. NOTE:
  * localCheckpoint(true) is EAGER — every checkpoint sits INSIDE its timed
  * block, else the cost books to the wrong stage (the first version of
  * this tool made exactly that mistake and under-attributed every leg).
  */
object ProfilePpjoin {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[profile] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(32)
    val threshold = 0.7
    // UnlimitedPairs: this profiler attributes the UNGOVERNED lossless
    // path's stages — the default budget would fall back before stage 3
    time("composed operator WARMUP") {
      Dedup.prefixFilterPairs(docs, "doc_id", "text", 8, threshold,
        maxCandidatePairs = Some(Dedup.UnlimitedPairs)).count()
    }
    time("composed operator end-to-end") {
      Dedup.prefixFilterPairs(docs, "doc_id", "text", 8, threshold,
        maxCandidatePairs = Some(Dedup.UnlimitedPairs)).count()
    }

    val t = lit(threshold)
    time("s1a gramHashes explode count") {
      Dedup.gramHashes(docs, "doc_id", "text", 8)
        .select(col("id"), explode(col("hs0")).as("g")).count()
    }
    val gchk = time("s1b gram explode (chk)") {
      Dedup.gramHashes(docs, "doc_id", "text", 8)
        .select(col("id"), explode(col("hs0")).as("g")).localCheckpoint(true)
    }
    time("s1c df agg from chk") {
      gchk.groupBy(col("g")).agg(count(lit(1)).as("df")).count()
    }
    time("s1d join+collect+sort from chk") {
      gchk.join(gchk.groupBy(col("g")).agg(count(lit(1)).as("df")), "g")
        .groupBy(col("id"))
        .agg(sort_array(collect_list(struct(col("df"), col("g")))).as("sg"))
        .count()
    }
    val sorted = time("stage1 gram+df+sort (chk)") {
      val g = Dedup.gramHashes(docs, "doc_id", "text", 8)
        .select(col("id"), explode(col("hs0")).as("g"))
      val withDf = g.join(
        g.groupBy(col("g")).agg(count(lit(1)).as("df")), "g")
      withDf.groupBy(col("id"))
        .agg(sort_array(collect_list(struct(col("df"), col("g")))).as("sg"))
        .select(col("id"), transform(col("sg"), _.getField("g")).as("gs"),
          size(col("sg")).as("n"))
        .localCheckpoint(true)
    }
    val prefixP = time("stage2 prefix posexplode (chk)") {
      sorted.select(col("id"), col("n"),
        posexplode(slice(col("gs"), lit(1),
          greatest(col("n") - ceil(col("n") * threshold).cast("int") + 1,
            lit(1)))).as(Seq("p", "g")))
        .localCheckpoint(true)
    }
    val cands = time("stage3 cand join+agg+posfilter (chk)") {
      prefixP.as("a").join(prefixP.as("b"),
          col("a.g") === col("b.g") && col("a.id") < col("b.id") &&
            col("a.n") * t <= col("b.n") && col("b.n") * t <= col("a.n"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(count(lit(1)).as("opp"),
          max(col("a.p")).as("pa"), max(col("b.p")).as("pb"),
          first(col("a.n")).as("na"), first(col("b.n")).as("nb"))
        .where(col("opp") +
          least(col("na") - col("pa") - 1, col("nb") - col("pb") - 1) >=
          ceil(t / (lit(1.0) + t) * (col("na") + col("nb")) - 1e-6))
        .select(col("id_a"), col("id_b"))
        .localCheckpoint(true)
    }
    System.err.println(s"[profile] candidates=${cands.count()}")
    time("stage4 verification join") {
      cands
        .join(sorted.select(col("id").as("id_a"), col("gs").as("gs_a"),
          col("n").as("na")), "id_a")
        .join(sorted.select(col("id").as("id_b"), col("gs").as("gs_b"),
          col("n").as("nb")), "id_b")
        .select(col("id_a"), col("id_b"),
          (size(array_intersect(col("gs_a"), col("gs_b"))) /
            (col("na") + col("nb") -
              size(array_intersect(col("gs_a"), col("gs_b"))))).as("j"))
        .where(col("j") >= threshold).count()
    }
    spark.stop()
  }
}
