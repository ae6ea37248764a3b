package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.TableCatalog

/** Scratch probe: macro-averaged recall of FILTERED batch ANN
  * (`ivfBatchTopK(filter = …)`, the gate config: nLists=16, iters=2,
  * nProbe=8, predicate `label <= 3`) against the filtered brute force,
  * per driver SF — measures the floor the `sim_ann_ivf_filtered` gate
  * pins. (Temporary tool — not part of the engine surface.)
  */
object FilteredAnnProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs) {
      val emb = TableCatalog.load(spark, dir, "embeddings")
      val pred = col("label") <= 3
      val queries = emb.where(pmod(col("vec_id"), lit(25)) === 0)
      val path =
        java.nio.file.Files.createTempDirectory("fap_ivf_").toString
      Similarity.ivfWrite(emb, "vec_id", "embedding", path,
        nLists = 16, kMeansIters = 2, payloadCols = Seq("label"))
      val exact = Similarity.bruteForceBatchTopK(emb.where(pred),
        "vec_id", "embedding", queries, "vec_id", "embedding", 10)
        .localCheckpoint(false)
      val ann = Similarity.ivfBatchTopK(spark, path, queries,
        "vec_id", "embedding", 10, nProbe = 8, filter = Some(pred))
      val r = exact.select(col("q_id"), col("vec_id").as("eid"))
        .join(ann.select(col("q_id"), col("vec_id").as("eid"))
          .withColumn("m", lit(1)), Seq("q_id", "eid"), "left")
        .groupBy(col("q_id"))
        .agg(count(lit(1)).as("n"), count(col("m")).as("h"))
        .agg(avg(col("h") / col("n"))).head().getDouble(0)
      // the filter must never leak a non-matching row into the result
      val leaks = ann.join(emb.select(col("vec_id"), col("label")),
        "vec_id").where(!pred).count()
      // SQ8 twin: payload in the codes table, filter before the shortlist
      val sqPath =
        java.nio.file.Files.createTempDirectory("fap_sq_").toString
      Similarity.ivfSqWrite(emb, "vec_id", "embedding", sqPath,
        nLists = 16, kMeansIters = 2, payloadCols = Seq("label"))
      val annSq = Similarity.ivfSqBatchTopK(spark, sqPath, queries,
        "vec_id", "embedding", 10, nProbe = 12, rerank = 64,
        filter = Some(pred))
      val rSq = exact.select(col("q_id"), col("vec_id").as("eid"))
        .join(annSq.select(col("q_id"), col("vec_id").as("eid"))
          .withColumn("m", lit(1)), Seq("q_id", "eid"), "left")
        .groupBy(col("q_id"))
        .agg(count(lit(1)).as("n"), count(col("m")).as("h"))
        .agg(avg(col("h") / col("n"))).head().getDouble(0)
      val leaksSq = annSq.join(emb.select(col("vec_id"), col("label")),
        "vec_id").where(!pred).count()
      // IVFADC twin: same contract through the PQ codes table
      val pqPath =
        java.nio.file.Files.createTempDirectory("fap_pq_").toString
      Similarity.ivfPqWrite(emb, "vec_id", "embedding", pqPath,
        nLists = 16, m = 16, ksub = 32, kMeansIters = 2,
        payloadCols = Seq("label"))
      val annPq = Similarity.ivfPqBatchTopK(spark, pqPath, queries,
        "vec_id", "embedding", 10, nProbe = 12, rerank = 64,
        filter = Some(pred))
      val rPq = exact.select(col("q_id"), col("vec_id").as("eid"))
        .join(annPq.select(col("q_id"), col("vec_id").as("eid"))
          .withColumn("m", lit(1)), Seq("q_id", "eid"), "left")
        .groupBy(col("q_id"))
        .agg(count(lit(1)).as("n"), count(col("m")).as("h"))
        .agg(avg(col("h") / col("n"))).head().getDouble(0)
      val leaksPq = annPq.join(emb.select(col("vec_id"), col("label")),
        "vec_id").where(!pred).count()
      println(f"[filtered-ann] $dir ivf recall=$r%.3f leaks=$leaks " +
        f"sq8 recall=$rSq%.3f leaks=$leaksSq " +
        f"ivfpq recall=$rPq%.3f leaks=$leaksPq")
    }
    spark.stop()
  }
}
