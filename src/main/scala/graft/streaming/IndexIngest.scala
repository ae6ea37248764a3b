package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Dedup, Similarity}

/** Structured-Streaming maintenance of a persisted ANN index — the
  * production nightly-ingest loop as a stream: each micro-batch of
  * embeddings is (optionally) near-dup-checked against the CURRENT index
  * state and the surviving rows are appended into the cell layout, so the
  * index is queryable between batches and never retrains in-line.
  *
  * Per micro-batch:
  *   1. `dedupThreshold` set → [[Dedup.semanticDedupIncremental]] flags
  *      batch rows whose cosine against any row in their probed cells
  *      reaches the threshold — reading ONLY the touched cell partitions
  *      of the index, never the corpus ([[graft.operators.Similarity]]
  *      layout contract), then a second INTRA-batch stage drops same-cell
  *      near-dup pairs inside the batch itself (greedy smaller-id keep).
  *      Because accepted rows are appended before the next batch arrives,
  *      later batches dedup against earlier ones automatically — the
  *      cross-batch property a pre-stream batch dedup cannot give;
  *   2. survivors append via [[Similarity.ivfAppend]] (assignment against
  *      the persisted sidecar centroids — no retrain; the standard Faiss
  *      `IndexIVF.add` maintenance trade);
  *   3. run [[Similarity.ivfCompact]] on a cadence (caller-side; each
  *      append adds ≥1 file per touched cell).
  *
  * Delivery semantics: plain-parquet appends carry no commit dedup key,
  * so a micro-batch replayed after a crash between the append and the
  * checkpoint advance can append twice — AT-LEAST-ONCE, documented: for
  * an ANN corpus a duplicated vector only duplicates a neighbor entry
  * (and a dedupThreshold ingest drops the replayed copy at the gate,
  * since its first copy is already in the index). Pipelines needing
  * exactly-once index maintenance should land vectors through the
  * snapshot-lake path and rebuild layouts from committed snapshots.
  */
object IndexIngest {

  /** Drive an embedding stream into the persisted IVF layout at `path`.
    * `dedupThreshold` = None ingests everything (deterministic);
    * Some(t) drops batch rows with a ≥ t cosine neighbor already indexed.
    */
  def streamAppendToIndex(embeddings: DataFrame, idCol: String,
      vecCol: String, path: String, checkpointDir: String,
      dedupThreshold: Option[Double] = None,
      nProbe: Int = 2): StreamingQuery =
    embeddings.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        appendBatch(batch, idCol, vecCol, path, dedupThreshold, nProbe)
      }
      .start()

  /** One micro-batch's worth of the ingest loop — factored out so the
    * batch-replay equivalence (stream ≡ sequential applies over the same
    * chunks) is testable without a streaming harness. With a threshold
    * set, the gate is two-stage: batch-vs-INDEX (the persisted cells),
    * then batch-vs-BATCH within each assigned cell (greedy smaller-id
    * keep, the [[Dedup.semanticDedup]] convention) — without the second
    * stage, near-duplicates arriving in the SAME micro-batch would all
    * pass the corpus gate and be indexed together (round-8 review). */
  def appendBatch(batch: DataFrame, idCol: String, vecCol: String,
      path: String, dedupThreshold: Option[Double],
      nProbe: Int = 2): Unit = {
    dedupThreshold match {
      case None =>
        if (!batch.isEmpty)
          Similarity.ivfAppend(batch, idCol, vecCol, path)
      case Some(t) =>
        val flags = Dedup.semanticDedupIncremental(batch, path, idCol,
          vecCol, t, nProbe)
        // corpus survivors, with their primary cell as the intra-batch
        // blocking key
        val survivors = batch.join(
          flags.where(!col("dup")).select(col(idCol), col("cell")),
          Seq(idCol))
        val dropped = Dedup.embeddingNearDupPairs(survivors, idCol,
          vecCol, "cell", t)
          .select(col("id_b").as(idCol)).distinct()
        // checkpoint: the gate plan (cell-partition probe join + pair
        // mine) otherwise re-executes for the emptiness probe AND the
        // append write
        val novel = survivors.join(dropped, Seq(idCol), "left_anti")
          .drop("cell")
          .localCheckpoint(false)
        if (!novel.isEmpty)
          Similarity.ivfAppend(novel, idCol, vecCol, path)
    }
  }
}
