package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sinks.{CommitStore, PosixLinkCommitStore, SnapshotLake}

/** CDC changelog ingestion — apply a Debezium-shaped change stream
  * (op ∈ {I/U, D}, key columns, payload, event time) to a snapshot-lake
  * table with LAST-WRITE-WINS semantics and exactly-once commits: the
  * production path from a database's change feed to an analytics-readable
  * mirror table, built from the engine's own MERGE INTO.
  *
  * Per batch:
  *   1. collapse to the newest change per key — (tsCol DESC, tieCol DESC)
  *      window, one row per key (MERGE requires unique source keys);
  *   2. upserts (op ≠ 'D'): one three-clause MERGE — matched rows update
  *      ONLY when the change is at least as new as the stored row
  *      (`mergeSource(ts) >= target.ts` per column — cross-batch LWW, so
  *      an out-of-order micro-batch can never regress a row), unmatched
  *      rows insert;
  *   3. deletes (op = 'D'): a second MERGE with a conditional matched-
  *      DELETE (same LWW guard), no insert — a delete for an absent key
  *      is a no-op.
  *
  * Exactly-once: both merges commit idempotently keyed on the micro-batch
  * id ([[SnapshotLake.merge]] `dedupKey`) — a replayed batch converges on
  * the versions its first run produced. Both merges retry their
  * optimistic-CAS loss against the refreshed head, so an unrelated
  * concurrent commit (a compaction, another feed) never fails the feed.
  *
  * Documented limitation (standard for tombstone-free CDC mirrors): the
  * target retains no memory of deleted keys, so an upsert arriving in a
  * LATER batch than the delete it precedes in event time re-inserts the
  * row. Within a batch the collapse resolves it exactly; across batches a
  * feed that can replay history out of order should retain tombstones
  * (model them as a payload flag and filter at read).
  *
  * Scale: the collapse is one window over the batch; each MERGE opens
  * O(files overlapping the batch's key span) via the stats-pruned locate,
  * not O(table) — a day of changes against a key-clustered mirror
  * rewrites a handful of files.
  */
object ChangeDataCapture {

  /** Apply one (batch) changelog frame. Returns the table version after
    * the apply (unchanged when the batch is empty or replayed).
    */
  def applyChangelogBatch(spark: SparkSession, table: String,
      changes: DataFrame, keys: Seq[String], tsCol: String, tieCol: String,
      opCol: String, payloadCols: Seq[String],
      dedupPrefix: Option[String] = None,
      store: CommitStore = PosixLinkCommitStore): Long = {
    require(keys.nonEmpty, "changelog apply needs key columns")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    val latest = changes
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .drop("__rn")
    val outCols = keys ++ payloadCols :+ tsCol
    val upserts = latest.where(col(opCol) =!= "D")
      .select(outCols.map(col): _*)
    val deletes = latest.where(col(opCol) === "D")
      .select((keys :+ tsCol).map(col): _*)

    def lww: Column = SnapshotLake.mergeSource(tsCol) >= col(tsCol)
    def retryMerge(source: DataFrame, update: Map[String, Column],
        delete: Option[Column], insert: Boolean, key: String): Long = {
      var attempts = 0
      while (attempts < 50) {
        SnapshotLake.merge(spark, table, source, keys,
          whenMatchedUpdate = update, whenMatchedDelete = delete,
          insertNotMatched = insert, store = store,
          dedupKey = dedupPrefix.map(_ + key)) match {
          case Some(v) => return v
          case None => attempts += 1 // CAS lost to a concurrent commit
        }
      }
      throw new IllegalStateException(
        s"changelog apply lost the commit race 50 times at $table")
    }

    if (SnapshotLake.versions(table, store).isEmpty) {
      // bootstrap: the first batch's upserts found the table; deletes of
      // never-inserted keys are no-ops by definition
      SnapshotLake.commitAppendIdempotent(upserts, table,
        dedupPrefix.getOrElse("cdc-bootstrap") + "-up", store)
    } else {
      val update = (payloadCols :+ tsCol).map(c =>
        c -> when(lww, SnapshotLake.mergeSource(c)).otherwise(col(c))).toMap
      retryMerge(upserts, update, None, insert = true, "-up")
    }
    if (deletes.limit(1).isEmpty)
      SnapshotLake.versions(table, store).max
    else
      retryMerge(deletes, Map.empty, Some(lww), insert = false, "-del")
  }

  /** The streaming entry: drive a changelog stream into the mirror table,
    * one exactly-once apply per micro-batch.
    */
  def streamChangelogToLake(changes: DataFrame, table: String,
      keys: Seq[String], tsCol: String, tieCol: String, opCol: String,
      payloadCols: Seq[String], checkpointDir: String,
      store: CommitStore = PosixLinkCommitStore): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyChangelogBatch(batch.sparkSession, table, batch, keys, tsCol,
          tieCol, opCol, payloadCols,
          dedupPrefix = Some(s"cdc-b$batchId"), store = store)
        ()
      }
      .start()
}
