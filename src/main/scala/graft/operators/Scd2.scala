package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history construction — the warehouse
  * shape a Sybase-IQ-to-lake migration lands dimension tables in (the
  * reference moves dimensions as flat extracts,
  * `/root/reference/Assets/sybaseiq/glue/extractor/code/sybaseiq_extractor.py:284-293`;
  * versioned validity intervals are what the lake side needs on top).
  *
  * Dataflow: a change-event stream `(key, ts, state…)` is compressed into
  * validity intervals with classic gaps-and-islands — consecutive equal
  * states collapse into one row carrying `effective_from`/`effective_to`/
  * `is_current`. The same key can re-enter an earlier state (A→B→A) and
  * correctly gets a NEW interval.
  *
  * Scale: everything runs under ONE hash partitioning on `keyCols` — the
  * lag window, the island aggregation (grouping on (key, island) is
  * satisfied by the key partitioning: subset clustering co-locates), and
  * the lead window all reuse the same exchange, so a 100 TB event table
  * pays exactly one shuffle. Per-key state is bounded by events-per-key
  * (dimension keys see few changes in practice); no global sort exists.
  */
object Scd2 {

  /** Compress change events into SCD2 intervals.
    *
    * @param events    one row per observed state
    * @param keyCols   dimension key
    * @param tsCol     event time (any orderable type; becomes effective_from)
    * @param tieBreak  deterministic order for same-ts events of one key
    * @param stateCols tracked attributes; consecutive runs of equal values
    *                  (null-safe) collapse into one interval
    * @return keyCols ++ stateCols ++ (effective_from, effective_to,
    *         is_current, n_events); effective_to is null on the open row
    */
  def fromEvents(events: DataFrame, keyCols: Seq[String], tsCol: String,
      tieBreak: Seq[String], stateCols: Seq[String]): DataFrame = {
    val key = keyCols.map(col)
    val ord = (tsCol +: tieBreak).map(col)
    val w = Window.partitionBy(key: _*).orderBy(ord: _*)
    // Null-safe "state changed vs previous event" — first event of a key is
    // always a change (lag yields an all-null struct, <=> makes that false
    // only if the state is itself all-null; guard with row_number instead).
    val stateStruct = struct(stateCols.map(col): _*)
    val changed = when(row_number().over(w) === 1, lit(1))
      .otherwise(when(stateStruct <=> lag(stateStruct, 1).over(w), lit(0))
        .otherwise(lit(1)))
    // Two steps: a window function may not appear inside another window
    // aggregate, so `changed` materializes first. Both windows share the
    // same partitioning/ordering — one exchange, one sort.
    val islands = events
      .withColumn("__chg", changed)
      .withColumn("__island", sum(col("__chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__chg")
    // State columns are constant within an island; min() is a deterministic
    // pick that DuckDB reproduces (vs any_value).
    val aggs = stateCols.map(c => min(col(c)).as(c)) ++ Seq(
      min(col(tsCol)).as("effective_from"),
      count(lit(1)).as("n_events"))
    val compressed = islands
      .groupBy((key :+ col("__island")): _*)
      .agg(aggs.head, aggs.tail: _*)
    // Islands are numbered in event order, so they are the deterministic
    // refinement when two islands of one key share an effective_from
    // (same-ts events with different states → zero-length interval).
    val wk = Window.partitionBy(key: _*)
      .orderBy(col("effective_from"), col("__island"))
    compressed
      .withColumn("effective_to", lead(col("effective_from"), 1).over(wk))
      .withColumn("is_current", col("effective_to").isNull)
      .drop("__island")
      .select((keyCols ++ stateCols ++
        Seq("effective_from", "effective_to", "is_current", "n_events"))
        .map(col): _*)
  }

  /** Merge a batch of new change events into an existing SCD2 table
    * (incremental nightly load): intervals that were already CLOSED are
    * immutable and pass through untouched; each key's OPEN interval is
    * re-expressed as its original opening event and re-compressed together
    * with the new events, so an unchanged state extends the open interval
    * (no spurious version) and a changed state closes it at the first
    * differing event.
    *
    * n_events on re-compressed rows counts the surviving opening event plus
    * new events folded into the run (history of intermediate events inside
    * a previously-compressed open interval is not re-expandable — that is
    * inherent to storing intervals, and n_events reflects it).
    *
    * Scale: closed history is read and written untouched (no shuffle on the
    * immutable bulk — at lake scale pair this with a partition layout that
    * separates open rows); only open rows + the new batch shuffle.
    *
    * ORDERING CONTRACT: every new event's `ts` must be >= its key's open
    * interval's `effective_from`. Closed history is immutable here — an
    * out-of-order event that predates the open interval re-compresses into
    * an interval OVERLAPPING the closed history (the closed row's
    * `effective_to` no longer chains to the next `effective_from`). The
    * streaming wrapper guarantees this by construction (watermarked
    * event-time order per key); batch callers replaying a backfill must
    * instead rebuild from the full event log with [[fromEvents]]. Set
    * `failOnLateEvents = true` to enforce the contract with one extra
    * aggregation over the (small) batch: late events are counted per join
    * against the open intervals and the call fails naming the count, so a
    * corrupted history is impossible rather than silent.
    */
  def applyChanges(current: DataFrame, events: DataFrame,
      keyCols: Seq[String], tsCol: String, tieBreak: Seq[String],
      stateCols: Seq[String], failOnLateEvents: Boolean = false): DataFrame = {
    if (failOnLateEvents) {
      val openFrom = current.where(col("is_current"))
        .select(keyCols.map(col) :+ col("effective_from").as("__open_from"): _*)
      val late = events.join(openFrom, keyCols)
        .where(col(tsCol) < col("__open_from")).count()
      require(late == 0L,
        s"$late event(s) predate their key's open interval's " +
          "effective_from; applyChanges cannot splice them into immutable " +
          "closed history — rebuild with fromEvents over the full log")
    }
    val outCols = keyCols ++ stateCols ++
      Seq("effective_from", "effective_to", "is_current", "n_events")
    val closed = current.where(!col("is_current"))
      .select(outCols.map(col): _*)
    // The open interval re-enters the compressor as one event at its own
    // effective_from; tieBreak columns are not stored on intervals, so it
    // sorts ahead of any same-ts new event via a null-first tiebreak.
    val openAsEvents = current.where(col("is_current"))
      .select((keyCols.map(col) ++
        Seq(col("effective_from").as(tsCol)) ++
        tieBreak.map(c => lit(null).cast(events.schema(c).dataType).as(c)) ++
        stateCols.map(col)): _*)
    val newEvents = events.select((keyCols.map(col) ++
      Seq(col(tsCol)) ++ tieBreak.map(col) ++ stateCols.map(col)): _*)
    val recompressed = fromEvents(openAsEvents.unionByName(newEvents),
      keyCols, tsCol, tieBreak, stateCols)
    closed.unionByName(recompressed.select(outCols.map(col): _*))
  }

  /** Quarantine split for the ordering contract: partition a batch into
    * (onTime, late), where `late` holds every event predating its key's
    * open interval's `effective_from` (those would overlap immutable closed
    * history if applied). The intended nightly-load shape is
    * {{{
    *   val (ok, late) = Scd2.partitionLateEvents(current, batch, keys, ts)
    *   late.write…                      // quarantine sink for replay audit
    *   Scd2.applyChanges(current, ok, …)
    * }}}
    * so a pipeline keeps flowing on partial disorder instead of failing the
    * whole batch (`failOnLateEvents`) or corrupting history (neither).
    * Events for unknown keys are on-time by definition (left join).
    *
    * Scale: one broadcast-or-hash left join of the batch against only the
    * OPEN rows of the dimension (open set is one row per live key); the
    * immutable closed bulk is never read.
    */
  def partitionLateEvents(current: DataFrame, events: DataFrame,
      keyCols: Seq[String], tsCol: String): (DataFrame, DataFrame) = {
    val openFrom = current.where(col("is_current"))
      .select(keyCols.map(col) :+ col("effective_from").as("__open_from"): _*)
    val tagged = events.join(openFrom, keyCols, "left")
      .withColumn("__late",
        col("__open_from").isNotNull && col(tsCol) < col("__open_from"))
    (tagged.where(!col("__late")).drop("__open_from", "__late"),
      tagged.where(col("__late")).drop("__open_from", "__late"))
  }
}
