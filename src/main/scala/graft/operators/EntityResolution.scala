package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage): fold dirty name variants of the same
  * real-world entity onto one canonical id — the classic data-integration
  * step the reference leaves to the user's `Query` slot (SURVEY.md §2.4
  * design note) and a curation pipeline needs natively (merging scraped
  * author/site/product records before dedup keys on them).
  *
  * Pipeline shape (Fellegi–Sunter by way of modern blocking practice):
  *   1. normalize   — lowercase, trim, collapse whitespace (map-side)
  *   2. block       — MULTIPLE cheap deterministic keys per record; a pair
  *                    is a candidate iff it shares ≥ 1 key. Multi-key is
  *                    the recall lever (an edit inside one key's window is
  *                    caught by another key); the per-key group is the
  *                    scale lever — candidates are per-block, never a
  *                    global cross join, mirroring LSH banding.
  *   3. score       — Levenshtein on the normalized names, kept iff
  *                    ≤ maxEdit. Spark's threshold form prunes the DP at
  *                    maxEdit+1 cost instead of O(|a|·|b|).
  *   4. cluster     — transitive closure over match pairs
  *                    ([[Dedup.nearDupClusters]]: union-find / min-label),
  *                    canonical entity id = minimum member id.
  *
  * Block-size cap: a key shared by more than `maxBlockSize` records is
  * degenerate (an empty-name bucket, a boilerplate token) and is dropped
  * whole — same guard as [[Graph.coOccurrenceEdges]]' group cap and the
  * LSH bucket cap; at 100 TB one mega-block would otherwise own the
  * shuffle. Dropped-key recall loss is the documented trade, and the
  * multi-key union usually recovers the pair under another key.
  */
object EntityResolution {

  /** Normalized form used for both blocking and scoring. */
  def normalizeName(name: Column): Column =
    regexp_replace(lower(trim(name)), "\\s+", " ")

  /** Match pairs (id_a < id_b, edit distance ≤ maxEdit, shared block key).
    *
    * @param blockKeys expressions over the NORMALIZED name producing one
    *                  blocking key each (null/empty keys are discarded)
    */
  def matchPairs(records: DataFrame, idCol: String, nameCol: String,
      blockKeys: Seq[Column => Column], maxEdit: Int,
      maxBlockSize: Int = 1000): DataFrame = {
    require(blockKeys.nonEmpty, "at least one blocking key")
    require(maxEdit >= 0, "maxEdit must be non-negative")
    val base = records.select(col(idCol).as("id"),
      normalizeName(col(nameCol)).as("nm"))
    // one (id, nm, key) row per record × key; keyed rows carry the key
    // INDEX too so identical values from different key functions don't
    // cross-match (a suffix that happens to equal a digit-run is not the
    // same evidence)
    val keyed = blockKeys.zipWithIndex.map { case (k, i) =>
      base.select(col("id"), col("nm"), lit(i).as("kix"),
        k(col("nm")).as("key"))
    }.reduce(_ unionByName _)
      .where(col("key").isNotNull && length(col("key")) > 0)
    // ONE shuffle groups each block into an in-value record list (the
    // FuzzyJoin.editDistancePairs shape); pairs expand inside the list —
    // the key self-join form this replaces shuffled the keyed rows three
    // more times (block-size count, live-key join, a/b self-join). The cap
    // keeps its drop-whole-block semantics: a block larger than
    // maxBlockSize is degenerate evidence and is discarded entirely.
    // Records sort by (id, nm) inside the block, so expansion yields
    // exactly the id_a < id_b pairs of the self-join (ties on duplicate
    // ids cannot pair with themselves: strict x.id < y.id).
    val cands = keyed.groupBy(col("kix"), col("key"))
      .agg(array_sort(collect_list(struct(col("id"), col("nm")))).as("recs"))
      .where(size(col("recs")) > 1 && size(col("recs")) <= maxBlockSize)
      .select(explode(flatten(transform(col("recs"), (x, i) =>
        transform(slice(col("recs"), i + 2, size(col("recs"))),
          y => struct(x.getField("id").as("id_a"),
            x.getField("nm").as("nm_a"),
            y.getField("id").as("id_b"),
            y.getField("nm").as("nm_b")))))).as("p"))
      .where(col("p.id_a") < col("p.id_b"))
      // dedup BEFORE scoring so each pair pays the Levenshtein DP once
      // even when multiple keys witness it
      .select(col("p.id_a").as("id_a"), col("p.nm_a").as("nm_a"),
        col("p.id_b").as("id_b"), col("p.nm_b").as("nm_b"))
      .distinct()
    cands
      .select(col("id_a"), col("id_b"),
        levenshtein(col("nm_a"), col("nm_b"), maxEdit).as("dist"))
      .where(col("dist") >= 0 && col("dist") <= maxEdit)
  }

  /** Full resolution: every input id mapped to its canonical entity id
    * (minimum id of its match component; singletons map to themselves).
    */
  def resolve(records: DataFrame, idCol: String, nameCol: String,
      blockKeys: Seq[Column => Column], maxEdit: Int,
      maxBlockSize: Int = 1000): DataFrame = {
    val pairs = matchPairs(records, idCol, nameCol, blockKeys, maxEdit,
      maxBlockSize)
    val comp = Dedup.nearDupClusters(pairs.select("id_a", "id_b"))
    records.select(col(idCol).as("id"))
      .join(comp.withColumnRenamed("rep", "entity_id"), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("entity_id"), col("id")).as("entity_id"))
  }

  /** Golden records: one row per resolved entity with member count and the
    * canonical (minimum-id member's) name — the survivorship policy is
    * deliberately the simplest deterministic one; richer policies are a
    * different agg over the same grouped frame.
    */
  def goldenRecords(records: DataFrame, idCol: String, nameCol: String,
      blockKeys: Seq[Column => Column], maxEdit: Int,
      maxBlockSize: Int = 1000): DataFrame = {
    val assign = resolve(records, idCol, nameCol, blockKeys, maxEdit,
      maxBlockSize)
    records.select(col(idCol).as("id"), col(nameCol).as("nm"))
      .join(assign, "id")
      .groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n_members"),
        min(struct(col("id"), col("nm"))).getField("nm").as("canonical_name"))
  }
}
