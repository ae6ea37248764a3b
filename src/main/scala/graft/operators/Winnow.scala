package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD
  * 2003 — the MOSS algorithm): slide a window of `w` consecutive k-gram
  * hashes over each document and keep each window's RIGHTMOST minimal hash.
  * The selected set is a position-robust fingerprint: any shared substring
  * of length ≥ w + k − 1 between two documents is guaranteed to surface at
  * least one common fingerprint, at an expected density of 2/(w+1) — the
  * local-sampling guarantee that made winnowing the standard
  * plagiarism/clone detector, and a cheaper doc-in-doc screen than the
  * full containment mine.
  *
  * Scale shape: ENTIRELY map-side — grams, hashes, per-window rightmost
  * argmins, and the per-document digest are all array expressions inside
  * one projection (`transform`/`aggregate` higher-order functions); no
  * explode, no shuffle, no state. A 100 TB corpus fingerprints at scan
  * speed; only the (doc, fingerprint) postings — ~2/(w+1) of the gram
  * count — ever leave the mapper, and only if the caller asks for the
  * exploded postings rather than the digest.
  *
  * The gram hash is `md5` hex (not xxhash64) by design: fingerprints are a
  * cross-system RECONCILIATION artifact (compare corpora fingerprinted by
  * different engines), so the hash must be standard. Minima compare
  * lexicographically on the hex string — identical in any engine.
  */
object Winnow {

  /** Per-document fingerprint table: (id, pos, fp) — `pos` is the 1-based
    * gram position selected, `fp` the md5-hex gram hash. Documents shorter
    * than `k` chars contribute their whole text as the single gram (the
    * [[Dedup]] gram-CTE convention).
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): DataFrame =
    withSelected(docs, idCol, textCol, k, w)
      .select(col(idCol), explode(col("fps")).as("f"))
      .select(col(idCol), col("f.pos").as("pos"), col("f.h").as("fp"))

  /** One row per document: gram count, fingerprint count, and an
    * order-canonical md5 digest of the fingerprint set — the compact
    * corpus-reconciliation form (equal digests ⇔ equal fingerprint sets).
    */
  def digests(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): DataFrame =
    withSelected(docs, idCol, textCol, k, w)
      .select(col(idCol), col("n").cast("long").as("n_grams"),
        size(col("fps")).cast("long").as("n_fp"),
        md5(array_join(array_sort(transform(col("fps"),
          f => concat(lpad(f.getField("pos").cast("string"), 10, "0"),
            lit(":"), f.getField("h")))), ",")).as("fp_digest"))

  /** Shared head: canonicalize → positional gram hashes → per-window
    * rightmost-argmin selection → distinct selected (pos, h) structs.
    */
  private def withSelected(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be positive")
    // sentinel sorts after every md5 hex digit; pos 0 never survives
    // because each window scan replaces it at its first element
    val sentinel = struct(lit("~").as("h"), lit(0L).as("pos"))
    docs
      .select(col(idCol), T.canonicalText(col(textCol)).as("c"))
      .select(col(idCol),
        transform(sequence(lit(1), greatest(length(col("c")) - (k - 1), lit(1))),
          i => md5(col("c").substr(i, lit(k)))).as("hs"))
      .select(col(idCol), size(col("hs")).as("n"), col("hs"))
      .select(col(idCol), col("n"),
        array_distinct(transform(
          sequence(lit(1), greatest(col("n") - (w - 1), lit(1))),
          j => aggregate(
            sequence(j.cast("long"), least(j + (w - 1), col("n")).cast("long")),
            sentinel,
            (acc, p) => when(
              element_at(col("hs"), p.cast("int")) <= acc.getField("h"),
              struct(element_at(col("hs"), p.cast("int")).as("h"),
                p.as("pos"))).otherwise(acc)))).as("fps"))
  }
}
