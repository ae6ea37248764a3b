package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-edit-distance self-join via deletion-neighborhood blocking
  * (SymSpell-style).
  *
  * The naive form compares all pairs (O(n²) `levenshtein` calls — a
  * cross join, unusable at scale). Deletion blocking is exact for
  * distance ≤ d: every string emits its ≤d-deletion neighborhood; two
  * strings within d edits (any mix of substitutions, insertions,
  * deletions) ALWAYS share at least one neighborhood key, so an equi-join
  * on the key finds every true pair, and the final `levenshtein ≤ d`
  * filter removes the false candidates (neighborhoods can also collide for
  * pairs up to 2d apart). Blow-up is bounded two ways:
  *  - key fan-out: a string of length L emits Σ C(L, i), i ≤ d keys —
  *    linear for d=1, ~L²/2 for d=2; fine for the short identity strings
  *    (names, titles, URLs) this operator targets, and the reason `d` is
  *    capped at 2 rather than generalized further.
  *  - bucket width: pair expansion is capped per key at `maxBucketSize`
  *    ids (sorted, lowest kept) — the same posting-list cap as
  *    [[Dedup.minhashLshPairsFromSigs]], preventing one degenerate key
  *    (e.g. the empty string from single-char inputs) from materializing
  *    quadratic candidates. Pairs beyond the cap are dropped; the default
  *    is far above any non-degenerate bucket.
  *
  * The classic use: collapsing near-identical short identity strings where
  * token-level dedup is too coarse.
  */
object FuzzyJoin {

  /** One deletion round over `in`'s (`idCol`, `_k`) pairs: each key emits
    * itself (position 0) plus every single-character deletion — position-
    * explode (i = delete char i), never an explode over a computed array of
    * strings (see TextFunctions.shinglesOfCanonical's Generate note).
    */
  private def deleteOnce(in: DataFrame, idCol: String): DataFrame =
    in.select(col(idCol), col("_k").as("_s"),
        explode(sequence(lit(0), length(col("_k")))).as("_p"))
      .select(col(idCol),
        when(col("_p") === 0, col("_s"))
          .otherwise(concat(
            col("_s").substr(lit(1), col("_p") - 1),
            col("_s").substr(col("_p") + 1, length(col("_s")))))
          .as("_k"))
      .distinct()

  /** (id, key) deletion neighborhood of depth `maxDeletes`: all strings
    * obtainable by deleting 0..maxDeletes characters. Built by iterating
    * the single-deletion step (each round includes position 0 = keep, so
    * round k covers ≤ k deletions).
    */
  def deletionKeys(df: DataFrame, idCol: String, strCol: String,
      maxDeletes: Int = 1): DataFrame = {
    require(maxDeletes >= 1 && maxDeletes <= 2,
      s"deletion blocking supports distance 1..2, got $maxDeletes " +
        "(key fan-out is C(L, d) — quadratic in length already at d=2)")
    val init = df.select(col(idCol), col(strCol).as("_k"))
    (1 to maxDeletes).foldLeft(init)((acc, _) => deleteOnce(acc, idCol))
  }

  /** All unordered pairs (id_a < id_b) whose strings are within edit
    * distance `maxDist` (including exact equals at distance 0).
    *
    * Shape: ONE shuffle groups the deletion keys into capped posting
    * lists; pairs expand inside the list value (no key self-join — that
    * form shuffles the exploded keys twice and needs a third exchange to
    * distinct); the verify join fetches the two strings and computes the
    * DP levenshtein ONCE per candidate (Catalyst does not share
    * subexpressions across Filter and Project).
    */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 1, maxBucketSize: Int = 4096): DataFrame = {
    val keys = deletionKeys(df, idCol, strCol, maxDist)
    val buckets = keys.groupBy(col("_k"))
      .agg(slice(array_sort(collect_list(col(idCol))), 1, maxBucketSize)
        .as("ids"))
      .where(size(col("ids")) > 1)
    val cand = buckets
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b")).distinct()
    val strs = df.select(col(idCol), col(strCol))
    cand
      .join(strs.select(col(idCol).as("id_a"), col(strCol).as("s_a")), "id_a")
      .join(strs.select(col(idCol).as("id_b"), col(strCol).as("s_b")), "id_b")
      // threshold form prunes the DP at maxDist+1 band width (O(L·d), not
      // O(L²)); it returns -1 above the threshold and the true distance at
      // or below it, so kept rows carry the identical dist value
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), maxDist))
      .where(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Distance-1 form (the original surface; specs and the `fuzzy_name_pairs`
    * gate pin it).
    */
  def editDistance1Pairs(df: DataFrame, idCol: String,
      strCol: String): DataFrame =
    editDistancePairs(df, idCol, strCol, maxDist = 1)
}
