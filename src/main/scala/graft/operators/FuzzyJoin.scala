package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance-1 self-join via deletion-neighborhood blocking.
  *
  * The naive form compares all pairs (O(n²) `levenshtein` calls — a
  * cross join, unusable at scale). Deletion blocking is exact for
  * distance ≤ 1: every string emits its deletion neighborhood (itself plus
  * each single-character deletion, n+1 keys of length ≤ n); two strings
  * within one edit — substitution, insertion, or deletion — ALWAYS share at
  * least one neighborhood key, so an equi-join on the key finds every true
  * pair, and the final `levenshtein ≤ 1` filter removes the false
  * candidates (e.g. two different substitutions at the same position
  * sharing a deletion). Blow-up is bounded: strings of length L emit L+1
  * keys — linear, shuffled as an ordinary equi-join.
  *
  * The classic use: collapsing near-identical short identity strings
  * (titles, URLs, product names) where token-level dedup is too coarse.
  */
object FuzzyJoin {

  /** (id, key) deletion neighborhood — position-explode (0 = the string
    * itself, i = delete char i), never an explode over a computed array of
    * strings (see TextFunctions.shinglesOfCanonical's Generate note).
    */
  def deletionKeys(df: DataFrame, idCol: String, strCol: String): DataFrame =
    df.select(col(idCol), col(strCol),
        explode(sequence(lit(0), length(col(strCol)))).as("_p"))
      .select(col(idCol),
        when(col("_p") === 0, col(strCol))
          .otherwise(concat(
            col(strCol).substr(lit(1), col("_p") - 1),
            col(strCol).substr(col("_p") + 1, length(col(strCol)))))
          .as("_k"))
      .distinct()

  /** All unordered pairs (id_a < id_b) whose strings are within edit
    * distance 1 (including exact equals at distance 0). */
  def editDistance1Pairs(df: DataFrame, idCol: String,
      strCol: String): DataFrame = {
    val keys = deletionKeys(df, idCol, strCol)
    val cand = keys.as("a").join(keys.as("b"),
        col("a._k") === col("b._k") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
    val strs = df.select(col(idCol), col(strCol))
    // compute the distance ONCE: Catalyst does not share subexpressions
    // across Filter and Project, and the DP levenshtein is the dominant
    // per-candidate cost this operator exists to minimize
    cand
      .join(strs.select(col(idCol).as("id_a"), col(strCol).as("s_a")), "id_a")
      .join(strs.select(col(idCol).as("id_b"), col(strCol).as("s_b")), "id_b")
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .where(col("dist") <= 1)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
