package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join via key salting.
  *
  * For a join where a handful of hot keys dominate the left side (the classic
  * 100 TB failure mode: one shuffle partition gets the hot key and runs for
  * hours), salt the left key into `saltFactor` sub-keys and replicate each
  * right-side row `saltFactor` times, so a hot key's rows spread across
  * `saltFactor` shuffle partitions. AQE's skew-join handles moderate skew at
  * runtime; explicit salting is for the pathological keys AQE's
  * split-by-size cannot break (e.g. a single key × single partition).
  *
  * Semantics: identical row multiset to `left.join(right, key)` (inner).
  * The left salt is derived deterministically from the whole left row hash,
  * so results are reproducible.
  */
object SkewJoin {

  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col).toIndexedSeq: _*)),
        lit(saltFactor.toLong)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Top-N hot keys of `df` on `key` — the diagnostic used to decide whether
    * salting is needed and what factor to use. */
  def hotKeys(df: DataFrame, key: String, topN: Int = 10): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key)).limit(topN)

  /** Hot-key profile with the two numbers the salting decision needs: each
    * top key's share of all rows (`frac`) and its lift over a uniform key
    * distribution (`lift` = n·ndv/total; 1.0 = perfectly even, and the lift
    * of the hottest key is a principled `saltFactor` starting point).
    *
    * Shape: one partial-aggregated groupBy(key) + a broadcast of the 1-row
    * totals; the top-N is TakeOrderedAndProject. The full key histogram is
    * never collected.
    */
  def hotKeyProfile(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    val totals = df.agg(count(lit(1)).as("_tot"),
      countDistinct(col(key)).as("_ndv"))
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(totals))
      .select(col(key), col("n"),
        round(col("n") / col("_tot"), 6).as("frac"),
        round(col("n") * col("_ndv") / col("_tot"), 4).as("lift"))
      .orderBy(col("n").desc, col(key))
      .limit(topN)
  }
}
