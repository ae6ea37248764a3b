package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) left join: each left row is matched to the most
  * recent right row of the same key with `right.ts <= left.ts`, or nulls
  * when none precedes it.
  *
  * Composed from built-ins (union + running `last(struct, ignoreNulls)`
  * window) rather than a custom physical operator — the composition
  * shuffles each side once on the key (the same exchange a dedicated
  * sort-merge as-of implementation needs) and streams one ordered pass per
  * key partition, so a custom SparkPlan would save nothing at scale. The
  * whole right payload travels as ONE struct so a null field inside a
  * matched right row can never mix columns from different right rows.
  *
  * Tie semantics: right rows sort before left rows at equal timestamps
  * (inclusive match); among multiple right rows at the same (key, ts) the
  * greatest row-hash wins deterministically — dedupe the right side per
  * (key, ts) first when that matters.
  */
object AsOfJoin {

  def asOfLeftJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String): DataFrame = {
    val rightPayload = right.columns.filterNot(_ == key).toSeq
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(rightPayload.map(col): _*)

    val rightStructType = right.select(payloadStruct.as("__r"))
      .schema("__r").dataType

    val lU = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__is_left", lit(1))
      .withColumn("__rid", lit(Long.MaxValue))
      .withColumn("__r", lit(null).cast(rightStructType))
      .select((Seq(col(key), col("__ts"), col("__is_left"), col("__rid"),
        col("__r")) ++ leftCols.filterNot(_ == key).map(col)): _*)

    val rU = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__is_left", lit(0))
      .withColumn("__rid",
        xxhash64(struct(right.columns.map(col).toIndexedSeq: _*)))
      .withColumn("__r", payloadStruct)
      .select((Seq(col(key), col("__ts"), col("__is_left"), col("__rid"),
        col("__r")) ++ leftCols.filterNot(_ == key)
        .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__is_left"), col("__rid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lU.union(rU)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__is_left") === 1)
      .select((leftCols.map(col) ++
        rightPayload.map(c => col(s"__m.$c").as(c))): _*)
  }
}
