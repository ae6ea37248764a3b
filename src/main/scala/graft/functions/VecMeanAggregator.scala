package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed element-wise vector mean: the per-cell centroid update of a
  * distributed k-means (Lloyd) iteration. Partial aggregation keeps the
  * shuffle at O(cells × dims) doubles — the corpus itself never moves,
  * which is what makes centroid refinement affordable at 100 TB (one
  * map-side pass per iteration).
  */
final case class VecSum(n: Long, sum: Seq[Double])

/** Input rows are (cell id, vector). */
final class VecMean extends Aggregator[(Long, Array[Double]), VecSum, Seq[Double]] {

  override def zero: VecSum = VecSum(0L, Vector.empty)

  override def reduce(b: VecSum, row: (Long, Array[Double])): VecSum = {
    val v = row._2
    if (b.n == 0L) VecSum(1L, v.toVector)
    else {
      val s = b.sum.toArray
      var i = 0
      while (i < s.length && i < v.length) { s(i) += v(i); i += 1 }
      VecSum(b.n + 1, s.toVector)
    }
  }

  override def merge(a: VecSum, b: VecSum): VecSum =
    if (a.n == 0L) b
    else if (b.n == 0L) a
    else {
      val s = a.sum.toArray
      var i = 0
      while (i < s.length && i < b.sum.length) { s(i) += b.sum(i); i += 1 }
      VecSum(a.n + b.n, s.toVector)
    }

  override def finish(b: VecSum): Seq[Double] =
    if (b.n == 0L) Vector.empty else b.sum.map(_ / b.n)

  override def bufferEncoder: Encoder[VecSum] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
