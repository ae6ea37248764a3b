package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k aggregator (SURVEY.md §7.3): keeps at most k
  * neighbors per group in the aggregation buffer, so a per-group top-k
  * needs no window sort over the full candidate set — the buffer is O(k)
  * through partial aggregation and merge, which is the memory profile a
  * 100 TB all-pairs sweep needs (window row_number materializes and sorts
  * every candidate per group first).
  *
  * Ordering: cosine descending, id ascending on ties — identical to the
  * window-based formulation so both paths are interchangeable.
  */
final case class Neighbor(id: Long, cos: Double)

/** Input rows are (group id, neighbor id, cosine). */
final class TopKNeighbors(k: Int)
    extends Aggregator[(Long, Long, Double), Seq[Neighbor], Seq[Neighbor]] {

  private def prune(s: Seq[Neighbor]): Seq[Neighbor] =
    s.sortBy(n => (-n.cos, n.id)).take(k)

  override def zero: Seq[Neighbor] = Vector.empty
  override def reduce(buf: Seq[Neighbor], row: (Long, Long, Double)): Seq[Neighbor] =
    prune(buf :+ Neighbor(row._2, row._3))
  override def merge(a: Seq[Neighbor], b: Seq[Neighbor]): Seq[Neighbor] =
    prune(a ++ b)
  override def finish(buf: Seq[Neighbor]): Seq[Neighbor] = buf
  override def bufferEncoder: Encoder[Seq[Neighbor]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Neighbor]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
