package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k aggregator (SURVEY.md §4.3 "top-k heap"): keeps at
  * most k (value, id) pairs per group, ordered value desc / id asc.
  *
  * Scale rationale: the window-function top-k (`row_number` + filter)
  * sorts each whole partition group; this Aggregator carries only k
  * elements through partial aggregation and merge — O(n log k) with a
  * constant-size buffer per group on the map side, the right shape when
  * groups are huge and k is small. Deterministic: total order with the id
  * tie-break.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortBy { case (v, id) => (-v, id) }.take(k)

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    trim(buf :+ a)

  override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(b1 ++ b2)

  override def finish(reduction: Seq[(Double, Long)]): Seq[(Double, Long)] = reduction

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
