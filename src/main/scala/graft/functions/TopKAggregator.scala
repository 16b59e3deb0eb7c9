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

  // Spark's desc ordering via java.lang.Double.compare: NaN ranks FIRST
  // (largest) and -0.0 sorts below 0.0 — Scala's TotalOrdering on the
  // negated value would instead push NaN out of the top-k, diverging
  // from the row_number-window formulation this aggregator must match.
  private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(x: (Double, Long), y: (Double, Long)): Int = {
      val c = java.lang.Double.compare(y._1, x._1) // value desc
      if (c != 0) c else java.lang.Long.compare(x._2, y._2) // id asc
    }
  }

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sorted(ord).take(k)

  override def zero: Seq[(Double, Long)] = Seq.empty

  // amortized: grow to 4k then trim, instead of a full O(k log k) sort
  // per input row — the buffer stays O(k), the sorts O(n/k) many
  override def reduce(buf: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] = {
    val grown = buf :+ a
    if (grown.size >= 4 * k) trim(grown) else grown
  }

  override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(b1 ++ b2)

  override def finish(reduction: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(reduction)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
