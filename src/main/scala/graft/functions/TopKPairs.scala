package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k over (score, id) pairs, ordered by
  * (score DESC, id ASC) — the tie-break a deterministic ranking needs.
  * Like [[TopKAggregator]] but keeping the id alongside the score, so a
  * per-query nearest-neighbour rank can be rebuilt from the aggregate
  * output without a global `row_number` window.
  *
  * Why it matters at scale: partial aggregation keeps at most k pairs
  * per group per map partition, so a brute-force scorer shuffles
  * O(partitions × k) rows per query instead of funneling ALL N×Q scored
  * rows into Q window tasks. Same math, bounded memory, bounded shuffle.
  */
final case class TopKPairs(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0)

  private val ord: Ordering[(Double, Long)] =
    Ordering.by { case (score, id) => (-score, id) }

  override def zero: List[(Double, Long)] = Nil

  override def reduce(buf: List[(Double, Long)], v: (Double, Long)): List[(Double, Long)] =
    trim(v :: buf)

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    trim(a ::: b)

  private def trim(xs: List[(Double, Long)]): List[(Double, Long)] =
    xs.sorted(ord).take(k)

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] =
    buf.sorted(ord)

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKPairs {
  /** Untyped column form for use inside `groupBy(...).agg(...)`:
    * `topK(k)(scoreCol, idCol)` returns `array<struct<_1,_2>>` sorted by
    * (score DESC, id ASC).
    */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      TopKPairs(k), Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
}
