package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` keeping the k largest doubles — the
  * custom-aggregate extension point the reference lacks (SURVEY §2.6).
  * A bounded buffer merged associatively: map-side partials carry at
  * most k values, so a global top-k costs one k-sized row per partition
  * at the shuffle — the sketch pattern (vs. sorting the world).
  *
  * (For whole-row top-k Spark's `TakeOrderedAndProject` already does
  * this; the Aggregator form composes inside `groupBy.agg` — per-group
  * top-k in one pass.)
  */
final case class TopKAggregator(k: Int)
    extends Aggregator[Double, List[Double], Seq[Double]] {
  require(k > 0)

  override def zero: List[Double] = Nil

  override def reduce(buf: List[Double], v: Double): List[Double] =
    trim(v :: buf)

  override def merge(a: List[Double], b: List[Double]): List[Double] =
    trim(a ::: b)

  private def trim(xs: List[Double]): List[Double] =
    xs.sorted(Ordering[Double].reverse).take(k)

  override def finish(buf: List[Double]): Seq[Double] =
    buf.sorted(Ordering[Double].reverse)

  override def bufferEncoder: Encoder[List[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Double]]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
