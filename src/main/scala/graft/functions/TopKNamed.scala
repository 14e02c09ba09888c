package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k over (score, name) pairs with a STRING
  * payload, ordered by (score DESC, name ASC) — [[TopKPairs]] for
  * dictionary-less workloads (tokens, terms, labels) where the payload
  * has no long id to carry.
  *
  * Same scale contract as [[TopKPairs]]: partial aggregation keeps at
  * most k pairs per group per map partition, so a group-wise text top-k
  * shuffles O(partitions × k) rows instead of pulling every
  * (group, term) count into one task per group — the low-cardinality
  * group key (e.g. 5 sources over a million-term vocabulary) is exactly
  * where a row_number window would funnel.
  */
final case class TopKNamed(k: Int)
    extends Aggregator[(Double, String), List[(Double, String)], Seq[(Double, String)]] {
  require(k > 0)

  private val ord: Ordering[(Double, String)] =
    Ordering.by { case (score, name) => (-score, name) }

  override def zero: List[(Double, String)] = Nil

  override def reduce(buf: List[(Double, String)], v: (Double, String)): List[(Double, String)] =
    trim(v :: buf)

  override def merge(a: List[(Double, String)], b: List[(Double, String)]): List[(Double, String)] =
    trim(a ::: b)

  private def trim(xs: List[(Double, String)]): List[(Double, String)] =
    xs.sorted(ord).take(k)

  override def finish(buf: List[(Double, String)]): Seq[(Double, String)] =
    buf.sorted(ord)

  override def bufferEncoder: Encoder[List[(Double, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, String)]]()

  override def outputEncoder: Encoder[Seq[(Double, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, String)]]()
}

object TopKNamed {
  /** Untyped column form for `groupBy(...).agg(...)`: `topK(k)(scoreCol,
    * nameCol)` returns `array<struct<_1,_2>>` sorted by (score DESC,
    * name ASC).
    */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      TopKNamed(k), Encoders.tuple(Encoders.scalaDouble, Encoders.STRING))
}
