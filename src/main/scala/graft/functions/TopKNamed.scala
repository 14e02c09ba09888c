package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** [[BoundedTopK]] with a STRING payload — for dictionary-less
  * workloads (tokens, terms, labels) where the payload has no long id
  * to carry. Same scale contract: a group-wise text top-k shuffles
  * O(partitions × k) rows instead of pulling every (group, term) count
  * into one task per group — the low-cardinality group key (e.g. 5
  * sources over a million-term vocabulary) is exactly where a
  * row_number window would funnel.
  */
final case class TopKNamed(k: Int) extends BoundedTopK[String](k) {
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
