package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftx.ColumnBridge

/** Column-API façade over Spark's internal Bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind AQE runtime filters, not exposed in the public function
  * registry). The aggregate's merge is a commutative bit-OR, so the
  * built filter is deterministic under any task order; `mightContain`
  * evaluates scan-side with no shuffle.
  */
object BloomFilters {

  /** Aggregate a `xxhash64`-style LONG column into a serialized Bloom
    * filter sized for `estItems` keys over `numBits` bits.
    */
  def bloomAgg(hashed: Column, estItems: Long, numBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(hashed),
      Literal(estItems), Literal(numBits)).toAggregateExpression())

  /** True when `hashed` may be in `bloom`; false is definitive. */
  def mightContain(bloom: Column, hashed: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bloom),
      ColumnBridge.expression(hashed)))
}
