package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash as ONE `TypedImperativeAggregate` over per-token md5
  * hex digests: the buffer is an `int[64]` of signed bit counts; update
  * parses the first 16 hex nibbles and adds ±1 per bit; merge adds
  * buffers (map-side combine works); eval emits the 64-char '0'/'1'
  * signature.
  *
  * Replaces a 64-column `sum(CASE WHEN ...)` aggregate whose generated
  * code was so large that Janino compilation dominated the first
  * execution (~10 s cold vs ~3 s warm at sf0.1). Bit semantics are
  * unchanged and oracle-portable: bit `b` is bit `3-(b%4)` of hex
  * nibble `b/4` of `md5(token)`, exactly as the SQL restatement
  * derives it (see TextQueries' simhash oracles).
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

  private val Bits = 64

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StringType

  override def createAggregationBuffer(): Array[Int] = new Array[Int](Bits)

  override def update(buf: Array[Int], input: org.apache.spark.sql.catalyst.InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val hex = v.asInstanceOf[UTF8String].getBytes
      var j = 0
      while (j < 16 && j < hex.length) {
        val c = hex(j)
        val nib =
          if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'a' && c <= 'f') c - 'a' + 10
          else if (c >= 'A' && c <= 'F') c - 'A' + 10
          else 0
        var k = 0
        while (k < 4) {
          val bit = (nib >> (3 - k)) & 1
          buf(j * 4 + k) += (if (bit == 1) 1 else -1)
          k += 1
        }
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < Bits) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    val out = new Array[Byte](Bits)
    var i = 0
    while (i < Bits) { out(i) = if (buf(i) > 0) '1' else '0'; i += 1 }
    UTF8String.fromBytes(out)
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(Bits * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(Bits)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}

object SimHashAgg {
  /** Aggregate-column entry point: `simhash(md5Hex)`. */
  def simhash(md5Hex: Column): Column =
    ColumnBridge.column(
      SimHashAgg(ColumnBridge.expression(md5Hex)).toAggregateExpression())
}
