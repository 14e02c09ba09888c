package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass winnowing (Schleimer/Wilkerson/Aiken) over one text
  * chunk: hash every char k-gram, slide a w-gram window, keep the
  * minimal hash per window (rightmost on ties), emit the distinct
  * (hash, global_pos) selections — `array<struct<fp_hash, fp_pos>>`.
  *
  * This replaces the explode-every-gram → per-doc window-sort → distinct
  * pipeline (millions of 40-byte string keys through a shuffle at
  * sf0.1) with a single monotonic-deque pass in plain Java: O(n) per
  * chunk, no intermediate rows at all — only the ~2/(w+1)-density
  * selections leave the expression. `CodegenFallback` is deliberate:
  * the per-row work IS the loop, so whole-stage fusion around it buys
  * nothing (unlike the scalar hot-path expressions in this package,
  * which do implement `doGenCode`).
  *
  * Bit-parity with the declarative formulation (property-tested in
  * WinnowPropsSpec): `useMd5 = true` reproduces `md5(gram)` lowercase
  * hex (the DuckDB-oracle hash); `false` reproduces
  * `lpad(hex(xxhash64(gram)), 16, '0')` — XXH64 seed 42 on UTF-8
  * bytes, uppercase — the production twin. Ties select the larger
  * position, exactly like the `hash || '#' || lpad(bigN - pos)` MIN
  * encoding it replaces.
  *
  * `right` is the chunk's global char offset; emitted `fp_pos` is the
  * 1-based global gram position `off + i + 1`. Windows needing grams
  * before this chunk (local end < w) are skipped — the overlapping
  * previous chunk owns them.
  */
case class WinnowFingerprints(left: Expression, right: Expression,
    k: Int, w: Int, useMd5: Boolean)
    extends BinaryExpression with CodegenFallback {
  require(k >= 1 && w >= 1)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("fp_hash", StringType, nullable = false),
      StructField("fp_pos", IntegerType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_winnow"

  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(md: MessageDigest, s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(csAny: Any, offAny: Any): Any = {
    val cs = csAny.asInstanceOf[UTF8String].toString
    val off = offAny.asInstanceOf[Int]
    val n = cs.length - k + 1
    if (n < w) return new GenericArrayData(Array.empty[Any])

    val hashes = new Array[String](n)
    if (useMd5) {
      val md = MessageDigest.getInstance("MD5")
      var i = 0
      while (i < n) { hashes(i) = md5Hex(md, cs.substring(i, i + k)); i += 1 }
    } else {
      var i = 0
      while (i < n) {
        val h = XXH64.hashUTF8String(UTF8String.fromString(cs.substring(i, i + k)), 42L)
        hashes(i) = f"$h%016X"
        i += 1
      }
    }

    // monotonic deque of gram indices: front = current window's winner
    // under (hash ASC, position DESC-on-ties)
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    val out = new java.util.ArrayList[Any](2 * n / (w + 1) + 2)
    var lastIdx = -1
    var e = 0
    while (e < n) {
      // e wins ties against any equal-hash earlier entry (larger pos)
      while (tail > head && hashes(deque(tail - 1)).compareTo(hashes(e)) >= 0) tail -= 1
      deque(tail) = e; tail += 1
      while (deque(head) <= e - w) head += 1
      if (e >= w - 1) {
        val sel = deque(head)
        if (sel != lastIdx) {
          out.add(new GenericInternalRow(Array[Any](
            UTF8String.fromString(hashes(sel)), off + sel + 1)))
          lastIdx = sel
        }
      }
      e += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WinnowFingerprints =
    copy(left = newLeft, right = newRight)
}

object WinnowFingerprints {
  def of(cs: Column, off: Column, k: Int, w: Int, useMd5: Boolean): Column =
    ColumnBridge.column(WinnowFingerprints(
      ColumnBridge.expression(cs), ColumnBridge.expression(off), k, w, useMd5))
}
