package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass ASYMMETRIC-EXTREMUM content-defined chunking (Zhang
  * et al.) over one document: a cut lands at 1-based character position
  * i when that character's 32-bit hash strictly exceeds every hash in
  * the preceding w positions (so the first possible cut is i = w+1).
  * Emits one struct per chunk — `array<struct<start, len, h>>` with
  * `start` 1-based, `len` in characters, `h = md5(chunk)` lowercase hex
  * — i.e. exactly the rows the declarative pipeline in
  * `TextDedup.aeChunksDeclarative` produces after its explode → window
  * MAX → lag → re-join-with-text dance.
  *
  * This replaces a per-CHARACTER (doc, pos, md5) explode (~16× the text
  * bytes crossing a shuffle, the round-8 `d_cdc_chunks` pole) with a
  * single monotonic-deque sliding-max pass inside the scan stage: O(n)
  * per document, zero intermediate rows, no shuffle at all until the
  * (tiny) per-chunk aggregate downstream. The deque discipline is the
  * [[WinnowFingerprints]] playbook with MAX in place of MIN.
  *
  * Bit-parity contract with the declarative twin (property-tested in
  * AeChunkSpec): the gram hash is the first 8 hex chars of
  * `md5(single character)` read base-16 — matching
  * `conv(substring(md5(ch),1,8),16,10)` — and character positions are
  * CODE POINTS, matching `substring`/`length` on `UTF8String`. Because
  * the gram is a single character, hashes memoize per code point: a
  * JVM-wide precomputed table covers ASCII; rarer code points fill a
  * per-eval map. Null text → null (explode drops it, like the
  * declarative's null-sequence explode); empty text → empty array.
  *
  * `CodegenFallback` is deliberate: the per-row work IS the loop (same
  * call as WinnowFingerprints), so whole-stage fusion buys nothing.
  */
case class AeChunkBoundaries(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(w >= 1)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("start", IntegerType, nullable = false),
      StructField("len", LongType, nullable = false),
      StructField("h", StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ae_chunks"

  import AeChunkBoundaries.{asciiGramHash, gramHash, md5Hex}

  override def nullSafeEval(tAny: Any): Any = {
    val s = tAny.asInstanceOf[UTF8String].toString
    val sLen = s.length // UTF-16 units; code points counted below
    if (sLen == 0) return new GenericArrayData(Array.empty[Any])

    val md = MessageDigest.getInstance("MD5")
    // one entry per code point: its gram hash and its char offset
    var cap = sLen
    var g = new Array[Long](cap)
    var cpOff = new Array[Int](cap + 1)
    var rare: java.util.HashMap[Int, java.lang.Long] = null
    var n = 0 // code points so far
    var ci = 0 // char index
    while (ci < sLen) {
      val cp = s.codePointAt(ci)
      val h =
        if (cp < 128) asciiGramHash(cp)
        else {
          if (rare == null) rare = new java.util.HashMap[Int, java.lang.Long]()
          var v = rare.get(cp)
          if (v == null) { v = gramHash(md, cp); rare.put(cp, v) }
          v.longValue()
        }
      g(n) = h
      cpOff(n) = ci
      n += 1
      ci += Character.charCount(cp)
    }
    cpOff(n) = sLen

    // sliding MAX over the previous w code points via a monotonic deque
    // of indices with strictly decreasing hashes; cut at 0-based i when
    // i >= w and g(i) > max(g(i-w .. i-1))
    val ends = new java.util.ArrayList[Int](n / (w + 1) + 2)
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    while (i < n) {
      while (head < tail && deque(head) < i - w) head += 1
      if (i >= w && g(i) > g(deque(head))) ends.add(i + 1)
      while (tail > head && g(deque(tail - 1)) <= g(i)) tail -= 1
      deque(tail) = i; tail += 1
      i += 1
    }
    if (ends.isEmpty || ends.get(ends.size - 1) != n) ends.add(n)

    val out = new Array[Any](ends.size)
    var start = 1 // 1-based code-point position
    var k = 0
    while (k < ends.size) {
      val end = ends.get(k)
      val chunk = s.substring(cpOff(start - 1), cpOff(end))
      out(k) = new GenericInternalRow(Array[Any](
        start, (end - start + 1).toLong,
        UTF8String.fromString(md5Hex(md, chunk))))
      start = end + 1
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): AeChunkBoundaries =
    copy(child = newChild)
}

object AeChunkBoundaries {
  private val hexDigits = "0123456789abcdef".toCharArray

  private[plans] def md5Hex(md: MessageDigest, s: String): String = {
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

  /** First 8 hex chars of md5(code point's UTF-8 bytes) as an unsigned
    * 32-bit value — `conv(substring(md5(ch),1,8),16,10)` bit-for-bit.
    */
  private[plans] def gramHash(md: MessageDigest, cp: Int): Long = {
    md.reset()
    val d = md.digest(new String(Character.toChars(cp)).getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** JVM-wide gram-hash table for the ASCII range — the overwhelmingly
    * common case, so the md5-per-character cost of the declarative form
    * collapses to an array read.
    */
  private val asciiGramHash: Array[Long] = {
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(128)(cp => gramHash(md, cp))
  }

  def of(text: Column, w: Int = 31): Column =
    ColumnBridge.column(AeChunkBoundaries(ColumnBridge.expression(text), w))
}
