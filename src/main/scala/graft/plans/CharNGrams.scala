package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass character n-grams: `char_ngrams(s, n)` ==
  * `transform(sequence(1, length(s) − n + 1), i -> substring(s, i, n))`
  * for `length(s) >= n` (shorter input → EMPTY array; the HOF's
  * descending-`sequence` artifact in that unguarded case is a bug
  * surface, not a behavior anyone wants, and every call site guards
  * `length >= n` anyway).
  *
  * Why native: `substring(s, i, n)` walks the string's bytes from the
  * START to find code point i on every call (UTF8String stores UTF-8
  * bytes; locating a code-point index is a scan), so the HOF
  * formulation is O(len²) byte-steps per document plus one interpreted
  * lambda invocation per position. This expression finds all
  * code-point boundaries in ONE byte walk and emits zero-copy-sliced
  * grams — O(len·n) total, inside codegen.
  */
case class CharNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"CharNGrams needs string, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      CharNGrams.slice(v.asInstanceOf[UTF8String], n)
        .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val grams = ctx.freshName("grams")
      s"""
         |org.apache.spark.unsafe.types.UTF8String[] $grams =
         |  graft.plans.CharNGrams.slice($s, $n);
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData((Object[]) $grams);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharNGrams =
    copy(child = newChild)
}

object CharNGrams {
  /** All n-grams of `s` by code point, one boundary walk, sliced
    * views over the original bytes. Empty when numChars < n.
    */
  def slice(s: UTF8String, n: Int): Array[UTF8String] = {
    val bytes = s.getBytes
    val nb = bytes.length
    // code-point start offsets (+ terminal), found in one walk
    val offs = new Array[Int](nb + 1)
    var nc = 0
    var i = 0
    while (i < nb) {
      offs(nc) = i
      nc += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offs(nc) = nb
    val out = nc - n + 1
    if (out <= 0) Array.empty[UTF8String]
    else {
      val grams = new Array[UTF8String](out)
      var j = 0
      while (j < out) {
        grams(j) = UTF8String.fromBytes(bytes, offs(j), offs(j + n) - offs(j))
        j += 1
      }
      grams
    }
  }

  def of(str: Column, n: Int): Column =
    ColumnBridge.column(CharNGrams(ColumnBridge.expression(str), n))
}
