package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Hamming distance between two equal-length
  * strings (e.g. SimHash bit-signatures). A custom `Expression` with
  * `doGenCode` — not a Scala UDF — so it participates in whole-stage
  * codegen with zero boxing/serialization overhead in the hot pair-join
  * path (SURVEY §4.2: preference order (b)).
  *
  * Returns null on null input or length mismatch (mismatch = caller bug,
  * but a null beats a wrong distance in a dedup pipeline).
  */
case class StringHammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].getBytes
    val b = r.asInstanceOf[UTF8String].getBytes
    if (a.length != b.length) null
    else {
      var i = 0; var d = 0
      while (i < a.length) { if (a(i) != b(i)) d += 1; i += 1 }
      d
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val ba = ctx.freshName("ba")
      val bb = ctx.freshName("bb")
      s"""
         |byte[] $ba = $a.getBytes();
         |byte[] $bb = $b.getBytes();
         |if ($ba.length != $bb.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  int acc = 0;
         |  for (int $i = 0; $i < $ba.length; $i++) {
         |    if ($ba[$i] != $bb[$i]) acc++;
         |  }
         |  ${ev.value} = acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StringHammingDistance =
    copy(left = newLeft, right = newRight)
}

object StringHammingDistance {
  /** Column-API entry point. */
  def hamming(a: Column, b: Column): Column =
    ColumnBridge.column(
      StringHammingDistance(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
