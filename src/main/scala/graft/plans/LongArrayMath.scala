package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expressions for quantized-vector math (the hot loop
  * of every similarity/dedup query): integer dot product and squared
  * norm over `array<bigint>`.
  *
  * The `functions.aggregate(zip_with(...))` formulation is semantically
  * identical but Spark evaluates higher-order functions INTERPRETED —
  * one lambda invocation per element per row. At `candidates × dim`
  * volume that's the dominant cost of the ANN queries. These are
  * `doGenCode` expressions (SURVEY §4.2 preference (b)): a tight Java
  * loop over `ArrayData` inside whole-stage codegen, no boxing, no
  * virtual calls.
  *
  * Inputs are quantization outputs, so elements are never null; a
  * length mismatch (caller bug) yields null rather than a wrong score.
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) null
    else {
      var i = 0; var s = 0L
      while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)
}

case class LongArrayNormSq(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var i = 0; var s = 0L
    val n = a.numElements()
    while (i < n) { val x = a.getLong(i); s += x * x; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => {
      val fn = ctx.freshName("normSq")
      val body =
        s"""
           |private long $fn(org.apache.spark.sql.catalyst.util.ArrayData arr) {
           |  long acc = 0L;
           |  int n = arr.numElements();
           |  for (int i = 0; i < n; i++) {
           |    long x = arr.getLong(i);
           |    acc += x * x;
           |  }
           |  return acc;
           |}
         """.stripMargin
      val method = ctx.addNewFunction(fn, body)
      s"$method($a)"
    })

  override protected def withNewChildInternal(newChild: Expression): LongArrayNormSq =
    copy(child = newChild)
}

object LongArrayMath {
  /** Column-API entry points. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      LongArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def normSq(a: Column): Column =
    ColumnBridge.column(LongArrayNormSq(ColumnBridge.expression(a)))
}
