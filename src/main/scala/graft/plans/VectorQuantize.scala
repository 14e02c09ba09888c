package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native quantization + hyperplane-signature expressions — the scan-side
  * hot loop of the similarity layer.
  *
  * Why these exist (measured, see BASELINE.md "scale curves"): the
  * `transform(vec, x -> floor(x * 1e4 + 0.5))` formulation of
  * [[graft.operators.Similarity.quantize]] is a higher-order function,
  * which Spark evaluates INTERPRETED (one lambda call per element) and
  * which therefore also blocks whole-stage codegen's common-subexpression
  * elimination — so a projection that derives k expressions from the
  * quantized vector re-runs the transform k times per row. The 64-plane
  * LSH signature paid exactly that: 64 interpreted re-quantizations per
  * row, ~0.35 ms/row, the dominant cost of the whole candidate pipeline.
  *
  * [[FloatArrayQuantize]] replaces the HOF with a tight codegen'd loop
  * (identical semantics: `floor(x·scale + 0.5)` in double, cast to
  * long, per-element null propagation). [[HyperplaneSignature]] computes
  * ALL plane signs in ONE pass over the quantized vector — the input is
  * evaluated once however many planes there are, turning O(planes ·
  * quantize) into O(planes · dim) long multiply-adds.
  */
case class FloatArrayQuantize(child: Expression, scale: Int)
    extends UnaryExpression {

  private def arrType: ArrayType = child.dataType.asInstanceOf[ArrayType]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"FloatArrayQuantize needs array<float|double>, got $other")
  }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = arrType.containsNull)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val isD = arrType.elementType == DoubleType
    if (!arrType.containsNull) {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        val x = if (isD) a.getDouble(i) else a.getFloat(i).toDouble
        out(i) = math.floor(x * scale + 0.5).toLong
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) {
          val x = if (isD) a.getDouble(i) else a.getFloat(i).toDouble
          out(i) = math.floor(x * scale + 0.5).toLong
        }
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val x = ctx.freshName("x")
      val getter =
        if (arrType.elementType == DoubleType) s"$a.getDouble($i)"
        else s"(double) $a.getFloat($i)"
      if (!arrType.containsNull)
        s"""
           |int $n = $a.numElements();
           |long[] $out = new long[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  double $x = $getter;
           |  $out[$i] = (long) Math.floor($x * $scale + 0.5);
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      else
        s"""
           |int $n = $a.numElements();
           |Object[] $out = new Object[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$a.isNullAt($i)) {
           |    double $x = $getter;
           |    $out[$i] = (Long) (long) Math.floor($x * $scale + 0.5);
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FloatArrayQuantize =
    copy(child = newChild)
}

/** All hyperplane signs in one pass: input is the QUANTIZED long
  * vector, output the '1'/'0' bucket-signature string (plane dot > 0 →
  * '1'), exactly the per-plane `when(dot > 0, "1")` semantics the
  * banded queries' oracles replicate in SQL. Null when the vector
  * length doesn't match the planes (caller bug, never data).
  */
case class HyperplaneSignature(child: Expression, planes: Seq[Seq[Long]])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private lazy val planeArr: Array[Array[Long]] =
    planes.map(_.toArray).toArray

  // containsNull is accepted because quantize outputs inherit their
  // input's (always-true) flag; elements are in fact never null —
  // the same contract as LongArrayDot/LongArrayNormSq.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"HyperplaneSignature needs array<bigint>, got $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val np = planeArr.length
    val chars = new Array[Char](np)
    var p = 0
    while (p < np) {
      val pl = planeArr(p)
      if (pl.length != n) return null
      var acc = 0L
      var i = 0
      while (i < n) { acc += a.getLong(i) * pl(i); i += 1 }
      chars(p) = if (acc > 0) '1' else '0'
      p += 1
    }
    UTF8String.fromString(new String(chars))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val planesRef = ctx.addReferenceObj("planes", planeArr, "long[][]")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val pl = ctx.freshName("pl")
      val acc = ctx.freshName("acc")
      val chars = ctx.freshName("chars")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |char[] $chars = new char[$planesRef.length];
         |boolean $bad = false;
         |for (int $p = 0; $p < $planesRef.length && !$bad; $p++) {
         |  long[] $pl = $planesRef[$p];
         |  if ($pl.length != $n) { $bad = true; break; }
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getLong($i) * $pl[$i];
         |  }
         |  $chars[$p] = $acc > 0 ? '1' : '0';
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} =
         |    org.apache.spark.unsafe.types.UTF8String.fromString(new String($chars));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
}

object VectorQuantize {
  def quantize(vec: Column, scale: Int): Column =
    ColumnBridge.column(FloatArrayQuantize(ColumnBridge.expression(vec), scale))

  def hyperplaneSignature(qvec: Column, planes: Seq[Seq[Long]]): Column =
    ColumnBridge.column(
      HyperplaneSignature(ColumnBridge.expression(qvec), planes))
}
