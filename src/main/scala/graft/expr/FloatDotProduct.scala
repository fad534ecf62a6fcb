package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two `array<float>` columns in
  * double precision, with whole-stage codegen.
  *
  * Replaces the `aggregate(zip_with(a, b, (x, y) => x*y), 0d, _+_)`
  * higher-order-function chain used by the similarity operators: the HOF
  * path allocates an intermediate product array and evaluates a lambda per
  * element; this expression is a fused loop the JIT vectorizes. Semantics
  * match the HOF chain EXACTLY, including the degenerate cases:
  *
  *   - equal-length, non-null elements → index-ascending `acc + x(i)*y(i)`
  *     fold (bit-identical to the HOF chain and to DuckDB's positional-sum
  *     oracle, so swapping it into a declared query cannot change results);
  *   - length mismatch → NULL (zip_with null-pads the shorter array, the
  *     null product poisons the sum);
  *   - any null element → NULL (same poisoning).
  *
  * SURVEY §4.3 custom-work item 1 (the reference has no expressions at
  * all — its executor is a 2-case switch, `/root/reference/db.cpp:504-513`;
  * this is the Spark-native extension point for scalar hot paths).
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"float_dot requires two array<float> inputs, got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // nullable even for non-null children: mismatched lengths / null
  // elements produce NULL (exactly like the HOF chain)
  override def nullable: Boolean = true
  override def prettyName: String = "float_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

object FloatDotProduct {
  /** Column-level entry point: `fdot(a, b)`. */
  def fdot(a: Column, b: Column): Column =
    Bridge.column(FloatDotProduct(Bridge.expression(a), Bridge.expression(b)))
}
