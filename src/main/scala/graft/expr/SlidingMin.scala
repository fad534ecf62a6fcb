package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: all sliding-window minima of an
  * `array<long>` — `sliding_min(a, w)[j] = min(a[j], ..., a[j+w-1])` for
  * j in 0..n-w, computed with a monotonic deque in O(n) per row.
  *
  * Replaces the explode-window-indices shape in winnowing
  * ([[graft.api.TextDedup.winnowFingerprints]]): that shape is
  * Catalyst-safe (no quadratic HOF inlining) but materializes one row and
  * one w-element `slice` copy PER WINDOW — ~n rows and allocations per
  * document ahead of a corpus-wide shuffle. This expression keeps the
  * whole computation inside the row: one pass, one output array, no
  * intermediate explode. Result values are identical (min over the same
  * windows).
  *
  * Contract: elements must be non-null (the engine feeds it hash arrays);
  * a null element throws. Returns NULL if the array is shorter than `w`.
  * `w` must be a positive integer literal-ish expression (foldable or
  * per-row, evaluated as given).
  */
case class SlidingMin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sliding_min requires (array<long>, int), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // short input → NULL
  override def prettyName: String = "sliding_min"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SlidingMin.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, w) => {
      val out = ctx.freshName("out")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.expr.SlidingMin.compute($arr, $w);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SlidingMin =
    copy(left = newLeft, right = newRight)
}

object SlidingMin {
  /** Monotonic-deque sliding minimum. Returns null when n < w. */
  def compute(arr: ArrayData, w: Int): ArrayData = {
    require(w > 0, s"sliding_min window must be positive, got $w")
    val n = arr.numElements()
    if (n < w) return null
    val out = new Array[Long](n - w + 1)
    // deque of candidate indices; values strictly increase front→back
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) throw new IllegalArgumentException(
        "sliding_min: null element at index " + i)
      val v = arr.getLong(i)
      while (tail > head && arr.getLong(dq(tail - 1)) >= v) tail -= 1
      dq(tail) = i
      tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) out(i - w + 1) = arr.getLong(dq(head))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level entry point: `slidingMin(a, w)`. */
  def slidingMin(a: Column, w: Int): Column =
    Bridge.column(SlidingMin(Bridge.expression(a),
      Bridge.expression(org.apache.spark.sql.functions.lit(w))))
}
