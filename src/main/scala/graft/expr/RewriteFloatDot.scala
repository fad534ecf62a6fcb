package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the higher-order-function dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> cast(x) * cast(y)), 0.0d, (s, v) -> s + v)
  *
  * into the fused, codegen'd [[FloatDotProduct]] when both inputs are
  * `array<float>`. Users writing the portable HOF form (e.g. ported SQL)
  * get native performance without touching their queries.
  *
  * The rewrite is exact for ALL inputs, including degenerate ones:
  * [[FloatDotProduct]] mirrors the HOF chain's NULL semantics (length
  * mismatch or any null element → NULL), so substituting it can never
  * change a result. Installed by [[graft.GraftExtensions]].
  */
object RewriteFloatDot extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(cx: Cast, cy: Cast, _), zArgs, _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(mLeft, mRight, _), mArgs, _),
            LambdaFunction(finBody, finArgs, _))
          if isFloatArray(a) && isFloatArray(b) &&
            cx.dataType == DoubleType && cy.dataType == DoubleType &&
            zArgs.length == 2 &&
            cx.child.semanticEquals(zArgs(0)) &&
            cy.child.semanticEquals(zArgs(1)) &&
            mArgs.length == 2 &&
            mLeft.semanticEquals(mArgs(0)) &&
            mRight.semanticEquals(mArgs(1)) &&
            finArgs.length == 1 && finBody.semanticEquals(finArgs.head) =>
        FloatDotProduct(a, b)
    }
}
