package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expr.FloatDotProduct

/** Engine extension installer (SURVEY §4.3).
  *
  * Registers the native expressions with Spark's function registry so they
  * are first-class in SQL text as well as the Column API:
  *
  *   spark.sql("SELECT float_dot(a.embedding, b.embedding) ...")
  *
  * Two installation routes, both standard:
  *   - config-time: `spark.sql.extensions=graft.GraftExtensions`
  *     (constructor injection via [[apply]]);
  *   - runtime: [[GraftExtensions.install]] on a live session (used by the
  *     harness mains, whose SparkSession is built by the driver without
  *     extension conf).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.floatDotDescriptor)
    ext.injectOptimizerRule(_ => graft.expr.RewriteFloatDot)
  }
}

object GraftExtensions {
  private val floatDotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("float_dot"),
    new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "float_dot(a, b) takes exactly 2 arguments")
      FloatDotProduct(children.head, children(1))
    })

  /** Idempotently register the engine functions on a live session. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (id, info, builder) = floatDotDescriptor
    org.apache.spark.sql.graft.Bridge.registerFunction(spark, id, info, builder)
  }
}
