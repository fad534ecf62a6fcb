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
    GraftExtensions.descriptors.foreach(ext.injectFunction)
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

  private val md548Descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("md5_48"),
    new ExpressionInfo(classOf[graft.expr.Md5Prefix48].getName, "md5_48"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "md5_48(s) takes exactly 1 argument")
      graft.expr.Md5Prefix48(children.head)
    })

  private val slidingMinDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("sliding_min"),
    new ExpressionInfo(classOf[graft.expr.SlidingMin].getName, "sliding_min"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "sliding_min(arr, w) takes exactly 2 arguments")
      graft.expr.SlidingMin(children.head, children(1))
    })

  private val gramHashDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("gram_hash48"),
    new ExpressionInfo(classOf[graft.expr.GramHash48].getName, "gram_hash48"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "gram_hash48(s, k) takes exactly 2 arguments")
      graft.expr.GramHash48(children.head, children(1))
    })

  private val shingleXxDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("shingle_xx64"),
    new ExpressionInfo(classOf[graft.expr.ShingleXx64].getName, "shingle_xx64"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "shingle_xx64(s, n) takes exactly 2 arguments")
      graft.expr.ShingleXx64(children.head, children(1))
    })

  private val minhashSigDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[graft.expr.MinHashSig].getName, "minhash_sig"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "minhash_sig(s, n) takes exactly 2 arguments")
      graft.expr.MinHashSig(children.head, children(1))
    })

  private val simhash48Descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash48"),
    new ExpressionInfo(classOf[graft.expr.SimHash48].getName, "simhash48"),
    (children: Seq[Expression]) => {
      require(children.size == 3, "simhash48(s, n, bits) takes exactly 3 arguments")
      graft.expr.SimHash48(children.head, children(1), children(2))
    })

  private val thetaAggDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("theta_sketch_agg"),
    new ExpressionInfo(classOf[graft.expr.ThetaSketchAgg].getName, "theta_sketch_agg"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "theta_sketch_agg(v) takes exactly 1 argument")
      graft.expr.ThetaSketchAgg(children.head)
    })

  private val countMinDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("count_min"),
    new ExpressionInfo(classOf[graft.expr.CountMinAgg].getName, "count_min"),
    (children: Seq[Expression]) => {
      require(children.size == 3,
        "count_min(item, depth, width) takes exactly 3 arguments")
      graft.expr.CountMinAgg(children.head, children(1), children(2))
    })

  private val misraGriesDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("misra_gries"),
    new ExpressionInfo(classOf[graft.expr.MisraGriesAgg].getName, "misra_gries"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "misra_gries(item, k) takes exactly 2 arguments")
      graft.expr.MisraGriesAgg(children.head, children(1))
    })

  private val thetaEstimateDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("theta_estimate"),
    new ExpressionInfo(classOf[graft.expr.ThetaEstimate].getName, "theta_estimate"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "theta_estimate(sk) takes exactly 1 argument")
      graft.expr.ThetaEstimate(children.head)
    })

  private val thetaIntersectDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("theta_intersect"),
    new ExpressionInfo(classOf[graft.expr.ThetaIntersect].getName, "theta_intersect"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "theta_intersect(a, b) takes exactly 2 arguments")
      graft.expr.ThetaIntersect(children.head, children(1))
    })

  private val bloomAggDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_agg"),
    new ExpressionInfo(classOf[graft.expr.BloomFilterAgg].getName, "bloom_agg"),
    (children: Seq[Expression]) => {
      require(children.size == 3,
        "bloom_agg(key, numBits, numHashes) takes exactly 3 arguments")
      graft.expr.BloomFilterAgg(children.head, children(1), children(2))
    })

  private val kllAggDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kll_sketch_agg"),
    new ExpressionInfo(classOf[graft.expr.KllDoublesAgg].getName, "kll_sketch_agg"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "kll_sketch_agg(v) takes exactly 1 argument")
      graft.expr.KllDoublesAgg(children.head)
    })

  private val kllQuantileDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kll_quantile"),
    new ExpressionInfo(classOf[graft.expr.KllQuantile].getName, "kll_quantile"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "kll_quantile(sk, q) takes exactly 2 arguments")
      graft.expr.KllQuantile(children.head, children(1))
    })

  private val kllNDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kll_n"),
    new ExpressionInfo(classOf[graft.expr.KllN].getName, "kll_n"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "kll_n(sk) takes exactly 1 argument")
      graft.expr.KllN(children.head)
    })

  private val bloomContainsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_contains"),
    new ExpressionInfo(classOf[graft.expr.BloomMightContain].getName, "bloom_contains"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "bloom_contains(bf, key) takes exactly 2 arguments")
      graft.expr.BloomMightContain(children.head, children(1))
    })

  /** Runtime-settable confs the engine's operators are tuned for. Applied
    * by [[install]] (the explicit engine-installation entry point); query
    * builders and table readers themselves never mutate a caller's
    * session.
    *
    *   - objectHashAggregate fallback: the default flushes to sort-based
    *     aggregation after 128 in-memory groups, pathological for the tiny
    *     fixed-size sketch buffers of [[graft.expr.MinHashAgg]];
    *   - nanosAsLong: kept for the LEGACY events layout — earlier harness
    *     data carried TIMESTAMP(NANOS), which Spark 4 refuses to read
    *     without it. The conf is inert for the current `timestamp[us]`
    *     layout; [[graft.core.Tables]] branches on the observed type. */
  val recommendedConfs: Map[String, String] = Map(
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "4194304",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true")

  /** Every engine function, registered by BOTH installation routes (the
    * extensions constructor and [[install]]) — one list, so a new
    * function can't be visible on one route and missing on the other. */
  private val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(floatDotDescriptor, md548Descriptor, slidingMinDescriptor,
      gramHashDescriptor, shingleXxDescriptor, minhashSigDescriptor,
      simhash48Descriptor, thetaAggDescriptor, thetaEstimateDescriptor,
      thetaIntersectDescriptor, misraGriesDescriptor, countMinDescriptor,
      bloomAggDescriptor, bloomContainsDescriptor,
      kllAggDescriptor, kllQuantileDescriptor, kllNDescriptor)

  /** Idempotently register the engine functions on a live session and
    * apply [[recommendedConfs]]. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    descriptors.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graft.Bridge.registerFunction(spark, id, info, builder)
    }
    recommendedConfs.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
