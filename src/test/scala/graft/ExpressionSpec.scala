package graft

import org.apache.spark.sql.functions._

import graft.core.{Tables => T}
import graft.expr.{FloatDotProduct, MinHashAgg}

/** Native extension machinery: the codegen'd FloatDotProduct must be
  * bit-identical to the higher-order-function formulation (both eval
  * paths), and the one-pass MinHash aggregator must equal the K-column
  * min formulation it replaced. */
class ExpressionSpec extends SparkSpecBase {

  private def hofDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("FloatDotProduct == HOF chain, bit-exact, on all sf0.001 embeddings") {
    val e = T.embeddings(spark, sf0001)
    val both = e.select(
      FloatDotProduct.fdot(col("embedding"), col("embedding")).as("native"),
      hofDot(col("embedding"), col("embedding")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    // also under the interpreted path (codegen off)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(both.filter(col("native") =!= col("hof")).count() == 0)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("FloatDotProduct null/shape semantics == HOF chain on degenerate inputs") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(Seq(Option(1f), Option(2f), Option(3f))),
        Some(Seq(Option(4f), Option(5f), Option(6f)))),
      (None, Some(Seq(Option(1f), Option(1f)))),        // null input → NULL
      (Some(Seq(Option(2f))),
        Some(Seq(Option(3f), Option(9f)))),             // length mismatch → NULL
      (Some(Seq(Option(1f), None)),
        Some(Seq(Option(2f), Option(3f))))              // null element → NULL
    ).toDF("a", "b")
    val out = df.select(
      FloatDotProduct.fdot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    assert(out(0).getDouble(0) == (4.0 + 10.0 + 18.0))
    assert(out(1).isNullAt(0) && out(2).isNullAt(0) && out(3).isNullAt(0))
    // null-safe equality with the HOF chain on EVERY row, both eval paths
    val diff = df.filter(!(FloatDotProduct.fdot(col("a"), col("b")) <=>
      hofDot(col("a"), col("b"))))
    assert(diff.count() == 0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(diff.count() == 0)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("RewriteFloatDot rewrites the HOF idiom into the native expression") {
    val e = T.embeddings(spark, sf0001).limit(100)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.expr.RewriteFloatDot
    try {
      val df = e.select(col("vec_id"),
        hofDot(col("embedding"), col("embedding")).as("d"))
      assert(df.queryExecution.optimizedPlan.toString.contains("float_dot"),
        "HOF chain not rewritten to FloatDotProduct")
      // and the rewritten plan still computes the identical values
      val viaRule = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == graft.expr.RewriteFloatDot)
      val plain = e.select(col("vec_id"),
        hofDot(col("embedding"), col("embedding")).as("d"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(viaRule == plain)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == graft.expr.RewriteFloatDot)
    }
  }

  test("MinHashAgg == column-wise min formulation") {
    val s = spark
    import s.implicits._
    val (p, k, a, b) = MinHashAgg.params
    val hv = (1 to 500).map(i => (i % 7L, (i * 2654435761L) % p))
      .toDF("g", "hv")
    val native = hv.groupBy("g").agg(MinHashAgg.minhash(col("hv")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val mins = (0 until k).map(i =>
      min((lit(a(i)) * col("hv") + lit(b(i))) % p).as(s"m_$i"))
    val colwise = hv.groupBy("g").agg(mins.head, mins.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to k).map(r.getLong(_))).toMap
    assert(native.keySet == colwise.keySet)
    native.foreach { case (g, sig) =>
      assert(sig == colwise(g), s"signature mismatch for group $g")
    }
  }
}
