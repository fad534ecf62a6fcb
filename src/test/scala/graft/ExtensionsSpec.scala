package graft

import org.apache.spark.sql.functions._

/** The SparkSessionExtensions surface: engine functions usable from SQL
  * text after install, matching the Column API bit-for-bit. */
class ExtensionsSpec extends SparkSpecBase {

  test("float_dot is callable from spark.sql after install") {
    GraftExtensions.install(spark)
    graft.core.Tables(spark, sf0001, "embeddings").limit(50)
      .createOrReplaceTempView("emb_ext")
    val viaSql = spark.sql(
      "SELECT vec_id, float_dot(embedding, embedding) AS d FROM emb_ext")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaCol = spark.table("emb_ext")
      .select(col("vec_id"),
        graft.expr.FloatDotProduct.fdot(col("embedding"), col("embedding")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaSql == viaCol && viaSql.nonEmpty)
  }

  test("install is idempotent") {
    GraftExtensions.install(spark)
    GraftExtensions.install(spark)
    assert(spark.sql("SELECT float_dot(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS d")
      .collect()(0).getDouble(0) == 2.0)
  }
}
