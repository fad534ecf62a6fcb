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

  test("count_min is callable from spark.sql and matches the Column API") {
    GraftExtensions.install(spark)
    graft.core.Tables(spark, sf0001, "events").limit(500)
      .createOrReplaceTempView("ev_ext")
    val viaSql = spark.sql(
      "SELECT count_min(event_type, 2, 64) AS sk FROM ev_ext")
      .collect()(0).getSeq[Long](0)
    val viaCol = spark.table("ev_ext")
      .agg(graft.expr.CountMin.agg(col("event_type"), 2, 64).as("sk"))
      .collect()(0).getSeq[Long](0)
    assert(viaSql == viaCol)
    assert(viaSql.sum == 2 * 500L, "each row increments one counter per sketch row")
  }

  test("install is idempotent") {
    GraftExtensions.install(spark)
    GraftExtensions.install(spark)
    assert(spark.sql("SELECT float_dot(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS d")
      .collect()(0).getDouble(0) == 2.0)
  }
}
