package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Persistence-across-restart semantics
  * (`/root/reference/spec/main_spec.rb:91-110`): data written by one
  * "session" is read back identically by another. In the engine the sink
  * is Parquet (`db_close`/`pager_flush` ≈ `df.write.parquet`,
  * `/root/reference/db.cpp:220-278`). */
class PersistenceSpec extends SparkSpecBase {

  test("view_incremental: delta-merged state equals one-shot recompute") {
    import graft.core.Numeric.dsum
    val maintained = graft.ops.Sources.viewIncremental(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val recomputed = graft.core.Tables(spark, sf0001, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sv"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(maintained.keySet == recomputed.keySet)
    maintained.foreach { case (k, v) =>
      assert(v == recomputed(k), s"view drifted from recompute at $k")
    }
    // the standing state really is on disk (partials, not final values)
    val stateDir = new java.io.File(
      s"${sys.props("java.io.tmpdir")}/graft_io/view_incremental_state")
    assert(stateDir.exists, "materialized state dir missing")
    val state = spark.read.parquet(stateDir.toString)
    assert(state.columns.toSet == Set("event_type", "day", "n", "sv"),
      s"state should hold mergeable partials, has ${state.columns.mkString(",")}")
  }

  test("write → read back is lossless for all column types") {
    val dir = Files.createTempDirectory("graft-persist").toString
    val src = graft.core.Tables(spark, sf0001, "lineitem")
    src.write.mode("overwrite").parquet(s"$dir/li")
    val back = spark.read.parquet(s"$dir/li")
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("append mode accumulates rows (R4 insert semantics)") {
    val dir = Files.createTempDirectory("graft-append").toString
    val s = spark
    import s.implicits._
    val a = Seq((1L, "u1", "e1"), (2L, "u2", "e2")).toDF("id", "username", "email")
    val b = Seq((3L, "u3", "e3")).toDF("id", "username", "email")
    a.write.mode("overwrite").parquet(s"$dir/t")
    b.write.mode("append").parquet(s"$dir/t")
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == 3)
    assert(back.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
  }

  test("corrupt input is rejected, not silently misread") {
    // reference semantics: a file that isn't a whole number of pages is
    // refused at open (/root/reference/db.cpp:296-300); the engine analog
    // is the parquet reader refusing a non-parquet payload
    val dir = Files.createTempDirectory("graft-corrupt")
    Files.writeString(dir.resolve("garbage.parquet"), "this is not parquet")
    val err = intercept[Exception] {
      spark.read.parquet(dir.toString).collect()
    }
    assert(err != null)
  }

  test("nested array columns (embeddings) survive the roundtrip bit-exactly") {
    val dir = Files.createTempDirectory("graft-embed").toString
    val src = graft.core.Tables(spark, sf0001, "embeddings")
    src.write.mode("overwrite").parquet(s"$dir/e")
    val back = spark.read.parquet(s"$dir/e")
    val l2 = (df: org.apache.spark.sql.DataFrame) =>
      df.select(sum(aggregate(col("embedding"),
        lit(0.0), (a, x) => a + x.cast("double") * x.cast("double"))))
        .collect()(0).getDouble(0)
    assert(l2(back) == l2(src))
    assert(back.exceptAll(src).isEmpty)
  }
}
