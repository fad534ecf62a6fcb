package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the harness tables (TESTDATA.md / FIXTURES.md §B).
  *
  * Generalizes the reference's pager + `db_open`
  * (`/root/reference/db.cpp:280-329`): storage is delegated entirely to
  * Spark's Parquet source framework — columnar scans with predicate
  * pushdown, column pruning and min/max row-group pruning replace the
  * hand-rolled 4 KiB page cache (`db.cpp:127-167`). At cluster scale each
  * table is a directory of many Parquet files; `local[n]` reads the same
  * plan shape against a single file.
  */
object Tables {
  val All: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one harness table from `sfDir`.
    *
    * `events.ts` is TIMESTAMP(NANOS) in Parquet, which Spark 4.x rejects
    * outright; we read it as a long (legacy conf, part of
    * [[graft.GraftExtensions.recommendedConfs]] — sessions must run
    * `GraftExtensions.install` first) and truncate to microsecond
    * `TimestampType` — exactly what DuckDB's µs TIMESTAMP does on the
    * same file, keeping oracle comparisons aligned. `ts div 1000` is
    * integer division: nanos ≈ 1.7e18 exceed a double's 2^53 mantissa, so
    * float division here would corrupt timestamps. Readers are
    * side-effect-free: no session conf is mutated here.
    */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(All.contains(name), s"unknown table: $name")
    if (name == "events") {
      spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
