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
    * `events.ts` has shipped in two physical layouts across harness data
    * regenerations, so the reader branches on the OBSERVED Parquet type
    * rather than assuming one — a regeneration can't silently break every
    * events query again:
    *
    *   - `timestamp[us], isAdjustedToUTC=false` (current): Spark reads
    *     TIMESTAMP_NTZ; cast to session-local `TimestampType`. Sessions are
    *     pinned to UTC (Verify/Bench/tests), so the resulting instants
    *     match DuckDB's naive-µs read of the same file bit-for-bit.
    *   - TIMESTAMP(NANOS) (legacy): Spark 4.x rejects it outright; with
    *     `spark.sql.legacy.parquet.nanosAsLong` (part of
    *     [[graft.GraftExtensions.recommendedConfs]]) it reads as a long,
    *     truncated here to µs. `ts div 1000` is integer division: nanos
    *     ≈ 1.7e18 exceed a double's 2^53 mantissa, so float division
    *     would corrupt timestamps.
    *   - already `TimestampType`: passed through unchanged.
    *
    * Readers are side-effect-free: no session conf is mutated here.
    */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(All.contains(name), s"unknown table: $name")
    if (name == "events") {
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      val ts = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          timestamp_micros(expr("ts div 1000"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          col("ts").cast(org.apache.spark.sql.types.TimestampType)
        case _ => col("ts")
      }
      raw.withColumn("ts", ts)
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
