package graft

import org.apache.spark.sql.types._

import graft.core.Tables

/** Schema-drift canary (VERDICT r4 #8): pins the ENGINE-FACING schema of
  * every harness table, so a testdata regeneration that changes a physical
  * layout fails here — in one obvious place — instead of 34 queries deep.
  * Round 4 shipped with every events query broken because `events.ts`
  * silently moved from TIMESTAMP(NANOS)-as-BIGINT to `timestamp[us]`; this
  * suite makes that class of regression a one-line diagnosis.
  *
  * Reference analogue: the golden `.constants` output test
  * (`/root/reference/spec/main_spec.rb:112-129`) pins the engine's
  * compiled-in layout constants the same way.
  */
class TableSchemaSpec extends SparkSpecBase {

  private def fields(name: String): Seq[(String, DataType)] =
    Tables(spark, sf0001, name).schema.map(f => f.name -> f.dataType)

  // Engine-facing contract: whatever the physical parquet layout, the
  // reader must present these exact columns and types to every operator.
  // (Naive `timestamp[us]` date columns surface as TIMESTAMP_NTZ and every
  // operator/oracle already treats them as such — pinned, not converted.)
  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    // the round-4 killer: ts MUST surface as TimestampType regardless of
    // the file's physical encoding (nanos-as-long or timestamp[us] NTZ)
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))

  for (t <- Tables.All) test(s"engine-facing schema of `$t` is pinned") {
    assert(expected.contains(t), s"no pinned schema for $t — add it")
    assert(fields(t) == expected(t),
      s"$t drifted:\n  observed: ${fields(t)}\n  pinned:   ${expected(t)}")
  }

  test("events.ts values round-trip the µs instants DuckDB sees") {
    // first event at a deterministic harness epoch — pin one literal value
    // so a unit mix-up (ns vs µs vs ms) can't pass the type check alone
    val first = Tables.events(spark, sf0001)
      .orderBy("event_id").select("ts").head.getTimestamp(0)
    // harness generates events from 2024-01-01T00:00:00Z onward
    assert(first.toInstant.toString.startsWith("2024-"),
      s"events.ts epoch drifted: $first")
  }
}
