package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Tables => T}
import graft.core.Numeric._

/** Headline composite analytics — TPC-H-shaped multi-join pipelines over
  * the harness star schema (the reference cannot express ANY of these; its
  * surface is insert/select, `/root/reference/db.cpp:428-441`). These are
  * the end-to-end plans a warehouse engine lives on: selective dim filters,
  * fact-to-fact joins, grouped revenue aggregation, top-k. Plan discipline
  * at 100 TB: dims broadcast, facts shuffle once on the join key, revenue
  * aggregates map-side first, top-k via TakeOrderedAndProject. */
object Composite {
  type Q = (SparkSession, String) => DataFrame

  private def revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** TPC-H Q3 shape (shipping priority): BUILDING-segment customers,
    * orders before a date, lineitems shipped after it; top-10 orders by
    * revenue. */
  val tpchQ3: Q = (s, d) => {
    val cutoff = lit("1995-03-15").cast("timestamp")
    val c = T.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val o = T.orders(s, d).filter(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val l = T.lineitem(s, d).filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"), revenue.as("rev"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(col("rev")).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("o_orderdate"), col("revenue"))
  }

  /** TPC-H Q5 shape (local-supplier volume): revenue by nation for one
    * region-year, where customer and supplier share the nation. */
  val tpchQ5: Q = (s, d) => {
    val y0 = lit("1995-01-01").cast("timestamp")
    val y1 = lit("1996-01-01").cast("timestamp")
    val r = T.region(s, d).filter(col("r_name") === "ASIA")
    val n = T.nation(s, d).join(broadcast(r),
      col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val c = T.customer(s, d).join(broadcast(n),
      col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"))
    val o = T.orders(s, d)
      .filter(col("o_orderdate") >= y0 && col("o_orderdate") < y1)
      .select(col("o_orderkey"), col("o_custkey"))
    val sup = T.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
    val l = T.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), revenue.as("rev"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("rev")).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q10 shape (returned-item reporting): revenue lost to returns
    * per customer in a quarter; top-20 customers. */
  val tpchQ10: Q = (s, d) => {
    val q0 = lit("1995-10-01").cast("timestamp")
    val q1 = lit("1996-01-01").cast("timestamp")
    val o = T.orders(s, d)
      .filter(col("o_orderdate") >= q0 && col("o_orderdate") < q1)
      .select(col("o_orderkey"), col("o_custkey"))
    val l = T.lineitem(s, d).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), revenue.as("rev"))
    val c = T.customer(s, d)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey"))
    val n = T.nation(s, d).select(col("n_nationkey"), col("n_name"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(dsum(col("rev")).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
      .select(col("c_custkey"), col("c_name"),
        round(col("c_acctbal"), 2).as("c_acctbal"), col("n_name"), col("revenue"))
  }

  val queries: Map[String, Q] = Map(
    "tpch_q3" -> tpchQ3,
    "tpch_q5" -> tpchQ5,
    "tpch_q10" -> tpchQ10,
  )

  private val rev = "l_extendedprice * (1.0 - l_discount)"

  val oracles: Map[String, String] = Map(
    "tpch_q3" ->
      s"""SELECT l_orderkey, o_orderdate, revenue FROM (
         |  SELECT l_orderkey, o_orderdate, ${dsumSql(rev)} AS revenue
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  WHERE c_mktsegment = 'BUILDING'
         |    AND o_orderdate < TIMESTAMP '1995-03-15'
         |    AND l_shipdate > TIMESTAMP '1995-03-15'
         |  GROUP BY l_orderkey, o_orderdate)
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "tpch_q5" ->
      s"""SELECT n_name, ${dsumSql(rev)} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1995-01-01'
         |  AND o_orderdate < TIMESTAMP '1996-01-01'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,

    "tpch_q10" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name, revenue FROM (
         |  SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal, n_name,
         |    ${dsumSql(rev)} AS revenue
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  WHERE l_returnflag = 'R'
         |    AND o_orderdate >= TIMESTAMP '1995-10-01'
         |    AND o_orderdate < TIMESTAMP '1996-01-01'
         |  GROUP BY c_custkey, c_name, round(c_acctbal, 2), n_name)
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
  )
}
