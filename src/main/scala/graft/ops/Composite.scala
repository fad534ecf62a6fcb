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

  /** TPC-H Q6 shape (forecasting revenue change): pure filter + one-row
    * aggregate over the fact table — zero joins, zero wide shuffles. At
    * 100 TB this is the scan-speed benchmark: all four predicates push to
    * the parquet reader, the partial sums combine map-side, and exactly
    * one row crosses the final exchange. */
  val tpchQ6: Q = (s, d) => {
    val y0 = lit("1995-01-01").cast("timestamp")
    val y1 = lit("1996-01-01").cast("timestamp")
    T.lineitem(s, d)
      .filter(col("l_shipdate") >= y0 && col("l_shipdate") < y1 &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))
  }

  /** TPC-H Q12 shape (shipping-mode priority): harness lineitem has no
    * l_shipmode/l_commitdate, so the adapted form keeps Q12's plan shape
    * exactly — fact-to-fact join + conditional two-way counts — grouping
    * by `l_linestatus` and splitting orders into high/low priority. One
    * shuffle join on the order key, then a 2-row aggregate. */
  val tpchQ12: Q = (s, d) => {
    val y0 = lit("1995-01-01").cast("timestamp")
    val y1 = lit("1996-01-01").cast("timestamp")
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    val l = T.lineitem(s, d)
      .filter(col("l_shipdate") >= y0 && col("l_shipdate") < y1)
      .select(col("l_orderkey"), col("l_linestatus"))
    val o = T.orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  /** TPC-H Q14 shape (promotion effect): one-month lineitem slice joined
    * to part (broadcast — part is a dim), conditional revenue ratio. The
    * percentage is rounded to 4 decimals with the exact-integer
    * `floor((2a+b)/2b)` recipe over the 2-decimal dsum results (see
    * [[graft.core.Numeric]]) — both engines divide the same two exact
    * doubles, so the result is bit-identical. */
  val tpchQ14: Q = (s, d) => {
    val m0 = lit("1995-09-01").cast("timestamp")
    val m1 = lit("1995-10-01").cast("timestamp")
    val l = T.lineitem(s, d)
      .filter(col("l_shipdate") >= m0 && col("l_shipdate") < m1)
      .select(col("l_partkey"), revenue.as("rev"))
    val p = T.part(s, d).select(col("p_partkey"), col("p_type"))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        dsum(when(col("p_type") === "PROMO", col("rev")).otherwise(0.0))
          .as("promo_revenue"),
        dsum(col("rev")).as("total_revenue"))
      .select(col("promo_revenue"), col("total_revenue"),
        (floor((lit(2e6) * col("promo_revenue") + col("total_revenue")) /
          (lit(2.0) * col("total_revenue"))).cast("long") / lit(1e4))
          .as("promo_pct"))
  }

  /** TPC-H Q18 shape (large-volume customers): self-aggregate lineitem to
    * find heavy orders (sum qty > 150), join back to orders + customer,
    * top-100 by order value. Plan discipline: the heavy-order aggregate
    * and the join to orders share one shuffle key (l_orderkey /
    * o_orderkey) so AQE lines them up; customer broadcasts; the top-100
    * is TakeOrderedAndProject (no global sort materialization). */
  val tpchQ18: Q = (s, d) => {
    val heavy = T.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
      .filter(col("sum_qty") > 150)
    val o = T.orders(s, d).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
    val c = T.customer(s, d).select(col("c_custkey"), col("c_name"))
    heavy.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
      .limit(100)
  }

  val queries: Map[String, Q] = Map(
    "tpch_q3" -> tpchQ3,
    "tpch_q5" -> tpchQ5,
    "tpch_q6" -> tpchQ6,
    "tpch_q10" -> tpchQ10,
    "tpch_q12" -> tpchQ12,
    "tpch_q14" -> tpchQ14,
    "tpch_q18" -> tpchQ18,
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

    "tpch_q6" ->
      s"""SELECT ${dsumSql("l_extendedprice * l_discount")} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
         |  AND l_shipdate < TIMESTAMP '1996-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07
         |  AND l_quantity < 24""".stripMargin,

    "tpch_q12" ->
      s"""SELECT l_linestatus,
         |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
         |  AND l_shipdate < TIMESTAMP '1996-01-01'
         |GROUP BY l_linestatus
         |ORDER BY l_linestatus""".stripMargin,

    "tpch_q14" ->
      s"""SELECT promo_revenue, total_revenue,
         |  CAST(floor((2e6 * promo_revenue + total_revenue)
         |    / (2.0 * total_revenue)) AS BIGINT) / 1e4 AS promo_pct
         |FROM (
         |  SELECT
         |    ${dsumSql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} AS promo_revenue,
         |    ${dsumSql(rev)} AS total_revenue
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey
         |  WHERE l_shipdate >= TIMESTAMP '1995-09-01'
         |    AND l_shipdate < TIMESTAMP '1995-10-01')""".stripMargin,

    "tpch_q18" ->
      s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
         |  sum_qty
         |FROM (
         |  SELECT l_orderkey,
         |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         |  FROM lineitem GROUP BY l_orderkey
         |  HAVING SUM(CAST(l_quantity AS BIGINT)) > 150) h
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100""".stripMargin,
  )
}
