package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Numeric.dsum
import graft.core.{Tables => T}

/** Round-13 operator batch: catalog statistics feeding the cost-based
  * optimizer end-to-end (`meta_analyze` — the last untested leg of "the
  * plans you'd want at 100x scale": `meta_profile` COMPUTES ANALYZE-grade
  * stats, this key PERSISTS them and pins a plan decision CONSUMING them).
  *
  * Reference semantics anchor: statements over scanned tables with
  * engine-invariant arithmetic (`/root/reference/db.cpp:487-502`
  * executeSelect discipline — every declared result is a deterministic
  * function of the stored rows).
  */
object Frontier4 {
  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------------------ meta_analyze

  /** Managed tables backing the ANALYZE pass; the PlanSpec CBO pin and the
    * statement script reference the same names. */
  val AnOrders = "graft_an_orders"
  val AnCustomer = "graft_an_customer"
  val AnNation = "graft_an_nation"

  /** Run `f` with the cost-based optimizer (and its join-reorder rule)
    * enabled, FORCING the plan while the conf is live — `executedPlan` is
    * a lazy val, so the restored conf can never re-plan the returned
    * frame — then restore both flags so no other declared key plans under
    * CBO (plan pins elsewhere assume the stats-less planner). */
  def withCbo(s: SparkSession)(f: => DataFrame): DataFrame = {
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val prev = keys.map(k => k -> s.conf.get(k))
    keys.foreach(k => s.conf.set(k, "true"))
    try { val df = f; df.queryExecution.executedPlan; df }
    finally prev.foreach { case (k, v) => s.conf.set(k, v) }
  }

  /** The 3-way join the CBO pin audits, DECLARED in the worst order (the
    * two big tables first, the filtered tiny dimension last): with
    * catalog stats + CBO the join-reorder rule rewrites it to shrink
    * customer through the 1-in-5 nation filter BEFORE meeting orders;
    * without stats the optimizer executes the declared order. Split out
    * so PlanSpec audits the join without the CTAS or the final agg. */
  def analyzedReadback(s: SparkSession): DataFrame =
    s.table(AnOrders)
      .join(s.table(AnCustomer), col("o_custkey") === col("c_custkey"))
      .join(s.table(AnNation).filter(col("n_regionkey") === 1),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))

  /** ANALYZE-STATS-TO-PLAN — the missing half of `meta_profile`: persist
    * exact row counts + per-column stats (ndv, min/max, null counts) into
    * the catalog via `ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL
    * COLUMNS`, then plan a 3-way join WITH the cost-based optimizer
    * consuming them. The declared result is the join readback — exactly
    * plan-invariant, so the oracle (the same join on the source tables)
    * proves the CTAS+ANALYZE+CBO path changes the PLAN and never the
    * ANSWER; PlanSpec pins both plan shapes (stats-less: declared
    * orders-first order; stats+CBO: reordered to filter the tiny
    * dimension first). `analyzed_rows` carries the catalog's persisted
    * rowCount back out — ANALYZE's count is exact, so the oracle checks
    * it as COUNT(*), attesting the stats the optimizer consumed are the
    * true cardinalities.
    *
    * 100 TB shape: ANALYZE is one counting scan per table, paid ONCE at
    * ingest and amortized over every subsequent plan; the stats
    * themselves are catalog-resident (bytes per column — no data moves).
    * At 1000 executors a mis-ordered 3-way join shuffles the fact table
    * into a dimension it could have met pre-filtered; the reorder the pin
    * asserts is the difference between shuffling 100 TB and 4 TB. */
  val metaAnalyze: Q = (s, d) => {
    Seq(AnOrders, AnCustomer, AnNation).foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      // a previously-failed run can leave an orphan managed-table location
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"spark-warehouse/$t"))
    }
    T.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"))
      .write.mode("overwrite").saveAsTable(AnOrders)
    T.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      .write.mode("overwrite").saveAsTable(AnCustomer)
    T.nation(s, d).select(col("n_nationkey"), col("n_name"),
        col("n_regionkey"))
      .write.mode("overwrite").saveAsTable(AnNation)
    Seq(AnOrders, AnCustomer, AnNation).foreach { t =>
      s.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    val analyzedRows = s.sessionState.catalog
      .getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(AnOrders))
      .stats.flatMap(_.rowCount).map(_.toLong).getOrElse(-1L)
    withCbo(s) {
      analyzedReadback(s)
        .withColumn("analyzed_rows", lit(analyzedRows))
        .orderBy(col("n_name"))
    }
  }

  // ------------------------------------------------------------ registration

  val queries: Map[String, Q] = Map(
    "meta_analyze" -> metaAnalyze,
  )

  /** DuckDB oracle texts. */
  val oracles: Map[String, String] = Map(
    "meta_analyze" ->
      """SELECT n_name, COUNT(*) AS n_orders,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(20,8))), 2) AS DOUBLE)
        |    AS revenue,
        |  (SELECT COUNT(*) FROM orders) AS analyzed_rows
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey AND n_regionkey = 1
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
  )
}
