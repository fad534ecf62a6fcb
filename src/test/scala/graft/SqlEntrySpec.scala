package graft

/** The SQL-text front door must be a faithful twin of the DataFrame path:
  * for every key in [[SqlCatalog.queriesSql]], running the SQL text against
  * the catalog views returns exactly the DataFrame query's schema and rows
  * (bit-exact — both paths share the decimal-sum/round determinism
  * discipline, so even doubles must agree). */
class SqlEntrySpec extends SparkSpecBase {

  test("every SQL-catalog entry matches the DataFrame path row-for-row") {
    GraftExtensions.install(spark) // float_dot must be SQL-callable
    val keys = SqlCatalog.queriesSql.keys.toSeq.sorted
    assert(keys.size >= 70,
      s"SQL catalog should cover >=70 declared queries, has ${keys.size}")
    // every SQL entry must correspond to a declared query
    val undeclared = keys.filterNot(SparkEntry.queries.contains)
    assert(undeclared.isEmpty, s"SQL entries without declared query: $undeclared")
    keys.foreach { k =>
      val df = SparkEntry.queries(k)(spark, sf0001)
      val viaSql = SqlCatalog.sql(k)(spark, sf0001)
      assert(df.columns.toSeq == viaSql.columns.toSeq,
        s"$k: columns ${viaSql.columns.toSeq} != ${df.columns.toSeq}")
      val expect = df.collect().map(_.toSeq)
      val got = viaSql.collect().map(_.toSeq)
      assert(expect.length == got.length,
        s"$k: ${got.length} rows via SQL, ${expect.length} via DataFrame")
      expect.zip(got).zipWithIndex.foreach { case ((e, g), i) =>
        assert(e == g, s"$k: row $i differs — sql=$g df=$e")
      }
      spark.catalog.clearCache()
    }
  }

  test("every statement SCRIPT matches the DataFrame path row-for-row") {
    GraftExtensions.install(spark)
    val keys = SqlCatalog.queriesScript.keys.toSeq.sorted
    keys.foreach { k =>
      val df = SparkEntry.queries(k)(spark, sf0001)
      val viaScript = SqlCatalog.runScript(k)(spark, sf0001)
      assert(df.columns.toSeq == viaScript.columns.toSeq,
        s"$k: columns ${viaScript.columns.toSeq} != ${df.columns.toSeq}")
      val expect = df.collect().map(_.toSeq)
      val got = viaScript.collect().map(_.toSeq)
      assert(expect.length == got.length,
        s"$k: ${got.length} rows via script, ${expect.length} via DataFrame")
      expect.zip(got).zipWithIndex.foreach { case ((e, g), i) =>
        assert(e == g, s"$k: row $i differs — script=$g df=$e")
      }
      spark.catalog.clearCache()
    }
    // statement-text coverage: single SELECTs + scripts must reach every
    // declared key except meta_vacuum (a physical file DELETE — SQL has
    // no statement for it). The connected-components keys joined the
    // script surface in round 11 via bounded-round expansion
    // (SqlCatalog.ccRoundStatements) — Spark 4.1 recursive CTEs still
    // reject the UNION-distinct recursion a single SELECT would need.
    val covered = SqlCatalog.queriesSql.keySet ++ SqlCatalog.queriesScript.keySet
    val uncovered = SparkEntry.queries.keySet -- covered
    assert(uncovered == Set("meta_vacuum"),
      s"keys without any statement-text path: ${uncovered.toSeq.sorted}")
  }

  test("upstream limitation pinned: recursive CTE rejects UNION-distinct") {
    // WHY connected components is a statement SCRIPT and not one SELECT:
    // the closure needs cross-iteration dedup (UNION distinct) to
    // terminate on the cyclic symmetrized graph, and Spark 4.1's
    // recursive CTE accepts only UNION ALL recursion — pinned here so the
    // day Spark lifts it, this test fails and the single-SELECT rewrite
    // becomes possible.
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("WITH RECURSIVE r(n) AS (SELECT 1 UNION " +
        "SELECT n + 1 FROM r WHERE n < 3) SELECT * FROM r").collect()
    }
    val cond = Option(e.getCondition).getOrElse("")
    assert(cond.contains("RECURSI") || e.getMessage.contains("RECURSI"),
      s"unexpected failure shape: cond=$cond msg=${e.getMessage.take(300)}")
  }
}
