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
    // declared key except the documented iterative connected-components
    // keys (Spark 4.1 recursive CTEs reject UNION-distinct recursion) and
    // meta_vacuum (a physical file DELETE — SQL has no statement for it)
    val covered = SqlCatalog.queriesSql.keySet ++ SqlCatalog.queriesScript.keySet
    val uncovered = SparkEntry.queries.keySet -- covered
    assert(uncovered == Set("dedup_cluster", "dedup_semantic", "dedup_report",
        "dedup_downweight", "meta_vacuum"),
      s"keys without any statement-text path: ${uncovered.toSeq.sorted}")
  }
}
