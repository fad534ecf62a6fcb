package graft

/** Dev-loop checker for the statement-script surface: for each key given
  * on the command line (or every [[SqlCatalog.queriesScript]] key if none),
  * runs the script AND the declared DataFrame query at the given sfDir and
  * reports row-for-row equality — the same comparison SqlEntrySpec pins,
  * runnable via the sbt-free `java -cp` fast path.
  *
  * Usage: `runMain graft.ScriptCheck /root/testdata/sf0.001 [key ...]`
  */
object ScriptCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val keys = if (args.length > 1) args.drop(1).toSeq
               else SqlCatalog.queriesScript.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.local(cpus)
    var bad = 0
    keys.foreach { k =>
      try {
        val df = SparkEntry.queries(k)(spark, sfDir)
        // prefer the script path when the key has one; otherwise compare
        // the single-SELECT SQL text (same row-for-row pin as SqlEntrySpec)
        val viaScript =
          if (SqlCatalog.queriesScript.contains(k)) SqlCatalog.runScript(k)(spark, sfDir)
          else SqlCatalog.sql(k)(spark, sfDir)
        val cOk = df.columns.toSeq == viaScript.columns.toSeq
        val e = df.collect().map(_.toSeq)
        val g = viaScript.collect().map(_.toSeq)
        val rowsOk = e.length == g.length &&
          e.zip(g).forall { case (a, b) => a == b }
        if (cOk && rowsOk) println(s"[scriptcheck] $k OK (${e.length} rows)")
        else {
          bad += 1
          println(s"[scriptcheck] $k MISMATCH colsOk=$cOk " +
            s"rows df=${e.length} script=${g.length}")
          if (!cOk) println(s"  df=${df.columns.toSeq}\n  sc=${viaScript.columns.toSeq}")
          e.zip(g).zipWithIndex.filter { case ((a, b), _) => a != b }.take(5)
            .foreach { case ((a, b), i) => println(s"  row $i df=$a script=$b") }
        }
        spark.catalog.clearCache()
      } catch { case ex: Throwable =>
        bad += 1
        println(s"[scriptcheck] $k FAILED: ${ex.getMessage.take(500)}")
      }
    }
    println(s"[scriptcheck] done, $bad bad")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
