package graft

/** Plan-inspection harness: `runMain graft.Explain <key> [sfDir]` prints the
  * formatted plan of one `SparkEntry.queries` entry, executes it, then
  * prints the AQE-final executed plan — the iterate-on-the-plan loop the
  * build process uses before pinning a shape in PlanSpec. */
object Explain {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus) // shared recipe (VERDICT r10 #5)
    val df = SparkEntry.queries(key)(spark, sfDir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    val rows = df.queryExecution.toRdd.count()
    println(s"== rows: $rows  sec: ${(System.nanoTime() - t0) / 1e9}")
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
