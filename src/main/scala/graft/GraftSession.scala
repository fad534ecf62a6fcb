package graft

import org.apache.spark.sql.SparkSession

/** ONE session recipe for every engine entry point (VERDICT r10 #5).
  *
  * Until round 10 the bench session carried config the shipped engine did
  * not (off-heap Tungsten), so the measured engine was not the verified
  * engine. This object is now the single call site: [[Bench]], [[Verify]],
  * [[Repl]] and [[Explain]] all build their session here, so a memory- or
  * planner-level setting can never silently fork between the bench and the
  * oracle gate again.
  *
  * Settings and why they are engine-level, not bench-level:
  *   - `spark.sql.shuffle.partitions` = worker threads: local[N] has no
  *     dynamic allocation; 200 partitions over N<=32 threads just adds
  *     scheduling overhead (SURVEY §7 rule).
  *   - UTC session time zone: the events reader casts TIMESTAMP_NTZ to
  *     TimestampType, which is timezone-sensitive — every entry point must
  *     agree or plans diverge per machine.
  *   - Tungsten off-heap (8g): join/agg scratch allocated on-heap makes G1
  *     concurrent cycles scan tens of GB on very large driver heaps (the
  *     round-10 graph_jaccard hunt: 3.2-30.9 s samples at 90g vs a stable
  *     ~3 s at 16g, same code). Unsafe pages never enter the GC's world,
  *     so execution-memory behavior stops depending on -Xmx. That is an
  *     ENGINE property — Verify and the REPL want it for the same reason
  *     the bench does.
  */
object GraftSession {

  /** Off-heap Tungsten pool, also stamped into BENCH jsons (ADVICE r10:
    * the artifact must self-describe its memory config). */
  val OffHeapBytes: Long = 8L * 1024 * 1024 * 1024

  /** Build + install: returns a live session with GraftExtensions
    * (native expressions, engine-tuned confs) applied. */
  def local(cpus: String, logLevel: String = "WARN"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", OffHeapBytes.toString)
      .getOrCreate()
    s.sparkContext.setLogLevel(logLevel)
    GraftExtensions.install(s)
    s
  }
}
