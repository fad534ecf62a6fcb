ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sqldatabaseenginespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// 16g default (was 8g): local[32] at sf0.1 runs 32 concurrent tasks'
// execution memory + localCheckpoint storage in ONE heap — at 8g the
// r8 driver-run bench showed a 1.2-1.8x contention tail the identical
// quiet run didn't. The machine has 128 GiB; test forks use the same
// setting (20 suites run sequentially, one fork at a time).
val driverMem = sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")
// Pre-COMMIT the heap (-Xms = -Xmx): on a ~90 GiB driver heap, G1's full
// collections otherwise uncommit down to the free-ratio band and the next
// heavy sample re-pays the page commit+zero cost inside its timed region
// (the r10 agg-block tax). The r11 runtime MaxHeapFreeRatio=100 pin fixed
// that but made every big-heap full GC pay work proportional to ~90 GiB
// committed — graph_betweenness read 22.2 s vs 8.3 s with the pin off
// (r11 verdict A/B). A pre-committed heap has NO recommit tax to
// mitigate, so the pin and its full-GC cost are both gone.
// Unit-aware (ADVICE r12): '32768m' is 32 GiB but its first integer reads
// 32768 — compare in GiB, treating an m/M suffix as value/1024 (bare or
// g/G values are GiB, matching JVM -Xmx parsing of our two-form input).
val driverMemGb: Int =
  "(?i)(\\d+)\\s*([gm]?)".r.findFirstMatchIn(driverMem).map { m =>
    val v = m.group(1).toLong
    if (m.group(2).equalsIgnoreCase("m")) (v / 1024).toInt else v.toInt
  }.getOrElse(16)
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xms$driverMem",
  s"-Xmx$driverMem",
) ++ (
  // Big heaps also pre-TOUCH at JVM start (untimed) so even first-touch
  // page zeroing never lands inside timed samples — at 89g/sf0.1 this is
  // graph_betweenness 6.0 s vs 8.1 s without. CAVEAT, measured: pre-touch
  // forces the WHOLE heap resident; on this 128 GiB box that evicts the
  // page cache sf1+ shuffle files live in (agg_spearman at sf1 read
  // 30.6/143.0/87.3 s across samples with buff/cache pinned at ~3 GB vs
  // a stable ~23 s without). The driver's bench runs sf0.1 (17 MB data,
  // dedicated-heap regime — pre-touch correct); big-SF local sweeps set
  // SPARK_GRAFT_NO_PRETOUCH=1 (SCALING.md round-12 rule). Either way
  // -Xms=-Xmx already prevents the r10 uncommit/recommit tax.
  if (driverMemGb >= 32 && !sys.env.contains("SPARK_GRAFT_NO_PRETOUCH"))
    Seq("-XX:+AlwaysPreTouch")
  else Seq.empty
)
