ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "vectordbcorespark"
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
// Default test run excludes @graft.SlowTest-tagged suites (streaming
// awaits dominate: ~80 min observed on a degraded host, which blows the
// driver's window). GRAFT_FULL_TESTS=1 runs the complete suite.
Test / testOptions ++= (
  if (sys.env.get("GRAFT_FULL_TESTS").contains("1")) Nil
  else Seq(Tests.Argument(TestFrameworks.ScalaTest, "-l", "graft.SlowTest")))
// The driver parses Bench's single JSON stdout line from the tail of the
// sbt output. Two obstacles, both fixed here: (a) the default fork output
// strategy routes child stdout through sbt's logger, prefixing "[info] "
// (BENCH_r01..r03 all show "parsed": null); (b) the "[success] Total time"
// epilogue lands after the JSON line. StdoutOutput passes child output
// through verbatim; showSuccess drops the epilogue.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 12g default: the bench JVM runs the full 160+-dim corpus (heavy
  // persists + broadcast churn) in one process — at 8g the old-gen
  // occasionally collapsed into multi-second full-GC pauses on individual
  // dims (measured: a 2.5 s dim spiking to 25 s). Host has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  // Pin the heap: growing/uncommitting it re-faults pages, which is
  // pathologically expensive on some virtualized hosts (measured ~3.4 µs
  // per 4 KB fault here — paying it once at startup beats paying it on
  // every GC cycle). THP (madvise mode) cuts the fault count ~500×.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
) ++ (if (!sys.env.get("GRAFT_PRETOUCH").contains("0")) Seq(
  // Default ON (opt out with GRAFT_PRETOUCH=0): with the heap merely
  // pinned but not touched, first-touch page faults land MID-RUN on
  // whichever query first grows into a fresh GC region — measured as
  // random 5-10× spikes on otherwise sub-second bench dims (a different
  // dim each run) and a 130 s vs 84 s total at sf0.1. Pre-touching moves
  // that cost to JVM startup, where no dimension is being timed.
  "-XX:+AlwaysPreTouch",
  "-XX:+UseTransparentHugePages",
) else Nil)
// (Deliberately NOT pointing java.io.tmpdir/spark.local.dir at /dev/shm:
// this harness periodically wipes it, which killed live SparkContexts.)
