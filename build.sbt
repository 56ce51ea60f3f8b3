ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pucminasdatapipelinesspark"
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
// The driver scrapes `sbt "runMain graft.Bench"` stdout for a line-leading
// JSON object. sbt's default LoggedOutput strategy prefixes every forked
// stdout line with "[info] " — which is why all 14 rounds of BENCH_rN.json
// carry parsed:null (the r13 tail shows the intact summary as
// "[info] {...}"). StdoutOutput pipes the forked process's stdout/stderr
// straight through, unprefixed, so the bench summary line starts with '{'.
run / outputStrategy := Some(StdoutOutput)
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
  // 32g default (was 8g, then 24g): local[32] runs the whole engine in
  // one JVM, and the wedge-join intermediates (q154/q107) measurably
  // GC-thrash under 8g at sf0.1 — q154 23.6s at 32g vs 47.4s at 8g,
  // same plan. -Xmx is a cap, not a reservation; the 128 GiB container
  // affords it.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // ParallelGC with a pinned heap and fixed generations, measured
  // against G1 across four 3x-full-bench cycles (12 suite runs,
  // BASELINE.md round-10 protocol section): G1 left q154's wedge
  // aggregate at a stable-but-2x 55-58 s while ParallelGC runs it at
  // 26-33 s; adaptive sizing and lazy heap growth were the variance
  // sources (unpinned ParallelGC swung q154 20-35 s run to run).
  "-XX:+UseParallelGC", "-XX:-UseAdaptiveSizePolicy", "-XX:NewRatio=1",
  // A full 276-query bench compiles ~825 whole-stage-codegen plans;
  // JDK 17's 240 MB default code cache fills mid-suite and the JIT
  // starts flushing and recompiling hot methods — the q154 JFR capture
  // (tools/q154_jfr_summary.txt) recorded 26k compiles / 80 s of
  // compiler time per bench process, and the recompilation storms land
  // on whichever heavy query runs late in the suite. 1 GiB keeps every
  // compiled plan resident for the life of the JVM.
  "-XX:ReservedCodeCacheSize=1g",
)
