ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pg_mooncakespark"
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
// Forked-run stdout goes to the REAL stdout instead of sbt's logger —
// sbt's default LoggedOutput prefixes every line with "[info] ", which
// breaks any consumer (the bench driver) parsing runMain output as JSON.
run / outputStrategy := Some(StdoutOutput)
// ... and no "[success] Total time" trailer AFTER the run's own output,
// so a runMain's final printed line IS the last line of stdout.
showSuccess := false
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
val commonJvmOpts = jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // The 115-query suite compiles ~300 unique whole-stage-codegen classes
  // in one JVM. At the JDK-17 default (240 MB) the code cache fills
  // mid-run and UseCodeCacheFlushing sweeps hot nmethods — whichever
  // query runs next re-JITs from scratch and stalls for seconds (the
  // roaming 10-20x outliers in BENCH_r04). 1 GB holds the whole suite
  // with no sweep; SegmentedCodeCache keeps profiled/non-profiled tiers
  // from evicting each other.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+SegmentedCodeCache",
)
// 24g for `run` (bench/verify cache every input table plus lake-mirror
// fixtures; at 8g the block cache and G1 fight — measured ~6% slower with
// multi-second GC spikes). Tests keep a conservative 8g so `sbt test`
// works on ordinary dev machines; both respect SPARK_DRIVER_MEM.
run / javaOptions := commonJvmOpts :+
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}"
Test / javaOptions := commonJvmOpts :+
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}"
