ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "flinkrelease1145commentspark"
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 8g is enough for any single query, but a ~90-query Bench run
  // accumulates localCheckpoint blocks and window/agg spill buffers;
  // on the 128GiB box a larger heap keeps late-suite queries from GC
  // thrashing (the same late-alphabet degradation pattern as the
  // code-cache issue below, but heap-shaped).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // A multi-query run (Bench/Verify) generates thousands of whole-stage
  // codegen classes; the JDK default 240m code cache fills mid-run, the
  // JIT shuts off, and every later query runs interpreted (10-100x
  // slower). Size it so codegen stays compiled for the whole suite.
  "-XX:ReservedCodeCacheSize=1g",
)
// Bench prints its result as ONE JSON line on stdout. Two sbt behaviors
// corrupt that for consumers: the logger wraps forked-process output in
// "[info] " lines, and a trailing "[success] Total time: ..." line lands
// after the JSON. Pass output through raw and suppress the banner.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Both scopes: r1's driver-side run still printed "[success] Total
// time: ..." after the JSON with only the ThisBuild-scoped setting.
ThisBuild / showSuccess := false
Global / showSuccess := false
