ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "featurestore2spark"
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
// The per-round driver parses the FINAL line of a ~2000-char output
// tail as Bench's JSON metric line. Two default sbt behaviors pushed
// it out of last place for five straight rounds: the "[success] Total
// time: …" epilogue printed AFTER the metric line, and the default
// LoggedOutput strategy re-logging every forked-run line with an
// [info]/[error] prefix. Pass forked output through verbatim and skip
// the success epilogue so the metric line is genuinely last.
ThisBuild / showSuccess := false
run / outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
Compile / runMain / outputStrategy := Some(StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // ~100 registered queries x several whole-stage-codegen classes each
  // overflow the default 240m JIT code cache mid-bench; once full, hot
  // generated loops run INTERPRETED (measured: identical 32-task stage,
  // 4s CPU compiled vs 179s interpreted — BENCHNOTES.md). On a cluster
  // the same flag belongs in spark.executor.defaultJavaOptions.
  "-XX:ReservedCodeCacheSize=1g",
)
