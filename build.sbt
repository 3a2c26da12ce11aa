ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "jobpostsimilarityspark"
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
// The driver tail-parses the forked run's stdout for a bare JSON line
// (BENCH_r*); sbt's default LoggedOutput prefixes every forked line with
// "[info] " and appends a "[success] Total time" epilogue after it, so no
// line in the captured tail ever starts with '{' — BENCH_r8/r9 both came
// back "parsed": null. Stream forked output raw and drop the epilogue so
// the final stdout line of `runMain graft.Bench` IS the compact JSON.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
  // 16g: the single-JVM local[32] driver+executor heap. The 122-query
  // Verify/Bench suites retain model caches + codegen classes across
  // queries; at 8g the tail of the suite runs GC-bound (~25% slower on
  // every heavy query, measured at sf0.1), at 16g it does not — on the
  // 128 GiB box this is the right floor, and the env var still overrides.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
