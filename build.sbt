ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "doctosqlspark"
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
// The driver parses the LAST stdout JSON line of `sbt "runMain graft.Bench"`.
// sbt normally decorates forked output with "[info] " (unparseable JSON) and
// appends its own "[success] Total time" line — inherit stdout raw and drop
// the success banner so the bench's JSON line is clean, final stdout.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// local-cluster[...] (real executor JVMs — the scaling-evidence mode)
// needs these to launch executors from the forked runner
run / envVars ++= Map(
  "SPARK_HOME" -> "/opt/spark",
  "SPARK_SCALA_VERSION" -> "2.13",
)
Test / envVars ++= Map(
  "SPARK_HOME" -> "/opt/spark",
  "SPARK_SCALA_VERSION" -> "2.13",
)
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
  // local[32] = 32 executor threads in ONE JVM. Keep the heap BELOW the
  // 32 GiB compressed-oops cliff: measured 15x slowdown of the pointer-
  // heavy ingest path at 48g (uncompressed oops) vs 8-16g
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
