ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "blockchain2graphdbspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// The round driver parses the LAST line of the captured run log as the bench
// JSON; sbt's "[success] Total time" trailer has made that parse fail every
// round. Suppress it so graft.Bench's final println IS the last line.
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not a task — exclude it
// from the unused-key lint that can't see that.
Global / excludeLintKeys += showSuccess
// Per-test durations in the report: the suite's wall time is a standing
// complaint (33 min at r8) — you cannot trim what you cannot see.
Test / testOptions += Tests.Argument("-oD")
run / fork := true
// Inherit sbt's stdio in the forked run JVM instead of relaying through the
// sbt logger: relayed stdout gets an "[info] " prefix and relayed stderr is
// buffered into one "[error]" block AFTER all stdout — both of which have
// kept the driver's last-line JSON parse of graft.Bench's output failing.
// With StdoutOutput the process writes the terminal directly, so Bench's
// final println is the last line of the log (showSuccess=false above kills
// the "[success] Total time" trailer that would otherwise follow).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // Deliberately 8g despite 128 GiB on the host: a bigger heap lets the
  // deserialized object caches (50k nested RawBlock graphs) accumulate
  // instead of evicting, and every GC then traces tens of GB of small
  // objects — measured: 24g sent the corpus pipeline 14.7s -> 21.8s median
  // with an 84s worst run; 8g keeps the heap small and GC flat.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
