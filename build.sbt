ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kmeansclusteringviamapreducespark"
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
// Pass the forked JVM's stdout through UNPREFIXED (default LoggedOutput
// wraps every line in "[info] ", which breaks the driver's parse of
// Bench's final JSON line), and drop sbt's trailing "[success] ..." line
// so Bench's JSON is literally the last stdout line.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, which the unused-key
// lint can't see
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
  // 24g default (box has 128g): at 8g a local[32] sf0.1 Bench pass spends
  // enough time in old-gen GC that pass totals swing ~2x run-to-run
  // (probed round 8: spread 47s at 8g -> 12s at 24g, medians -22%)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
