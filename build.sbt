ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hbasesupportspark"
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
// Keep sbt's "[success] Total time" epilogue off stdout: the bench driver
// parses the last line of `sbt runMain graft.Bench` output as JSON, and the
// epilogue line after the metric line broke that parse in round 1.
ThisBuild / showSuccess := false
// Forked run stdout goes raw to stdout (no "[info] " prefix) so the Bench
// metric line is parseable exactly as printed.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++
  // Gate scripts (tools/sf10_gate.sh) point each chunk JVM's shuffle/block
  // scratch at a private dir so the between-chunk sweep can't touch any
  // other process's /tmp state (ADVICE r19).
  sys.env.get("SPARK_GRAFT_LOCAL_DIR").map(d => s"-Dspark.local.dir=$d").toSeq
