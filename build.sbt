ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "distributedgraphcoloringwithpysparkspark"
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
// Forked run output goes straight to this process's stdout/stderr instead
// of through sbt's logger — the logger prefixes every stdout line with
// "[info] ", which breaks any consumer expecting a bare line (the bench
// harness parses graft.Bench's single JSON metric line from stdout).
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
  // 16g default: local[32] runs 32 concurrent tasks in ONE JVM — at the
  // 30x stress corpus the billion-row join/agg stages need more than the
  // old 8g (250 MB/task) to stay out of memory pressure. Max heap is
  // reserved lazily, so small runs don't pay for it.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
// Dev hook: GRAFT_JAVA_OPTS appends extra JVM flags to forked runs —
// e.g. -Dspark.eventLog.enabled=true for per-stage profiling of a bench
// query without touching the harness (the bench's own conf still wins
// where it sets a key explicitly).
javaOptions ++= sys.env.get("GRAFT_JAVA_OPTS").toSeq
  .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
