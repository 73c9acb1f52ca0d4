ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kafkastreamsprojectspark"
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
// machine-sourced spec count (round-15): every full `sbt test` run writes
// test-summary.json via the custom reporter; update_docs.py reads it
Test / testOptions +=
  Tests.Argument(TestFrameworks.ScalaTest, "-C", "graft.TestCountReporter")
// pass the forked JVM's stdout through UNWRAPPED instead of logging each
// line as [info]: the driver scrapes Bench's one-line JSON from stdout and
// its parser found nothing (parsed:null) while every line wore a prefix
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and drop sbt's own "[success] Total time" epilogue, which otherwise
// lands AFTER the JSON line and defeats a last-line stdout parse
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Variance pinning (round 16): the SAME three flags tools/run_main.sh
  // gained in the r16 variance work — they were useless there alone,
  // because the DRIVER benches via `sbt "runMain graft.Bench"`, i.e. THIS
  // forked JVM. -Xms=-Xmx removes G1 heap-resize churn across ~680 query
  // executions per bench run (the r15 driver run's emb_power_eigvec
  // samples — 283 then 915 cpu-sec against a ~20 cpu-sec committed floor
  // with ext-busy ~0 — are a full-GC storm signature, not load);
  // AlwaysPreTouch pays the page-fault cost once at JVM start, outside
  // any timed pass; parallel ref processing drains Spark's weak-ref load
  // without long remark pauses. None move the floor; all shrink spread.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+AlwaysPreTouch",
  "-XX:+ParallelRefProcEnabled",
)
