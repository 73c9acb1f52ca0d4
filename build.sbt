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
  // NO GC-pinning flags (round-16 A/B, measured and REJECTED): the
  // -Xms=-Xmx + AlwaysPreTouch + ParallelRefProcEnabled trio (added to
  // tools/run_main.sh mid-r16 against the r15 driver run's
  // emb_power_eigvec full-GC storm — 283/915 cpu-sec vs a ~20 cpu-sec
  // floor) was ported here so it would reach the DRIVER's sbt-forked
  // JVM, then A/B'd over full 228-query runs: flags-on 243.3 s vs
  // flags-off 235.5 s, with the untouched-query cohort ~8 s slower under
  // the flags (a fixed 8 GB young gen spreads allocation over more cache
  // lines). The storm's actual source — the d²-explode decimal
  // allocation churn — is fixed in code (covariance moment kernels), so
  // the flags buy nothing and cost throughput; both run paths now agree
  // on the plain -Xmx-only JVM.
)
