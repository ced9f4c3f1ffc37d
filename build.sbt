ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "az_datapipeline_sentiment_analysisspark"
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
// The multi-minute planted-truth volume tests (graft.VolumeTest tag) run
// once per round, not in every `sbt test` (round-13 verdict #2: they were
// ~6 min of a 20m16s wall). GRAFT_VOLUME=1 lifts the exclusion:
//   GRAFT_VOLUME=1 sbt "testOnly graft.VolumeTruthSpec"
Test / testOptions ++= (
  if (sys.env.contains("GRAFT_VOLUME")) Seq.empty
  else Seq(Tests.Argument(TestFrameworks.ScalaTest, "-l", "graft.VolumeTest")))
// Per-test durations in the report (-oD): the suite-wall budget work needs
// to attribute wall growth to named tests, not to timestamp-gap archaeology.
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
// Forked run's stdout passes through raw instead of being re-logged at
// info level — otherwise `sbt -error` (or any quieter log level) swallows
// the one JSON line Bench/Verify exist to print.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
