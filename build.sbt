ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "manualdataingestspark"
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
// The driver tail-parses runMain's LAST stdout line as the bench JSON.
// Two sbt behaviors break that: the default LoggedOutput strategy wraps
// every forked-process line in "[info] ", and sbt appends its own
// "[success] Total time..." trailer after main returns. Route forked run
// output straight to stdout and suppress the success banner so the JSON
// totals line IS the last stdout line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, which lintUnused can't see.
Global / excludeLintKeys += showSuccess
// Suites share ONE SparkSession (SparkSuite.getOrCreate), and two of them
// mutate session-global state the others assert on: KernelSubstitutionSpec
// removes/restores optimizer rules while PlanAuditSpec reads plan shapes,
// and PropertySpec flips shuffle-partition counts. Under sbt's default
// parallel suite execution those interleave into spurious plan-audit
// failures (seen once the 10th suite landed); suite-sequential is the
// correct model for a shared-session fixture.
Test / parallelExecution := false
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
