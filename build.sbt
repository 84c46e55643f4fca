ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tezspark"
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
// Bench's contract is ONE bare JSON line on stdout; sbt's default
// LoggedOutput strategy re-logs the forked JVM's stdout with an
// "[info] " prefix, which is what kept the driver's BENCH_rNN.json
// parser at parsed:null through r09 (the size-bounded summary line
// survived the 2000-char tail but arrived prefixed). StdoutOutput
// passes the forked process's stdout/stderr through verbatim.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// SpeculationClusterSpec boots a local-cluster master (real executor JVMs,
// needs SPARK_HOME and a JVM with no pre-existing SparkContext), so it runs
// in its own forked JVM; everything else shares one JVM + SparkTestSession.
Test / testGrouping := {
  val forkOpts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
    // SPARK_SCALA_VERSION: the in-process Worker launches executors via
    // WorkerCommandBuilder without sourcing load-spark-env.sh, and a
    // release dist has no launcher/target build dirs to infer it from.
    .withEnvVars(Map("SPARK_HOME" -> "/opt/spark", "SPARK_SCALA_VERSION" -> "2.13"))
  val (cluster, rest) = (Test / definedTests).value.partition(_.name.endsWith("ClusterSpec"))
  Seq(
    Tests.Group("graft", rest, Tests.SubProcess(forkOpts)),
    Tests.Group("cluster", cluster, Tests.SubProcess(forkOpts)),
  ).filter(_.tests.nonEmpty)
}
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
  // the full query suite generates thousands of whole-stage-codegen
  // classes per run; the JVM default 240m code cache fills mid-run and
  // the JIT stops compiling, flipping later queries to interpreted
  // bytecode (observed as 2-4x slowdowns late in bench passes)
  "-XX:ReservedCodeCacheSize=512m",
)
