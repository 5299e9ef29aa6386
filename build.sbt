ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "metalpipespark"
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
// Pass the forked JVM's stdout through verbatim (no "[info] " prefix):
// Bench prints one machine-readable JSON line that the harness parses,
// and sbt's default logger decoration breaks a per-line json parse.
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
  // this container has NO locale (LANG unset), so JDK 17 defaults
  // file.encoding to US-ASCII — and Spark's variant JSON parser then
  // CORRUPTS non-BMP characters (a 2-code-point astral string reads
  // back as 5 mangled chars; found by JsonSchemaPropertySpec's
  // independent-reference cross-check, r13). Force UTF-8 like any
  // production Spark deployment's locale does; spark-submit runs need
  // the same via spark.{driver,executor}.extraJavaOptions
  // (plans/CLUSTER.md).
  "-Dfile.encoding=UTF-8",
  "-Dsun.jnu.encoding=UTF-8",
  // 24g default: local[32] runs 32 concurrent tasks in ONE JVM; at 8g the
  // sf0.1 bench spends more time in GC than in queries (62s vs 40s total).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // 140 query executions per bench JVM each emit whole-stage-codegen
  // classes; at the default 240m the JIT code cache fills mid-run and
  // compilation stops — late queries then run interpreted (observed:
  // trivial queries 10-20x slower toward the end of the alphabet).
  "-XX:ReservedCodeCacheSize=1g",
)
