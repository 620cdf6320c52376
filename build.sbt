ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "stripesyncenginespark"
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
)
// local[32] = 32 executor threads in ONE JVM: size the heap for the
// whole "cluster" (the box has 128 GiB; 8g meant GC thrash and 5-20x
// run-to-run variance on broadcast/window-heavy queries). Xms=Xmx +
// AlwaysPreTouch faults every heap page in at JVM start: in a microVM,
// first-touch page zeroing is expensive system time, and letting the
// heap grow lazily injected multi-second stalls into whatever query
// happened to be running when the heap expanded. Scoped to `run` (the
// Bench/Verify mains); test JVMs use small local sessions and would just
// pay minutes of pretouch at startup.
run / javaOptions ++= Seq(
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  "-XX:+AlwaysPreTouch",
)
Test / javaOptions ++= Seq("-Xmx8g")
// Forked run output goes straight to stdout, NOT through sbt's logger:
// the logger prefixes every line with "[info] ", which breaks any
// consumer that greps for Bench's bare one-line JSON contract
// (BENCH_r01.json recorded "parsed": null for exactly this reason).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
