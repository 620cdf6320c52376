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
// whole "cluster" (the box has 128 GiB; a lazily-grown 8g heap meant GC
// thrash and 5-20x run-to-run variance on broadcast/window-heavy
// queries). Xms=Xmx pins the heap size so GC never resizes it.
// -XX:+AlwaysPreTouch is deliberately ABSENT: this microVM faults pages
// at ~35 s/GiB, so pretouching 12 GiB cost ~7 minutes of JVM startup
// (measured fork→SparkContext 15:23:30→15:30:42) — the round-2 bench
// timeout (BENCH_r02.json rc=124) was exactly this. graft.Bench instead
// prefaults a bounded slice of heap in parallel with a hard time cap,
// and reports min-over-passes so residual first-touch stalls land in at
// most one pass. 6g is ample: the sf0.1 inventory peaks well under 4g.
run / javaOptions ++= Seq(
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "6g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "6g")}",
)
Test / javaOptions ++= Seq("-Xmx8g")
// Forked run output goes straight to stdout, NOT through sbt's logger:
// the logger prefixes every line with "[info] ", which breaks any
// consumer that greps for Bench's bare one-line JSON contract
// (BENCH_r01.json recorded "parsed": null for exactly this reason).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
