ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "simplemapreducesearchengineinformationretrievalspark"
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
// No trailing "[success] Total time ..." line after runMain: the
// bench driver parses the LAST line of this process's output as
// JSON, and sbt's success banner was shadowing graft.Bench's summary
// line every round (exit codes are unaffected).
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
  // local[32] Spark with cached/persisted intermediates needs real
  // heap — 8g GC-thrashed the 55-query bench run (q24_dedup_jaccard
  // 32s vs 7s in a fresh JVM); the box has 125 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // 55 queries × whole-stage codegen ≈ hundreds of Janino classes; the
  // 240m default code cache fills mid-run and C2 stops compiling —
  // CPU-bound queries then run 2-5× slower late in the bench sequence.
  "-XX:ReservedCodeCacheSize=1g",
)
