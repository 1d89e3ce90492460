ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "emdatapipelinesspark"
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
// Emit forked-run stdout bare (no sbt "[info] " prefix): the bench/verify
// mains print machine-read JSON lines, and downstream parsers should get
// them verbatim. tools/*.sh strip the prefix defensively either way.
run / outputStrategy := Some(StdoutOutput)
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
  // local[32] puts every executor thread's shuffle/broadcast buffers in
  // this one JVM; 8g was enough for the sf0.1 board but the sf1 (10x) legs
  // showed 2.5-5x GC inflation on the shuffle-heavy dedup family in
  // full-board runs (isolated runs were clean) — the 128 GiB machine has
  // ample headroom.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // Long-running sessions compile thousands of whole-stage-codegen classes;
  // the 240m default code cache silently flushes hot compiled methods under
  // that pressure (UseCodeCacheFlushing), nondeterministically degrading
  // interpretation-heavy paths 50-100×. 512m sufficed at 73 board queries;
  // at 147 queries × 2 passes the round-4 official run showed the same 3-5×
  // inflation again (22.2 s vs 4.0 s isolated for the same query), so keep
  // headroom well ahead of board growth.
  "-XX:ReservedCodeCacheSize=1g",
)
