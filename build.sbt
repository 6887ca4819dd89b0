ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "taxcomplianceenginespark"
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
// The bench/verify mains print one machine-parsed JSON line; forward forked
// stdout raw (no "[info] " prefix) and drop sbt's "[success] Total time"
// trailer so that JSON line is the last thing on stdout.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is read by sbt's command engine, not another setting — keep
// the unused-key lint quiet about it
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
  // Static conf (read once at first session): the JVM-wide generated-class
  // cache holds 100 entries by default, sized for a handful of hot queries.
  // A 270-query catalog emits thousands of codegen units per sweep, so the
  // LRU guaranteed a 100% miss rate on every re-visit — pass 2 of the bench
  // re-ran Janino for EVERY query (~0.3-1.5 s each), which is why isolated
  // warm probes measured 2-3x faster than the same query inside a sweep
  // (r18 measurement: op_pagerank 0.9 s probe-warm vs 3.4 s in-sweep).
  // Sized to hold a full catalog sweep; ~50 KB/class keeps it under a few
  // hundred MB. A many-query deployment (Thrift server, scheduled DAGs)
  // wants the same.
  "-Dspark.sql.codegen.cache.maxEntries=8192",
  // 16g default (overridable): the bench session persists the shared
  // lineages plus each dedup/ANN family's session-scoped intermediates;
  // at 8g the unified pool sat near its storage ceiling by mid-sweep and
  // pass-2 revisits of the cache-heavy queries read evicted blocks back
  // from disk (r18 measurement: op_containment min-of-2 5.1 s under
  // pressure vs 2.2 s warm in an isolated probe). The box has 128 GiB;
  // a real deployment sizes the driver/executor heap to its cache
  // working set the same way.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
// Suites share one SparkSession and some mutate session conf
// (e.g. autoBroadcastJoinThreshold) — run them sequentially.
Test / parallelExecution := false
