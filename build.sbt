ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etlarcgisspark"
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
// Forked-run output passes through VERBATIM instead of via sbt's logger:
// the logger prefixes every child line with [info]/[error], which is what
// has defeated the driver's regex over the bench metric line in every
// BENCH_r02..r19 artifact ("parsed": null). With StdoutOutput the final
// stdout line of `sbt "runMain graft.Bench"` is the bare one-line JSON.
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
  // 8g, MEASURED as the right size for the 258-query sf0.1 suite: a 30g
  // heap ran the identical suite 12% SLOWER (161.8s vs 144.1s, same host,
  // same code) — G1 lazily grows a big heap and batches garbage into long
  // mixed-GC pauses that land on whichever (often tiny) query runs next
  // (g2 0.15s → 1.65s, m10 0.12s → 0.85s under 30g), while 8g keeps
  // collections small and frequent. Raise via SPARK_DRIVER_MEM only for
  // runs whose working set genuinely outgrows it (sf2 GenScale/Verify).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // 258 codegen-heavy queries generate thousands of JIT'd methods and
  // classes; the 240m default code cache silently flushes hot code late in
  // the suite and the default metaspace trigger forces extra full GCs.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:MetaspaceSize=1g",
)
// diagnostics passthrough: extra JVM flags for the forked run without
// editing the build (e.g. SPARK_GRAFT_XJAVA="-Xlog:gc:gc.log" or
// "-XX:TieredStopAtLevel=1" for JIT-sensitivity experiments)
javaOptions ++= sys.env.get("SPARK_GRAFT_XJAVA").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
