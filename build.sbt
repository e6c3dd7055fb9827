ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "billingetlv1spark"
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
// The driver parses the LAST stdout line of `runMain graft.Bench` as the
// bench summary; sbt's default forked-output strategy prefixes every line
// with `[info] ` and appends a `[success]` trailer, which has broken that
// parse every round (`"parsed": null`). StdoutOutput passes the forked
// JVM's stdout/stderr through verbatim; showSuccess drops the trailer.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // G1's default of 2 GCLocker retries makes large broadcast-build
  // allocations fail spuriously under heap pressure ("Retried waiting
  // for GCLocker too often") — observed once in the 4 GiB scale gate.
  // Raising the retry count is the standard JDK-17 mitigation; a real
  // OOM still fails after the retries.
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=64",
)
// Ladder-investigation experiment knob (docs/LADDER_INVESTIGATION.md):
// SPARK_GRAFT_PRETOUCH=1 pins the heap at Xmx and pre-faults it, removing
// G1 commit/uncommit churn (the System.gc() between gate measurements
// shrinks an Xms-less heap, so each query re-commits GBs — the candidate
// mechanism for the late-sequence kernel-time tax).
javaOptions ++= (if (sys.env.get("SPARK_GRAFT_PRETOUCH").contains("1"))
  Seq(s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
    "-XX:+AlwaysPreTouch")
else Nil)

// One-command round ritual (round-7 verdict #7): tests → correctness dump →
// ratcheted ×10 scale gate → bench → doc regeneration, in order, failing
// fast (sbt command sequences stop at the first failing command).
addCommandAlias("gates",
  ";test" +
  ";runMain graft.Verify /root/testdata/sf0.01 target/verify_out" +
  ";runMain graft.ScaleSmoke" +
  ";runMain graft.Bench" +
  ";runMain graft.CatalogDoc")
