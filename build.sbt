ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kafkaexercisespark"
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
// Nine rounds of harvested bench artifacts parsed null because sbt printed
// "[success] Total time: ..." AFTER the bench's final JSON line, pushing it
// off the driver's last-line parse. The success trailer carries no
// information the exit code doesn't; suppress it globally so a `runMain`'s
// last stdout line is the program's own.
Global / showSuccess := false
// ... and pass the forked program's stdout/stderr through verbatim instead
// of re-logging each line with an "[info] "/"[error] " prefix, so the JSON
// is parseable exactly as printed.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Round 16 (r15 verdict #6): the suite is the round's inner loop and ran
// ~11 min wall in ONE forked JVM (suites sequential, streaming suites
// dominating). Shard it into G forked JVMs run CONCURRENTLY:
// round-robin over the sorted suite names spreads the adjacent-named
// streaming heavyweights across groups. Safe to parallelize across
// PROCESSES because each group JVM builds its own SparkSession
// (local[4], in-memory catalog) and every persisted-table path is keyed
// by the owning JVM's applicationId (Tables.persistedTableRoot) — no
// cross-process shared state. 4 groups × local[4] × 8g heap fits the
// 32-core / 128 GiB box with room to spare. SPARK_GRAFT_TEST_GROUPS=1
// restores the single-JVM run (timing-sensitive local iteration).
Test / testGrouping := {
  val groups = sys.env.getOrElse("SPARK_GRAFT_TEST_GROUPS", "4").toInt.max(1)
  val tests = (Test / definedTests).value.sortBy(_.name)
  val opts = (Test / javaOptions).value.toVector
  tests.zipWithIndex.groupBy(_._2 % groups).toSeq.sortBy(_._1).map {
    case (i, ts) =>
      Tests.Group(s"g$i", ts.map(_._1),
        Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
  }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 4),
  Tags.limitAll(math.max(4, java.lang.Runtime.getRuntime.availableProcessors())))
