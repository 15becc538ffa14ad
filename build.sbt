ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "rtbigdataspark"
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
// Pass the forked JVM's stdout/stderr through unmodified — the driver
// parses Bench's single JSON line from stdout and sbt's default logger
// would prefix it with "[info] ".
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
// default forked-JVM heap: the 32g bench posture on the big machine,
// derived from the ACTUAL host so a fresh checkout starts on ordinary
// hardware (an unconditional 32g -Xms would refuse to launch tests on
// any host under 32 GiB). Half the host, floored at 4g, capped at the
// 32g bench posture; SPARK_DRIVER_MEM overrides either way.
lazy val defaultHeap: String = {
  val totalGb =
    try {
      val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean]
      os.getTotalMemorySize / (1024L * 1024L * 1024L)
    } catch { case _: Throwable => 64L } // unknown host: keep old posture
  s"${math.max(4L, math.min(32L, totalGb / 2))}g"
}

javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 32g: local[32] puts driver AND all 32 executor threads in ONE JVM;
  // at 8g the unified memory pool (~4.6 GB) plus the bench's session-
  // lifetime listener/cleaner state ran the old gen full and inflated
  // later queries' in-suite times up to 7x vs cold-isolated (r14
  // verdict #1). The machine has 128 GiB; headroom is the cheap fix.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap)}",
  // -Xms == -Xmx: Bench.releaseAll's explicit full GC otherwise lets
  // G1 UNCOMMIT the freed regions (MaxHeapFreeRatio shrink), and the
  // next timed rep re-commits gigabytes of zeroed pages mid-window —
  // measured as 11.5 s vs 27 s bistable reps of the same q145 plan
  // even after the ContextCleaner storm was fully quiesced (r15).
  // A floor equal to the cap makes committed heap monotone: pages
  // fault in once per JVM, never inside a later timed window.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap)}",
  // JIT code cache: the decisive fix for the r14 in-suite bench
  // inflation (q145 90.6 s in-suite vs 13.3 s isolated). Every rep of
  // every query generates FRESH whole-stage-codegen classes (exprIds
  // differ, so the 100-entry source-keyed codegen cache can't hit),
  // and 160 queries x 3 reps overflow the 240 MB default reserved
  // code cache; the sweeper then flushes hot compiled methods and
  // random reps run partly interpreted — measured on q145: same 1535
  // tasks/107 stages but 1.6x taskCpu and 5x executorDeserializeTime,
  // bistable 9.5-80 s. At 1g the reps are stable (9.2-10.8 s after
  // JIT warm-up). Applies to tests too (same suite-length effect).
  "-XX:ReservedCodeCacheSize=1g",
) ++
  // forensic JVM flags for instrument diagnosis runs only (e.g.
  // -Xlog:deoptimization — the r18 storm hunt); empty by default
  sys.env.get("SPARK_GRAFT_EXTRA_JVMOPTS").toSeq
    .flatMap(_.split(" ").filter(_.nonEmpty))
