ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ltssspark"
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
// Forked run output goes straight to stdout — no "[info]" logger prefix,
// so line-oriented parsers (the bench JSON line) read it clean.
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
// Heap: SPARK_DRIVER_MEM wins; otherwise a quarter of physical RAM
// capped at 24g. local[32] + the persisted shared frames (band/signature
// caches) need old-gen headroom — at 8g the tail of an 81-query bench
// run sat in GC (window_running, the last query, read 3.1 s vs 0.1 s
// fresh) and the 128 GiB bench host sizes to the 24g cap — but a FIXED
// 24g default would swap or OOM-kill smaller dev/CI hosts, so size to
// the machine instead of baking in the bench host.
val driverMem = sys.env.get("SPARK_DRIVER_MEM").getOrElse {
  val memTotalKb =
    try scala.io.Source.fromFile("/proc/meminfo").getLines()
      .collectFirst { case l if l.startsWith("MemTotal:") => l.split("\\s+")(1).toLong }
      .getOrElse(32L * 1024 * 1024)
    catch { case _: Throwable => 32L * 1024 * 1024 } // non-Linux: assume 32 GiB
  s"${math.max(2L, math.min(24L, memTotalKb / 4 / 1024 / 1024))}g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverMem",
)
