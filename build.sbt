ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "crawlerspark"
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
  // 32 executor threads + broadcast builds + checkpoint blocks for a
  // 134-query suite need headroom: 8g put the long bench run into
  // storage-eviction/GC territory (host has 128 GiB).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Each query compiles fresh whole-stage-codegen classes; the JDK
  // default 240m code cache can fill over a 134-query run, silently
  // dropping hot loops to interpreter speed.
  "-XX:ReservedCodeCacheSize=512m",
  "-XX:+UseCodeCacheFlushing",
) ++ {
  // Keep JVM temp files (Janino scratch, Utils.createTempDir) off the
  // virtio disk for the same burst-credit reason spark.local.dir
  // points at tmpfs (GraftSession.scratchDir).
  val shm = new java.io.File("/dev/shm/graft-jvm-tmp")
  if (shm.isDirectory || shm.mkdirs()) Seq(s"-Djava.io.tmpdir=${shm.getAbsolutePath}")
  else Seq.empty
}
