ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "streamsprototypingspark"
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
// Forked run output passes through UNWRAPPED: by default sbt pipes the
// child's stdout through its logger, prefixing every line with
// "[info] " — which breaks machine parsing of Bench's single-line JSON
// summary (the driver's BENCH_rN.json extraction saw "[info] {...}"
// and recorded parsed: null two rounds running). StdoutOutput inherits
// the parent streams, so the totals line lands bare.
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
// Spark still writes block-manager temp files and Janino scratch to
// java.io.tmpdir even with spark.local.dir on tmpfs; /tmp sits on the
// same virtual disk whose writeback storms stalled earlier bench runs.
// Point the whole JVM temp dir at tmpfs when available.
val tmpfsTmpDir: Seq[String] = {
  val shm = new java.io.File("/dev/shm")
  if (shm.isDirectory && shm.canWrite) {
    val d = new java.io.File(shm, "graft-jvm-tmp")
    d.mkdirs()
    Seq(s"-Djava.io.tmpdir=${d.getAbsolutePath}")
  } else Seq.empty
}
javaOptions ++= jdk17AddOpens ++ tmpfsTmpDir ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // ~100 codegen-heavy query executions per Bench/Verify JVM overflow
  // the default 240 MB reserved code cache; once full the JIT disables
  // itself and everything drops to interpreted speed (measured: 10-20x
  // slowdowns on the second bench pass). Spark's own launcher scripts
  // raise this for the same reason.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
)
