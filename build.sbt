ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "flechasdbspark"
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
// Forked `run` output goes straight to this process's stdout/stderr —
// without this, sbt relogs every child line with an [info]/[error]
// prefix, which breaks line-oriented JSON scraping of Bench's output.
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
  // SIMD BLAS for MLlib (dev.ludovic.netlib VectorBLAS) needs the
  // incubator vector API; without it MLlib falls back to f2j scalar BLAS
  "--add-modules=jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 128 GiB box; 8g caused cache eviction + GC stalls in long bench
  // sessions (measured 6s -> 40s on one query late in a 33-query run)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // a 338-entry bench at 3 runs/entry compiles tens of thousands of
  // Janino whole-stage-codegen classes in one JVM; at the JDK-17
  // default 240 MB the code cache can fill LATE in the suite, the JIT
  // stops compiling (or flushes hot methods), and CPU-dense entries
  // degrade 5-10x — the signature of the r14 driver's
  // text_ngram_diversity_incr 34.6 s in-suite blowup (4-5 s solo,
  // unreproducible in short sessions). Headroom removes that cliff for
  // every entry equally; it is not a per-query tuning knob.
  "-XX:ReservedCodeCacheSize=512m",
)
