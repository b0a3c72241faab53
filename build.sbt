ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "daskgrblasspark"
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
// Pass the forked run's stdout through verbatim: the default strategy
// logs it line-by-line with an "[info] " prefix, which breaks any
// machine parser reading Bench's one-line JSON metric off stdout.
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
  // Bench runs ~70 sequential SparkContexts in one JVM; at 8g the heap
  // debris of earlier contexts throttles later queries (round-3 bench
  // showed up to 4x inflation vs isolated reruns). The container has
  // 128 GiB; give the forked run room so GC pressure never taints timing.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
) ++
  // diagnostics: SPARK_GRAFT_GCLOG=/path enables a unified GC log for
  // the forked run (used to attribute bench variance to GC cadence)
  sys.env.get("SPARK_GRAFT_GCLOG").toSeq.map(p => s"-Xlog:gc*:file=$p") ++
  sys.env.get("SPARK_GRAFT_JAVAOPTS").toSeq.flatMap(_.split("\\s+").toSeq)
