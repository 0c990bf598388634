ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "milantelecometlspark"
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
  // Shuffle/spill scratch on tmpfs: this box's block device degrades
  // pathologically under sustained small-file create/delete (observed: all
  // executor threads pinned in FileOutputStream.open0 mid-bench, 20x+
  // slowdowns); shuffles here are far smaller than RAM, so a RAM-backed
  // local dir removes the failure mode entirely.
  "-Dspark.local.dir=/dev/shm/spark-local",
  // 43 catalog queries x best-of-3 generate thousands of codegen classes;
  // the default 240m code cache drives heavy sweeper/recompile churn in
  // long benchmark JVMs (observed: tasks crawling at interpreted speed
  // with the C2 thread pegged).
  "-XX:ReservedCodeCacheSize=512m",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
