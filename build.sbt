ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "minihadoopspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++ {
  // JDK 17 G1 GCLocker starvation: executors hold JNI critical sections
  // (lz4/snappy/unsafe copies) while other tasks allocate; the default
  // retry budget (2) turns a transient lock into a spurious
  // "OutOfMemoryError: Java heap space" on tiny allocations ("allocating
  // 4 words") under 32 concurrent cache-builds. Raise the retry budget —
  // but only where the flag exists: JDK 22+ removes the GCLocker
  // entirely (JDK-8308341) and an unrecognized diagnostic flag aborts
  // JVM startup, so gate on the running JVM's major version.
  val javaMajor = scala.util.Try(
    sys.props.getOrElse("java.specification.version", "17")
      .split('.').head.toInt).getOrElse(17)
  if (javaMajor <= 21)
    Seq("-XX:+UnlockDiagnosticVMOptions",
      "-XX:GCLockerRetryAllocationCount=64")
  else Seq.empty
}
