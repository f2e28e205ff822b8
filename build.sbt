ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "umaetliisloaderspark"
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
// The container locale is POSIX/C → the JVM's filename charset
// (sun.jnu.encoding, captured natively at startup — a -D flag is NOT
// honored) is ASCII and refuses to CREATE non-ASCII paths (hive
// partition dirs like p=café). ext4 stores raw bytes; forcing the
// forked JVM's locale to the one UTF-8 locale the image ships fixes
// the JVM-side charset.
Test / envVars ++= Map("LC_ALL" -> "C.utf8", "LANG" -> "C.utf8")
run / envVars ++= Map("LC_ALL" -> "C.utf8", "LANG" -> "C.utf8")
// Pass the forked main's stdout through RAW (no "[info] " logger
// prefix): Bench prints machine-parseable JSON lines that downstream
// tooling reads from the process tail, and the sbt log decoration is
// what kept them unparseable.
run / outputStrategy := Some(StdoutOutput)
// The container locale is POSIX/C — without this scalac decodes UTF-8
// sources with the platform charset and Cyrillic literals become mojibake.
scalacOptions ++= Seq("-deprecation", "-encoding", "utf8")
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
  "-Dfile.encoding=UTF-8",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
