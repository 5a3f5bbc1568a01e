ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "yaetlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// Live PostgreSQL-dialect (ON CONFLICT) upsert coverage: DuckDB's JDBC
// driver already sits in the pre-warmed local coursier cache, and
// DuckDB executes that dialect. Test-only, UNMANAGED (no new resolvable
// dependency is declared), and optional — JdbcIntegrationSpec cancels
// its dialect case when the jar is absent.
Test / unmanagedJars ++= {
  val cache = file(sys.props.getOrElse("user.home", "/root")) / ".cache" / "coursier"
  (if (cache.exists) (cache ** "duckdb_jdbc-*.jar").get else Seq.empty)
    .take(1).map(Attributed.blank(_))
}
Test / fork := true
run / fork := true
// The driver parses the LAST bare-JSON stdout line of `sbt runMain
// graft.Bench`. A forked run's output goes through sbt's logger by
// default, which prefixes every line with `[info] ` — four rounds of
// BENCH_r{06..09}.json landed `parsed: null` because of it. Route the
// forked JVM's stdout/stderr straight through, and drop the trailing
// `[success] Total time …` decoration so the JSON line stays last.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
showSuccess := false
Global / excludeLintKeys += showSuccess // consumed by the command engine, not a task
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
