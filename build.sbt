ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tbenchagenticdatapipelinespark"
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
  // 24g default: the host ships 125 GiB and the concurrent bench runs
  // the whole query board in one JVM — at 8g the shared heap spent
  // whole batches in GC/block-eviction churn (walls swinging 2-3× with
  // identical plans); at 24g the block manager holds every
  // checkpointed core + transient comfortably
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
// Materialization-policy switch for the forked mains (Verify/Bench):
// SPARK_GRAFT_MATERIALIZE=reliable + SPARK_GRAFT_MATERIALIZE_DIR=<dir>
// route every shared-core barrier through reliable checkpoints —
// the cluster-durability mode (see graft.Materialize).
javaOptions ++= sys.env.get("SPARK_GRAFT_MATERIALIZE")
  .map(m => s"-Dspark.graft.materialize=$m").toSeq
javaOptions ++= sys.env.get("SPARK_GRAFT_MATERIALIZE_DIR")
  .map(d => s"-Dspark.graft.materialize.dir=$d").toSeq
