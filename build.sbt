ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bigdata_jobmatchingspark"
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
// Heap sizing: honor SPARK_DRIVER_MEM but CAP it at 32g. Measured at
// the harness's 89g offer (full 100-query suite, idle 128g/32-core
// box, four complete runs): every G1 strategy at a ~90g Xmx is
// mode-unstable — default shrink-after-full-GC makes heavy queries
// re-grow the heap through incremental expansion each iteration
// (q53 14-38s vs ~5s at any fixed heap), Xms=Xmx+AlwaysPreTouch
// starves the OS page cache and slows checkpoint-heavy streaming 6x
// (q97 2.5s isolated -> 15.8s in-suite), and no-shrink at 89g moved
// the instability to other queries (q38 8->18s, q60 2->12s across
// iterations). A 24g+ heap is the measured linear-growth zone
// (SCALE.md round-5 heap probe); 32g gives 4x headroom over the 8g
// spill edge while keeping the GC surface small and ~90g of page
// cache for parquet/scratch/checkpoint I/O. MaxHeapFreeRatio=100
// additionally pins the committed heap at its high-water mark so the
// bench's between-query System.gc() (GC-driven ContextCleaner) can't
// trigger the shrink/re-grow cycle at this size either. A real
// cluster deployment sizes executor heaps in exactly this 16-64g
// band for the same GC reasons.
val graftHeap: String = {
  val m = "([0-9]+)([gGmM])".r
  sys.env.getOrElse("SPARK_DRIVER_MEM", "8g") match {
    case m(n, u) if u.toLowerCase == "g" && n.toLong > 32L => "32g"
    // Megabyte-denominated offers (e.g. 89000m) must hit the same cap,
    // or they reintroduce the ~90g G1 mode-instability documented above.
    case m(n, u) if u.toLowerCase == "m" && n.toLong > 32768L => "32g"
    case other => other
  }
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$graftHeap",
  "-XX:MaxHeapFreeRatio=100",
  // A 100-query suite (plus its sf0.001 warmup pass) generates
  // several hundred whole-stage-codegen classes; the JDK17 default
  // 240m code cache is the documented Spark squeeze point for
  // codegen-heavy sessions (flushing/deopt churn once full), so give
  // it headroom. Measured cost-free at suite level; note it does NOT
  // explain the roaming late-suite first-iteration noise — see
  // SCALE.md's round-6 residual-noise paragraph.
  "-XX:ReservedCodeCacheSize=512m",
)
// Opt-in forensic JVM flags (e.g. SPARK_GRAFT_JAVA_OPTS="-Xlog:gc*" for
// the round-14 own-JVM heap-episode hunt) — appended last so a probe
// can also override a default above; empty and cost-free by default.
javaOptions ++= sys.env.get("SPARK_GRAFT_JAVA_OPTS")
  .toSeq.flatMap(_.split("\\s+")).filter(_.nonEmpty)
