ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "twittertosqlitespark"
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
// The suite is ~35 CPU-minutes of mostly single-threaded Spark-local
// work; one sequential forked JVM wall-clocks far past the driver's
// verification budget (r16's `sbt test` was cut mid-suite ⇒
// tests_ok:false with zero failing assertions). Partition the suites
// into forked GROUPS that run CONCURRENTLY: each group is its own JVM
// with its own SparkSession, so nothing mutable (session conf, temp
// views, catalog roots, registered functions) is ever shared between
// concurrently-running suites, and within a group suites run
// sequentially exactly as before. Groups are balanced by measured
// suite wall-clock (LPT bin-packing; 2026-08-18 -oD profile, rounded
// seconds — an unknown/new suite defaults to 10 s, and drift only
// unbalances groups, never breaks them).
val testGroupCount = 10
val measuredSuiteSeconds: Map[String, Double] = Map(
  "GraftCatalogSpec" -> 196, "StreamingSpec" -> 134,
  "IndexMaintainSpec" -> 118, "FtsSpec" -> 93, "DoctorSpec" -> 92,
  "CliSpec" -> 81, "EpochLogSourceSpec" -> 78, "FtsDeleteSpec" -> 72,
  "SourcesSpec" -> 71, "StreamVectorsSpec" -> 55,
  "EpochPropertySpec" -> 53, "EpochCommitSpec" -> 51,
  "TestdataContractSpec" -> 48, "AnnRecallSpec" -> 47, "LshSpec" -> 39,
  "GraftDmlSpec" -> 37, "EpochPropertyS3Spec" -> 36,
  "ScaleShapeSpec" -> 35, "CodegenFallbackSpec" -> 32,
  "IvfPqSpec" -> 31, "BucketedUpsertSpec" -> 31, "IvfSpec" -> 28,
  "TrigramSpec" -> 28, "IvfDriftSpec" -> 27, "StreamQuantilesSpec" -> 26,
  "ChangeFeedSpec" -> 24, "ChangeFeedS3Spec" -> 24, "IvfSqSpec" -> 24,
  "EpochStreamSpec" -> 24, "FtsColsSpec" -> 23, "SnapshotOccSpec" -> 21,
  "ZOrderSpec" -> 20, "SnapshotOccS3Spec" -> 18, "IvfBinSpec" -> 15,
  "GraftDmlPropertySpec" -> 14, "HybridSpec" -> 13, "ArchiveSpec" -> 13,
  "PairExpansionSpec" -> 12, "PlanShapeSpec" -> 12,
  "EpochFollowerSpec" -> 11, "SaveTweetsSpec" -> 11,
  "SemanticSplitSpec" -> 11, "ConnectedComponentsSpec" -> 10,
  "MultiConsumerSpec" -> 10, "EmptyBatchSpec" -> 10, "PqSpec" -> 10,
  "StreamNearDupSpec" -> 9, "CompactionSpec" -> 9, "BinSpec" -> 8,
  "SqSpec" -> 8, "StreamTokenBudgetSpec" -> 8, "StreamCdcDedupSpec" -> 8,
  "StreamTrigramSpec" -> 7, "StreamHeavyHittersSpec" -> 7,
  "UpsertPropertySpec" -> 7, "StreamDecontaminateSpec" -> 6,
  "StreamCentroidSpec" -> 6, "FingerprintSpec" -> 6, "FtsMarkSpec" -> 5,
  "StreamLshSpec" -> 5, "ListsSpec" -> 4, "StreamBinDupSpec" -> 4,
  "WatermarksSpec" -> 4, "StreamAsofSpec" -> 4, "StatsEstimateSpec" -> 4,
  "BpeSpec" -> 3, "BloomSkipSpec" -> 3, "QualityClassifierSpec" -> 2,
  "BucketingSpec" -> 2, "PartitionPruningSpec" -> 2,
)
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / forkOptions).value
  def weight(n: String): Double =
    measuredSuiteSeconds.getOrElse(n.split('.').last, 10.0)
  val bins = Vector.fill(testGroupCount)(
    collection.mutable.ArrayBuffer.empty[TestDefinition])
  val load = Array.fill(testGroupCount)(0.0)
  tests.sortBy(t => (-weight(t.name), t.name)).foreach { t =>
    val i = load.zipWithIndex.minBy(_._1)._2
    bins(i) += t
    load(i) += weight(t.name)
  }
  bins.zipWithIndex.filter(_._1.nonEmpty).map { case (b, i) =>
    Tests.Group(s"g$i", b.toVector, Tests.SubProcess(opts))
  }
}
// sbt caps concurrent forked test groups at 1 by default — lift it to
// the group count (the box has 32 cores; each group's session is
// local[4])
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testGroupCount))
// Each forked test JVM believes it owns every host core, so its GC /
// JIT / common pools each spawn ~host-width threads — measured 12
// concurrent groups at 151 min user + 72 min sys for a 51-min-user
// workload. Cap what each TEST JVM sees (the session is local[4]);
// run/Bench keeps the full host width.
Test / javaOptions += "-XX:ActiveProcessorCount=6"
// Forked run output must reach stdout UNWRAPPED (no sbt "[info] "
// prefix): the bench driver parses the JSON line graft.Bench prints,
// and the logger prefix made BENCH_r01.json unparseable.
outputStrategy := Some(OutputStrategy.StdoutOutput)
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
