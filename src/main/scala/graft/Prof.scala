package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler: times labelled sub-frames of a query under
  * the same session settings Bench uses, each after a warm-up pass,
  * so per-stage costs can be attributed within ONE JVM (cross-JVM
  * comparisons drift 10-20%). Usage:
  * SPARK_GRAFT_SF_DIR=… tools/run_main.sh graft.Prof
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(mk: => DataFrame): Unit = {
      mk.count() // warm
      val t0 = System.nanoTime()
      val n = mk.count()
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
    }

    // default subjects: the CC loop on the real semantic edge set
    // (the engine's slowest query family) and the full query around
    // it — edit locally when attributing a different query's stages
    val edges = queries.SimilarityOps.semanticEdges(spark, sfDir)
      .localCheckpoint(true)
    time("cc rounds on semantic edges")(
      queries.DedupOps.connectedComponents(
        edges.select("doc_a", "doc_b")))
    time("cell-local union-find cc")(
      queries.SimilarityOps.cellComponents(edges))
    queries.SimilarityOps.lastCcPeak.foreach(p =>
      println(s"[prof] cc peak task vertices        ${p.value}"))
    time("full q_semantic_dedup")(
      queries.SimilarityOps.semanticDedup(spark, sfDir))
    spark.stop()
  }
}
