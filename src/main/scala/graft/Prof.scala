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

    val docs = queries.Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"), lower(col("text")).as("t"))
    val needle = "sort table window"
    val nGrams = needle.sliding(3).toSeq.distinct
    import spark.implicits._
    val grams = docs.filter(length(col("t")) >= 3)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), length(col("t")) - 2),
          i => col("t").substr(i, lit(3))))).as("g"))
    time("docs scan")(docs)
    time("grams explode")(grams)
    time("grams join+agg") {
      grams.join(broadcast(nGrams.toDF("g")), Seq("g"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("hits"))
        .filter(col("hits") === nGrams.length)
    }
    time("full query")(queries.TextOps.substringSearch(spark, sfDir))
    spark.stop()
  }
}
