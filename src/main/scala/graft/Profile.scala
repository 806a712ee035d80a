package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ingest.Transforms
import graft.queries.Catalog

/** Scratch profiling main for stage-level timing of expression-heavy
  * pipelines. Usage: tools/run_main.sh graft.Profile
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }

    val docs = Catalog.table(spark, sfDir, "documents")
    // warm
    docs.count(); docs.count()

    time("tokenize")(docs
      .select(col("doc_id"), Transforms.tokens(col("text")).as("toks"))
      .select(max(size(col("toks")))).count())

    time("tokenize+shingle")(docs
      .select(col("doc_id"), Transforms.tokens(col("text")).as("toks"))
      .select(col("doc_id"), Transforms.shingles(col("toks"), 3).as("sh"))
      .select(max(size(col("sh")))).count())

    time("tok+shingle+distinct")(docs
      .select(col("doc_id"), Transforms.tokens(col("text")).as("toks"))
      .select(col("doc_id"), Transforms.shingles(col("toks"), 3).as("shRaw"))
      .select(col("doc_id"), array_distinct(col("shRaw")).as("sh"))
      .select(max(size(col("sh")))).count())

    time("...+md5")(docs
      .select(col("doc_id"), Transforms.tokens(col("text")).as("toks"))
      .select(col("doc_id"), Transforms.shingles(col("toks"), 3).as("shRaw"))
      .select(col("doc_id"), array_distinct(col("shRaw")).as("sh"))
      .select(col("doc_id"), transform(col("sh"), s => md5(s)).as("hs"))
      .select(max(size(col("hs")))).count())

    time("...+4 minhash slices")(docs
      .select(col("doc_id"), Transforms.tokens(col("text")).as("toks"))
      .select(col("doc_id"), Transforms.shingles(col("toks"), 3).as("shRaw"))
      .select(col("doc_id"), array_distinct(col("shRaw")).as("sh"))
      .select(col("doc_id"), transform(col("sh"), s => md5(s)).as("hs"))
      .select(col("doc_id"),
        array_min(transform(col("hs"), h => substring(h, 1, 8))).as("h0"),
        array_min(transform(col("hs"), h => substring(h, 9, 8))).as("h1"),
        array_min(transform(col("hs"), h => substring(h, 17, 8))).as("h2"),
        array_min(transform(col("hs"), h => substring(h, 25, 8))).as("h3"))
      .select(count(col("h0"))).count())

    time("minhashBands cold")(
      graft.queries.DedupOps.minhashBands(spark, sfDir).count())
    time("minhashBands warm")(
      graft.queries.DedupOps.minhashBands(spark, sfDir).count())
    time("minhashBands warm2")(
      graft.queries.DedupOps.minhashBands(spark, sfDir).count())
    time("nearDupPairs warm")(
      graft.queries.DedupOps.nearDupPairs(spark, sfDir).count())

    val plan = graft.queries.DedupOps.minhashBands(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    println(s"[profile] plan: split occurrences = ${"split".r.findAllIn(plan).size}, " +
      s"md5 occurrences = ${"md5".r.findAllIn(plan).size}, " +
      s"transform occurrences = ${"transform".r.findAllIn(plan).size}")

    spark.stop()
  }
}
