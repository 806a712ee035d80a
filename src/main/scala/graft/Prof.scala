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

    // default subjects — edit locally when attributing a different
    // query's stages (round 13: q_hybrid_rrf's legs)
    val docs = queries.Catalog.table(spark, sfDir, "documents")
    time("lex: array-stat BM25 leg")(docs
      .select(col("doc_id"), ingest.Transforms.tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        size(filter(col("toks"), t => t === "spark")).cast("double").as("tf_s"),
        size(filter(col("toks"), t => t === "vector")).cast("double").as("tf_v"))
      .filter(col("dl") > 0 && col("tf_s") > 0 && col("tf_v") > 0))
    time("lex: old tf-sum leg")(docs
      .select(col("doc_id"),
        explode(ingest.Transforms.tokens(col("text"))).as("token"))
      .filter(col("token").isin("spark", "vector"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("score"),
        countDistinct(col("token")).as("n_terms"))
      .filter(col("n_terms") === 2))
    val emb = queries.Catalog.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("norm", sqrt(aggregate(zip_with(col("e"), col("e"), _ * _),
        lit(0.0), _ + _)))
    time("sem: cosine-vs-doc0 leg")(emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(emb.filter(col("vec_id") === 0)
        .select(col("e").as("qe"), col("norm").as("qnorm"))))
      .select(col("vec_id"),
        (aggregate(zip_with(col("qe"), col("e"), _ * _), lit(0.0), _ + _) /
          (col("qnorm") * col("norm"))).as("cosine"))
      .orderBy(col("cosine").desc).limit(50))
    time("full q_hybrid_rrf")(
      queries.SimilarityOps.hybridRrf(spark, sfDir))
    spark.stop()
  }
}
