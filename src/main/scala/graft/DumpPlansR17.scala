package graft

import java.io.{File, PrintWriter}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// temporary r17 plan-artifact generator — delete before the final commit.
// Writes plans/r17/*_{before,after}.txt. "Before" shapes are the r16 SQL
// text / expression shapes reproduced verbatim (git 929cf6b) so both
// sides explain under the identical session.
object DumpPlansR17 {
  private def dump(path: String, df: DataFrame): Unit = {
    val w = new PrintWriter(new File(path))
    try w.println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    finally w.close()
  }

  // r16 perRowPostings + indexRows, verbatim
  private def oldPerRowPostings(toks: Column): Column =
    transform(array_distinct(toks), t =>
      struct(t.as("token"),
        filter(sequence(lit(0), size(toks) - 1),
          i => toks.getItem(i) === t).as("positions")))

  private def oldIndexRows(batch: DataFrame, pkCol: String, textCol: String): DataFrame =
    batch
      .select(col(pkCol).as("pk"), graft.ingest.Transforms.tokens(col(textCol)).as("toks"))
      .select(col("pk"), size(col("toks")).cast("long").as("dl"),
        explode(oldPerRowPostings(col("toks"))).as("e"))
      .select(col("pk"), col("e.token").as("token"),
        size(col("e.positions")).cast("long").as("tf"), col("dl"),
        col("e.positions").as("positions"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions",
        classOf[graft.functions.GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new File("plans/r17").mkdirs()

    graft.queries.Catalog.table(spark, sfDir, "orders")
      .createOrReplaceTempView("dml_orders_src")

    // q_merge_upsert MERGE source: the r16 UNION-ALL double aggregation
    dump("plans/r17/q_merge_upsert_source_before.txt", spark.sql(
      """SELECT o_custkey AS k, COUNT(*) AS n
        |FROM dml_orders_src GROUP BY o_custkey
        |UNION ALL
        |SELECT o_custkey + 1000000000, COUNT(*)
        |FROM dml_orders_src GROUP BY o_custkey""".stripMargin))
    // ... vs the r17 single-aggregation + 2-row offset fan-out
    dump("plans/r17/q_merge_upsert_source_after.txt", spark.sql(
      """SELECT o_custkey + offs AS k, n
        |FROM (
        |  SELECT o_custkey, COUNT(*) AS n
        |  FROM dml_orders_src GROUP BY o_custkey
        |)
        |CROSS JOIN (VALUES (CAST(0 AS BIGINT)),
        |                   (CAST(1000000000 AS BIGINT))) AS offsets(offs)""".stripMargin))

    // FTS postings derivation over the documents corpus
    val docs = graft.queries.Catalog.table(spark, sfDir, "documents")
    dump("plans/r17/fts_postings_derivation_before.txt",
      oldIndexRows(docs, "doc_id", "text"))
    dump("plans/r17/fts_postings_derivation_after.txt",
      graft.store.Fts.indexRows(docs, "doc_id", "text"))

    spark.stop()
  }
}
