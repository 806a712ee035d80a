package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal-column operators surfaced as verifiable queries. The
  * binary payloads are derived deterministically from documents.text
  * (no real media in testdata), so the oracle can reproduce the
  * byte-level facts (lengths, digests) while the decode stub's typed
  * outputs are covered by MultimodalSpec.
  */
object MultimodalOps {

  // q_multimodal_meta — binary column hygiene scan: payload size and
  // content digest per doc; a pure columnar pass over binary data.
  def multimodalMeta(spark: SparkSession, sfDir: String): DataFrame =
    Multimodal.binariesFromDocuments(Catalog.table(spark, sfDir, "documents"))
      .select(
        col("doc_id"),
        length(col("content")).as("n_bytes"),
        md5(col("content")).as("content_md5"))
      .orderBy(col("doc_id"))

  val multimodalMetaSql: String =
    """SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS content_md5
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // q_multimodal_kinds — the decode path's aggregate shape: kind
  // distribution + mean payload size. The decode stub derives kind
  // from the first CODE POINT % 3 (exactly what the oracle's
  // ascii(substr(text,1,1)) returns, ASCII or not) — so the full
  // mapPartitions path is oracle-checked end to end.
  def multimodalKinds(spark: SparkSession, sfDir: String): DataFrame = {
    val meta = Multimodal.decodeMeta(
      Multimodal.binariesFromDocuments(Catalog.table(spark, sfDir, "documents")))
    meta.toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("nBytes")).as("total_bytes"))
      .orderBy(col("kind"))
  }

  val multimodalKindsSql: String =
    """SELECT CASE ascii(substr(text, 1, 1)) % 3
      |         WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |  COUNT(*) AS n, CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
      |FROM documents
      |GROUP BY 1
      |ORDER BY kind""".stripMargin

  def ops: Seq[Op] = Seq(
    Op("q_multimodal_meta", multimodalMeta, Some(multimodalMetaSql)),
    Op("q_multimodal_kinds", multimodalKinds, Some(multimodalKindsSql)))
}
