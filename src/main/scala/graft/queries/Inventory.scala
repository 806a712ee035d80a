package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator demonstration: a Spark DataFrame program and
  * (when SQL-expressible) the equivalent ANSI SQL the driver runs in
  * DuckDB over the same parquet tables. Column names and row order must
  * match exactly on both sides (driver hashes values after sorting
  * columns by name; we additionally pin row order with a total ORDER BY
  * on both sides so the comparison can never depend on partitioning).
  */
final case class Op(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Inventory {
  /** Full operator inventory, one entry per SURVEY.md §2 line that is
    * demonstrated as a query over the testdata tables. Golden-fixture
    * behaviors (byte-exact hash ids, save_tweets normalization, archive
    * import, streaming semantics) are additionally covered by ScalaTest
    * suites under src/test/scala/graft.
    */
  def all: Seq[Op] =
    RelationalOps.ops ++ StateOps.ops ++ TextOps.ops ++
      DedupOps.ops ++ SimilarityOps.ops ++ MultimodalOps.ops ++
      SamplingOps.ops ++ PipelineOps.ops ++ DmlOps.ops

  lazy val byName: Map[String, Op] = all.map(op => op.name -> op).toMap
}
