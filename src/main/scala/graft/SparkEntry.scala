package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Inventory

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator inventory itself lives in graft.queries.Inventory (one
  * Op per SURVEY.md §2 line, each with its DuckDB oracle SQL).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the J4 semi-join + facet shape (README.md:212 of the reference).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_semi_facet")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Inventory.all.map(op => op.name -> op.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Inventory.all.flatMap(op => op.oracle.map(op.name -> _)).toMap
}
