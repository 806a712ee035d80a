package graft.sources

import org.apache.spark.sql.SparkSession

/** S15 resolve_identifiers (`/root/reference/utils.py:514-531`): the
  * `--sql` / `--attach` input source — arbitrary SQL whose first
  * column feeds the scan, unioned with explicit CLI identifiers.
  * ATTACH alias:path maps to registering a parquet directory (or any
  * Spark-readable path) as a temp view on the session catalog.
  */
object Identifiers {

  /** attach entries: "alias:path" or bare "path" (alias = file stem,
    * matching the reference's split logic).
    */
  def attach(spark: SparkSession, entries: Seq[String]): Unit =
    entries.foreach { e =>
      val (alias, path) = e.split(":", 2) match {
        case Array(a, p) => (a, p)
        case Array(p) =>
          (p.split("/").last.split("\\.").head, p)
      }
      spark.read.parquet(path).createOrReplaceTempView(alias)
    }

  def resolve(
      spark: SparkSession,
      identifiers: Seq[String],
      attachEntries: Seq[String] = Seq.empty,
      sql: Option[String] = None): Seq[String] = {
    val fromSql = sql match {
      case Some(s) =>
        attach(spark, attachEntries)
        spark.sql(s).collect().map(r => String.valueOf(r.get(0))).toSeq
      case None => Seq.empty
    }
    identifiers ++ fromSql
  }
}
