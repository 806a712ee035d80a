package graft.state

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.TableStore

/** A4 migrations ledger (`/root/reference/utils.py:51-66`,
  * migrations.py): named, idempotent store mutations recorded in a
  * `migrations(name, applied)` table; each runs at most once, and —
  * like the reference's open_database — nothing runs against an empty
  * store (fresh stores are created at current schema).
  */
object Migrations {

  final case class Migration(name: String, apply: TableStore => Unit)

  def applied(store: TableStore): Set[String] =
    store.readIfExists("migrations")
      .map(_.select("name").collect().map(_.getString(0)).toSet)
      .getOrElse(Set.empty)

  /** Run all unapplied migrations (skipping everything on an empty
    * store) and record them. Returns the names actually run.
    */
  def migrate(
      spark: SparkSession,
      store: TableStore,
      migrations: Seq[Migration],
      now: String): Seq[String] = {
    import spark.implicits._
    if (store.tableNames.isEmpty) return Seq.empty
    val done = applied(store)
    val toRun = migrations.filterNot(m => done.contains(m.name))
    toRun.foreach { m =>
      m.apply(store)
      store.upsert("migrations",
        Seq((m.name, now)).toDF("name", "applied"), Seq("name"))
    }
    toRun.map(_.name)
  }
}
