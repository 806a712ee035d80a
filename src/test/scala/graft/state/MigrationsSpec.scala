package graft.state

import graft.SparkSpec
import graft.store.TableStore

/** A4 ledger semantics (`/root/reference/tests/test_migrations.py`):
  * skipped on a fresh store, applied once on an existing one.
  */
class MigrationsSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): TableStore =
    new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-mig").toString)

  private def addFlagMigration = Migrations.Migration(
    "add_flag_column",
    store => {
      val t = store.read("t")
      store.overwrite("t", t.withColumn("flag",
        org.apache.spark.sql.functions.lit(true)))
    })

  test("fresh store: migrations are skipped (test_migrations.py:10-14)") {
    val store = freshStore()
    val ran = Migrations.migrate(spark, store, Seq(addFlagMigration), "2026-01-01")
    assert(ran.isEmpty)
    assert(store.tableNames.isEmpty)
  }

  test("existing store: applied exactly once, ledger recorded (:17-50)") {
    val store = freshStore()
    store.overwrite("t", Seq((1L, "a")).toDF("id", "v"))
    val ran = Migrations.migrate(spark, store, Seq(addFlagMigration), "2026-01-01")
    assert(ran === Seq("add_flag_column"))
    assert(store.read("t").columns.contains("flag"))
    assert(Migrations.applied(store) === Set("add_flag_column"))

    // idempotent: second call runs nothing
    val ran2 = Migrations.migrate(spark, store, Seq(addFlagMigration), "2026-02-02")
    assert(ran2.isEmpty)
    assert(store.read("migrations").count() === 1)
  }

  test("convert_source_column golden port (test_migrations.py:23-50)") {
    val store = freshStore()
    store.overwrite("tweets", Seq(
      (1L, """<a href="URL">NAME</a>"""),
      (2L, """<a href="URL2">NAME2</a>"""),
      (3L, "d3c1d39c57fecfc09202f20ea5e2db30262029fd"))
      .toDF("id", "source"))

    val ran = Migrations.migrate(spark, store,
      ReferenceMigrations.all, "2026-01-01")
    assert(ran === Seq("convert_source_column"))

    val sources = store.read("sources").collect()
      .map(r => (r.getAs[String]("id"), r.getAs[String]("url"),
        r.getAs[String]("name"))).toSet
    assert(sources === Set(
      ("d3c1d39c57fecfc09202f20ea5e2db30262029fd", "URL", "NAME"),
      ("000e4c4db71278018fb8c322f070d051e76885b1", "URL2", "NAME2")))

    val tweets = store.read("tweets").orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("source")))
    assert(tweets.toSeq === Seq(
      (1L, "d3c1d39c57fecfc09202f20ea5e2db30262029fd"),
      (2L, "000e4c4db71278018fb8c322f070d051e76885b1"),
      (3L, "d3c1d39c57fecfc09202f20ea5e2db30262029fd")))
  }
}
