package graft.store

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Upsert semantics (SURVEY.md §2.5): replace = last-writer-wins,
  * ignore = first-writer-wins, schema evolution via deep unionByName,
  * idempotence under replay (redelivery safety, §2.7).
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("replace: incoming beats existing, later ord beats earlier") {
    val existing = Seq((1L, "old"), (2L, "keep")).toDF("id", "v")
    val incoming = Seq((1L, "mid", 0L), (1L, "new", 1L), (3L, "add", 2L))
      .toDF("id", "v", Upsert.OrdCol)
    val out = Upsert.upsert(Some(existing), incoming, Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((1L, "new"), (2L, "keep"), (3L, "add")))
  }

  test("insert-ignore: existing wins, first in batch wins (following first_seen)") {
    val existing = Seq((1L, 2L, "2020-01-01")).toDF("followed_id", "follower_id", "first_seen")
    val incoming = Seq(
      (1L, 2L, "2021-05-05", 0L),
      (1L, 3L, "2021-05-05", 1L),
      (1L, 3L, "2021-06-06", 2L))
      .toDF("followed_id", "follower_id", "first_seen", Upsert.OrdCol)
    val out = Upsert.insertIgnore(Some(existing), incoming, Seq("followed_id", "follower_id"))
      .orderBy("followed_id", "follower_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq === Seq((1L, 2L, "2020-01-01"), (1L, 3L, "2021-05-05")))
  }

  test("schema evolution: alter=true analog adds and null-fills columns") {
    val existing = Seq((1L, "a")).toDF("id", "v")
    val incoming = Seq((2L, "b", 42L)).toDF("id", "v", "extra")
    val out = Upsert.upsert(Some(existing), incoming, Seq("id")).orderBy("id").collect()
    assert(out(0).getAs[Any]("extra") === null)
    assert(out(1).getAs[Long]("extra") === 42L)
  }

  test("idempotence: replaying the same batch is a fixed point") {
    val batch = Seq((1L, "x", 0L), (2L, "y", 1L)).toDF("id", "v", Upsert.OrdCol)
    val once = Upsert.upsert(None, batch, Seq("id"))
    val twice = Upsert.upsert(Some(once), batch, Seq("id"))
    assert(once.orderBy("id").collect().toSeq === twice.orderBy("id").collect().toSeq)
  }

  test("TableStore: upsert/insertIgnore/overwrite round-trip on disk") {
    val dir = java.nio.file.Files.createTempDirectory("graft-store").toString
    val store = new TableStore(spark, dir)
    store.overwrite("t", Seq((1L, "a")).toDF("id", "v"))
    store.upsert("t", Seq((1L, "b"), (2L, "c")).toDF("id", "v"), Seq("id"))
    val rows = store.read("t").orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq === Seq((1L, "b"), (2L, "c")))
    store.insertIgnore("t", Seq((2L, "zzz"), (3L, "d")).toDF("id", "v"), Seq("id"))
    val rows2 = store.read("t").orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows2.toSeq === Seq((1L, "b"), (2L, "c"), (3L, "d")))
    assert(store.tableNames === Seq("t"))
  }
}
