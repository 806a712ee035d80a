package graft.ingest

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.TableStore

/** K9 lists sink (`utils.py:102-116, 534-568`): list dimension row
  * with owner FK extraction + ISO created_at, member users saved, and
  * (list, user) membership links.
  */
class ListsSpec extends SparkSpec {
  import spark.implicits._

  test("saveList: dimension + owner FK + membership links") {
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-lists").toString)

    val listJson =
      """{"id": 101, "id_str": "101", "name": "datasette",
        | "created_at": "Mon Sep 02 14:19:58 +0000 2019",
        | "slug": "datasette", "full_name": "@simonw/datasette",
        | "member_count": 2,
        | "user": {"id": 12497, "id_str": "12497", "screen_name": "simonw",
        |   "name": "Simon Willison", "description": "", "url": null,
        |   "created_at": "Wed Nov 15 13:18:50 +0000 2006"}}"""
        .stripMargin.replace("\n", "")
    val listRow = spark.read.json(Seq(listJson).toDS)

    val members = Seq(
      (22737278L, "drvox", "Wed Mar 04 05:14:12 +0000 2009", "", null.asInstanceOf[String]),
      (14148390L, "bwhitman", "Fri Mar 14 18:19:20 +0000 2008", "", null.asInstanceOf[String]))
      .toDF("id", "screen_name", "created_at", "description", "url")

    LinkSinks.saveList(spark, store, listRow, members)

    val lists = store.read("lists").collect()
    assert(lists.length === 1)
    assert(lists(0).getAs[Long]("id") === 101L)
    assert(lists(0).getAs[Long]("user") === 12497L) // owner FK
    assert(lists(0).getAs[String]("created_at") === "2019-09-02T14:19:58+00:00")
    assert(!store.read("lists").columns.contains("id_str"))

    // owner + 2 members all in users
    assert(store.read("users").collect().map(_.getAs[Long]("id")).toSet ===
      Set(12497L, 22737278L, 14148390L))

    val memberships = store.read("list_members").collect()
      .map(r => (r.getAs[Long]("list"), r.getAs[Long]("user"))).toSet
    assert(memberships === Set((101L, 22737278L), (101L, 14148390L)))

    // re-save is idempotent (replace semantics)
    LinkSinks.saveList(spark, store, listRow, members)
    assert(store.read("lists").count() === 1)
    assert(store.read("list_members").count() === 2)
  }
}
