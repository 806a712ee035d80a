package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Transactionally-consistent multi-table CDC: the epoch log is
  * global, so a `transact` that upserts N tables lands at ONE epoch —
  * but per-table consumers advance per-table cursors at their own
  * pace, so a mirror that JOINS two such tables can consume them at
  * different epochs and serve a torn join. consumeChangesMulti closes
  * that hole: one logical cursor, every batch a same-window map of
  * member diffs, member cursor rows advanced by one atomic swap.
  */
class MultiConsumerSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-multi").toString

  private def rows(df: DataFrame): Set[(Long, String, String)] =
    df.select(col("id").cast("long"), col("v"), col("_change_type"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

  private val pks = Seq("users" -> Seq("id"), "posts" -> Seq("id"))

  test("tables committed in one transact are always delivered in the same batch") {
    val store = new TableStore(spark, freshRoot())
    store.ensureGoverned(Seq("users", "posts"))
    store.transact {
      store.upsert("users", Seq((1L, "u1")).toDF("id", "v"), Seq("id"))
      store.upsert("posts", Seq((1L, "p1")).toDF("id", "v"), Seq("id"))
    }
    var batches = Vector.empty[Map[String, Set[(Long, String, String)]]]
    def poll() = EpochFollower.consumeChangesMulti(store, pks, "m") { m =>
      batches :+= m.map { case (t, df) => t -> rows(df) }
    }
    // registration: both members in full, in ONE batch
    assert(poll().isDefined)
    assert(batches.last === Map(
      "users" -> Set((1L, "u1", "insert")),
      "posts" -> Set((1L, "p1", "insert"))))

    // a joint commit: delivered as one batch — never split
    store.transact {
      store.upsert("users", Seq((2L, "u2")).toDF("id", "v"), Seq("id"))
      store.upsert("posts", Seq((2L, "p2")).toDF("id", "v"), Seq("id"))
    }
    assert(poll().isDefined)
    assert(batches.last === Map(
      "users" -> Set((2L, "u2", "insert")),
      "posts" -> Set((2L, "p2", "insert"))))

    // a single-member commit: only that member appears in the map
    store.upsert("users", Seq((3L, "u3")).toDF("id", "v"), Seq("id"))
    assert(poll().isDefined)
    assert(batches.last === Map("users" -> Set((3L, "u3", "insert"))))

    // rewrite-only window: cursor advances, handler silent
    val n = batches.size
    store.compact("users")
    assert(poll().isEmpty)
    assert(batches.size === n)
    assert(EpochFollower.cursor(store, "users", "m")
      === Some(store.snapshot().epoch))
  }

  test("crash between tables is impossible: member cursors advance atomically") {
    val store = new TableStore(spark, freshRoot())
    store.ensureGoverned(Seq("users", "posts"))
    store.transact {
      store.upsert("users", Seq((1L, "u1")).toDF("id", "v"), Seq("id"))
      store.upsert("posts", Seq((1L, "p1")).toDF("id", "v"), Seq("id"))
    }
    EpochFollower.consumeChangesMulti(store, pks, "m")(_ => ())
    val before = EpochFollower.cursors(store)
    assert(before(("users", "m")) === before(("posts", "m")),
      "member cursors diverged at registration")

    // the handler dies mid-batch: NO member cursor moves — the next
    // poll redelivers the identical consistent window
    store.transact {
      store.upsert("users", Seq((2L, "u2")).toDF("id", "v"), Seq("id"))
      store.upsert("posts", Seq((2L, "p2")).toDF("id", "v"), Seq("id"))
    }
    intercept[RuntimeException] {
      EpochFollower.consumeChangesMulti(store, pks, "m") { _ =>
        throw new RuntimeException("sink died mid-batch")
      }
    }
    assert(EpochFollower.cursors(store).view
      .filterKeys(_._2 == "m").toMap === before.view
      .filterKeys(_._2 == "m").toMap,
      "a crashed batch moved a member cursor")
    var got = Map.empty[String, Set[(Long, String, String)]]
    EpochFollower.consumeChangesMulti(store, pks, "m") { m =>
      got = m.map { case (t, df) => t -> rows(df) }
    }
    assert(got === Map(
      "users" -> Set((2L, "u2", "insert")),
      "posts" -> Set((2L, "p2", "insert"))))
  }

  test("a window mixing joint commits with a compaction still delivers consistent exact batches") {
    val store = new TableStore(spark, freshRoot())
    store.ensureGoverned(Seq("users", "posts"))
    store.transact {
      store.upsert("users", Seq((1L, "u1")).toDF("id", "v"), Seq("id"))
      store.upsert("posts", Seq((1L, "p1")).toDF("id", "v"), Seq("id"))
    }
    EpochFollower.consumeChangesMulti(store, pks, "m")(_ => ())
    // pending while the consumer sleeps: joint upsert, compaction of
    // one member, joint upsert — the cut at the rewrite boundary must
    // keep each joint commit's members together
    store.transact {
      store.upsert("users", Seq((2L, "u2")).toDF("id", "v"), Seq("id"))
      store.upsert("posts", Seq((2L, "p2")).toDF("id", "v"), Seq("id"))
    }
    store.compact("posts")
    store.transact {
      store.upsert("users", Seq((3L, "u3")).toDF("id", "v"), Seq("id"))
      store.upsert("posts", Seq((3L, "p3")).toDF("id", "v"), Seq("id"))
    }
    var batches = Vector.empty[Map[String, Set[(Long, String, String)]]]
    EpochFollower.consumeChangesMulti(store, pks, "m") { m =>
      batches :+= m.map { case (t, df) => t -> rows(df) }
    }
    assert(batches === Vector(
      Map("users" -> Set((2L, "u2", "insert")),
        "posts" -> Set((2L, "p2", "insert"))),
      Map("users" -> Set((3L, "u3", "insert")),
        "posts" -> Set((3L, "p3", "insert")))),
      "the rewrite cut tore a joint commit apart or echoed the compaction")
  }

  test("the torn-join hole per-table consumers permit is closed") {
    val store = new TableStore(spark, freshRoot())
    store.ensureGoverned(Seq("users", "posts"))
    store.transact {
      store.upsert("users", Seq((1L, "name-v1")).toDF("id", "v"), Seq("id"))
      store.upsert("posts", Seq((1L, "title-v1")).toDF("id", "v"), Seq("id"))
    }
    // the per-table shape: users' consumer catches up, posts' does not
    // (its poll is scheduled later) — the mirror joins v1 users against
    // nothing, or after the next commit v2 users against v1 posts
    EpochFollower.consumeChanges(store, "users", "solo", Seq("id"))(_.count())
    store.transact {
      store.upsert("users", Seq((1L, "name-v2")).toDF("id", "v"), Seq("id"))
      store.upsert("posts", Seq((1L, "title-v2")).toDF("id", "v"), Seq("id"))
    }
    EpochFollower.consumeChanges(store, "users", "solo", Seq("id"))(_.count())
    // users' solo cursor is ahead of posts' (unregistered) — the torn
    // state the multi consumer makes unrepresentable:
    val multiBatch = EpochFollower.consumeChangesMulti(store, pks, "joined") {
      m =>
        // both members present, both pinned at the SAME window — the
        // join inside the handler is consistent by construction
        val u = m("users").drop("_change_type").withColumnRenamed("v", "uname")
        val p = m("posts").drop("_change_type").withColumnRenamed("v", "ptitle")
        assert(u.join(p, Seq("id")).count() === 1L)
        m.map { case (t, df) => t -> rows(df) }
    }
    assert(multiBatch.isDefined)
    val got = multiBatch.get._1
    assert(got("users") === Set((1L, "name-v2", "insert")))
    assert(got("posts") === Set((1L, "title-v2", "insert")))
  }
}
