package graft.sql

import scala.util.Random

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.store.TableStore

/** Randomized MERGE INTO against an in-JVM reference model: rounds of
  * random source batches and random clause sets (conditional matched
  * UPDATE/DELETE, conditional NOT MATCHED INSERT, conditional NOT
  * MATCHED BY SOURCE UPDATE/DELETE, in random order within each
  * group) apply to BOTH the engine (through SQL) and a Map-based
  * model implementing first-matching-clause-wins by hand; the table
  * must equal the model after every round. Seeded — failures replay.
  */
private[sql] case class DmlSrc(id: Long, v: String, n: Long)

class GraftDmlPropertySpec extends SparkSpec {
  import spark.implicits._

  private def mountCatalog(): (String, TableStore) = {
    val root = java.nio.file.Files.createTempDirectory("graft-dmlp").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", root)
    (root, new TableStore(spark, root))
  }

  test("random MERGE rounds equal the reference model (seed 1013)") {
    val rnd = new Random(1013)
    val (_, store) = mountCatalog()
    store.ensureBucketed("t", Seq("id"), 4)
    store.ensureGoverned(Seq("t"))

    var model = Map[Long, (String, Long)]()
    val init = (0L until 12L).map(i => (i, s"v$i", i * 10))
    store.upsert("t", init.toDF("id", "v", "n"), Seq("id"))
    model = init.map { case (i, v, n) => i -> (v, n) }.toMap

    for (round <- 1 to 12) {
      // random source: some existing ids, some new, never duplicated
      val ids = rnd.shuffle((0L until 30L).toList).take(1 + rnd.nextInt(8))
      val src = ids.map(i => DmlSrc(i, s"r$round-$i", rnd.nextInt(100).toLong))

      val mThr = rnd.nextInt(120).toLong  // matched-clause threshold
      val iThr = rnd.nextInt(100).toLong  // insert threshold
      val bThr = rnd.nextInt(120).toLong  // by-source threshold

      // matched group: conditional DELETE and unconditional UPDATE,
      // random order (first-wins differs between the two orders)
      val delFirst = rnd.nextBoolean()
      val matchedSql =
        if (delFirst)
          s"""WHEN MATCHED AND t.n < $mThr THEN DELETE
             |WHEN MATCHED THEN UPDATE SET v = s.v, n = t.n + s.n""".stripMargin
        else
          s"""WHEN MATCHED AND t.n < $mThr THEN UPDATE SET v = s.v, n = t.n + s.n
             |WHEN MATCHED THEN DELETE""".stripMargin
      val withInsert = rnd.nextBoolean()
      val insertSql =
        if (withInsert)
          s"\nWHEN NOT MATCHED AND s.n >= $iThr THEN " +
            "INSERT (id, v, n) VALUES (s.id, s.v, s.n)"
        else ""
      val withBySource = rnd.nextBoolean()
      val bySourceSql =
        if (withBySource)
          s"\nWHEN NOT MATCHED BY SOURCE AND t.n > $bThr THEN " +
            "UPDATE SET n = t.n - 1"
        else ""

      src.toDF("id", "v", "n").createOrReplaceTempView(s"src_$round")
      spark.sql(
        s"""MERGE INTO graft.t t USING src_$round s
           |ON t.id = s.id
           |$matchedSql$insertSql$bySourceSql""".stripMargin)

      // the model, first-matching-clause-wins by hand, over the
      // PRE-merge state (matched/by-source from the target side,
      // inserts from source rows absent pre-merge)
      val pre = model
      val srcById = src.map(s => s.id -> s).toMap
      val targetSide = pre.flatMap { case (id, (v, n)) =>
        srcById.get(id) match {
          case Some(s) =>
            if (delFirst) {
              if (n < mThr) None else Some(id -> (s.v, n + s.n))
            } else {
              if (n < mThr) Some(id -> (s.v, n + s.n)) else None
            }
          case None =>
            if (withBySource && n > bThr) Some(id -> (v, n - 1))
            else Some(id -> (v, n))
        }
      }
      val inserts =
        if (withInsert)
          src.filter(s => !pre.contains(s.id) && s.n >= iThr)
            .map(s => s.id -> (s.v, s.n))
        else Nil
      model = targetSide ++ inserts

      val actual = spark.sql("SELECT id, v, n FROM graft.t")
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
        .toMap
      assert(actual === model,
        s"round $round diverged (delFirst=$delFirst ins=$withInsert " +
          s"bys=$withBySource mThr=$mThr iThr=$iThr bThr=$bThr)\n" +
          s"src=$src")
    }
  }

  test("random FLAT-table MERGE rounds equal a row-list model, " +
    "including duplicate source keys on insert-only merges (seed 2027)") {
    val rnd = new Random(2027)
    val (_, store) = mountCatalog()
    store.ensureGoverned(Seq("p"))

    // flat tables have no pk: the model is a plain ROW LIST — inserted
    // duplicate ids are legal and must round-trip (later matched
    // clauses then touch EVERY row of that id, each against the one
    // deduped source row)
    var model: Vector[(Long, String, Long)] =
      (0L until 10L).map(i => (i, s"v$i", i * 10)).toVector
    store.overwrite("p", model.toDF("id", "v", "n"))

    for (round <- 1 to 10) {
      val insertOnly = rnd.nextBoolean()
      val rawIds = List.fill(1 + rnd.nextInt(8))(rnd.nextInt(16).toLong)
      // insert-only merges tolerate (and must not duplicate targets
      // under) repeated source keys; merges with matched clauses hit
      // the cardinality rule, so those sources dedupe
      val ids = if (insertOnly) rawIds else rawIds.distinct
      val src = ids.zipWithIndex.map { case (i, k) =>
        DmlSrc(i, s"r$round-$i-$k", rnd.nextInt(100).toLong)
      }
      val iThr = rnd.nextInt(80).toLong
      val mThr = rnd.nextInt(120).toLong

      src.toDF("id", "v", "n").createOrReplaceTempView(s"psrc_$round")
      val clauses =
        if (insertOnly)
          s"WHEN NOT MATCHED AND s.n >= $iThr THEN " +
            "INSERT (id, v, n) VALUES (s.id, s.v, s.n)"
        else
          s"""WHEN MATCHED AND t.n < $mThr THEN DELETE
             |WHEN MATCHED THEN UPDATE SET v = s.v, n = t.n + s.n
             |WHEN NOT MATCHED AND s.n >= $iThr THEN
             |  INSERT (id, v, n) VALUES (s.id, s.v, s.n)""".stripMargin
      spark.sql(
        s"""MERGE INTO graft.p t USING psrc_$round s
           |ON t.id = s.id
           |$clauses""".stripMargin)

      val pre = model
      val preIds = pre.map(_._1).toSet
      val srcById = src.map(s => s.id -> s).toMap // deduped in full mode
      val kept =
        if (insertOnly) pre // matched rows untouched — exactly once
        else pre.flatMap { case row @ (id, _, n) =>
          srcById.get(id) match {
            case Some(s) =>
              if (n < mThr) None else Some((id, s.v, n + s.n))
            case None => Some(row)
          }
        }
      // standard MERGE: EVERY qualifying not-matched source row
      // inserts — duplicates included on a keyless table
      val inserts = src.filter(s => !preIds.contains(s.id) && s.n >= iThr)
        .map(s => (s.id, s.v, s.n))
      model = kept ++ inserts

      val actual = spark.sql("SELECT id, v, n FROM graft.p")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toVector
      assert(actual.sorted === model.sorted,
        s"round $round diverged (insertOnly=$insertOnly iThr=$iThr " +
          s"mThr=$mThr)\nsrc=$src")
    }
  }
}
