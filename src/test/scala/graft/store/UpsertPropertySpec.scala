package graft.store

import graft.SparkSpec

/** Property-style hardening of the sink semantics: random sequences of
  * replace/ignore batches applied both through Upsert and a trivial
  * in-memory reference model must agree exactly (the reference model
  * IS sqlite-utils' semantics: replace = overwrite key, ignore = keep
  * first).
  */
class UpsertPropertySpec extends SparkSpec {
  import spark.implicits._

  test("random batch sequences match the reference model (seeded)") {
    val rnd = new scala.util.Random(1234)
    (1 to 5).foreach { round =>
      val model = scala.collection.mutable.LinkedHashMap[Long, String]()
      var table: Option[org.apache.spark.sql.DataFrame] = None

      (1 to 6).foreach { _ =>
        val isReplace = rnd.nextBoolean()
        val batch = (1 to (1 + rnd.nextInt(8))).map { i =>
          (rnd.nextInt(10).toLong, s"v${rnd.nextInt(1000)}", i.toLong)
        }
        val batchDf = batch.toDF("id", "v", Upsert.OrdCol)

        if (isReplace) {
          // model: later rows in the batch win, batch beats table
          batch.foreach { case (id, v, _) => model(id) = v }
          table = Some(Upsert.upsert(table, batchDf, Seq("id")))
        } else {
          // model: existing wins; within batch the FIRST occurrence wins
          val firstPerKey = batch.groupBy(_._1).map { case (k, rows) =>
            k -> rows.minBy(_._3)._2
          }
          firstPerKey.foreach { case (id, v) =>
            if (!model.contains(id)) model(id) = v
          }
          table = Some(Upsert.insertIgnore(table, batchDf, Seq("id")))
        }

        val got = table.get.collect()
          .map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap
        assert(got === model.toMap, s"diverged in round $round")
      }
    }
  }
}
