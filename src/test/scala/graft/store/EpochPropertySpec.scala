package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property-style hardening of the epoch commit log (the
  * UpsertPropertySpec discipline applied to the transactional layer):
  * seeded random sequences of multi-table transactions, redeliveries,
  * crash injections at the pre-flip window, aborts, vacuums, and
  * bucket conversions, checked after EVERY step against an in-memory
  * reference model — a cross-process reader must always see exactly
  * the model (all-or-nothing per transaction), and crashes must never
  * lose, tear, or duplicate state.
  */
class EpochPropertySpec extends SparkSpec {
  import spark.implicits._

  private val tables = Seq("ta", "tb", "tc")

  test("random transaction sequences: reader state always equals the model") {
    val rnd = new scala.util.Random(20260814)
    (1 to 3).foreach { round =>
      val root = java.nio.file.Files.createTempDirectory("graft-eprop").toString
      val store = new TableStore(spark, root)
      val reader = new TableStore(spark, root)
      // one table starts bucketed (the O(touched) path), rest flat
      store.ensureBucketed("ta", Seq("id"), 4)
      store.ensureGoverned(tables)
      val model = scala.collection.mutable.Map(
        tables.map(_ -> scala.collection.mutable.Map.empty[Long, String]): _*)
      var lastBatch: Option[Map[String, Seq[(Long, String)]]] = None

      def applyTx(batch: Map[String, Seq[(Long, String)]]): Unit =
        store.transact {
          batch.foreach { case (t, rows) =>
            store.upsert(t, rows.toDF("id", "v"), Seq("id"))
          }
        }

      def check(step: String): Unit = tables.foreach { t =>
        val want = model(t).toSet
        val got =
          if (reader.readIfExists(t).isEmpty) Set.empty[(Long, String)]
          else reader.read(t).select(col("id"), col("v"))
            .collect().map(r => (r.getLong(0), r.getString(1))).toSet
        assert(got === want, s"round $round, $step: $t diverged")
      }

      (0 until 14).foreach { step =>
        rnd.nextInt(10) match {
          case n if n <= 4 => // normal multi-table transaction
            // ids are DISTINCT within each batch frame: without an
            // explicit __ord column Upsert breaks intra-batch ties
            // arbitrarily (deterministic but unspecified), so the
            // model only constrains distinct-key batches
            val batch = rnd.shuffle(tables).take(1 + rnd.nextInt(3))
              .map(t => t -> rnd.shuffle((0 until 30).toList)
                .take(1 + rnd.nextInt(4))
                .map(id => (id.toLong, s"v$step-${rnd.nextInt(100)}"))).toMap
            applyTx(batch)
            batch.foreach { case (t, rows) =>
              rows.foreach { case (id, v) => model(t)(id) = v }
            }
            lastBatch = Some(batch)
            check(s"tx@$step")
          case 5 | 6 => // crash at the pre-flip window, then redeliver
            lastBatch.foreach { batch =>
              store.beforeCommitFlip = () => throw new RuntimeException("kill")
              try intercept[RuntimeException] { applyTx(batch) }
              finally store.beforeCommitFlip = () => ()
              check(s"crash@$step") // reader unmoved
              applyTx(batch) // at-least-once redelivery converges
              check(s"redeliver@$step")
            }
          case 7 => // abort mid-transaction (second table never lands)
            store.beforeCommitFlip = () => ()
            intercept[RuntimeException] {
              store.transact {
                store.upsert("tb", Seq((99L, "never")).toDF("id", "v"), Seq("id"))
                throw new RuntimeException("abort")
              }
            }
            check(s"abort@$step")
          case 8 => // vacuum: reclaim must never change visible state
            store.vacuumEpochs()
            check(s"vacuum@$step")
          case 9 => // time travel: the latest epoch equals the model
            tables.foreach { t =>
              if (model(t).nonEmpty) {
                val got = store.readEpoch(t, store.epochs().last)
                  .select(col("id"), col("v"))
                  .collect().map(r => (r.getLong(0), r.getString(1))).toSet
                assert(got === model(t).toSet, s"round $round epoch-read@$step")
              }
            }
        }
      }
      assert(Doctor.check(store) === Seq.empty,
        s"round $round left integrity issues")
    }
  }
}
