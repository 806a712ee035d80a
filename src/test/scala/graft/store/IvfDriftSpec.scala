package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Centroid drift: train an IVF index on one distribution, upsert a
  * corpus from a DIFFERENT region, and the engine must (a) flag the
  * drift in `doctor suggest` with a retrain recommendation, and (b)
  * restore the recall floor once the recommended retrain (a
  * buildIndex re-run) executes — the silent-recall-decay loop closed
  * end to end.
  */
class IvfDriftSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 16
  private val rnd = new scala.util.Random(77)

  private def axis(i: Int): Array[Double] = {
    val a = Array.fill(dims)(0.0); a(i) = 1.0; a
  }
  private def around(base: Array[Double], eps: Double): Seq[Double] =
    base.map(_ + eps * rnd.nextGaussian()).toSeq

  // training corpus: two tight clusters on axes 0 and 1
  private def trainCorpus: DataFrame =
    ((0 until 30).map(i => (i.toLong, around(axis(0), 0.05))) ++
      (30 until 60).map(i => (i.toLong, around(axis(1), 0.05))))
      .toDF("pk", "e")

  // drift corpus: a NEW region (axis 2) the trained centroids never
  // saw — assignments there are noise-driven, so true neighbors
  // scatter across cells and probes miss them
  private def driftCorpus: DataFrame =
    (100 until 300).map(i => (i.toLong, around(axis(2), 0.2)))
      .toDF("pk", "e")

  private def freshStore(): TableStore =
    new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-drift").toString)

  /** recall@10 of the index against exact cosine, for probe pks. */
  private def recall(store: TableStore, probes: DataFrame): Double = {
    val exact = probes.as("q").join(store.read("docs").as("c"),
        col("q.pk") =!= col("c.pk"))
      .select(col("q.pk").as("query_id"), col("c.pk").as("cand_id"),
        (aggregate(zip_with(col("q.qe"), col("c.e"), (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x) /
          (sqrt(aggregate(transform(col("q.qe"), x => x * x), lit(0.0), (a, x) => a + x)) *
            sqrt(aggregate(transform(col("c.e"), x => x * x), lit(0.0), (a, x) => a + x))))
          .as("cos"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id"))))
      .filter(col("rnk") <= 10)
      .select(col("query_id"), col("cand_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Ivf.annTopK(store, "docs",
        probes.select(col("pk"), col("qe")), "pk", "qe", 10, nprobe = 2)
      .select(col("query_id"), col("cand_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got.intersect(exact).size.toDouble / exact.size
  }

  test("drift is flagged, retrain is recommended, and retraining restores recall") {
    val store = freshStore()
    Ivf.buildIndex(store, "docs", trainCorpus, "pk", "e", k = 4, iters = 4)
    // freshly trained: no drift advisory
    assert(Doctor.suggest(store).filterNot(_.component == "compact") === Seq.empty)
    val r0 = IvfDrift.report(store, Ivf.centsName("docs"), Ivf.mapName("docs")).get
    assert(r0.tv === 0.0 && r0.growth === 1.0)

    // heavy post-training upsert from an unseen region
    Ivf.upsertWithCells(store, "docs", driftCorpus, "pk", "e")
    val drifted = Doctor.suggest(store).filter(_.component == "ivf-drift")
    assert(drifted.size === 1, s"drift not flagged: ${Doctor.suggest(store)}")
    assert(drifted.head.table === "docs_ivf")
    assert(drifted.head.problem.contains("retrain"),
      s"no retrain recommendation: ${drifted.head.problem}")
    val r1 = IvfDrift.report(store, Ivf.centsName("docs"), Ivf.mapName("docs")).get
    assert(r1.growth > 2.0, s"growth ${r1.growth}")

    // recall on the new region suffers under the stale centroids
    val probes = driftCorpus.orderBy(col("pk")).limit(5)
      .select(col("pk"), col("e").as("qe"))
    val recallDrifted = recall(store, probes)

    // the recommended retrain: one buildIndex re-run over the corpus
    Ivf.buildIndex(store, "docs", store.read("docs").select(col("pk"), col("e")),
      "pk", "e", k = 4, iters = 4)
    assert(Doctor.suggest(store).filter(_.component == "ivf-drift") === Seq.empty)
    val recallRetrained = recall(store, probes)
    assert(recallRetrained > recallDrifted,
      s"retrain did not help: $recallDrifted -> $recallRetrained")
    assert(recallRetrained >= 0.8,
      s"retrained recall floor broken: $recallRetrained")
    // the whole store stays integrity-clean through the loop
    assert(Doctor.check(store) === Seq.empty)
  }

  test("one-command retrain: recorded provenance drives IvfDrift.retrain / doctor --repair") {
    val store = freshStore()
    Ivf.buildIndex(store, "docs", trainCorpus, "pk", "e", k = 4, iters = 4)
    // provenance captured at build time
    val meta = IvfDrift.trainingMeta(store, "docs_ivf").get
    assert(meta("table") === "docs" && meta("family") === "ivf" &&
      meta("pk") === "pk" && meta("emb") === "e" && meta("k") === "4")
    Ivf.upsertWithCells(store, "docs", driftCorpus, "pk", "e")
    assert(Doctor.suggest(store).exists(_.component == "ivf-drift"))

    // the doctor --repair hook: detect → retrain in one call, nothing
    // restated by the caller
    val done = Doctor.retrainDrifted(store)
    assert(done.size === 1)
    val (fam, before, after) = done.head
    assert(fam === "docs_ivf")
    assert(before.growth > 2.0)
    assert(after.tv < 1e-9 && math.abs(after.growth - 1.0) < 1e-9,
      s"retrain did not reset the drift report: $after")
    // idempotent: a retrained index no longer suggests, so a second
    // repair pass is a no-op
    assert(Doctor.suggest(store).filter(_.component == "ivf-drift") === Seq.empty)
    assert(Doctor.retrainDrifted(store) === Seq.empty)
    assert(Doctor.check(store) === Seq.empty)

    // an index without provenance stays advisory-only, loudly
    store.drop(IvfDrift.metaName("docs_ivf"))
    val e = intercept[IllegalArgumentException] {
      IvfDrift.retrain(store, "docs_ivf")
    }
    assert(e.getMessage.contains("provenance"))
  }

  test("an index trained on an empty corpus is named plainly, not as Infinityx growth") {
    // regression (ADVICE r9): nTrain == 0 made growth +Infinity and
    // the advisory rendered "corpus grew Infinityx" — confusing for
    // what is really a pre-data build
    val store = freshStore()
    Ivf.buildIndex(store, "docs", trainCorpus, "pk", "e", k = 4, iters = 4)
    store.overwrite(IvfDrift.snapName(Ivf.centsName("docs")),
      trainCorpus.limit(0).select(col("pk").as("cell"), col("pk").as("n_train")))
    val flagged = Doctor.suggest(store).filter(_.component == "ivf-drift")
    assert(flagged.size === 1)
    assert(flagged.head.problem.contains("EMPTY corpus"), flagged.head.problem)
    assert(!flagged.head.problem.contains("Infinity"), flagged.head.problem)
  }

  test("shape drift alone (no growth) is flagged via total variation") {
    val store = freshStore()
    Ivf.buildIndex(store, "docs", trainCorpus, "pk", "e", k = 4, iters = 4)
    // REPLACE the axis-1 cluster's vectors with axis-0 region content:
    // same corpus size (growth 1.0), occupancy collapses into the
    // axis-0 cells — pure shape drift
    val moved = (30 until 60).map(i => (i.toLong, around(axis(0), 0.05)))
      .toDF("pk", "e")
    Ivf.upsertWithCells(store, "docs", moved, "pk", "e")
    val r = IvfDrift.report(store, Ivf.centsName("docs"), Ivf.mapName("docs")).get
    assert(math.abs(r.growth - 1.0) < 1e-9, s"growth ${r.growth}")
    assert(r.tv > 0.25, s"tv ${r.tv}")
    val flagged = Doctor.suggest(store).filter(_.component == "ivf-drift")
    assert(flagged.size === 1)
    assert(flagged.head.problem.contains("shape drifted"))
  }
}
