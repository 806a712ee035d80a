package graft.store

import org.apache.spark.sql.functions._

/** Centroid-drift detector for the IVF families (Ivf, IvfPq, IvfSq,
  * IvfBin). Cells train ONCE ([[Kmeans.train]] at buildIndex); every
  * later upsert assigns against the frozen centroids. When the corpus
  * distribution moves — a new domain, a new embedding regime — fresh
  * vectors crowd into whichever cells happen to be least-wrong, the
  * occupancy distribution skews away from the trained one, and probe
  * recall decays SILENTLY: nprobe cells hold an ever-smaller fraction
  * of any query's true neighbors, while every query still returns k
  * plausible rows. (FAISS ships the same advice: retrain the coarse
  * quantizer when the data distribution shifts.)
  *
  * Detection needs a baseline, so buildIndex persists a train-time
  * occupancy snapshot (`<cents>_train`: cell → n_train, written from
  * the map table right after the first assignment). The drift report
  * compares CURRENT per-cell occupancy (one bounded aggregate over
  * the (pk, cell) map — ≤ k cells by construction, no vector math,
  * works identically for all four families including the code-only
  * ones) against the snapshot:
  *  - `tv`: total-variation distance between the two occupancy
  *    DISTRIBUTIONS (0 = same shape, 1 = disjoint) — shape drift;
  *  - `growth`: n_now / n_train — even shape-preserving growth means
  *    the centroids were trained on a small prefix of the corpus.
  * [[Doctor.suggest]] surfaces both past thresholds with a retrain
  * recommendation; retraining is one buildIndex re-run (the k-means
  * path the index was born from), which rewrites cells + snapshot and
  * restores the recall floor — IvfDriftSpec drives the full loop.
  */
object IvfDrift {

  /** Train-time occupancy snapshot table for a cents table. */
  def snapName(centsTable: String): String = s"${centsTable}_train"

  final case class Report(tv: Double, growth: Double, nTrain: Long, nNow: Long)

  /** Persist the train-time per-cell occupancy (called by each IVF
    * family's buildIndex after the initial assignment).
    */
  def snapshot(store: TableStore, centsTable: String, mapTable: String): Unit =
    store.overwrite(snapName(centsTable),
      store.read(mapTable).groupBy(col("cell"))
        .agg(count(lit(1)).as("n_train")))

  /** Drift of the current occupancy vs the snapshot, or None when
    * either side is missing (pre-snapshot index: nothing to compare).
    * Driver-side math over ≤ k cells — bounded by construction.
    */
  def report(
      store: TableStore, centsTable: String, mapTable: String): Option[Report] =
    for {
      snap <- store.readIfExists(snapName(centsTable))
      m <- store.readIfExists(mapTable)
    } yield {
      val now = m.groupBy(col("cell")).agg(count(lit(1)).as("n_now"))
      val rows = snap.join(now, Seq("cell"), "full_outer")
        .select(
          coalesce(col("n_train"), lit(0L)).as("a"),
          coalesce(col("n_now"), lit(0L)).as("b"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val nTrain = rows.map(_._1).sum
      val nNow = rows.map(_._2).sum
      val tv =
        if (nTrain == 0L || nNow == 0L) if (nTrain == nNow) 0.0 else 1.0
        else rows.map { case (a, b) =>
          math.abs(a.toDouble / nTrain - b.toDouble / nNow)
        }.sum / 2.0
      val growth = if (nTrain == 0L) Double.PositiveInfinity
        else nNow.toDouble / nTrain
      Report(tv, growth, nTrain, nNow)
    }
}
