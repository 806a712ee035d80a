package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ingest.Transforms
import graft.queries.TextOps
import graft.store.{Iteration, TableStore}

/** Streaming incrementally-TRAINED quality classifier — the unbounded
  * form of q_quality_classifier: the nearest-centroid model is a pair
  * of per-bucket class count sums plus two doc counts, ALL mergeable
  * by addition, so a stream maintains the exact same model a batch
  * train over the full history would produce — not an approximation
  * (the mergeable-summaries property the sketch sinks exploit, here
  * exact). The persisted `<table>_qcls` model table holds one row per
  * feature bucket (bucket, sp, sn) plus the bucket = −1 row carrying
  * the class DOC counts in the same columns; [[classify]] scores any
  * frame against the current model with the integer midpoint rule
  * ([[TextOps.centroidPredict]] — one body, the formula cannot fork
  * from the oracle op).
  *
  * SUM MERGES ARE NOT IDEMPOTENT, so the sink carries the
  * StreamHeavyHitters watermark discipline verbatim: (run_id,
  * batch_id) ride the model table itself and commit in the same
  * atomic swap as the sums — a redelivered batch (crash between the
  * store write and the checkpoint advance) is skipped by the
  * watermark instead of double-counting, and a NEW checkpoint
  * lineage (different run_id) merges on top of the carried model.
  *
  * Scale shape: per batch, one tokenize+explode over the BATCH only,
  * a ≤257-row distributed merge with the stored model, one swap
  * write. Training cost is O(batch tokens); the model never exceeds
  * 257 rows regardless of stream length.
  */
object StreamCentroid {

  def modelName(table: String): String = s"${table}_qcls"

  /** Doc-count sentinel bucket (sp = positive docs, sn = negative). */
  private val CountsBucket = -1

  private def watermark(
      store: TableStore, table: String): Option[(Option[String], Long)] =
    store.readIfExists(modelName(table)).flatMap { m =>
      if (!m.columns.contains("batch_id")) None
      else m.agg(max(col("batch_id"))).collect().headOption
        .filter(!_.isNullAt(0)).map { r =>
          val runId =
            if (m.columns.contains("run_id"))
              m.select(col("run_id")).limit(1).collect()
                .headOption.flatMap(row => Option(row.getString(0)))
            else None
          (runId, r.getLong(0))
        }
    }

  /** foreachBatch handler: fold the batch's texts into the persisted
    * centroid model. Labels come from the shared length-gate rule —
    * the weak-label bootstrap runs ON the stream.
    */
  def centroidSink(
      store: TableStore, table: String, textCol: String,
      runId: String = "adhoc"): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val alreadyMerged = watermark(store, table).exists {
        case (storedRun, storedBatch) =>
          storedRun.contains(runId) && batchId <= storedBatch
      }
      if (!batch.isEmpty && !alreadyMerged) {
        val lab = batch.select(col(textCol).as("text"))
          .filter(col("text").isNotNull)
          .select(col("text"), TextOps.lengthGateLabel(col("text")).as("y"))
        // batch-local per-bucket class token sums (one row per token
        // then a partial-agg'd groupBy — O(batch tokens))
        val bucketSums = lab
          .select(col("y"), explode(Transforms.tokens(col("text"))).as("token"))
          .select(col("y"), TextOps.featBucket.as("bucket"))
          .groupBy(col("bucket"))
          .agg(sum(when(col("y") === 1, 1L).otherwise(0L)).as("sp"),
            sum(when(col("y") === -1, 1L).otherwise(0L)).as("sn"))
        val docCounts = lab.agg(
          sum(when(col("y") === 1, 1L).otherwise(0L)).as("sp"),
          sum(when(col("y") === -1, 1L).otherwise(0L)).as("sn"))
          .select(lit(CountsBucket).as("bucket"), col("sp"), col("sn"))
        val batchModel = bucketSums.unionByName(docCounts)
        // merge with the stored model by ADDITION (the mergeable
        // model property); materialized first — the frame reads the
        // table the swap replaces. A non-model-shaped table (the
        // out-of-band state Doctor reports) contributes nothing and
        // is overwritten — the no-crash contract the sketch sinks
        // share.
        val merged = Iteration.materialize(
          store.readIfExists(modelName(table))
            .filter(m => m.columns.contains("bucket") &&
              m.columns.contains("sp") && m.columns.contains("sn"))
            .map(_.select(col("bucket"), col("sp"), col("sn"))
              .unionByName(batchModel))
            .getOrElse(batchModel)
            .groupBy(col("bucket"))
            .agg(sum(col("sp")).as("sp"), sum(col("sn")).as("sn"))
            .withColumn("run_id", lit(runId))
            .withColumn("batch_id", lit(batchId)))
        store.overwrite(modelName(table), merged)
      }
    }

  /** The maintained model's (bucket, sp, sn) rows + class doc counts. */
  def model(store: TableStore, table: String): (DataFrame, DataFrame) = {
    val m = store.read(modelName(table))
      .select(col("bucket"), col("sp"), col("sn"))
    (m.filter(col("bucket") =!= CountsBucket),
      m.filter(col("bucket") === CountsBucket)
        .select(col("sp").as("b_pos"), col("sn").as("a_neg")))
  }

  /** Score `docs` (idCol, textCol) against the current model: the
    * serving surface. Returns (doc_id, pred ∈ {1, −1}) — the same
    * integer midpoint rule as the oracle op, one shared body.
    */
  def classify(
      store: TableStore, table: String, docs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val (sums, counts) = model(store, table)
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val feat = base
      .select(col("doc_id"), explode(Transforms.tokens(col("text"))).as("token"))
      .select(col("doc_id"), TextOps.featBucket.as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    TextOps.centroidPredict(feat, base.select(col("doc_id")), sums, counts)
      .select(col("doc_id"), col("pred"))
  }
}
