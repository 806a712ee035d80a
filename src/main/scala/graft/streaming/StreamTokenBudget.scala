package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ingest.Transforms
import graft.queries.SamplingOps
import graft.store.{Iteration, TableStore}

/** Streaming token-budget admission — the unbounded form of
  * q_token_budget: documents are admitted into `<table>_budget` in
  * arrival order while their source's cumulative token count stays
  * within the budget; once a source's budget is spent, its later
  * arrivals are dropped. The mixture fills DURING ingest instead of
  * in a post-hoc batch pass — the "stop pulling from this source, it
  * is full" signal a live corpus build acts on.
  *
  * Per micro-batch:
  *  1. tokenize the batch ([[Transforms.tokens]], the one shared
  *     definition) and order it deterministically per source
  *     (hash-shuffled: `hashBucket(id), id` — the SAME order the
  *     batch recipe uses, so a replayed batch admits the same rows);
  *  2. running per-source sums over the BATCH (a batch-sized window),
  *     offset by the source's stored `seen` total — EVERY token that
  *     ever arrived for the source, admitted or not. Gating on seen
  *     (not on the admitted `used`) is what makes the recipe's
  *     monotone-prefix semantics boundary-invariant: the first
  *     overflow pushes seen past the budget permanently, so a source
  *     that fills mid-batch stays closed in every later batch — with
  *     used-gating it would block only for the rest of that batch and
  *     resume at the next trigger, making the corpus depend on
  *     trigger cadence;
  *  3. rows with `seen + cum ≤ budget` insert-ignore into the
  *     admitted table (idempotent by id);
  *  4. the state table `<table>_budget_state` (source, used, seen,
  *     run_id, batch_id) swap-writes with the new totals (`used` =
  *     admitted tokens, the reporting surface; `seen` = all arrivals,
  *     the gate). Legacy state without a seen column reads as
  *     seen = used — the best available floor.
  *
  * The one admission decision micro-batching still owns is ORDER:
  * rows are hash-ordered within a batch, so two runs whose triggers
  * split the same arrivals differently can admit a different last-doc
  * AT the budget boundary (a 2-token doc vs its batch-mate). What is
  * boundary-invariant is the semantics the header promises: every
  * source's admitted prefix stops at its first overflow, forever.
  *
  * TOKEN SUMS ARE NOT IDEMPOTENT, so redelivery is guarded by the
  * sketch-sink watermark discipline (StreamHeavyHitters): the
  * (run_id, batch_id) watermark rides the STATE table itself — state
  * and watermark commit in one swap. The write order is
  * admitted-then-state: a crash between them redelivers a batch whose
  * admission decision recomputes IDENTICALLY (deterministic order,
  * unchanged prior state), so the insert-ignore no-ops and the state
  * delta lands exactly once.
  *
  * Scale: admission state is O(sources) — the state table never
  * grows with the stream; per batch the only non-batch-sized I/O is
  * the state read and the admitted insert-ignore (O(batch) keyed
  * upsert). The per-source window runs over the batch, not history.
  */
object StreamTokenBudget {

  def admittedName(table: String): String = s"${table}_budget"
  def stateName(table: String): String = s"${table}_budget_state"

  /** Stored per-source totals (sentinel/watermark columns dropped). */
  def usedTotals(store: TableStore, table: String): DataFrame =
    store.read(stateName(table))
      .filter(col("source").isNotNull)
      .select(col("source"), col("used"))

  private def watermark(
      store: TableStore, table: String): Option[(Option[String], Long)] =
    store.readIfExists(stateName(table)).flatMap { st =>
      if (!st.columns.contains("batch_id")) None
      else st.agg(max(col("batch_id"))).collect().headOption
        .filter(!_.isNullAt(0)).map { r =>
          val runId = st.select(col("run_id")).limit(1).collect()
            .headOption.flatMap(row => Option(row.getString(0)))
          (runId, r.getLong(0))
        }
    }

  /** Start the admission sink over a streaming (id, source, text)
    * frame. `budget` is per SOURCE.
    */
  def writeBudgeted(
      docs: DataFrame, store: TableStore, table: String, idCol: String,
      sourceCol: String, textCol: String, budget: Long,
      checkpoint: String): StreamingQuery = {
    val runId = checkpoint
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        val skip = watermark(store, table).exists {
          case (Some(r), b) => r == runId && batchId <= b
          case (None, _) => false
        }
        if (!skip) applyBatch(
          store, table, batch.toDF(), idCol, sourceCol, textCol, budget,
          runId, batchId)
        ()
      }
      .start()
  }

  private def applyBatch(
      store: TableStore, table: String, batch: DataFrame, idCol: String,
      sourceCol: String, textCol: String, budget: Long, runId: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val prior = store.readIfExists(stateName(table))
      .map { st =>
        // legacy state (pre-seen column): seen = used is the best
        // available floor — strictly better than re-opening a closed
        // source, and exact from the source's next arrival on
        val withSeen =
          if (st.columns.contains("seen")) st
          else st.withColumn("seen", col("used"))
        withSeen.filter(col("source").isNotNull)
          .select(col("source"), col("used"), col("seen"))
      }
      .getOrElse(Seq.empty[(String, Long, Long)].toDF("source", "used", "seen"))
    val w = Window.partitionBy(col("source"))
      .orderBy(SamplingOps.hashBucket(col("id")), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = Iteration.materialize(batch
      .select(col(idCol).as("id"), col(sourceCol).as("source"),
        size(Transforms.tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .join(broadcast(prior.select(col("source"), col("seen").as("prior_seen"))),
        Seq("source"), "left")
      // the gate counts EVERY token the source ever presented (this
      // row's batch-prefix included) — one overflow closes the source
      // in this and every later batch, trigger cadence irrelevant
      .withColumn("total", coalesce(col("prior_seen"), lit(0L)) + col("cum")))
    val admitted = scored.filter(col("total") <= budget)
      .select(col("id"), col("source"), col("n_tokens"),
        col("total").as("cum_tokens"))
    // admitted FIRST (idempotent insert-ignore), state after: a crash
    // between them replays a batch whose decision recomputes
    // identically, so the delta lands exactly once
    store.insertIgnore(admittedName(table), admitted, Seq("id"))
    val delta = scored.groupBy(col("source")).agg(
      sum(when(col("total") <= budget, col("n_tokens")).otherwise(lit(0L)))
        .as("used"),
      sum(col("n_tokens")).as("seen"))
    val newState = prior
      .unionByName(delta)
      .groupBy(col("source"))
      .agg(sum(col("used")).as("used"), sum(col("seen")).as("seen"))
      .withColumn("run_id", lit(runId))
      .withColumn("batch_id", lit(batchId))
    // a batch admitting nothing still advances the watermark — the
    // state swap is the commit point (sentinel row when no sources)
    val sentinel = Seq((null: String, 0L, 0L, runId, batchId))
      .toDF("source", "used", "seen", "run_id", "batch_id")
    store.overwrite(stateName(table),
      Iteration.materialize(newState
        .select(col("source"), col("used"), col("seen"),
          col("run_id"), col("batch_id"))
        .unionByName(sentinel)))
  }
}
