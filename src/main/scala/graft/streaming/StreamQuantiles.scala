package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

import graft.store.{Iteration, TableStore}

/** Streaming rank-statistics maintenance — the unbounded form of
  * q_quantile_sketch: a persisted ≤ k-rows-per-group bottom-k-by-hash
  * sample table (`<table>_bks`) merged per micro-batch, so the store
  * always holds a deterministic uniform sample of the FULL stream
  * history and any quantile of it answers from ≤ k longs per group.
  *
  * Merge discipline: the sample is the k rows with the smallest
  * (hash, tie) key per group — a SET function of the data. Unlike
  * the Misra-Gries counters (StreamHeavyHitters, where count merges
  * are not idempotent and the batch watermark must ride the sketch),
  * bottom-k union is IDEMPOTENT: re-merging a redelivered batch
  * re-offers keys that are either already in the sample or already
  * above its cutoff, and lands on the identical table. No watermark,
  * no run-id scoping, no sentinel rows — at-least-once delivery is
  * enough, which is the cheapest redelivery contract any maintained
  * sketch in this engine gets.
  *
  * Per batch: hash the batch rows (same salted-md5 kernel as the
  * batch query, so batch and stream build THE SAME sample for the
  * same data), union with the stored ≤ k·|groups| rows, keep the k
  * smallest (hash, tie) per group with one bounded window rank, and
  * swap-write — O(batch + k·|groups|) per micro-batch, never a
  * history replay.
  */
object StreamQuantiles {

  def sampleName(table: String): String = s"${table}_bks"

  /** Collision-free estimate column name: integral percents keep the
    * familiar `p50_est`; fractional ones carry their full digits
    * (`p49_5_est` for 0.495), so two distinct requested ps can never
    * alias one column and break a later select-by-name.
    */
  private[streaming] def pColName(p: Double): String = {
    // via the decimal RENDERING of p, not p*100 in binary floating
    // point (0.901 * 100 == 90.10000000000001)
    val pct = (BigDecimal(p.toString) * 100).bigDecimal.stripTrailingZeros
    s"p${pct.toPlainString.replace('.', '_').replace("-", "neg")}_est"
  }

  /** The current per-group sample rows (grp, h, tie, v, k). */
  def sample(store: TableStore, table: String): DataFrame =
    store.read(sampleName(table))

  /** Lower-quantile estimates per group from the persisted sample:
    * one row per group, element ⌊p·(n−1)⌋ of the value-sorted
    * sample for each requested p — the same integer pick as
    * q_quantile_sketch's oracle-pinned math.
    */
  def quantiles(
      store: TableStore, table: String, ps: Seq[Double]): DataFrame = {
    val sorted = sample(store, table)
      .groupBy(col("grp"))
      .agg(sort_array(collect_list(col("v"))).as("sorted"))
    val picks = ps.map { p =>
      element_at(col("sorted"),
        (floor(lit(p) * (size(col("sorted")) - 1)) + 1).cast("int"))
        .as(pColName(p))
    }
    sorted.select(col("grp") +: size(col("sorted")).cast("long").as("n_sample") +: picks: _*)
  }

  /** KMV distinct-count estimate per group from the SAME persisted
    * sample: the k smallest hashes double as a bottom-k sketch of the
    * tie-key domain, so one maintained table answers BOTH rank
    * statistics and cardinality over the stream's whole history —
    * n̂ = (k−1)·2^48 / h_k (the StateOps.cardinalityKmvExact
    * estimator), with sub-k groups exact (the sample degenerates to
    * the true key set; fewer than k rows is the tell). This counts
    * DISTINCT TIE KEYS ever offered; for value-cardinality, maintain
    * a sample keyed tie=value.
    */
  def cardinality(store: TableStore, table: String): DataFrame = {
    // a declared-but-empty sample (bucketed before the first batch, or
    // every row filtered) has no k to read — the estimate over zero
    // history is the empty frame, not an NPE
    def emptyResult: DataFrame = store.spark.createDataFrame(
      store.spark.sparkContext.emptyRDD[Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("grp",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("est_distinct",
          org.apache.spark.sql.types.LongType))))
    val sk = store.readIfExists(sampleName(table)) match {
      case Some(df) => df
      case None => return emptyResult
    }
    require(sk.columns.contains("k"),
      s"${sampleName(table)} carries no k column — rebuild via the sink")
    // the sink stamps every row with its k on each merge, so max() is
    // THE k — the estimator cannot silently run with a mismatched
    // numerator (a 1-value agg, driver-read like the KMV constant)
    val kRow = sk.agg(max(col("k"))).head
    if (kRow.isNullAt(0)) return emptyResult
    val k = kRow.getInt(0)
    val c = (k - 1).toDouble * 281474976710656.0 // (k−1)·2^48
    sk.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"), max(col("h")).as("hk"))
      .select(col("grp"),
        when(col("n_rows") < k, col("n_rows"))
          .otherwise(floor(lit(c) / col("hk").cast("double")).cast("long"))
          .as("est_distinct"))
      .orderBy(col("grp"))
  }

  /** Union + keep the k smallest (hash, tie) per group — the one
    * merge body both layouts share. Duplicate (grp, tie) keys — a
    * redelivered batch against the stored copy, or a redelivery whose
    * value column changed between deliveries — collapse to the MIN
    * value, the same rule as [[graft.functions.BottomKSample]].add,
    * so the merged sample is a pure set function of the offered keys
    * regardless of delivery order or value drift.
    *
    * An existing non-empty sample that LACKS the expected columns is
    * a loud error, not a silent rebuild: an out-of-band or
    * legacy-schema table must be repaired explicitly (Doctor treats
    * the same condition as an integrity failure), never overwritten
    * with a batch-only sample that loses the stream's history.
    */
  private def evict(
      existing: Option[DataFrame], batch: DataFrame, k: Int): DataFrame =
    existing
      .map { t =>
        val missing = Seq("grp", "h", "tie", "v").filterNot(t.columns.contains)
        if (missing.isEmpty)
          t.select(col("grp"), col("h"), col("tie"), col("v"))
            .unionByName(batch.select(col("grp"), col("h"), col("tie"), col("v")))
        else if (t.isEmpty) // zero-row shell (e.g. declared-bucketed): nothing lost
          batch.select(col("grp"), col("h"), col("tie"), col("v"))
        else throw new IllegalArgumentException(
          s"existing sample table lacks column(s) ${missing.mkString(", ")} " +
            s"(found ${t.columns.mkString(", ")}) — refusing to overwrite " +
            "stream history with a batch-only sample; repair or drop the " +
            "table explicitly")
      }
      .getOrElse(batch.select(col("grp"), col("h"), col("tie"), col("v")))
      .groupBy(col("grp"), col("h"), col("tie"))
      .agg(min(col("v")).as("v"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("h"), col("tie"))))
      .filter(col("_rn") <= k)
      .drop("_rn")
      // every merge re-stamps k uniformly, so readers (cardinality)
      // recover THE k from the table itself, never from convention
      .withColumn("k", lit(k))

  /** Declare a grp-bucketed layout for the sample table — the
    * O(batch) maintenance path at many-groups scale: each micro-batch
    * then reads and rewrites ONLY the buckets its groups hash into
    * (whole groups co-locate in one bucket), instead of the whole
    * ≤ k·|groups| table. At a handful of groups the flat default is
    * fine; at millions (per-domain length samples over a 100 TB
    * corpus) the flat rewrite is O(|groups|) per batch and this path
    * is the difference. Safe on a live flat sample: the next batch
    * pays one partitioned conversion rewrite, then stays O(touched).
    */
  def ensureBucketedSample(
      store: TableStore, table: String, buckets: Int): Unit =
    store.bucketLayoutOf(sampleName(table)) match {
      case Some((n, key)) =>
        require(n == buckets && key == Seq("grp"),
          s"${sampleName(table)} already declares (buckets=$n, " +
            s"key=${key.mkString(",")})")
      case None =>
        store.readIfExists(sampleName(table)) match {
          case Some(df) =>
            // convert in place through an identity merge (an empty
            // batch: existing rows ride through unchanged) — NOT
            // TableStore.bucketize, whose upsert-on-pk semantics
            // would collapse the sample to one row per group
            store.mergeTouchedBuckets(
              sampleName(table), df.limit(0),
              Seq("grp"), buckets)((ex, inc) =>
              ex.map(_.unionByName(inc)).getOrElse(inc))
          case None =>
            store.ensureBucketed(sampleName(table), Seq("grp"), buckets)
        }
    }

  /** foreachBatch handler: merge `(grpCol, tieCol, valueCol)` batch
    * rows into the persisted sample. `tieCol` must be a unique
    * INTEGRAL row key — enforced on the batch schema, because the
    * stored `tie` is a long and the hash must recompute from it (the
    * Doctor invariant): a string or fractional tie would either
    * null out under the cast (silently dropping every row) or store
    * a truncated key whose recomputed hash no longer matches.
    * Routes through the bucket-scoped merge when
    * [[ensureBucketedSample]] declared a layout.
    */
  def quantilesSink(
      store: TableStore, table: String, grpCol: String, tieCol: String,
      valueCol: String, k: Int): (DataFrame, Long) => Unit =
    (batch, _) => {
      if (!batch.isEmpty) {
        import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
        val tieType = batch.schema(tieCol).dataType
        require(Seq(ByteType, ShortType, IntegerType, LongType).contains(tieType),
          s"tie column $tieCol is $tieType — the sample stores tie as a " +
            "long and recomputes its hash from it, so tie must be integral")
        // hash the CASTED long's rendering: the stored (tie, h) pair
        // then recomputes by construction, whatever integral width
        // the batch carried
        val tie = col(tieCol).cast("long")
        val hashed = Iteration.materialize(batch.select(
          col(grpCol).cast("string").as("grp"),
          conv(substring(md5(concat(lit("q|"), tie.cast("string"))), 1, 12), 16, 10)
            .cast("long").as("h"),
          tie.as("tie"),
          col(valueCol).cast("long").as("v"))
          .filter(col("grp").isNotNull && col("h").isNotNull &&
            col("tie").isNotNull && col("v").isNotNull))
        // gate on the frame actually merged: a batch whose rows all
        // filter out must not pay a full sample rewrite
        if (!hashed.isEmpty) {
          store.bucketLayoutOf(sampleName(table)) match {
            case Some((n, Seq("grp"))) =>
              // O(batch + touched buckets): groups co-locate per
              // bucket, so the rank window never sees an unread
              // group's rows
              store.mergeTouchedBuckets(
                sampleName(table), hashed, Seq("grp"), n)(evict(_, _, k))
            case _ =>
              // flat default: pinned ONCE (derives from the table the
              // swap replaces — index-first rule)
              val merged = Iteration.materialize(
                evict(store.readIfExists(sampleName(table)), hashed, k))
              store.overwrite(sampleName(table), merged)
          }
        }
      }
    }

  /** Wire a streaming frame into the sink. */
  def writeQuantiles(
      rows: DataFrame, store: TableStore, table: String, grpCol: String,
      tieCol: String, valueCol: String, checkpointDir: String,
      k: Int = 64): StreamingQuery = {
    val writer: DataStreamWriter[Row] = rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
    writer.foreachBatch { (batch: DataFrame, id: Long) =>
      quantilesSink(store, table, grpCol, tieCol, valueCol, k)(batch, id)
    }.start()
  }
}
