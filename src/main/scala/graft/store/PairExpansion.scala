package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-bounded all-pairs expansion within buckets — the quadratic
  * step of every LSH-style dedup pipeline (MinHash bands, SimHash
  * blocks), made safe against degenerate buckets.
  *
  * The naive shape (`groupBy(bucket).agg(collect_set)` then explode
  * all pairs from the list) is quadratic in bucket size INSIDE ONE
  * TASK: a boilerplate-heavy corpus that lands a million documents in
  * one band produces a 10^12-pair explode on a single executor and an
  * unbounded aggregation buffer. This utility bounds both:
  *
  *  - each bucket is split into `ng = ceil(size / cellSize)` groups by
  *    a stable hash of the member id, so no aggregation buffer ever
  *    holds more than ~2·cellSize members;
  *  - the bucket's pair space is covered by the TRIANGLE of group
  *    tasks (i, j) with i ≤ j: every member of group g replicates to
  *    the ng tasks {(min(g, j), max(g, j)) : j < ng}, one aggregation
  *    collects each task's ≤ 2·cellSize members, and each task row
  *    expands only the pairs it owns (both-in-i for the diagonal,
  *    one-from-each off it) — ≤ ~(2·cellSize)² work per task, spread
  *    over ng² reducers for a hot bucket, all in ONE aggregation
  *    subtree (no self-join: a join-based variant re-executed the
  *    expensive upstream member computation once per plan branch);
  *  - a bucket smaller than `cellSize` has ng = 1 and degenerates to
  *    exactly the naive single-list plan (one task, no replication).
  *
  * The emitted pair set is identical to the naive expansion for any
  * `cellSize` (every unordered pair of distinct-id members sharing a
  * bucket appears; callers dedup across buckets with `distinct`, same
  * as the naive plan). Total work is the same Θ(Σ bucketSize²) — that
  * is the pair count itself — but per-task work is bounded by
  * cellSize², which is the property that survives adversarial data at
  * 100 TB.
  */
object PairExpansion {

  /** All unordered pairs (a, b) with a.id < b.id of members sharing a
    * bucket key.
    *
    * @param members     one row per bucket membership; columns must
    *                    include `keyCols`, `idCol`, `payloadCols`
    * @param keyCols     the bucket key (e.g. band_idx, band)
    * @param idCol       orderable member id (pair order + grid hash
    *                    entropy); duplicate (bucket, id) rows are
    *                    deduped deterministically (minimal payload
    *                    struct wins), so each id pairs at most once
    *                    per bucket
    * @param payloadCols carried per-member columns (e.g. a simhash to
    *                    verify against)
    * @param cellSize    target members per grid cell — the per-task
    *                    expansion bound is ~cellSize²
    * @return columns `a`, `b`: structs of (idCol, payloadCols*)
    */
  def pairsWithinBuckets(
      members: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      payloadCols: Seq[String] = Nil,
      cellSize: Int = 64): DataFrame = {
    require(cellSize > 0, "cellSize must be positive")
    val keys = keyCols.map(col)
    val item = struct((idCol +: payloadCols).map(col): _*)

    // Bucket sizes via a whole-partition window count, NOT a
    // groupBy+self-join: a join against an aggregated copy would
    // execute the `members` plan twice, and members is typically the
    // expensive part (signature computation). The window shuffles once
    // by the bucket key; a hot bucket streams through one spill-backed
    // task here (O(size) with disk-backed buffering — the same cost as
    // scanning it), while the quadratic work downstream is what gets
    // spread.
    val sized = members
      .withColumn("__bsz",
        count(lit(1)).over(Window.partitionBy(keys: _*)))
      .withColumn("__ng",
        floor((col("__bsz") + lit(cellSize.toLong - 1)) / lit(cellSize.toLong))
          .cast("long"))
      .withColumn("__g", pmod(xxhash64(col(idCol)), col("__ng")))

    // Triangle cover: member of group g participates in tasks
    // (min(g, j), max(g, j)) for every j — its own diagonal (g, g)
    // once (j = g) and one mixed task per other group. Each unordered
    // group pair is exactly one task, so each id pair is produced
    // exactly once.
    val tasks = sized.select((keys :+
      struct(item.as("x"), col("__g").as("g")).as("__xg") :+
      explode(transform(sequence(lit(0L), col("__ng") - 1), j =>
        struct(least(col("__g"), j).as("ti"),
          greatest(col("__g"), j).as("tj")))).as("__t")): _*)

    // One bounded sorted list per (bucket, task): ≤ 2·cellSize
    // members (the task's one or two cells). Sorting by the member
    // struct (id leads) makes indexed i < j expansion emit a.id <
    // b.id; the diagonal task owns same-group pairs, mixed tasks own
    // exactly the cross-group pairs (one member from each side).
    //
    // The id-uniqueness precondition is ENFORCED here, not assumed:
    // duplicate (bucket, id) rows — e.g. a caller feeding raw
    // membership rows with differing payloads — hash to the SAME grid
    // group (__g keys on the id), so all copies of an id sit adjacent
    // in every sorted task list that contains it, and keeping only the
    // first occurrence (the minimal payload struct — deterministic)
    // dedups globally. Without this, each duplicate would pair with
    // every other member, double-emitting pairs with divergent
    // payloads (a Jaccard/Hamming verify downstream would then score
    // the same pair twice, inconsistently).
    // (when/otherwise, not `||`: element_at is 1-based — index i IS
    // the 0-based predecessor — and would throw on i = 0 if the Or
    // evaluated both sides; CaseWhen short-circuits per row)
    val dedupById = (xs: Column) => filter(xs, (x, i) =>
      when(i === 0, lit(true)).otherwise(
        element_at(xs, i).getField("x").getField(idCol) =!=
          x.getField("x").getField(idCol)))
    val expanded = tasks
      .groupBy((keys :+ col("__t")): _*)
      .agg(sort_array(collect_set(col("__xg"))).as("__xr"))
      .select(col("__t"), dedupById(col("__xr")).as("__xs"))
      .select(explode(flatten(transform(col("__xs"), (x, i) =>
        filter(
          transform(slice(col("__xs"), i + 2, size(col("__xs"))), y =>
            when(col("__t.ti") === col("__t.tj") ||
                x.getField("g") =!= y.getField("g"),
              struct(x.getField("x").as("a"), y.getField("x").as("b")))),
          p => p.isNotNull)))).as("__p"))

    // Belt-and-braces: after the in-task dedup, task-list ids are
    // strictly increasing, so i < j expansion already implies
    // a.id < b.id — this filter only guards future refactors.
    expanded.select(col("__p.a").as("a"), col("__p.b").as("b"))
      .filter(col(s"a.$idCol") < col(s"b.$idCol"))
  }
}
