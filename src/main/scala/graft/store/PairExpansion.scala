package graft.store

import org.apache.spark.sql.DataFrame
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
  *    holds more than ~cellSize members;
  *  - pairs WITHIN a group expand from that group's sorted list
  *    (≤ cellSize² work per task);
  *  - pairs ACROSS groups come from replicating each member to every
  *    higher-numbered group and equi-joining on (bucket, group) — the
  *    Salting.saltedJoin shape — so a hot bucket's cross-group work is
  *    spread over ng join partitions instead of one;
  *  - a bucket smaller than `cellSize` has ng = 1 and degenerates to
  *    exactly the naive single-list plan (no replication rows).
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
    * @param idCol       unique, orderable member id (pair order + grid
    *                    hash entropy)
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

    // One bounded sorted list per (bucket, group) cell.
    val cells = sized
      .groupBy((keys :+ col("__g")): _*)
      .agg(sort_array(collect_set(item)).as("__xs"))

    // Pairs within a cell: indexed expansion of the sorted list
    // (i < j ⇒ a.id < b.id).
    val within = cells.select(explode(flatten(
      transform(col("__xs"), (x, i) =>
        transform(slice(col("__xs"), i + 2, size(col("__xs"))),
          y => struct(x.as("a"), y.as("b")))))).as("__p"))

    // Pairs across cells: replicate each member to every HIGHER group
    // of its bucket and join on (bucket, group) — each joined row
    // expands against one ≤cellSize list; the join key spreads a hot
    // bucket over its ng groups. Pair order is canonicalized by id
    // (structs compare by their first field).
    val rep = sized.select((keys :+ item.as("__x") :+
      explode(filter(sequence(lit(0L), col("__ng") - 1),
        gb => gb > col("__g"))).as("__g")): _*)
    val cross = rep
      .join(cells, keyCols :+ "__g")
      .select(explode(transform(col("__xs"), y =>
        when(col("__x") < y, struct(col("__x").as("a"), y.as("b")))
          .otherwise(struct(y.as("a"), col("__x").as("b"))))).as("__p"))

    within.unionByName(cross)
      .select(col("__p.a").as("a"), col("__p.b").as("b"))
  }
}
