package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Giant-cell auto-split for semantic dedup: a corpus whose embedding
  * mass collapses into one k-means cell used to hand PairExpansion a
  * quadratic task and cellComponents an unbounded parent map, with
  * "use more centroids" as the documented operator escape. The split
  * must bound both WITHOUT changing the answer on data whose similar
  * groups are tight (the SemDeDup regime: near-duplicates cluster far
  * tighter than the edge threshold).
  *
  * Geometry (48 dims): seeds 0..15 are basis vectors; 270 members in
  * 30 tight groups of 9 all point near seed 3 (direction
  * e3 + 3.3·e(16+g), tiny per-member noise), so >90% of the corpus
  * lands in ONE cell, while cosine is ~0.9999 within a group, 0.084
  * across groups, and 0.29 member-to-seed — only within-group pairs
  * clear the 0.3 edge threshold, so the split (which keeps tight
  * groups intact by construction) preserves the edge set exactly.
  */
class SemanticSplitSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 48
  private val groups = 30
  private val perGroup = 9

  private def basis(i: Int): Array[Double] = {
    val a = Array.fill(dims)(0.0); a(i) = 1.0; a
  }

  private def member(id: Int): Array[Double] = {
    val g = (id - 16) % groups
    val v = basis(3)
    v(16 + g) = 3.3
    // per-id noise: every member distinct, so THIS corpus exercises
    // the split path alone (the exact-dup collapse has its own test)
    v(47) += 0.0001 * (id - 16)
    v
  }

  private lazy val emb = {
    val seeds = (0 until 16).map(i => (i.toLong, basis(i).toSeq))
    val members = (16 until 16 + groups * perGroup)
      .map(id => (id.toLong, member(id).toSeq))
    (seeds ++ members).toDF("vec_id", "embedding")
  }

  private def edgeSet(maxCell: Int): Set[(Long, Long)] =
    SimilarityOps.semanticEdgesOf(emb, maxCell)
      .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .collect().map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet

  private def comps(maxCell: Int): Map[Long, Long] =
    SimilarityOps.cellComponents(
        SimilarityOps.semanticEdgesOf(emb, maxCell))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("the 90%-mass cell is split; components are identical; task peak is bounded") {
    // the skew is real: unsplit, one cell holds 271 of 286 vectors
    val unsplitEdges = edgeSet(maxCell = 100000)
    val unsplitComps = comps(maxCell = 100000)
    val unsplitPeak = SimilarityOps.lastCcPeak.get.value
    assert(unsplitPeak === (groups * perGroup).toLong,
      s"expected the giant cell's full vertex set in one task, got $unsplitPeak")

    // split at 20: same edges, same components, bounded tasks
    assert(edgeSet(maxCell = 20) === unsplitEdges,
      "the auto-split changed the candidate edge set")
    val splitComps = comps(maxCell = 20)
    val splitPeak = SimilarityOps.lastCcPeak.get.value
    assert(splitComps === unsplitComps)
    assert(splitPeak <= 20L,
      s"auto-split left a union-find task holding $splitPeak vertices")

    // both agree with the global distributed fixpoint AND the model:
    // each tight group is one component, representative = min id
    val fixpoint = DedupOps.connectedComponents(
        SimilarityOps.semanticEdgesOf(emb, 20).select("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(splitComps === fixpoint)
    val model = (16 until 16 + groups * perGroup)
      .map(id => id.toLong -> (16L + (id - 16) % groups)).toMap
    assert(splitComps === model)
  }

  test("a cell of identical vectors collapses to linear edges, answer intact") {
    // 64 bit-identical copies of one direction (+16 seed spread): no
    // clustering can split them — the exact-dup collapse must bound
    // the pair step instead (1 verified rep pair + 63 dup edges, not
    // the 2080 quadratic pairs the raw cell implies)
    val dup = ((0 until 16).map(i => (i.toLong, basis(i).toSeq)) ++
      (16 until 80).map(id => (id.toLong, basis(3).map(_ * 2.0).toSeq)))
      .toDF("vec_id", "embedding")
    val edges = SimilarityOps.semanticEdgesOf(dup, maxCellSize = 8)
    assert(edges.count() === 64L,
      "identical-vector cell generated a quadratic pair set")
    val cc = SimilarityOps.cellComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // seed 3 (cos 1 to every copy) joins the duplicates' component
    assert(cc.keySet === (Set(3L) ++ (16L until 80L).toSet))
    assert(cc.values.toSet === Set(3L))
  }
}
