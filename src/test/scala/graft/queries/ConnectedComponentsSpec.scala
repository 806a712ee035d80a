package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Connected-components label propagation: correctness on multi-
  * component graphs and the pointer-jumping round bound on a
  * path-shaped component (plain neighbor propagation needs
  * O(diameter) rounds — a long chain would blow any fixed cap).
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Run `f` with the local union-find arm disabled, so small test
    * graphs exercise the distributed pointer-jumping path.
    */
  private def forcingIterative[T](f: => T): T = {
    val saved = DedupOps.LocalCcMaxEdges
    DedupOps.LocalCcMaxEdges = 0L
    try f finally DedupOps.LocalCcMaxEdges = saved
  }

  test("multi-component graph: each vertex labeled with component min") {
    // components: {1,2,3}, {10,11}, {20} (isolated vertices never
    // appear in the pair set, so 20 is absent from the output)
    val pairs = Seq((2L, 3L), (1L, 2L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = DedupOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("property: random graphs match a driver-side union-find model") {
    val rnd = new scala.util.Random(7)
    (1 to 8).foreach { _ =>
      val nVerts = 2 + rnd.nextInt(40)
      val nEdges = 1 + rnd.nextInt(60)
      val pairs = (1 to nEdges).map { _ =>
        val a = 1L + rnd.nextInt(nVerts)
        val b = 1L + rnd.nextInt(nVerts)
        // doc_a < doc_b like LSH pairs; bump self-loops to a real edge
        if (a == b) (a, a + 1) else (math.min(a, b), math.max(a, b))
      }.distinct
      // driver-side union-find reference
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(v => v -> find(v)).toMap
      // both arms of the hybrid must equal the model: the one-task
      // union-find (the small-graph default) and the distributed
      // pointer-jumping fixpoint
      val got = DedupOps.connectedComponents(pairs.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"local arm: verts=$nVerts edges=${pairs.length}")
      val gotIter = forcingIterative(
        DedupOps.connectedComponents(pairs.toDF("doc_a", "doc_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
      assert(gotIter === expected, s"iterative arm: verts=$nVerts edges=${pairs.length}")
    }
  }

  test("jaccardVerify drops spurious band collisions, keeps real near-dups") {
    // (1,2) near-identical (Jaccard 4/5 = 0.8), (1,3) a spurious
    // collision (Jaccard 1/7) — verify-then-cluster must keep only
    // the first so 3 never transitively merges into cluster 1
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox leaps"),
      (3L, "completely unrelated text about turbines")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val kept = DedupOps.jaccardVerify(pairs, docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept === Set((1L, 2L)))
    val clusters = DedupOps.connectedComponents(
        DedupOps.jaccardVerify(pairs, docs, threshold = 0.5))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters === Map(1L -> 1L, 2L -> 1L)) // 3 not over-merged
  }

  test("reliable checkpoint dir: same labels through the Iteration seam") {
    // with a checkpoint dir configured, store.Iteration switches the
    // per-round pin from executor-local localCheckpoint to reliable
    // checkpoint() — labels must be identical
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      assert(spark.sparkContext.getCheckpointDir.isDefined)
      val pairs = Seq((2L, 3L), (1L, 2L), (10L, 11L)).toDF("doc_a", "doc_b")
      val got = forcingIterative(DedupOps.connectedComponents(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
      assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
      // reliable checkpoint files actually landed in the configured dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, "expected reliable checkpoint files under the dir")
    } finally {
      // restore the shared context's localCheckpoint path for every
      // later suite: there is no public unset, so clear the private
      // var reflectively and verify the restoration took
      val f = classOf[org.apache.spark.SparkContext].getDeclaredField("checkpointDir")
      f.setAccessible(true)
      f.set(spark.sparkContext, None)
      assert(spark.sparkContext.getCheckpointDir.isEmpty)
    }
  }

  test("path-shaped component of diameter 60 converges (pointer jumping)") {
    // chain 1-2-…-61: incrementally edited boilerplate is exactly this
    // shape; min label must traverse 60 hops — log-rounds with
    // jumping, impossible under a small fixed cap without it
    val chain = (1L to 60L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = forcingIterative(DedupOps.connectedComponents(chain).collect())
    assert(got.length === 61)
    assert(got.forall(_.getLong(1) === 1L))
  }

  test("cell-local union-find equals the global fixpoint on cell-partitioned graphs") {
    // SemDeDup's edge sets are in-cell by construction (candidates
    // come from one k-means cell), which is exactly what lets
    // cellComponents replace the iterative global CC with one
    // mapGroups pass — this pins the two bit-identical on random
    // graphs with that structure (disjoint vertex ranges per cell)
    val rnd = new scala.util.Random(11)
    (1 to 6).foreach { trial =>
      val edges = (0 until 4).flatMap { cell =>
        val base = cell * 1000L
        val nVerts = 2 + rnd.nextInt(30)
        val nEdges = 1 + rnd.nextInt(40)
        (1 to nEdges).map { _ =>
          val a = base + rnd.nextInt(nVerts)
          val b = base + rnd.nextInt(nVerts)
          if (a == b) (a, a + 1, cell.toLong)
          else (math.min(a, b), math.max(a, b), cell.toLong)
        }
      }.distinct
      val df = edges.toDF("doc_a", "doc_b", "cell")
      val global = DedupOps.connectedComponents(df.select("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val local = SimilarityOps.cellComponents(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local === global, s"trial=$trial")
    }
  }
}
