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

  test("multi-component graph: each vertex labeled with component min") {
    // components: {1,2,3}, {10,11}, {20} (isolated vertices never
    // appear in the pair set, so 20 is absent from the output)
    val pairs = Seq((2L, 3L), (1L, 2L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = DedupOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("path-shaped component of diameter 60 converges (pointer jumping)") {
    // chain 1-2-…-61: incrementally edited boilerplate is exactly this
    // shape; min label must traverse 60 hops — log-rounds with
    // jumping, impossible under a small fixed cap without it
    val chain = (1L to 60L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = DedupOps.connectedComponents(chain).collect()
    assert(got.length === 61)
    assert(got.forall(_.getLong(1) === 1L))
  }
}
