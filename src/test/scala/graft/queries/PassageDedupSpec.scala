package graft.queries

import graft.SparkSpec

/** Passage-level duplication census (DedupOps.passageDedupOf):
  * a doc's distinct word-8-grams are its passages; a passage is
  * duplicated iff some OTHER doc also contains it. Within-doc
  * repetition alone must not count, short docs have no passages,
  * and counts are over DISTINCT per-doc grams.
  */
class PassageDedupSpec extends SparkSpec {
  import spark.implicits._

  test("cross-doc passages count; within-doc repeats and short docs don't") {
    val docs = Seq(
      // 10 tokens -> grams abcdefgh, bcdefghi, cdefghij
      1L -> "a b c d e f g h i j",
      // shares exactly "a b c d e f g h" with doc 1
      2L -> "x a b c d e f g h y",
      // unique 8 tokens -> 1 private gram, excluded (n_dup = 0)
      3L -> "p q r s t u v w",
      // one DISTINCT gram repeated within the doc; shared with doc 6
      4L -> "m m m m m m m m m m m m",
      // 7 tokens -> no passages at all
      5L -> "a b c d e f g",
      6L -> "m m m m m m m m m m m m")
    val got = DedupOps.passageDedupOf(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got === Seq(
      (1L, 3L, 1L, 1.0 / 3.0),
      (2L, 3L, 1L, 1.0 / 3.0),
      (4L, 1L, 1L, 1.0),
      (6L, 1L, 1L, 1.0)))
  }
}
