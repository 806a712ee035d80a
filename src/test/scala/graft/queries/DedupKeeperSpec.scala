package graft.queries

import graft.SparkSpec

/** q_dedup_keep_best's keeper policy (max n_chars, lowest doc_id on
  * ties) must hold for ANY id domain: the r11 arithmetic packing
  * (n_chars*1e8 − doc_id) silently let ids past 1e8 outrank the
  * quality term — exactly the billion-document corpora the engine
  * targets. The struct-ordered max_by cannot flip; this spec pins it
  * against a sort-based model over adversarial ids.
  */
class DedupKeeperSpec extends SparkSpec {
  import spark.implicits._

  test("keeper matches the sort-based model for billion-scale doc ids") {
    val rnd = new scala.util.Random(12)
    val rows = (0 until 400).map { _ =>
      val fp = s"fp${rnd.nextInt(40)}"
      // nonnegative ids across the FULL int64 domain (documents carry
      // nonnegative ids; far beyond the old 1e8 packing bound)
      val id = rnd.nextLong() & Long.MaxValue
      // few distinct lengths force tiebreaks
      (id, rnd.nextInt(5).toLong, fp)
    }
    val got = DedupOps.keepBestOf(rows.toDF("doc_id", "n_chars", "fp"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val model = rows.groupBy(_._3).map { case (fp, g) =>
      val keeper = g.minBy(t => (-t._2, t._1))
      (fp, keeper._1, g.map(_._2).max, g.size.toLong)
    }.toSet
    assert(got === model)
  }

  test("the r11 regression shape: a huge-id long doc beats a small-id short one") {
    val adv = Seq((200000001L, 50L, "x"), (7L, 10L, "x"))
      .toDF("doc_id", "n_chars", "fp")
    val r = DedupOps.keepBestOf(adv).head
    assert(r.getLong(1) === 200000001L, "quality dominance flipped by the id term")
    assert(r.getLong(2) === 50L)
  }
}
