package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** contentFingerprint must be a pure function of the table's row
  * MULTISET — invariant under every layout decision the store makes
  * (row order, partitioning, compaction, z-order, bucketization),
  * and sensitive to any single-row or duplicate-row change. That
  * combination is what makes it a release-reproducibility check:
  * equal fingerprints across two exports mean equal data, whatever
  * the files look like.
  */
class FingerprintSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): TableStore =
    new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-fp").toString)

  private def rows = (0 until 500).map(i => (i.toLong, s"v$i", i % 7))

  test("invariant under row order, partitioning, and column order") {
    val a = freshStore()
    a.overwrite("t", rows.toDF("id", "v", "g"))
    val fpA = a.contentFingerprint("t")
    assert(fpA._1 === 500L)

    val b = freshStore()
    b.overwrite("t", scala.util.Random.shuffle(rows).toDF("id", "v", "g")
      .repartition(17))
    assert(b.contentFingerprint("t") === fpA)

    // different on-disk column order, same data → same fingerprint
    // (default col list is name-sorted)
    val c = freshStore()
    c.overwrite("t", rows.toDF("id", "v", "g").select("g", "id", "v"))
    assert(c.contentFingerprint("t") === fpA)
  }

  test("sensitive to a changed row AND to a duplicated row") {
    val base = freshStore()
    base.overwrite("t", rows.toDF("id", "v", "g"))
    val fp = base.contentFingerprint("t")

    val changed = freshStore()
    changed.overwrite("t",
      (rows.take(250) ++ Seq((250L, "TAMPERED", 250 % 7)) ++ rows.drop(251))
        .toDF("id", "v", "g"))
    assert(changed.contentFingerprint("t") !== fp)

    // a duplicated row changes the multiset — the xor-hash blind spot
    // the wrapping SUM exists to catch
    val duped = freshStore()
    duped.overwrite("t", (rows ++ rows.take(1)).toDF("id", "v", "g"))
    val fpD = duped.contentFingerprint("t")
    assert(fpD._1 === 501L)
    assert(fpD._2 !== fp._2)
  }

  test("null position matters: (5, null) and (null, 5) fingerprint differently") {
    // Spark's hash expressions skip null children, so without the
    // interleaved null flags these two tables would collide — the
    // exact "value migrated between nullable columns" release bug
    // the check exists to catch
    val a = freshStore()
    a.overwrite("t", Seq((Some(5L), None: Option[Long])).toDF("p", "q"))
    val b = freshStore()
    b.overwrite("t", Seq((None: Option[Long], Some(5L))).toDF("p", "q"))
    assert(a.contentFingerprint("t")._2 !== b.contentFingerprint("t")._2)
  }

  test("layout rewrites preserve the fingerprint (compact, z-order, bucketize)") {
    val store = freshStore()
    store.overwrite("t", rows.toDF("id", "v", "g").repartition(40))
    val fp = store.contentFingerprint("t")
    store.compact("t")
    assert(store.contentFingerprint("t") === fp)
    store.compactZorder("t", Seq("id", "g"), bits = 9)
    assert(store.contentFingerprint("t") === fp)
    // bucketize adds pk_bucket, which the default column list excludes
    // as a layout artifact — flat and bucketized fingerprints compare
    // directly
    store.bucketize("t", Seq("id"), 4)
    assert(store.contentFingerprint("t") === fp)
  }
}
