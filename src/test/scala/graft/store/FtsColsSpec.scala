package graft.store

import graft.SparkSpec

/** Multi-column FTS (the reference's users index spans
  * name/screen_name/description/location, utils.py:352): bare terms
  * match in any column, AND is row-level across columns, phrases and
  * NEAR never span columns (per-column position spaces), `col:term`
  * filters restrict to one column, and the fcol layout maintains
  * incrementally with correct corpus stats.
  */
class FtsColsSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): TableStore =
    new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-ftsc").toString)

  test("multi-column MATCH: cross-column AND, in-column phrase/NEAR, col: filters") {
    val store = freshStore()
    val users = Seq(
      (1L, "Simon Willison", "datasette creator writes python"),
      (2L, "Nat Python", "builds owl websites"),
      (3L, "Cleo Dog", "python hater simon fan")).toDF("id", "name", "description")
    Fts.upsertWithIndexCols(store, "users", users, "id", Seq("name", "description"))

    def hits(q: String): Set[Long] =
      Fts.search(spark, store, "users", q).collect().map(_.getLong(0)).toSet

    // a bare term matches in ANY column; AND is row-level (may span)
    assert(hits("python") === Set(1L, 2L, 3L))
    assert(hits("simon python") === Set(1L, 3L))
    // col: restricts to one column
    assert(hits("name:python") === Set(2L))
    assert(hits("description:python") === Set(1L, 3L))
    assert(hits("name:simon") === Set(1L)) // doc 3 has simon only in description
    assert(hits("name:pyth*") === Set(2L)) // col-filtered prefix
    assert(hits("description:\"python hater\"") === Set(3L)) // col-filtered phrase
    // phrases and NEAR never span columns (doc 1: willison ends name,
    // datasette starts description)
    assert(hits("\"willison datasette\"") === Set.empty)
    assert(hits("NEAR(willison datasette, 3)") === Set.empty)
    assert(hits("NEAR(simon fan, 3)") === Set(3L)) // in-column proximity
    // boolean composition with col filters
    assert(hits("name:python OR description:creator") === Set(1L, 2L))
    assert(hits("python NOT name:dog") === Set(1L, 2L))
    // ranked search honors the filter and never double-counts a doc
    val ranked = Fts.searchRanked(spark, store, "users", "description:python")
      .collect()
    assert(ranked.map(_.getLong(0)).toSet === Set(1L, 3L))
    assert(ranked.map(_.getLong(0)).distinct.length === ranked.length)
    // unknown column is an error (FTS5 parity), not an empty set
    intercept[IllegalArgumentException] {
      Fts.search(spark, store, "users", "nosuch:python").collect()
    }
  }

  test("{col1 col2}: multi-column filters and per-column ^ anchors") {
    val store = freshStore()
    val users = Seq(
      (1L, "python tools", "great site"),
      (2L, "other", "python heavy"),
      (3L, "misc", "about python tools")).toDF("id", "name", "description")
    Fts.upsertWithIndexCols(store, "users", users, "id",
      Seq("name", "description"))

    def hits(q: String): Set[Long] =
      Fts.search(spark, store, "users", q).collect().map(_.getLong(0)).toSet

    assert(hits("{name description}:python") === Set(1L, 2L, 3L))
    assert(hits("{name}:python") === Set(1L))
    assert(hits("{description name}:\"python tools\"") === Set(1L, 3L))
    // anchors are per-column position spaces
    assert(hits("^python") === Set(1L, 2L)) // position 0 of ANY column
    assert(hits("name:^python") === Set(1L))
    assert(hits("description:^python") === Set(2L))
    assert(hits("{name description}:^python") === Set(1L, 2L))
    // unknown column inside braces errors like the single form
    intercept[IllegalArgumentException] {
      Fts.search(spark, store, "users", "{name nosuch}:python").collect()
    }
    intercept[IllegalArgumentException] {
      Fts.search(spark, store, "users", "{name").collect()
    }
  }

  test("per-column BM25 weights re-rank (FTS5 bm25(fts, w1, w2))") {
    val store = freshStore()
    val users = Seq(
      (1L, "python tools", "writes about other things entirely"),
      (2L, "someone else", "python python python enthusiast page")
    ).toDF("id", "name", "description")
    Fts.upsertWithIndexCols(store, "users", users, "id",
      Seq("name", "description"))

    def order(weights: Map[String, Double]): Seq[Long] =
      Fts.searchRanked(spark, store, "users", "python",
        colWeights = weights).collect().map(_.getLong(0)).toSeq

    // unweighted: doc 2's tf=3 in a short-ish description outranks
    val base = order(Map.empty)
    assert(base === Seq(2L, 1L))
    // heavy name weight flips the ranking; heavy description keeps it
    assert(order(Map("name" -> 10.0)) === Seq(1L, 2L))
    assert(order(Map("description" -> 10.0)) === Seq(2L, 1L))
    // weights never change the MATCH set
    assert(order(Map("name" -> 10.0)).toSet === base.toSet)
    // unknown column / single-column layout are errors
    intercept[IllegalArgumentException] {
      order(Map("nosuch" -> 2.0))
    }
    val store2 = freshStore()
    Fts.upsertWithIndex(store2, "tweets",
      Seq((1L, "python")).toDF("id", "full_text"), "id", "full_text")
    intercept[IllegalArgumentException] {
      Fts.searchRanked(spark, store2, "tweets", "python",
        colWeights = Map("full_text" -> 2.0)).collect()
    }
  }

  test("col filter on a single-column index is rejected") {
    val store = freshStore()
    val docs = Seq((1L, "spark streams")).toDF("id", "full_text")
    Fts.upsertWithIndex(store, "tweets", docs, "id", "full_text")
    intercept[IllegalArgumentException] {
      Fts.search(spark, store, "tweets", "full_text:spark").collect()
    }
  }

  test("multi-column bucketed incremental maintenance keeps stats correct") {
    val store = freshStore()
    val users = Seq(
      (1L, "alpha beta", "gamma"),
      (2L, "delta", "epsilon zeta")).toDF("id", "name", "description")
    Fts.upsertWithIndexCols(store, "users", users, "id",
      Seq("name", "description"), buckets = 4)
    val st0 = store.read(Fts.statsName("users")).head
    assert(st0.getAs[Long]("n_docs") === 2L) // docs counted once, not per column
    assert(st0.getAs[Long]("total_dl") === (2 + 1) + (1 + 2))

    Fts.upsertWithIndexCols(store, "users",
      Seq((1L, "eta", "theta iota kappa")).toDF("id", "name", "description"),
      "id", Seq("name", "description"), buckets = 4)
    val st = store.read(Fts.statsName("users")).head
    assert(st.getAs[Long]("n_docs") === 2L)
    assert(st.getAs[Long]("total_dl") === (1 + 3) + (1 + 2))

    def hits(q: String): Set[Long] =
      Fts.search(spark, store, "users", q).collect().map(_.getLong(0)).toSet
    assert(hits("alpha") === Set.empty) // old postings replaced
    assert(hits("name:eta") === Set(1L))
    assert(hits("description:kappa") === Set(1L))
    assert(hits("delta") === Set(2L)) // untouched doc intact
  }

  test("single -> multi column layout switch rebuilds the index once") {
    val store = freshStore()
    Fts.upsertWithIndex(store, "users",
      Seq((1L, "old words")).toDF("id", "name"), "id", "name")
    // switch to two indexed columns: wholesale rebuild from base+batch
    Fts.upsertWithIndexCols(store, "users",
      Seq((2L, "fresh", "second column text")).toDF("id", "name", "description")
        .unionByName(Seq((1L, "old words")).toDF("id", "name")
          .withColumn("description",
            org.apache.spark.sql.functions.lit("migrated"))),
      "id", Seq("name", "description"))
    def hits(q: String): Set[Long] =
      Fts.search(spark, store, "users", q).collect().map(_.getLong(0)).toSet
    assert(hits("name:old") === Set(1L))
    assert(hits("description:migrated") === Set(1L))
    assert(hits("description:second") === Set(2L))
  }
}
