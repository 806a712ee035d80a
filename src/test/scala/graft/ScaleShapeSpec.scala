package graft

/** Scale-shape regression guard: the dedup family's 100 TB argument is
  * a SHAPE claim — shuffled bytes grow (at most) linearly in the input,
  * because candidate generation is bucketed/blocked (PairExpansion),
  * never all-pairs. SCALING.md argues it in prose; this spec MEASURES
  * it: run each query at two scale factors (sf0.01 → sf0.1, a 10×
  * row ratio), sum the actual task-level shuffle-write bytes through
  * [[TaskMetricsProbe]], and pin the growth exponent
  *
  *   α = log(bytes_hi / bytes_lo) / log(rows_hi / rows_lo)
  *
  * to ≤ 1.35 (linear plus log-factor/constant slack; a quadratic
  * pair-blowup shows up as α ≈ 2 and fails loudly). Fixed per-query
  * overheads (broadcast stats, metadata aggregates) only DEFLATE α,
  * so the bound cannot be satisfied by accident of small inputs.
  *
  * Uses the driver-generated testdata (TESTDATA.md); the suite
  * cancels, not passes, when it is absent.
  */
class ScaleShapeSpec extends SparkSpec {

  private val lo = "/root/testdata/sf0.01"
  private val hi = "/root/testdata/sf0.1"

  private def available: Boolean =
    new java.io.File(lo).isDirectory && new java.io.File(hi).isDirectory

  private def rows(dir: String, table: String): Long =
    spark.read.parquet(s"$dir/$table.parquet").count()

  private def shuffleWriteBytes(name: String, dir: String): Long =
    TaskMetricsProbe.measure(spark) {
      SparkEntry.queries(name)(spark, dir).count(); ()
    }.shuffleWriteBytes

  private def pinAlpha(probes: Seq[(String, String)], blame: String): Unit = {
    val exponents = probes.map { case (name, table) =>
      val rLo = rows(lo, table)
      val rHi = rows(hi, table)
      val bLo = shuffleWriteBytes(name, lo)
      val bHi = shuffleWriteBytes(name, hi)
      assert(bLo > 0, s"$name shuffled nothing at sf0.01 — probe broken?")
      assert(rHi > rLo, s"testdata row counts not increasing for $table")
      val alpha =
        math.log(bHi.toDouble / bLo) / math.log(rHi.toDouble / rLo)
      info(f"$name%-18s rows $rLo%7d→$rHi%8d  shuffleWrite " +
        f"${bLo / 1024}%8d KiB→${bHi / 1024}%9d KiB  α=$alpha%.2f")
      name -> alpha
    }
    val offenders = exponents.filter(_._2 > 1.35)
    assert(offenders.isEmpty,
      s"super-linear shuffle growth (α > 1.35) — $blame: " +
        offenders.map { case (n, a) => f"$n α=$a%.2f" }.mkString(", "))
  }

  test("dedup-family shuffle volume grows ≤ ~linearly from sf0.01 to sf0.1") {
    assume(available, s"driver testdata missing at $lo / $hi")
    // (query, driving table) — the table whose row count scales the work
    pinAlpha(Seq(
      "q_semantic_dedup" -> "embeddings",
      "q_near_dup_pairs" -> "documents",
      "q_passage_dedup" -> "documents",
      "q_ngram_novelty" -> "documents"),
      "a pair-expansion or join-back is leaking quadratic volume")
  }

  test("SQL DML shuffle volume grows ≤ ~linearly in the source batch " +
    "from sf0.01 to sf0.1") {
    assume(available, s"driver testdata missing at $lo / $hi")
    // the full statement path: scratch-store build + the MERGE's one
    // right-outer join + the FUSED guard aggregate (cardinality +
    // duplicate-pk in one action) + bucketed upsert/cascade. A guard
    // that recomputed the join per rule, or a join that went O(table ×
    // batch), would surface as α well above linear.
    pinAlpha(Seq(
      "q_update_where" -> "customer",
      "q_merge_upsert" -> "orders",
      "q_delete_where" -> "customer",
      "q_cdc_multi" -> "customer",
      // the composable-MATCH path: CTAS + index-from-birth postings
      // build + the TVF's token-pruned semi-join + facet — a postings
      // expansion or an unpruned MATCH side would surface here
      "q_fts_sql" -> "documents"),
      "a DML guard, merge join, delete cascade, or MATCH semi-join " +
        "is leaking super-linear volume")
  }

  test("ANN/similarity-family shuffle volume grows ≤ ~linearly " +
    "from sf0.01 to sf0.1") {
    assume(available, s"driver testdata missing at $lo / $hi")
    // the train (k-means/codebooks) + encode + probe compositions:
    // every stage shuffles O(rows) (assignments, code rows, top-k
    // exchanges) — a candidate blowup (cell skew, unpruned probe)
    // would surface as α → 2
    pinAlpha(Seq(
      "q_cosine_topk" -> "embeddings",
      "q_ann_lsh_topk" -> "embeddings",
      "q_ann_ivfpq_topk" -> "embeddings",
      "q_embed_diversity" -> "embeddings"),
      "a candidate-generation or train stage is leaking " +
        "super-linear volume")
  }
}
