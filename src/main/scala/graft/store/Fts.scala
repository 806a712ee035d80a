package graft.store

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.Transforms

/** Full-text search (SURVEY.md §4.3.2): SQLite FTS5 shadow tables
  * (`/root/reference/utils.py:330-332, 352`) re-expressed as a derived
  * inverted-index table `<table>_fts(pk, token, tf, dl, positions)`
  * maintained alongside the base table, queried by token equi-join.
  * Covers the FTS5 `MATCH` surface the reference exposes:
  *
  *  - AND-of-terms (`spark window`)
  *  - quoted phrases (`"spark window"` — positional verify against the
  *    per-posting position list, FTS5's poslist analog)
  *  - trailing-`*` prefix terms (`spar*` — a `startsWith` range
  *    predicate on the token column, pushed to the parquet scan)
  *  - proximity (`NEAR(spark window, 5)` — positional span check over
  *    the same poslists, either order, FTS5's default n=10)
  *  - relevance order (`searchRanked`, BM25 — FTS5's default `rank`)
  *
  * The reference keeps the index fresh with sync triggers; here the
  * index rebuild rides the same upsert batch (rebuild-of-affected-keys
  * — the index rows for an upserted pk are replaced wholesale), and the
  * corpus-level stats BM25 needs (doc count, mean doc length) are
  * persisted ONCE per index build into `<table>_fts_stats` — the FTS5
  * docsize/stat shadow-table analog — so ranked search never
  * re-aggregates the full postings table in the query hot path.
  *
  * Scale: the index is a (token, pk) table, so a term lookup is a
  * pruned scan + semi-join; multi-term AND is an intersection of
  * per-term pk sets done as a groupBy count filter — one shuffle, no
  * quadratic step. A phrase adds one ≤1-row-per-pk equi-join per phrase
  * word over the already-token-pruned postings; corpus stats ride a
  * broadcast of the 1-row stats table.
  */
object Fts {

  def indexName(table: String): String = s"${table}_fts"

  /** 1-row corpus stats `(n_docs, avgdl)` — FTS5 keeps the same in its
    * docsize/stat shadow tables, computed at write time not query time.
    */
  def statsName(table: String): String = s"${table}_fts_stats"

  /** Build/refresh index rows for a batch of (pk, text): one posting
    * per (pk, token) carrying the term frequency, the document's token
    * count, and the sorted token positions (FTS5's poslist) — the
    * per-document stats BM25 and phrase verification need, computed
    * once at index time.
    */
  def indexRows(batch: DataFrame, pkCol: String, textCol: String): DataFrame =
    batch
      .select(col(pkCol).as("pk"), Transforms.tokens(col(textCol)).as("toks"))
      .select(col("pk"), size(col("toks")).cast("long").as("dl"),
        posexplode(col("toks")).as(Seq("pos", "token")))
      .groupBy(col("pk"), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf"), sort_array(collect_list(col("pos"))).as("positions"))
      .select(col("pk"), col("token"), col("tf"), col("dl"), col("positions"))

  /** Partition column of the bucketed postings layout. */
  private val BucketCol = "pk_bucket"

  private def bucketOf(pk: Column, buckets: Int): Column =
    pmod(xxhash64(pk), lit(buckets.toLong))

  /** Upsert base rows AND their index rows: delete-and-replace the
    * index entries of every pk in the batch (trigger analog), then
    * refresh the persisted corpus stats.
    *
    * `buckets = 0` (default) keeps the postings as one unpartitioned
    * table, rewritten wholesale per batch — fine while the index is
    * small. `buckets > 0` lays the postings out Hive-partitioned by a
    * pk hash (`pk_bucket`) and maintains them with DYNAMIC PARTITION
    * OVERWRITE: a batch rewrites only the ≤|batch| buckets containing
    * its pks, so index maintenance is O(batch), not O(corpus) — the
    * scale path for a 100 TB index (a lakehouse MERGE would replace
    * exactly this seam with transactional semantics). Rows are sorted
    * by token within each written file so term lookups prune row
    * groups via parquet min/max stats even though the partitioning key
    * is the pk hash. Corpus stats update INCREMENTALLY on this path
    * (counts/totals ± the replaced and fresh docs — FTS5's docsize
    * bookkeeping), never rescanning the index. Switching layouts (or
    * migrating a pre-positions index) rebuilds wholesale once.
    */
  def upsertWithIndex(
      store: TableStore,
      table: String,
      batch: DataFrame,
      pkCol: String,
      textCol: String,
      buckets: Int = 0): Unit = {
    // Index FIRST, base table second: `batch` may lazily reference the
    // base table's current parquet files (e.g. a reindex of the table
    // itself), and TableStore's write-swap deletes them — any plan
    // still pointing at the old files would fail afterwards.
    val fresh = indexRows(batch, pkCol, textCol)
    val existing = store.readIfExists(indexName(table))
    val existingBucketed = existing.exists(_.columns.contains(BucketCol))

    existing match {
      // incremental only when the caller's bucket count MATCHES the
      // one the index was built with (persisted in the stats row):
      // filtering old partitions by buckets computed mod a different N
      // would silently leave stale postings behind — a mismatch falls
      // through to the wholesale rebuild below instead
      case Some(ex) if ex.columns.contains("positions") &&
          existingBucketed && buckets > 0 &&
          statsBucketCount(store, table).contains(buckets) =>
        val batchPks = batch.select(col(pkCol).as("pk")).distinct()
        // affected buckets derive from the BATCH pks (not from fresh
        // postings): a doc re-upserted with empty text has no fresh
        // rows but its old postings must still be cleared
        val affected = batchPks.select(bucketOf(col("pk"), buckets).as("b"))
          .distinct().collect().map(_.getLong(0)).toSeq
        val exAffected = ex.filter(col(BucketCol).isin(affected: _*))
        // incremental stats deltas read the OLD index — before any write
        val (oldN, oldDl) = statsTotals(store, table, ex)
        val (outN, outDl) = docTotals(
          exAffected.join(batchPks, Seq("pk"), "left_semi"))
        val (inN, inDl) = docTotals(fresh)
        // materialize severs the plan's dependency on the files the
        // dynamic overwrite is about to replace (in-place, no swap)
        val merged = Iteration.materialize(
          exAffected.join(batchPks, Seq("pk"), "left_anti")
            .drop(BucketCol)
            .unionByName(fresh)
            .withColumn(BucketCol, bucketOf(col("pk"), buckets))
            .repartition(col(BucketCol))
            .sortWithinPartitions(col("token")))
        store.overwritePartitions(indexName(table), merged, Seq(BucketCol))
        // a bucket whose merged content is empty is absent from the
        // dynamic overwrite — clear its stale partition explicitly
        val stillThere = merged.select(col(BucketCol)).distinct()
          .collect().map(_.getLong(0)).toSet
        affected.filterNot(stillThere).foreach(b =>
          store.dropPartition(indexName(table), BucketCol, b.toString))
        writeStats(store, table, oldN - outN + inN, oldDl - outDl + inDl, buckets)

      case _ =>
        // (re)build wholesale: first index of this table, a layout
        // switch (bucketed <-> flat), or a pre-positions migration
        val flat = existing match {
          case Some(ex) if !ex.columns.contains("positions") =>
            // pre-positions index layout ((pk, token) or (pk, token,
            // tf, dl)): a union would fail to resolve the new columns,
            // so rebuild the postings wholesale from the post-upsert
            // base table (the text lives there)
            indexRows(Upsert.upsert(store.readIfExists(table), batch, Seq(pkCol))
              .select(col(pkCol), col(textCol)), pkCol, textCol)
          case Some(ex) =>
            // drop all index rows of the re-upserted pks, then add fresh
            ex.drop(BucketCol)
              .join(batch.select(col(pkCol).as("pk")).distinct(), Seq("pk"), "left_anti")
              .unionByName(fresh)
          case None => fresh
        }
        if (buckets > 0)
          store.overwrite(indexName(table),
            flat.withColumn(BucketCol, bucketOf(col("pk"), buckets))
              .repartition(col(BucketCol))
              .sortWithinPartitions(col("token")),
            partitionBy = Seq(BucketCol))
        else store.overwrite(indexName(table), flat)
        // corpus stats from the fresh index: one scan at write time —
        // the price FTS5 pays in its docsize table — so ranked queries
        // read a broadcast 1-row table instead of re-aggregating
        val (n, dl) = docTotals(store.read(indexName(table)))
        writeStats(store, table, n, dl, buckets)
    }
    store.upsert(table, batch, Seq(pkCol))
  }

  /** (distinct docs, summed dl) of a postings slice — dl is constant
    * per pk, so the distinct collapses to one row per doc.
    */
  private def docTotals(postings: DataFrame): (Long, Long) = {
    val r = postings.select(col("pk"), col("dl")).distinct()
      .agg(count(lit(1)), sum(col("dl"))).head
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Current (n_docs, total_dl); legacy stats rows without total_dl
    * (or no stats table) recompute once from the index.
    */
  private def statsTotals(store: TableStore, table: String, idx: DataFrame): (Long, Long) =
    store.readIfExists(statsName(table)) match {
      case Some(st) if st.columns.contains("total_dl") =>
        val r = st.select(col("n_docs"), col("total_dl")).head
        (r.getLong(0), r.getLong(1))
      case _ => docTotals(idx)
    }

  /** Bucket count the index was built with, from the stats row
    * (0 = flat layout; None = no/legacy stats).
    */
  private def statsBucketCount(store: TableStore, table: String): Option[Int] =
    store.readIfExists(statsName(table)).flatMap { st =>
      if (st.columns.contains("n_buckets"))
        Some(st.select(col("n_buckets")).head.getInt(0))
      else None
    }

  private def writeStats(
      store: TableStore, table: String, nDocs: Long, totalDl: Long, buckets: Int): Unit = {
    val spark = store.spark
    import spark.implicits._
    store.overwrite(statsName(table),
      Seq((nDocs, totalDl, buckets)).toDF("n_docs", "total_dl", "n_buckets")
        .withColumn("avgdl",
          when(col("n_docs") > 0,
            col("total_dl").cast("double") / col("n_docs").cast("double"))))
  }

  // --- query parsing (FTS5 MATCH subset) -------------------------------

  private[store] sealed trait Term
  private[store] case class Plain(tok: String) extends Term
  private[store] case class PrefixTerm(pre: String) extends Term
  private[store] case class Phrase(toks: Seq[String]) extends Term
  private[store] case class Near(a: String, b: String, n: Int) extends Term

  private def tokenize(s: String): Seq[String] =
    s.toLowerCase(java.util.Locale.ROOT).split("\\W+").filter(_.nonEmpty).toSeq

  /** Parse the FTS5 MATCH subset: `"quoted phrase"`, `prefix*`,
    * `NEAR(a b, n)` (two single-token operands — the common form; n
    * defaults to FTS5's 10), bare terms — all implicitly ANDed (FTS5's
    * default connective). A one-word quoted phrase degrades to a plain
    * term; a `*` after a multi-token unit applies to the last token
    * (FTS5 parses `ab-cd*` as a phrase with a prefix tail — same
    * containment semantics here since all terms AND). FTS5's boolean
    * operators (OR, NOT, column filters) are NOT parsed — uppercase OR
    * degrades to the token `or`, like a tokenizer would see it.
    */
  private[store] def parseQuery(query: String): Seq[Term] = {
    // quoted phrases FIRST: a NEAR(...) inside quotes is phrase
    // content (FTS5 tokenizes it), not a proximity operator
    val quoted = "\"([^\"]*)\"".r
    val phraseOnly = quoted.findAllMatchIn(query).map(_.group(1)).flatMap { p =>
      tokenize(p) match {
        case Seq()  => Seq.empty[Term]
        case Seq(w) => Seq(Plain(w))
        case ws     => Seq(Phrase(ws))
      }
    }.toSeq
    val afterQuotes = quoted.replaceAllIn(query, " ")
    val near = """NEAR\(([^,)]+)(?:,\s*(\d+))?\)""".r
    val nearTerms = near.findAllMatchIn(afterQuotes).flatMap { m =>
      val n = Option(m.group(2)).map { g =>
        try g.toInt
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(s"NEAR distance out of range: $g") }
      }.getOrElse(10)
      require(n >= 0 && n < Int.MaxValue - 1, s"NEAR distance out of range: $n")
      if (m.group(1).contains("*"))
        throw new IllegalArgumentException(
          s"NEAR operands must be plain tokens (no prefix *): ${m.group(1)}")
      tokenize(m.group(1)) match {
        case Seq(a, b) => Seq(Near(a, b, n))
        case Seq(w)    => Seq(Plain(w)) // degenerate: NEAR of one term
        case ws        =>
          throw new IllegalArgumentException(
            s"NEAR supports two single-token operands, got: ${ws.mkString(" ")}")
      }
    }.toSeq
    val phraseTerms = phraseOnly ++ nearTerms
    val rest = near.replaceAllIn(afterQuotes, " ")
    val bareTerms = rest.split("\\s+").filter(_.nonEmpty).toSeq.flatMap { unit =>
      if (unit.endsWith("*"))
        tokenize(unit.dropRight(1)) match {
          case Seq()           => Seq.empty[Term]
          case ws :+ last      => ws.map(Plain.apply) :+ PrefixTerm(last)
        }
      else tokenize(unit).map(Plain.apply)
    }
    (phraseTerms ++ bareTerms).distinct
  }

  /** pks whose token stream contains `ws` consecutively: equi-join the
    * per-word postings (≤1 row per pk each — (pk, token) is unique),
    * then verify positions by shift-and-intersect: positions where the
    * phrase prefix ending at word i matches = (prev matches + 1) ∩
    * positions(word i). All word scans are token-pruned.
    */
  private def phrasePks(idx: DataFrame, ws: Seq[String]): DataFrame = {
    val parts = ws.zipWithIndex.map { case (w, i) =>
      idx.filter(col("token") === w).select(col("pk"), col("positions").as(s"__p$i"))
    }
    val joined = parts.reduce((a, b) => a.join(b, Seq("pk")))
    val ends = (1 until ws.size).foldLeft(col("__p0")) { (acc, i) =>
      array_intersect(transform(acc, x => x + 1), col(s"__p$i"))
    }
    joined.filter(size(ends) > 0).select(col("pk"))
  }

  /** pks where tokens `a` and `b` occur within `n` intervening tokens
    * (either order) — FTS5 NEAR: a window of the 2 matched tokens plus
    * ≤ n others, i.e. |posA - posB| ≤ n + 1. Same token-pruned ≤1-row
    * join shape as a 2-word phrase; a NEAR of a term with itself needs
    * two distinct occurrences.
    */
  private def nearPks(idx: DataFrame, a: String, b: String, n: Int): DataFrame = {
    val pa = idx.filter(col("token") === a)
      .select(col("pk"), col("positions").as("__pa"))
    val pb = idx.filter(col("token") === b)
      .select(col("pk"), col("positions").as("__pb"))
    val withinSpan: (Column, Column) => Column = (x, y) =>
      if (a == b) abs(x - y) <= n + 1 && x =!= y
      else abs(x - y) <= n + 1
    pa.join(pb, Seq("pk"))
      .filter(exists(col("__pa"), x => exists(col("__pb"), y => withinSpan(x, y))))
      .select(col("pk"))
  }

  /** FTS5 `MATCH` (implicit AND): pks satisfying every query term —
    * plain terms via one groupBy-count intersection over the
    * token-pruned postings (single shuffle), each phrase/prefix term
    * via one additional pk-set semi-join.
    */
  def search(spark: SparkSession, store: TableStore, table: String, query: String): DataFrame = {
    val terms = parseQuery(query)
    val idx = store.read(indexName(table))
    if (terms.isEmpty) return idx.select(col("pk")).limit(0)
    val plain = terms.collect { case Plain(t) => t }
    val extra: Seq[DataFrame] = terms.collect {
      case PrefixTerm(p) =>
        // startsWith pushes to the scan as a StringStartsWith filter;
        // distinct because several tokens of one doc can share a prefix
        idx.filter(col("token").startsWith(p)).select(col("pk")).distinct()
      case Phrase(ws)    => phrasePks(idx, ws)
      case Near(a, b, n) => nearPks(idx, a, b, n)
    }
    val base: DataFrame =
      if (plain.nonEmpty)
        idx.filter(col("token").isin(plain: _*))
          .groupBy(col("pk"))
          .agg(countDistinct(col("token")).as("n_terms"))
          .filter(col("n_terms") === plain.size)
          .select(col("pk"))
      else extra.head
    val rest = if (plain.nonEmpty) extra else extra.tail
    rest.foldLeft(base)((acc, pks) => acc.join(pks, Seq("pk"))).select(col("pk"))
  }

  /** FTS5 `MATCH … ORDER BY rank`: matched pks scored with BM25
    * (k1=1.2, b=0.75 — FTS5's constants, fts5_aux.c), best first, over
    * the same MATCH subset as `search`: a prefix term matches (and
    * scores) every token carrying the prefix; a phrase term is
    * enforced POSITIONALLY (the shift-intersect semi-join — a doc with
    * the words scattered does not rank) and scored bag-of-words over
    * its constituent tokens (FTS5 scores phrase hits as units; the
    * per-token sum is a documented, deterministic approximation). A
    * posting satisfying several query terms is scored once.
    *
    * Corpus stats (N, avgdl) come from the persisted 1-row
    * `<table>_fts_stats` table (built at index time — no full-postings
    * aggregation in the query path; a legacy store without the stats
    * table falls back to computing them once from the index). Per-term
    * document frequencies ride a broadcast aggregate of the matched
    * postings, so scoring adds no extra shuffle over the unranked
    * search: one groupBy(pk) on the matched postings, everything
    * upstream narrow.
    */
  def searchRanked(
      spark: SparkSession,
      store: TableStore,
      table: String,
      query: String,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val terms = parseQuery(query)
    val idx = store.read(indexName(table))
    if (terms.isEmpty)
      return idx.select(col("pk"), lit(0.0).as("score")).limit(0)
    val stats: DataFrame = store.readIfExists(statsName(table)) match {
      case Some(st) =>
        st.select(col("n_docs").cast("double").as("n_docs"), col("avgdl"))
      case None => // legacy store indexed before stats persistence
        idx.select(col("pk"), col("dl")).distinct()
          .agg(count(lit(1)).cast("double").as("n_docs"), avg(col("dl")).as("avgdl"))
    }
    // one match condition per query term; a posting tags the term ids
    // it satisfies so the AND check counts TERMS, not tokens (a doc
    // with two tokens under one prefix satisfies one term)
    val conds: Seq[Column] = terms.map {
      case Plain(t)      => col("token") === t
      case PrefixTerm(p) => col("token").startsWith(p)
      case Phrase(ws)    => col("token").isin(ws.distinct: _*)
      case Near(a, b, _) => col("token").isin(a, b)
    }
    val termIds = filter(
      array(conds.zipWithIndex.map { case (c, i) => when(c, lit(i)) }: _*),
      x => x.isNotNull)
    val matched = idx.filter(conds.reduce(_ || _))
      .withColumn("__tids", termIds)
    val docFreq = matched.groupBy(col("token"))
      .agg(countDistinct(col("pk")).cast("double").as("df"))
    val scored = matched
      .join(broadcast(docFreq), Seq("token"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("s",
        col("idf") * (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("pk"))
      .agg(size(array_distinct(flatten(collect_list(col("__tids"))))).as("n_terms"),
        sum(col("s")).as("score"))
      .filter(col("n_terms") === terms.size)
    terms.collect {
        case Phrase(ws)    => phrasePks(idx, ws)
        case Near(a, b, n) => nearPks(idx, a, b, n)
      }
      .foldLeft(scored)((acc, pks) => acc.join(pks, Seq("pk")))
      .select(col("pk"), col("score"))
      .orderBy(col("score").desc, col("pk"))
  }
}
