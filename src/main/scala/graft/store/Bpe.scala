package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding vocabulary training (Sennrich et
  * al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units") — the tokenizer-TRAINING half a training-data pipeline
  * needs next to token counting (queries/TextOps.tokenCount).
  *
  * The corpus collapses to the word-count table first (one groupBy —
  * the standard trick: merges depend only on word FREQUENCIES, so the
  * loop runs over the word vocabulary (|V| rows), not the corpus).
  * Each round then:
  *
  *  1. counts adjacent symbol pairs weighted by word count (explode +
  *     partial-agg'd groupBy — distributed);
  *  2. takes the single most frequent pair to the driver (top-1 row —
  *     the same driver-scalar seam as the k-means loop and the
  *     watermark reads; ties break lexicographically, so the choice
  *     is deterministic on any partitioning);
  *  3. rewrites each word's symbol array with the merged pair (the
  *     reference algorithm's greedy left-to-right scan as an array
  *     fold), pinned through [[Iteration.materialize]] so lineage
  *     stays bounded across rounds.
  *
  * No end-of-word marker (the GPT-2-style convention); merges never
  * cross word boundaries. Returns the ranked merge list — the MODEL,
  * inherently driver-sized (one row per merge). At 100 TB the
  * expensive artifact is the word-count table, computed exactly once.
  */
object Bpe {

  final case class Merge(rank: Int, a: String, b: String, count: Long)

  /** (word, n) counts — the only corpus-sized pass. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(
        graft.ingest.Transforms.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** Initial symbol sequence: one-character split. */
  def charSymbols(c: Column): Column =
    transform(sequence(lit(1), length(c)), i => c.substr(i, lit(1)))

  /** Adjacent-pair counts over (syms, n) rows, weighted by n. */
  private def pairCounts(words: DataFrame): DataFrame =
    words.filter(size(col("syms")) >= 2)
      .select(col("n"), explode(transform(
        sequence(lit(0), size(col("syms")) - 2),
        j => struct(element_at(col("syms"), j + 1).as("a"),
          element_at(col("syms"), j + 2).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("n")).as("cnt"))

  /** Greedy left-to-right merge of adjacent (a, b) into a+b — the
    * reference scan as a fold. Nested when, not `&&` on element_at:
    * CaseWhen short-circuits per row, so the -1 access never runs on
    * an empty accumulator (ANSI mode would throw).
    */
  private[store] def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) === 0, array(x)).otherwise(
        when(element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x)))))

  /** Learn up to `nMerges` merges; stops early when no pair reaches
    * `minCount`. `docs` needs the text column only.
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L): Seq[Merge] = {
    import Iteration.materialize
    var words = materialize(wordCounts(docs, textCol)
      .select(charSymbols(col("word")).as("syms"), col("n")))
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1).collect()
      if (top.isEmpty || top.head.getLong(2) < minCount) done = true
      else {
        val (a, b) = (top.head.getString(0), top.head.getString(1))
        merges += Merge(rank, a, b, top.head.getLong(2))
        words = materialize(words.select(
          mergePair(col("syms"), a, b).as("syms"), col("n")))
        rank += 1
      }
    }
    merges.result()
  }

  /** Tokenize a string column with a learned merge list: char split,
    * then each merge applied in rank order — the reference encoder's
    * semantics exactly. k sequential folds are fine for a model-sized
    * k on a scoring pass; a production tokenizer would compile the
    * merge table into a native longest-match Expression (the
    * graft.functions pattern) — same semantics, one pass.
    */
  def applyMerges(c: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.rank).foldLeft(charSymbols(c))(
      (s, m) => mergePair(s, m.a, m.b))
}
