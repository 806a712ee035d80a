package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** The full graft function surface as ONE list, consumed two ways:
  *
  *  - [[GraftFunctions.registerAll]] — session-registry registration
  *    (temp functions), the belt-and-braces call for code that mixes
  *    frames from multiple sessions (foreachBatch's isolated clone vs
  *    the store session — the StreamBinDup lesson);
  *  - [[GraftExtensions]] — the CANONICAL integration
  *    (SURVEY.md §4.3 / SparkSessionExtensions): a user sets
  *    `spark.sql.extensions=graft.functions.GraftExtensions` and
  *    every session built from that config — INCLUDING streaming
  *    micro-batch clones, which inherit injected functions through
  *    the session-state builder — resolves the whole surface with no
  *    registration calls anywhere.
  *
  * Builders with literal-argument parsing live as `builder` vals on
  * their own objects (CharGrams, WordGrams, MinHashSig, KmvMins,
  * MgCounters, SliceDists.sliceL2Builder) so this list cannot drift
  * from what the per-object register methods install; constructor-only
  * builders are written inline — the typed constructor call IS the
  * builder, so drift is a compile error.
  */
object GraftFunctions {

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "slice_l2_dists" -> SliceDists.sliceL2Builder,
    "dot_fold" -> (e => DotFold(e(0), e(1))),
    "l2_fold" -> (e => L2Fold(e(0), e(1))),
    "sub_vec" -> (e => SubVec(e(0), e(1))),
    "pack_codes" -> (e => PackCodes(e(0))),
    "code_dot_q" -> (e => CodeDotQ(e(0), e(1))),
    "adc_dist" -> (e => AdcDist(e(0), e(1))),
    "sign_pack" -> (e => SignPack(e(0))),
    "hamming_fold" -> (e => HammingFold(e(0), e(1))),
    "char_grams" -> CharGrams.builder,
    "word_grams" -> WordGrams.builder,
    "minhash_sig" -> MinHashSig.builder,
    "simhash_fp" -> (e => SimHashFp(e.head)),
    "winnow_fp" -> (e => WinnowFp(e.head)),
    "cdc_chunks" -> (e => CdcChunks(e.head)),
    "trigram_stats" -> (e => TrigramStats(e.head)),
    "kmv_mins" -> KmvMins.builder,
    "bottom_k_sample" -> BottomKSample.builder,
    "mg_counters" -> MgCounters.builder,
    "graft_bloom_agg" -> (e => new BloomFilterAggregate(e(0), e(1), e(2))),
    "graft_might_contain" -> (e => BloomFilterMightContain(e(0), e(1))),
    "keyed_might_contain" -> (e => KeyedBloomMightContain(e(0), e(1), e(2))),
    "fts_highlight" -> (e => FtsHighlight(e(0), e(1), e(2), e(3))),
    "fts_snippet" -> (e => FtsSnippet(e(0), e(1), e(2), e(3), e(4), e(5))))

  /** Register every graft function on `spark`'s session registry —
    * idempotent (guarded per name), cheap enough for hot paths.
    */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (name, builder) =>
      if (!reg.functionExists(FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` — inject
  * the whole function surface at session build time. Injected
  * functions live in the session-state BUILDER, so cloned sessions
  * (notably Structured Streaming's per-micro-batch isolated clones)
  * inherit them — the class of registry-cold resolution failures the
  * manual registration calls defend against cannot occur at all on
  * an extensions-configured session.
  *
  * Also injects the SQL DML interception for governed tables
  * ([[graft.sql.GraftDml]]): a post-hoc resolution rule turns
  * analyzed `UPDATE` / `MERGE INTO` on `graft.*` catalog tables into
  * store-verb commands, and the paired planner strategy executes
  * them. Both are strict no-ops on every other plan, so the
  * extensions stay safe to install globally.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
    // MATCH as a composable TABLE function (`SELECT pk FROM
    // graft_fts('docs', 'a AND b')` joins/nests like any relation) —
    // see graft.sql.FtsTableFunctions
    graft.sql.FtsTableFunctions.all.foreach { case (name, ranked) =>
      ext.injectTableFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.sql", name),
        (args: Seq[Expression]) =>
          graft.sql.FtsTableFunctions.plan(name, ranked, args)))
    }
    ext.injectPostHocResolutionRule(sp => new graft.sql.GraftDml.DmlRule(sp))
    ext.injectPlannerStrategy(sp => new graft.sql.GraftDml.DmlStrategy(sp))
  }
}
