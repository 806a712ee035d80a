package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The text/hash kernels must run COMPILED: every converted
  * expression is evaluated under CODEGEN_ONLY with fallback disabled
  * (a janino error fails the test instead of silently demoting every
  * dedup/text scan to interpreted mode) and its rows must equal the
  * interpreted evaluation of the same plan — the two paths share one
  * body by construction, this pins that the glue (casts, null
  * handling, reference plumbing) preserves it.
  */
class KernelCodegenSpec extends SparkSpec {
  import spark.implicits._

  private def corpus: DataFrame = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs jugs jugs"),
    (3L, "a"),              // below every kernel's minimum → null paths
    (4L, ""),               // empty string
    (5L, "Sphinx of black quartz, judge my vow; judge my vow again"))
    .toDF("id", "text")

  private def allKernels(df: DataFrame): DataFrame =
    df.select(col("id"),
      CharGrams.charGrams(spark, lower(col("text")), 3).as("cg"),
      WordGrams.wordGrams(spark, col("text"), 2, distinct = true).as("wg"),
      WordGrams.wordGrams(spark, col("text"), 2, distinct = false).as("wga"),
      MinHashSig.minhashSig(spark, col("text")).as("mh"),
      SimHashFp.simhashFp(spark, col("text")).as("sh"),
      WinnowFp.winnowFp(spark, col("text")).as("wf"),
      CdcChunks.cdcChunks(spark, col("text")).as("cc"),
      TrigramStats.trigramStats(spark, col("text")).as("ts"))

  // A Seq(...).toDF LocalRelation is PRE-EVALUATED by the optimizer's
  // ConvertToLocalRelation rule with an interpreted projection —
  // doGenCode never runs and a "codegen-only" assertion over it is
  // vacuous (exactly how a broken generated cast once shipped: the
  // test passed while every parquet-backed query silently fell back).
  // Excluding the rule forces the projection to actually compile.
  private val localCollapse =
    "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation"

  test("all converted kernels run codegen-only and match interpreted rows") {
    val conf = spark.conf
    val oldMode = conf.getOption("spark.sql.codegen.factoryMode")
    val oldFb = conf.getOption("spark.sql.codegen.fallback")
    val oldEx = conf.getOption("spark.sql.optimizer.excludedRules")
    def rows(mode: String): Seq[String] = {
      conf.set("spark.sql.codegen.factoryMode", mode)
      allKernels(corpus).collect().map(_.toString).sorted.toSeq
    }
    try {
      conf.set("spark.sql.optimizer.excludedRules", localCollapse)
      conf.set("spark.sql.codegen.fallback", "false")
      val interpreted = rows("NO_CODEGEN")
      val compiled = rows("CODEGEN_ONLY")
      assert(compiled === interpreted)
      // sanity: the fixture actually exercises non-trivial output AND
      // the null paths (row 3/4 null out the token-based kernels)
      assert(interpreted.size === 5)
      assert(interpreted.exists(_.contains("null")))
    } finally {
      def restore(k: String, v: Option[String]): Unit =
        v.fold(conf.unset(k))(conf.set(k, _))
      restore("spark.sql.codegen.factoryMode", oldMode)
      restore("spark.sql.codegen.fallback", oldFb)
      restore("spark.sql.optimizer.excludedRules", oldEx)
    }
  }

  test("seeded unicode fuzz corpus: compiled == interpreted on every kernel") {
    // the fixed fixture above exercises the happy paths; generated
    // Java breaks on the WEIRD inputs — astral-plane code points,
    // isolated surrogates patched to valid chars, control chars,
    // regex metacharacters, very long tokens. Seeded so a failure
    // reproduces exactly.
    val rnd = new scala.util.Random(20260814)
    val alphabets = Seq(
      "abc def ghi ",                       // plain
      "äöü ßharp ñandú 北京 مرحبا ",          // BMP unicode
      "😀🎉🚀 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 ",                    // astral plane
      "\t\n .,;:!?()[]{}|\\^$*+?",          // controls + regex metas
      "a" * 300 + " " + "b" * 300 + " ")    // very long tokens
    val corpus = (0 until 60).map { i =>
      val sb = new StringBuilder
      (0 until 1 + rnd.nextInt(6)).foreach { _ =>
        val a = alphabets(rnd.nextInt(alphabets.size))
        val start = rnd.nextInt(a.length)
        // cut at arbitrary char offsets ON PURPOSE: a slice can split
        // a surrogate pair — kernels must not throw on lone surrogates
        sb.append(a.substring(start, start + rnd.nextInt(a.length - start)))
      }
      (i.toLong, sb.toString)
    }.toDF("id", "text")
    val conf = spark.conf
    val oldMode = conf.getOption("spark.sql.codegen.factoryMode")
    val oldFb = conf.getOption("spark.sql.codegen.fallback")
    val oldEx = conf.getOption("spark.sql.optimizer.excludedRules")
    def rows(mode: String): Seq[String] = {
      conf.set("spark.sql.codegen.factoryMode", mode)
      allKernels(corpus).collect().map(_.toString).sorted.toSeq
    }
    try {
      conf.set("spark.sql.optimizer.excludedRules", localCollapse)
      conf.set("spark.sql.codegen.fallback", "false")
      assert(rows("CODEGEN_ONLY") === rows("NO_CODEGEN"))
    } finally {
      def restore(k: String, v: Option[String]): Unit =
        v.fold(conf.unset(k))(conf.set(k, _))
      restore("spark.sql.codegen.factoryMode", oldMode)
      restore("spark.sql.codegen.fallback", oldFb)
      restore("spark.sql.optimizer.excludedRules", oldEx)
    }
  }

  test("minhash signatures from the compiled path match the DuckDB-pinned md5 recipe") {
    // one concrete anchor so a codegen regression cannot hide behind
    // "both paths changed together": the md5-slice family is pinned
    // cross-engine by q_minhash_bands — spot-check one signature
    // equals a from-first-principles recomputation
    val conf = spark.conf
    val old = conf.getOption("spark.sql.codegen.factoryMode")
    val oldEx = conf.getOption("spark.sql.optimizer.excludedRules")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    conf.set("spark.sql.optimizer.excludedRules", localCollapse)
    try {
      val sig = Seq(Tuple1("one two three four")).toDF("t")
        .select(MinHashSig.minhashSig(spark, col("t")).as("s"))
        .head.getString(0)
      val md = java.security.MessageDigest.getInstance("MD5")
      def md5hex(s: String) =
        md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val shingles = Seq("one two three", "two three four")
      val mins = (0 until 4).map { h =>
        shingles.map(s => md5hex(s).substring(8 * h, 8 * h + 8)).min
      }
      assert(sig === mins.mkString)
    } finally {
      old.fold(conf.unset("spark.sql.codegen.factoryMode"))(
        conf.set("spark.sql.codegen.factoryMode", _))
      oldEx.fold(conf.unset("spark.sql.optimizer.excludedRules"))(
        conf.set("spark.sql.optimizer.excludedRules", _))
    }
  }
}
