package graft.store

import graft.SparkSpec
import graft.functions.FtsMarkCore

/** FTS5 highlight()/snippet() semantics: token-boundary
  * case-insensitive phrase marking over the ORIGINAL text, merged
  * overlaps, prefix words, and the snippet window/ellipsis rules —
  * unit-level on FtsMarkCore, end-to-end through Fts.search*.
  */
class FtsMarkSpec extends SparkSpec {
  import spark.implicits._

  test("highlight/snippet run codegen-only and match interpreted rows; no span break") {
    import org.apache.spark.sql.functions._
    import graft.functions.FtsMark
    val docs = Seq(
      (1L, "Spark streams sparkly data. spark!"),
      (2L, "vector search; vectors win"),
      (3L, null.asInstanceOf[String]),
      (4L, ""),
      (5L, "stream processing. stream... processing!"))
      .toDF("id", "text")
    def marks(df: org.apache.spark.sql.DataFrame) = df.select(col("id"),
      FtsMark.ftsHighlight(spark, col("text"), Seq("spark", "vector*")).as("h"),
      FtsMark.ftsSnippet(spark, col("text"), Seq("stream processing"),
        nTok = 3).as("s"))
    val conf = spark.conf
    val oldMode = conf.getOption("spark.sql.codegen.factoryMode")
    val oldFb = conf.getOption("spark.sql.codegen.fallback")
    val oldEx = conf.getOption("spark.sql.optimizer.excludedRules")
    // keep the LocalRelation from being pre-evaluated interpreted —
    // the KernelCodegenSpec vacuity guard
    val localCollapse =
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation"
    def rows(mode: String): Seq[String] = {
      conf.set("spark.sql.codegen.factoryMode", mode)
      marks(docs).collect().map(_.toString).sorted.toSeq
    }
    try {
      conf.set("spark.sql.optimizer.excludedRules", localCollapse)
      conf.set("spark.sql.codegen.fallback", "false")
      val interpreted = rows("NO_CODEGEN")
      val compiled = rows("CODEGEN_ONLY")
      assert(compiled === interpreted)
      assert(interpreted.exists(_.contains("null"))) // null text path ran
      // the marking PROJECT sits inside a WholeStageCodegen span —
      // no CodegenFallback break left in the highlight path
      val plan = marks(docs).queryExecution.executedPlan.toString
      val projLine = plan.linesIterator
        .find(_.contains("fts_highlight")).getOrElse("")
      assert(projLine.trim.startsWith("*("),
        s"highlight project fell out of WholeStageCodegen:\n$plan")
    } finally {
      def restore(k: String, v: Option[String]): Unit =
        v.fold(conf.unset(k))(conf.set(k, _))
      restore("spark.sql.codegen.factoryMode", oldMode)
      restore("spark.sql.codegen.fallback", oldFb)
      restore("spark.sql.optimizer.excludedRules", oldEx)
    }
  }

  test("highlight core: token boundaries, case, phrases, prefixes, overlap merge") {
    def h(text: String, terms: String*): String =
      FtsMarkCore.highlight(text, terms, "[", "]")

    // token-boundary, case-insensitive, original case kept
    assert(h("Spark streams sparkly data. spark!", "spark") ===
      "[Spark] streams sparkly data. [spark]!")
    // multiple terms, punctuation between tokens untouched
    assert(h("vector search; vectors win", "vector", "win") ===
      "[vector] search; vectors [win]")
    // prefix word marks the whole token
    assert(h("vector search; vectors win", "vector*") ===
      "[vector] search; [vectors] win")
    // phrase matches only consecutive tokens (across punctuation)
    assert(h("stream processing. stream... processing!", "stream processing") ===
      "[stream processing]. [stream... processing]!")
    // phrase NOT matched when words are apart
    assert(h("stream the processing", "stream processing") ===
      "stream the processing")
    // overlapping instances merge into one region
    assert(h("a b c", "a b", "b c") === "[a b c]")
    // underscore is a word char: foo_spark is ONE token, no match
    assert(h("foo_spark spark", "spark") === "foo_spark [spark]")
    // no tokens → text unchanged
    assert(h("!!!", "spark") === "!!!")
    // empty term list → unchanged
    assert(h("spark", Seq.empty[String]: _*) === "spark")
  }

  test("snippet core: best window, ellipses, marks inside the window") {
    def s(text: String, ntok: Int, terms: String*): String =
      FtsMarkCore.snippet(text, terms, "[", "]", "…", ntok)

    val text = "one two three four five spark vector six seven eight nine ten"
    // earliest window containing the phrase instance, both edges trimmed
    assert(s(text, 4, "spark vector") === "…four five [spark vector]…")
    // window at the text start: no leading ellipsis
    assert(s("spark vector one two three four five six seven eight nine ten",
      4, "spark vector") === "[spark vector] one two…")
    // text shorter than the window: whole text, no ellipses
    assert(s("tiny spark doc", 10, "spark") === "tiny [spark] doc")
    // no match: leading window
    assert(s(text, 3, "absent") === "one two three…")
    // more instances beats fewer: window covers the doubled term
    assert(s("spark a b c d e f spark spark", 3, "spark") ===
      "…f [spark] [spark]")
  }

  test("searchHighlighted / searchSnippet end-to-end, boolean and multi-column queries") {
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-ftsm").toString)
    val docs = Seq(
      (1L, "Spark streams data; spark wins"),
      (2L, "vector search helps"),
      (3L, "plain text only")).toDF("id", "full_text")
    Fts.upsertWithIndex(store, "tweets", docs, "id", "full_text")

    val hi = Fts.searchHighlighted(spark, store, "tweets",
        "spark OR vector", "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hi === Map(
      1L -> "[Spark] streams data; [spark] wins",
      2L -> "[vector] search helps"))

    // NOT-excluded terms are never highlighted (and can't match rows)
    val hiNot = Fts.searchHighlighted(spark, store, "tweets",
        "spark NOT wins OR vector", "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hiNot === Map(2L -> "[vector] search helps"))

    val sn = Fts.searchSnippet(spark, store, "tweets", "wins", "id",
        nTok = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sn === Map(1L -> "…spark [wins]"))

    // multi-column: render one column; col-scoped terms apply only to it
    val store2 = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-ftsm2").toString)
    val users = Seq(
      (1L, "Simon Willison", "datasette creator"),
      (2L, "Nat Simon", "simon fan account")).toDF("id", "name", "description")
    Fts.upsertWithIndexCols(store2, "users", users, "id",
      Seq("name", "description"))
    // rendering needs an explicit column on a multi-column index
    intercept[IllegalArgumentException] {
      Fts.searchHighlighted(spark, store2, "users", "simon", "id")
    }
    val hName = Fts.searchHighlighted(spark, store2, "users",
        "simon", "id", column = Some("name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hName === Map(1L -> "[Simon] Willison", 2L -> "Nat [Simon]"))
    // description:-scoped term doesn't mark the name column
    val hScoped = Fts.searchHighlighted(spark, store2, "users",
        "description:simon", "id", column = Some("name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hScoped === Map(2L -> "Nat Simon")) // matched, nothing marked in name
    val hScoped2 = Fts.searchHighlighted(spark, store2, "users",
        "description:simon", "id", column = Some("description"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hScoped2 === Map(2L -> "[simon] fan account"))
  }
}
