package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Content-defined chunking: boundaries derive from window content,
  * so a prepended prefix (which shifts every byte offset) leaves the
  * downstream chunk fingerprints intact — the dedup-recall property
  * fixed-offset windows lack, and the reason CDC exists (LBFS,
  * Muthitacharoen et al. SOSP'01).
  */
class CdcChunksSpec extends SparkSpec {
  import spark.implicits._

  private def chunkFps(text: String): Seq[String] =
    Seq(Tuple1(text)).toDF("text")
      .select(explode(CdcChunks.cdcChunks(spark, col("text"))).as("c"))
      .select(col("c.fp")).collect().map(_.getString(0)).toSeq

  private def chunkLens(text: String): Seq[Long] =
    Seq(Tuple1(text)).toDF("text")
      .select(explode(CdcChunks.cdcChunks(spark, col("text"))).as("c"))
      .select(col("c.clen")).collect().map(_.getLong(0)).toSeq

  // deterministic pseudo-text long enough to yield several chunks
  private val body: String = (0 until 400).map { i =>
    val r = (i * 2654435761L) % 9973
    s"w$r"
  }.mkString(" ")

  test("chunks cover the normalized text exactly, in order") {
    val norm = body.toLowerCase.replaceAll("\\W+", " ").trim
    assert(chunkLens(body).sum === norm.length.toLong)
    assert(chunkLens(body).forall(_ >= 1L))
    assert(chunkFps(body).size > 3, "body should split into several chunks")
  }

  test("a shifted prefix re-aligns: CDC shares most chunks, fixed windows share none") {
    val shifted = "zzqq prefix inserted here " + body
    val a = chunkFps(body)
    val b = chunkFps(shifted)
    val shared = a.toSet.intersect(b.toSet)
    // only the few chunks around the splice point change; everything
    // downstream of the first content-defined boundary re-aligns
    assert(shared.size >= a.toSet.size - 3 && shared.size > a.toSet.size / 2,
      s"CDC lost alignment: ${shared.size} of ${a.toSet.size} chunks survive a prefix")

    // the fixed-offset baseline (q_chunk_windows math: 64-token
    // windows, stride 48) shares NO window fingerprint once offsets
    // shift by a non-stride amount — same corpus, same engines
    def fixedFps(text: String): Set[String] = {
      val toks = text.toLowerCase.split("\\W+").filter(_.nonEmpty)
      (0 until math.max(1, (toks.length - 64 + 47) / 48 + 1))
        .map(j => toks.slice(j * 48, j * 48 + 64).mkString(" ")).toSet
    }
    // 5-token prefix: not a multiple of the stride, every window shifts
    val fixedShared = fixedFps("one two three four five " + body)
      .intersect(fixedFps(body))
    assert(fixedShared.isEmpty,
      "fixed windows unexpectedly survived a non-stride prefix shift")
  }

  test("an edit only resynchronizes locally") {
    // flip one word in the middle: chunks before and after the edited
    // chunk keep their fingerprints
    val words = body.split(" ")
    val edited = (words.take(200) ++ Array("EDITED") ++ words.drop(201)).mkString(" ")
    val a = chunkFps(body)
    val b = chunkFps(edited)
    val shared = a.toSet.intersect(b.toSet)
    assert(shared.size >= a.size - 3,
      s"a 1-word edit disturbed ${a.size - shared.size} chunks")
    assert(a.toSet != b.toSet, "the edited chunk must change")
  }

  test("short and empty documents behave") {
    assert(chunkFps("tiny doc").size === 1) // shorter than the window
    assert(Seq(Tuple1("   ")).toDF("text")
      .select(CdcChunks.cdcChunks(spark, col("text")).as("c"))
      .filter(col("c").isNotNull).count() === 0L)
  }

  test("boundaries match the oracle's per-window fold (same polynomial)") {
    // recompute cuts with the O(n·w) definition the DuckDB SQL uses and
    // compare against the expression's O(n) rolling version
    val norm = body.toLowerCase.replaceAll("\\W+", " ").trim
    val codes = norm.map(_.toLong)
    val cuts = (16 to norm.length).filter { i =>
      val h = codes.slice(i - 16, i).foldLeft(0L)((acc, c) => (acc * 31 + c) % 1000000007L)
      h % 64 == 0
    }
    val starts = 1 +: cuts.map(_ + 1)
    val ends = cuts :+ norm.length
    val want = starts.indices.collect {
      case k if ends(k) >= starts(k) => (ends(k) - starts(k) + 1).toLong
    }
    assert(chunkLens(body) === want)
  }
}
