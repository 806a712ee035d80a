package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (BASELINE.json
  * north-star extension): brute-force cosine top-k as the exact
  * baseline, and random-hyperplane LSH bucketing as the 100 TB scale
  * path (candidates restricted to equal sign-bit buckets → equi-join
  * instead of all-pairs).
  *
  * Numeric parity with the DuckDB oracle: dot products / norms are
  * LEFT-FOLD sequential double sums (higher-order `aggregate` with 0.0
  * init on the Spark side, `list_reduce` with a prepended 0.0 on the
  * DuckDB side), so every float is widened and accumulated in the same
  * order → bit-identical doubles, no rounding slop needed.
  */
object SimilarityOps {

  /** float[] → double[] (exact IEEE widening on both engines). */
  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Sequential left-fold dot product (codegen'd higher-order fns). */
  private def sub(a: Column, b: Column): Column =
    graft.functions.SliceDists.subVec(
      org.apache.spark.sql.SparkSession.active, a, b)

  private def dot(a: Column, b: Column): Column =
    graft.functions.SliceDists.dotFold(
      org.apache.spark.sql.SparkSession.active, a, b)

  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])), (acc, x) -> acc + x)"

  /** Per-query top-k over a scored (query_id, cand_id, cosine) set.
    *
    * This LOOKS like the classic few-reducer funnel (a window
    * partitioned by a handful of probe ids), but in Spark ≥ 3.5 the
    * `row_number ≤ k` filter triggers InferWindowGroupLimit: the
    * physical plan inserts a PARTIAL WindowGroupLimit before the
    * exchange, so each input partition ships only its local top-k
    * (k·P rows per query cross the wire, not every scored row), and
    * the final per-query sort sees k·P rows. That is exactly the
    * two-stage top-k one would hand-build — verified in the formatted
    * plan (WindowGroupLimit(Partial) → Exchange → WindowGroupLimit
    * (Final) → Window); a hand-rolled groupBy(query, partition-id) +
    * sorted-slice stage was measured 25-40% SLOWER here because it
    * adds a second exchange for rows the partial limit already
    * bounds.
    */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("cand_id"), col("cosine"))
      .orderBy(col("query_id"), col("rnk"))
  }

  // ---------------------------------------------------------------------
  // q_cosine_topk — brute-force exact ANN baseline: top-5 cosine
  // neighbors for each of 8 probe vectors. Probe side is tiny →
  // broadcast; candidate side streams (no shuffle of the big table;
  // per-query top-k via window on the joined result).
  def cosineTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Catalog.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("norm", sqrt(dot(col("e"), col("e"))))
    val probes = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("e").as("qe"),
        col("norm").as("qnorm"))
    val cands = emb.filter(col("vec_id") >= 8)
      .select(col("vec_id").as("cand_id"), col("e").as("ce"),
        col("norm").as("cnorm"))
    val scored = cands.crossJoin(broadcast(probes))
      .select(col("query_id"), col("cand_id"),
        (dot(col("qe"), col("ce")) / (col("qnorm") * col("cnorm")))
          .as("cosine"))
    topKPerQuery(scored, 5)
  }

  val cosineTopKSql: String = {
    s"""WITH emb AS (
       |  SELECT vec_id, e, sqrt(${dotSql("e", "e")}) AS norm
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
       |), scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
       |    ${dotSql("q.e", "c.e")} / (q.norm * c.norm) AS cosine
       |  FROM emb q JOIN emb c ON q.vec_id < 8 AND c.vec_id >= 8
       |), ranked AS (
       |  SELECT query_id, cand_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rnk
       |  FROM scored
       |)
       |SELECT query_id, rnk, cand_id, cosine FROM ranked
       |WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_ann_lsh_buckets — the scale path: 8 deterministic Rademacher
  // hyperplanes (sign of md5(plane_dim) hex digit) → 8 sign bits →
  // 256-way bucket space. Planes are plan literals on the Spark side
  // (broadcast-free, codegen'd); the oracle recomputes the identical
  // weights from md5 in SQL.
  private val nPlanes = 8
  private val dims = 64

  /** Rademacher weight for (plane, dim): -1 if first hex digit of
    * md5("p_d") is 0-7, else +1 — reproducible in any engine with md5.
    */
  private[queries] def planeWeight(p: Int, d: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${p}_$d".getBytes("UTF-8"))
    val firstHexDigit = (digest(0) >> 4) & 0xf
    if (firstHexDigit < 8) -1.0 else 1.0
  }

  def annLshBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    val bits = (0 until nPlanes).map { p =>
      val weights = typedLit((0 until dims).map(d => planeWeight(p, d)))
      when(dot(weights, col("e")) > 0, lit("1")).otherwise(lit("0"))
    }
    Catalog.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .select(col("vec_id"), concat(bits: _*).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy(col("bucket"))
  }

  val annLshBucketsSql: String = {
    val planeExprs = (0 until nPlanes).map { p =>
      val w = s"(CASE WHEN substr(md5(CAST($p AS VARCHAR) || '_' || CAST(i - 1 AS VARCHAR)), 1, 1) " +
        s"IN ('0','1','2','3','4','5','6','7') THEN -1.0 ELSE 1.0 END)"
      val proj = s"list_reduce(list_prepend(0.0, list_transform(range(1, len(e) + 1), i -> $w * e[i])), (acc, x) -> acc + x)"
      s"(CASE WHEN $proj > 0 THEN '1' ELSE '0' END)"
    }
    s"""WITH emb AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       |)
       |SELECT ${planeExprs.mkString(" || ")} AS bucket, COUNT(*) AS n_vecs
       |FROM emb
       |GROUP BY 1
       |ORDER BY bucket""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_embed_norms — embedding hygiene scan (norm distribution by
  // label): one narrow pass, partial-agg before the single shuffle.
  // ---------------------------------------------------------------------
  // q_random_projection — Johnson-Lindenstrauss sign projection, the
  // dimensionality-reduction primitive ahead of high-dim ANN (Achlioptas
  // 2003: ±1 entries preserve pairwise distances in expectation; the
  // hyperplane-LSH buckets above are the 1-bit special case). The
  // 8×64 sign matrix is generated ONCE in Scala from a fixed integer
  // recurrence and emitted as LITERALS into both engines — no
  // cross-engine RNG to agree on — and each output coordinate is the
  // same left-to-right chain of fused multiply-adds on both sides, so
  // doubles match bit-for-bit (the sequential-fold parity rule). One
  // codegen'd projection, no shuffle: the 100 TB shape is a map-only
  // column rewrite.
  private val rpOutDims = 8
  private val rpInDims = 64
  // deterministic ±1: xorshift-ish integer hash of (j, d), sign from
  // the low bit — fixed forever, shared by both engines as literals
  private[graft] def signMatrix(outDims: Int, inDims: Int): Array[Array[Int]] =
    Array.tabulate(outDims, inDims) { (j, d) =>
      var x = j * 1000003 + d * 8191 + 12345
      x ^= x << 13; x ^= x >>> 17; x ^= x << 5
      if ((x & 1) == 0) 1 else -1
    }
  private[queries] val rpSigns: Array[Array[Int]] = signMatrix(rpOutDims, rpInDims)

  def randomProjection(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Catalog.table(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 100)
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
    val projections = (0 until rpOutDims).map { j =>
      (0 until rpInDims).map { d =>
        element_at(col("e"), d + 1) * lit(rpSigns(j)(d).toDouble)
      }.reduceLeft(_ + _).as(s"p$j")
    }
    emb.select(col("vec_id") +: projections: _*)
      .orderBy(col("vec_id"))
  }

  val randomProjectionSql: String = {
    val cols = (0 until rpOutDims).map { j =>
      (0 until rpInDims).map { d =>
        s"e[${d + 1}] * CAST(${rpSigns(j)(d)} AS DOUBLE)"
      }.mkString("(", " + ", s") AS p$j")
    }.mkString(",\n  ")
    s"""SELECT vec_id,
       |  $cols
       |FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       |      WHERE vec_id < 100)
       |ORDER BY vec_id""".stripMargin
  }

  def embedNorms(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Catalog.table(spark, sfDir, "embeddings")
      .select(col("label"), asDouble(col("embedding")).as("e"))
      .select(col("label"), sqrt(dot(col("e"), col("e"))).as("norm"))
    emb.groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        min(col("norm")).as("min_norm"),
        max(col("norm")).as("max_norm"))
      .orderBy(col("label"))
  }

  val embedNormsSql: String = {
    val d = dotSql("e", "e")
    s"""SELECT label, COUNT(*) AS n, MIN(norm) AS min_norm, MAX(norm) AS max_norm
       |FROM (
       |  SELECT label, sqrt($d) AS norm
       |  FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
       |)
       |GROUP BY label
       |ORDER BY label""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_int8_quant — per-dimension affine int8 scalar quantization of the
  // embedding column (the FAISS-ScalarQuantizer/SQ8 public recipe): the
  // serving-storage pass that cuts vector bytes 4× ahead of ANN, and the
  // scalar sibling of the PQ family above. Per-dim min/max is a
  // 64-group partial aggregation (one tiny shuffle regardless of corpus
  // size); the quantize + reconstruction-error pass is map-only after a
  // broadcast join of the 64-row stats — the 100 TB shape is one narrow
  // column rewrite. Exactness discipline: round-half-up spelled as
  // floor(v + 0.5) in BOTH engines (no banker's-rounding divergence),
  // identical left-assoc arithmetic order, errors 1e-9-quantized to
  // longs before the max (the established quantized-comparison rule).
  def int8Quant(spark: SparkSession, sfDir: String): DataFrame = {
    val ex = Catalog.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .select(col("vec_id"), posexplode(col("e")).as(Seq("p", "x")))
      .select(col("vec_id"), (col("p") + 1).as("pos"), col("x"))
    val stats = ex.groupBy(col("pos"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val q = ex.join(broadcast(stats), Seq("pos"))
      .withColumn("q", when(col("mx") === col("mn"), lit(0))
        .otherwise(floor(
          (col("x") - col("mn")) * lit(255.0) / (col("mx") - col("mn"))
            + lit(0.5)).cast("int")))
      .withColumn("err", abs(
        col("mn") + col("q").cast("double") * (col("mx") - col("mn"))
          / lit(255.0) - col("x")))
    q.groupBy(col("vec_id"))
      .agg(sum(col("q")).as("q_sum"),
        min(col("q")).as("q_min"),
        max(col("q")).as("q_max"),
        max(floor(col("err") * lit(1e9)).cast("long")).as("max_err_q"))
      .orderBy(col("vec_id"))
  }

  val int8QuantSql: String =
    s"""WITH ex AS (
       |  SELECT vec_id, pos, e[pos] AS x
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |       (SELECT unnest(range(1, ${dims + 1})) AS pos)
       |), stats AS (
       |  SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM ex GROUP BY pos
       |), qq AS (
       |  SELECT vec_id, x, mn, mx,
       |    CASE WHEN mx = mn THEN 0
       |         ELSE CAST(floor((x - mn) * 255.0 / (mx - mn) + 0.5) AS INT)
       |    END AS q
       |  FROM ex JOIN stats USING (pos)
       |), e2 AS (
       |  SELECT vec_id, q,
       |    abs(mn + CAST(q AS DOUBLE) * (mx - mn) / 255.0 - x) AS err
       |  FROM qq
       |)
       |SELECT vec_id, CAST(SUM(q) AS BIGINT) AS q_sum,
       |  MIN(q) AS q_min, MAX(q) AS q_max,
       |  MAX(CAST(floor(err * 1000000000.0) AS BIGINT)) AS max_err_q
       |FROM e2 GROUP BY vec_id ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_ann_sq_topk — asymmetric cosine top-k over int8 scalar-quantized
  // candidates (the persisted form lives in store/Sq): full-precision
  // queries score candidates through their SQ8 codes alone, using
  //   q · dequant(c) = Σ q_d·mn_d + Σ (q_d·sc_d)·code_d
  // so the candidate side reads 4× fewer bytes than raw floats — the
  // serving-memory trade between brute-force floats (q_cosine_topk)
  // and PQ's 32× (q_ann_pq_topk). Exactness discipline: codes via the
  // q_int8_quant floor(v + 0.5) convention, per-dim products and the
  // dequantized-norm squares 1e-6-quantized to longs before their sums
  // (exact, commutative on any partitioning), one final division per
  // cosine.
  def annSqTopK(spark: SparkSession, sfDir: String): DataFrame =
    topKPerQuery(sqScored(spark, sfDir), 5)

  /** The SQ8 asymmetric-scored (query_id, cand_id, cosine) set —
    * shared by [[annSqTopK]] (direct top-k), [[annRerank]] (coarse
    * shortlist stage), and [[annFiltered]] (label-restricted
    * candidate set). `label` restricts CANDIDATES only; the
    * quantization scales stay a corpus-level index property —
    * predicates must never change codes, or two filtered searches
    * would score the same candidate differently.
    */
  private def sqScored(
      spark: SparkSession, sfDir: String,
      label: Option[Int] = None): DataFrame = {
    val emb = Catalog.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
    val ex = emb.select(col("vec_id"), posexplode(col("e")).as(Seq("p", "x")))
      .select(col("vec_id"), (col("p") + 1).as("pos"), col("x"))
    val scales = ex.groupBy(col("pos"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val enc = ex.filter(col("vec_id") >= 4)
      .join(broadcast(scales), Seq("pos"))
      .select(col("vec_id").as("cand_id"), col("pos"),
        when(col("mx") === col("mn"), lit(0))
          .otherwise(floor(
            (col("x") - col("mn")) * lit(255.0) / (col("mx") - col("mn"))
              + lit(0.5)).cast("int")).as("code"),
        col("mn"), col("mx"))
      .withColumn("dq",
        col("mn") + col("code").cast("double") * (col("mx") - col("mn"))
          / lit(255.0))
    // per-query broadcast row (pos-ordered weight array + constants)
    // and per-candidate code ARRAYS: scoring is then one native
    // CodeDotQ fold per (candidate, query) on a map-only scan — no
    // per-dim row blowup, no aggregate exchange keyed on the pair
    // (bit-identical to the former posexplode/groupBy form: same
    // floor(w·code·1e6) longs, long addition commutes)
    val qarr = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"),
        sqrt(dot(col("e"), col("e"))).as("qnorm"),
        posexplode(col("e")).as(Seq("p", "qx")))
      .select(col("query_id"), col("qnorm"), (col("p") + 1).as("pos"), col("qx"))
      .join(broadcast(scales), Seq("pos"))
      .select(col("query_id"), col("qnorm"), col("pos"),
        (col("qx") * (col("mx") - col("mn")) / lit(255.0)).as("w"),
        (col("qx") * col("mn")).as("qmn"))
      .groupBy(col("query_id"), col("qnorm"))
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("w")))),
          x => x.getField("w")).as("warr"),
        sum(floor(col("qmn") * lit(1e6)).cast("long")).as("qmnq"))
    val candCodes = enc.groupBy(col("cand_id"))
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("code")))),
          x => x.getField("code")).as("codes"),
        sqrt(sum(floor(col("dq") * col("dq") * lit(1e6)).cast("long"))
          .cast("double") / lit(1e6)).as("dnorm"))
    // PRE-filter: the predicate lands on the candidate rows BEFORE
    // the scoring pass, so work is selectivity-proportional (in the
    // persisted-index form the label rides the codes table and this
    // is a scan-level pushed filter — store/Sq.annTopKFiltered).
    // Post-filtering a fixed-depth shortlist instead can return
    // FEWER than k for selective labels — the classic filtered-ANN
    // failure this shape avoids.
    val candKept = label.fold(candCodes) { l =>
      candCodes.join(
        Catalog.table(spark, sfDir, "embeddings")
          .filter(col("label") === l).select(col("vec_id").as("cand_id")),
        Seq("cand_id"), "left_semi")
    }
    candKept
      .crossJoin(broadcast(qarr))
      .select(col("query_id"), col("cand_id"),
        (((graft.functions.SliceDists.codeDotQ(spark, col("codes"), col("warr"))
          + col("qmnq")).cast("double") / lit(1e6))
          / (col("qnorm") * col("dnorm"))).as("cosine"))
  }

  /** Shared CTE prefix: the SQ8 asymmetric cosine set (`cosines`),
    * used by both the direct top-k and the rerank oracle.
    */
  private val sqCosinesSql: String =
    s"""WITH ex AS (
       |  SELECT vec_id, pos, e[pos] AS x
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |       (SELECT unnest(range(1, ${dims + 1})) AS pos)
       |), scales AS (
       |  SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM ex GROUP BY pos
       |), enc AS (
       |  SELECT vec_id AS cand_id, pos, mn, mx,
       |    CASE WHEN mx = mn THEN 0
       |         ELSE CAST(floor((x - mn) * 255.0 / (mx - mn) + 0.5) AS INT)
       |    END AS code
       |  FROM ex JOIN scales USING (pos) WHERE vec_id >= 4
       |), dq AS (
       |  SELECT cand_id, pos, code,
       |    mn + CAST(code AS DOUBLE) * (mx - mn) / 255.0 AS dq
       |  FROM enc
       |), dnorms AS (
       |  SELECT cand_id,
       |    sqrt(CAST(CAST(SUM(CAST(floor(dq * dq * 1000000.0) AS BIGINT))
       |      AS BIGINT) AS DOUBLE) / 1000000.0) AS dnorm
       |  FROM dq GROUP BY cand_id
       |), q AS (
       |  SELECT vec_id AS query_id, e AS qe,
       |    sqrt(${dotSql("e", "e")}) AS qnorm
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
       |  WHERE vec_id < 4
       |), qdims AS (
       |  SELECT query_id, qnorm, pos,
       |    qe[pos] * (mx - mn) / 255.0 AS w,
       |    qe[pos] * mn AS qmn
       |  FROM q, scales
       |), qconst AS (
       |  SELECT query_id, qnorm,
       |    CAST(SUM(CAST(floor(qmn * 1000000.0) AS BIGINT)) AS BIGINT) AS qmnq
       |  FROM qdims GROUP BY query_id, qnorm
       |), scored AS (
       |  SELECT query_id, cand_id,
       |    CAST(SUM(CAST(floor(w * CAST(code AS DOUBLE) * 1000000.0) AS BIGINT))
       |      AS BIGINT) AS dotq
       |  FROM dq JOIN qdims USING (pos)
       |  GROUP BY query_id, cand_id
       |), cosines AS (
       |  SELECT query_id, cand_id,
       |    (CAST(dotq + qmnq AS DOUBLE) / 1000000.0) / (qnorm * dnorm) AS cosine
       |  FROM scored JOIN qconst USING (query_id) JOIN dnorms USING (cand_id)
       |)""".stripMargin

  val annSqTopKSql: String =
    s"""$sqCosinesSql
       |SELECT query_id, rnk, cand_id, cosine FROM (
       |  SELECT query_id, cand_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, cand_id) AS rnk
       |  FROM cosines)
       |WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin

  // ---------------------------------------------------------------------
  // q_ann_filtered — FILTERED vector search: top-k under a metadata
  // predicate (label = 7 here), the serving shape every production
  // vector store needs (search within a tenant / language / date
  // slice). Two designs exist: POST-filter (search, then drop
  // non-matching results — returns < k whenever the label is rarer
  // than 1/depth) and PRE-filter (restrict the candidate set, then
  // score — selectivity-proportional work, always k results when k
  // matches exist). This is the pre-filter form through the SQ8
  // code scan: the predicate semi-joins the per-candidate code rows
  // BEFORE the scoring fold, the quantization scales stay corpus-
  // level (an index property — a predicate must never change codes),
  // and the integer kernel is q_ann_sq_topk's, so exactness carries
  // over unchanged. Oracle applies the same predicate to the same
  // cosine set (pre- and post-filter agree on RESULTS when both
  // score the full candidate set — the difference is cost and
  // result-count guarantees, which the scaladoc pins).
  private val filterLabel = 7

  def annFiltered(spark: SparkSession, sfDir: String): DataFrame =
    topKPerQuery(sqScored(spark, sfDir, Some(filterLabel)), 5)

  val annFilteredSql: String =
    s"""$sqCosinesSql
       |SELECT query_id, rnk, cand_id, cosine FROM (
       |  SELECT query_id, cand_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, cand_id) AS rnk
       |  FROM cosines
       |  JOIN (SELECT vec_id FROM embeddings WHERE label = $filterLabel) f
       |    ON f.vec_id = cand_id)
       |WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin

  // ---------------------------------------------------------------------
  // q_ann_rerank — the standard two-stage serving pattern (coarse
  // quantized scan → exact re-rank): the SQ8 code-only scorer above
  // produces a per-query shortlist of `rerankWidth` candidates, and
  // only THOSE rows' full-precision vectors are read for the exact
  // cosine that decides the final top-5. At 100 TB the corpus-wide
  // pass touches 1-byte codes (4× less I/O than floats; 32× with PQ
  // codes), while the float read is |queries|·width rows fetched
  // through a BROADCAST semi-join — never a second full scan shuffled.
  // Exactness: stage 1 is q_ann_sq_topk's pinned integer kernel;
  // stage 2 is q_cosine_topk's left-fold double kernel; both already
  // bit-identical across engines, so their composition is too.
  private val rerankWidth = 16

  def annRerank(spark: SparkSession, sfDir: String): DataFrame = {
    val cw = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    val shortlist = sqScored(spark, sfDir)
      .withColumn("crnk", row_number().over(cw))
      .filter(col("crnk") <= rerankWidth)
      .select(col("query_id"), col("cand_id"))
    val emb = Catalog.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("norm", sqrt(dot(col("e"), col("e"))))
    val qside = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("e").as("qe"),
        col("norm").as("qnorm"))
    val cside = emb.filter(col("vec_id") >= 4)
      .select(col("vec_id").as("cand_id"), col("e").as("ce"),
        col("norm").as("cnorm"))
    // broadcast the tiny shortlist INTO the candidate scan: the big
    // side is filtered map-side, no shuffle of full vectors
    val exact = cside.join(broadcast(shortlist), Seq("cand_id"))
      .join(broadcast(qside), Seq("query_id"))
      .select(col("query_id"), col("cand_id"),
        (dot(col("qe"), col("ce")) / (col("qnorm") * col("cnorm")))
          .as("cosine"))
    topKPerQuery(exact, 5)
  }

  val annRerankSql: String =
    s"""$sqCosinesSql, shortlist AS (
       |  SELECT query_id, cand_id FROM (
       |    SELECT query_id, cand_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY cosine DESC, cand_id) AS crnk
       |    FROM cosines)
       |  WHERE crnk <= $rerankWidth
       |), embx AS (
       |  SELECT vec_id, e, sqrt(${dotSql("e", "e")}) AS norm
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
       |), exact AS (
       |  SELECT s.query_id, s.cand_id,
       |    ${dotSql("q.e", "c.e")} / (q.norm * c.norm) AS cosine
       |  FROM shortlist s
       |  JOIN embx q ON q.vec_id = s.query_id
       |  JOIN embx c ON c.vec_id = s.cand_id
       |)
       |SELECT query_id, rnk, cand_id, cosine FROM (
       |  SELECT query_id, cand_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, cand_id) AS rnk
       |  FROM exact)
       |WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin

  // ---------------------------------------------------------------------
  // q_ann_hamming_topk — the 1-bit/dim rung of the quantization ladder
  // (float32 → SQ8 4× → PQ 32× → THIS: 32× with INTEGER-only scoring),
  // the FAISS IndexBinaryFlat recipe: each vector collapses to its
  // sign bits (native SignPack, bit d set iff x_d > 0 — Charikar's
  // hyperplane LSH with the standard basis as planes, so Hamming
  // tracks angle on zero-centered dims) and candidates rank by
  // popcount(xor) against a BROADCAST of the packed query rows — one
  // native HammingFold per (candidate, query) on a map-only scan, the
  // only exchange the top-k window's. Hamming is an INTEGER, so
  // cross-engine parity is by construction: the oracle counts
  // sign-bit disagreements from the unpacked dims; ties break on the
  // lower cand_id. The persisted form lives in store/Bin.
  private def hammingScored(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Catalog.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
    val cands = emb.filter(col("vec_id") >= 4)
      .select(col("vec_id").as("cand_id"),
        graft.functions.SliceDists.signPack(spark, col("e")).as("bits"))
    val qs = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"),
        graft.functions.SliceDists.signPack(spark, col("e")).as("qbits"))
    cands.crossJoin(broadcast(qs))
      .select(col("query_id"), col("cand_id"),
        graft.functions.SliceDists
          .hammingFold(spark, col("bits"), col("qbits"))
          .cast("long").as("hamming"))
  }

  def annHammingTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming"), col("cand_id"))
    hammingScored(spark, sfDir)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("query_id"), col("rnk"), col("cand_id"), col("hamming"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Shared CTE: per-(query, candidate) sign-bit Hamming distances,
    * used by the direct top-k and the rerank oracle. The oracle works
    * on UNPACKED bits — the packed blob is a storage layout, not a
    * semantic; equality of the integer distances is the parity claim.
    */
  private val hammingCte: String =
    s"""WITH ex AS (
       |  SELECT vec_id, pos,
       |    -- NOT isnan: DuckDB sorts NaN above every value so NaN > 0
       |    -- is TRUE there, while Java's NaN comparisons are all
       |    -- false — pin both engines to the SignPack rule (NaN
       |    -- codes to 0, exactly like a non-positive dim)
       |    CASE WHEN e[pos] > 0 AND NOT isnan(e[pos]) THEN 1 ELSE 0 END AS s
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |       (SELECT unnest(range(1, ${dims + 1})) AS pos)
       |), hx AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
       |    CAST(SUM(CASE WHEN q.s <> c.s THEN 1 ELSE 0 END) AS BIGINT) AS hamming
       |  FROM ex q JOIN ex c USING (pos)
       |  WHERE q.vec_id < 4 AND c.vec_id >= 4
       |  GROUP BY q.vec_id, c.vec_id
       |)""".stripMargin

  val annHammingTopKSql: String =
    s"""$hammingCte
       |SELECT query_id, rnk, cand_id, hamming FROM (
       |  SELECT query_id, cand_id, hamming,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY hamming, cand_id) AS rnk
       |  FROM hx)
       |WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin

  // q_ann_hamming_rerank — binary shortlist → exact re-rank, the
  // serving composition binary codes exist for: the corpus-wide pass
  // touches ONLY 8-byte sign blobs (32× less I/O than floats, and the
  // scoring is integer popcount — no FP at all), then the
  // |queries|·width shortlist reads full vectors through a broadcast
  // semi-join for the exact cosine that decides the final top-5.
  // Same two-stage skeleton as q_ann_rerank (SQ8 stage 1); both
  // stages bit-exact cross-engine, so the composition is too.
  private val binRerankWidth = 16

  def annHammingRerank(spark: SparkSession, sfDir: String): DataFrame = {
    val hw = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming"), col("cand_id"))
    val shortlist = hammingScored(spark, sfDir)
      .withColumn("hrnk", row_number().over(hw))
      .filter(col("hrnk") <= binRerankWidth)
      .select(col("query_id"), col("cand_id"))
    val emb = Catalog.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("norm", sqrt(dot(col("e"), col("e"))))
    val qside = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("e").as("qe"),
        col("norm").as("qnorm"))
    val cside = emb.filter(col("vec_id") >= 4)
      .select(col("vec_id").as("cand_id"), col("e").as("ce"),
        col("norm").as("cnorm"))
    val exact = cside.join(broadcast(shortlist), Seq("cand_id"))
      .join(broadcast(qside), Seq("query_id"))
      .select(col("query_id"), col("cand_id"),
        (dot(col("qe"), col("ce")) / (col("qnorm") * col("cnorm")))
          .as("cosine"))
    topKPerQuery(exact, 5)
  }

  val annHammingRerankSql: String =
    s"""$hammingCte, shortlist AS (
       |  SELECT query_id, cand_id FROM (
       |    SELECT query_id, cand_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY hamming, cand_id) AS hrnk
       |    FROM hx)
       |  WHERE hrnk <= $binRerankWidth
       |), embx AS (
       |  SELECT vec_id, e, sqrt(${dotSql("e", "e")}) AS norm
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
       |), exact AS (
       |  SELECT s.query_id, s.cand_id,
       |    ${dotSql("q.e", "c.e")} / (q.norm * c.norm) AS cosine
       |  FROM shortlist s
       |  JOIN embx q ON q.vec_id = s.query_id
       |  JOIN embx c ON c.vec_id = s.cand_id
       |)
       |SELECT query_id, rnk, cand_id, cosine FROM (
       |  SELECT query_id, cand_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, cand_id) AS rnk
       |  FROM exact)
       |WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin

  // ---------------------------------------------------------------------
  // Shared LSH machinery for the bucketed search path: per vector, the
  // 8-bit hyperplane bucket + the norm, computed once.
  private def withBucketAndNorm(spark: SparkSession, sfDir: String): DataFrame = {
    val bits = (0 until nPlanes).map { p =>
      val weights = typedLit((0 until dims).map(d => planeWeight(p, d)))
      when(dot(weights, col("e")) > 0, lit("1")).otherwise(lit("0"))
    }
    Catalog.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .select(col("vec_id"), col("e"),
        concat(bits: _*).as("bucket"),
        sqrt(dot(col("e"), col("e"))).as("norm"))
  }

  private val bucketNormCte: String = {
    val planeExprs = (0 until nPlanes).map { p =>
      val w = s"(CASE WHEN substr(md5(CAST($p AS VARCHAR) || '_' || CAST(i - 1 AS VARCHAR)), 1, 1) " +
        s"IN ('0','1','2','3','4','5','6','7') THEN -1.0 ELSE 1.0 END)"
      val proj = s"list_reduce(list_prepend(0.0, list_transform(range(1, len(e) + 1), i -> $w * e[i])), (acc, x) -> acc + x)"
      s"(CASE WHEN $proj > 0 THEN '1' ELSE '0' END)"
    }
    s"""emb AS (
       |  SELECT vec_id, e, ${planeExprs.mkString(" || ")} AS bucket,
       |    sqrt(${dotSql("e", "e")}) AS norm
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
       |)""".stripMargin
  }

  // q_ann_lsh_topk — the bucketed ANN search itself: probes hit ONLY
  // their own sign-bucket's candidates (equi-join on bucket, ~N/256 of
  // the table), then exact cosine re-rank top-3. This is the plan
  // shape that survives 100 TB: the crossJoin of the brute-force
  // baseline becomes a hash join on the bucket key.
  def annLshTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = withBucketAndNorm(spark, sfDir)
    val probes = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("e").as("qe"),
        col("norm").as("qnorm"), col("bucket"))
    val cands = emb.filter(col("vec_id") >= 8)
      .select(col("vec_id").as("cand_id"), col("e").as("ce"),
        col("norm").as("cnorm"), col("bucket"))
    val scored = cands.join(broadcast(probes), Seq("bucket"))
      .select(col("query_id"), col("cand_id"),
        (dot(col("qe"), col("ce")) / (col("qnorm") * col("cnorm"))).as("cosine"))
    topKPerQuery(scored, 3)
  }

  val annLshTopKSql: String =
    s"""WITH $bucketNormCte, scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
       |    ${dotSql("q.e", "c.e")} / (q.norm * c.norm) AS cosine
       |  FROM emb q JOIN emb c ON q.bucket = c.bucket AND q.vec_id < 8 AND c.vec_id >= 8
       |), ranked AS (
       |  SELECT query_id, cand_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rnk
       |  FROM scored
       |)
       |SELECT query_id, rnk, cand_id, cosine FROM ranked WHERE rnk <= 3
       |ORDER BY query_id, rnk""".stripMargin

  // q_ann_lsh_multiprobe — multi-probe LSH (Lv et al. 2007, "Multi-
  // probe LSH: Efficient Indexing for High-Dimensional Similarity
  // Search"): single-probe LSH misses neighbors that fall JUST across
  // a hyperplane, and the planes most likely to be wrong for a query
  // are exactly the ones with the smallest |projection| margin. So
  // each probe searches its own bucket PLUS the buckets reached by
  // flipping its 2 lowest-margin sign bits — 3 of 256 buckets per
  // query instead of 1, trading ~3× candidates for the recall a
  // second hash table would buy WITHOUT storing a second index. Shape
  // is unchanged: the probe set (3 rows per query, broadcast) joins
  // candidates on the bucket key; margins sort in a bounded 8-element
  // array slice, never a corpus-side window.
  def annLshMultiprobe(spark: SparkSession, sfDir: String): DataFrame =
    lshMultiprobeSearch(
      Catalog.table(spark, sfDir, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("e")),
      probeMax = 8L, k = 3)

  /** The multiprobe search itself, over any (vec_id, e: array<double>)
    * corpus: rows with vec_id < `probeMax` probe, the rest are
    * candidates. Parameterized so quality suites can run the SAME plan
    * on planted-neighborhood corpora (AnnRecallSpec), not just the
    * testdata the oracle query pins.
    */
  private[graft] def lshMultiprobeSearch(
      embIdE: DataFrame, probeMax: Long, k: Int): DataFrame = {
    import graft.store.Iteration.materialize
    val projCols = (0 until nPlanes).map { p =>
      val weights = typedLit((0 until dims).map(d => planeWeight(p, d)))
      dot(weights, col("e"))
    }
    val emb = materialize(embIdE
      .select(col("vec_id"), col("e"), array(projCols: _*).as("projs"),
        sqrt(dot(col("e"), col("e"))).as("norm"))
      .withColumn("bucket", concat((0 until nPlanes).map { p =>
        when(element_at(col("projs"), p + 1) > 0, lit("1")).otherwise(lit("0"))
      }: _*)))
    val cands = emb.filter(col("vec_id") >= probeMax)
      .select(col("vec_id").as("cand_id"), col("e").as("ce"),
        col("norm").as("cnorm"), col("bucket"))
    val probes = emb.filter(col("vec_id") < probeMax)
      .select(col("vec_id").as("query_id"), col("e").as("qe"),
        col("norm").as("qnorm"), col("bucket"), col("projs"))
    // the 2 planes with the smallest |projection| per probe: bounded
    // 8-element sort inside the row, ties to the lower plane index
    val flips = probes.select(col("query_id"), col("qe"), col("qnorm"),
        col("bucket"),
        explode(slice(sort_array(transform(col("projs"),
          (x, i) => struct(abs(x).as("m"), i.as("p")))), 1, 2)).as("f"))
      .select(col("query_id"), col("qe"), col("qnorm"), col("bucket"),
        col("f.p").as("p"))
    def flipBit(b: Column, p: Column): Column = concat(
      b.substr(lit(1), p),
      when(b.substr(p + 1, lit(1)) === "1", lit("0")).otherwise(lit("1")),
      b.substr(p + 2, lit(nPlanes)))
    val probeBuckets = probes.drop("projs")
      .unionByName(flips.select(col("query_id"), col("qe"), col("qnorm"),
        flipBit(col("bucket"), col("p")).as("bucket")))
    val scored = cands.join(broadcast(probeBuckets), Seq("bucket"))
      .select(col("query_id"), col("cand_id"),
        (dot(col("qe"), col("ce")) / (col("qnorm") * col("cnorm"))).as("cosine"))
    topKPerQuery(scored, k)
  }

  val annLshMultiprobeSql: String = {
    val w = "(CASE WHEN substr(md5(CAST(p AS VARCHAR) || '_' || CAST(i - 1 AS VARCHAR)), 1, 1) " +
      "IN ('0','1','2','3','4','5','6','7') THEN -1.0 ELSE 1.0 END)"
    s"""WITH emb AS (
       |  SELECT vec_id, e, sqrt(${dotSql("e", "e")}) AS norm,
       |    list_transform(range(0, $nPlanes), p ->
       |      list_reduce(list_prepend(0.0, list_transform(range(1, len(e) + 1),
       |        i -> $w * e[i])), (acc, x) -> acc + x)) AS projs
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
       |), emb2 AS (
       |  SELECT vec_id, e, norm, projs,
       |    list_reduce(list_transform(projs,
       |      x -> CASE WHEN x > 0 THEN '1' ELSE '0' END), (a, b) -> a || b) AS bucket
       |  FROM emb
       |), cands AS (
       |  SELECT vec_id AS cand_id, e AS ce, norm AS cnorm, bucket
       |  FROM emb2 WHERE vec_id >= 8
       |), probes AS (
       |  SELECT vec_id AS query_id, e AS qe, norm AS qnorm, bucket, projs
       |  FROM emb2 WHERE vec_id < 8
       |), flips AS (
       |  SELECT query_id, p FROM (
       |    SELECT query_id, pp.p AS p,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY abs(projs[pp.p + 1]), pp.p) AS r
       |    FROM probes, (SELECT unnest(range(0, $nPlanes)) AS p) pp
       |  ) WHERE r <= 2
       |), probe_buckets AS (
       |  SELECT query_id, qe, qnorm, bucket FROM probes
       |  UNION ALL
       |  SELECT pr.query_id, pr.qe, pr.qnorm,
       |    substr(pr.bucket, 1, CAST(f.p AS INT)) ||
       |    (CASE WHEN substr(pr.bucket, CAST(f.p + 1 AS INT), 1) = '1' THEN '0' ELSE '1' END) ||
       |    substr(pr.bucket, CAST(f.p + 2 AS INT), $nPlanes) AS bucket
       |  FROM probes pr JOIN flips f ON pr.query_id = f.query_id
       |), scored AS (
       |  SELECT p.query_id, c.cand_id,
       |    ${dotSql("p.qe", "c.ce")} / (p.qnorm * c.cnorm) AS cosine
       |  FROM cands c JOIN probe_buckets p ON c.bucket = p.bucket
       |), ranked AS (
       |  SELECT query_id, cand_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rnk
       |  FROM scored
       |)
       |SELECT query_id, rnk, cand_id, cosine FROM ranked WHERE rnk <= 3
       |ORDER BY query_id, rnk""".stripMargin
  }

  // q_embed_near_dup — embedding-cosine near-duplicate detection,
  // bucketed: candidate pairs share an LSH bucket, verified by exact
  // cosine above threshold. Pair generation goes through
  // store/PairExpansion: with 256 sign buckets over N vectors,
  // per-bucket membership grows ~N/256 and a plain in-bucket self-join
  // is an unbounded quadratic inside one task — the grid split bounds
  // per-task expansion at ~cellSize² while emitting the identical pair
  // set (each vector is in exactly one bucket, so pairs are already
  // unique). The expansion carries IDS ONLY: 64-dim embeddings through
  // the grid's two shuffles and sorted task lists cost ~1.6× at sf0.1
  // and would dominate at scale; the vectors join back onto the small
  // verified-candidate pair set from the pinned frame instead.
  def embedNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.store.Iteration.materialize
    // materialize: pair branch + two vector join-backs all read `emb`;
    // unpinned, the hyperplane bucketing would recompute per branch
    val emb = materialize(withBucketAndNorm(spark, sfDir))
    graft.store.PairExpansion.pairsWithinBuckets(
        emb.select(col("vec_id"), col("bucket")),
        keyCols = Seq("bucket"), idCol = "vec_id")
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .join(emb.select(col("vec_id").as("vec_a"), col("e").as("ea"),
        col("norm").as("na")), Seq("vec_a"))
      .join(emb.select(col("vec_id").as("vec_b"), col("e").as("eb"),
        col("norm").as("nb")), Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        (dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cosine"))
      .filter(col("cosine") > 0.25)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  val embedNearDupSql: String =
    s"""WITH $bucketNormCte
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  ${dotSql("a.e", "b.e")} / (a.norm * b.norm) AS cosine
       |FROM emb a JOIN emb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |WHERE ${dotSql("a.e", "b.e")} / (a.norm * b.norm) > 0.25
       |ORDER BY vec_a, vec_b""".stripMargin

  // ---------------------------------------------------------------------
  // q_ann_ivf_topk — the IVF flavor of the scale path: vectors are
  // assigned to their nearest "centroid" cell (here: the first 16
  // vectors stand in for k-means centroids — deterministic so the
  // oracle can reproduce the partitioning; a real pipeline plugs
  // trained centroids into the same plan); probes search only their
  // nprobe=2 closest cells. Same join shape as LSH: assignment is a
  // narrow map against a broadcast centroid set, search is an
  // equi-join on the cell id + exact re-rank.
  private val nCentroids = 16
  private val nProbeCells = 2

  def annIvfTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Catalog.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("norm", sqrt(dot(col("e"), col("e"))))
    val cents = emb.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cent_id"), col("e").as("cent_e"),
        col("norm").as("cent_norm"))
    val cands = emb.filter(col("vec_id") >= nCentroids)
      .select(col("vec_id").as("cand_id"), col("e").as("ce"),
        col("norm").as("cnorm"))
    val probes = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("e").as("qe"),
        col("norm").as("qnorm"))

    def centScore(eCol: String, normCol: String): Column =
      dot(col(eCol), col("cent_e")) / (col(normCol) * col("cent_norm"))

    // Nearest-cell assignment as a partial aggregation, NOT a window:
    // row_number over (partition by cand_id) would shuffle all N×16
    // scored rows by cand_id just to keep 1 of 16. max_by collapses
    // each candidate to one row map-side (all 16 centroid rows of a
    // candidate sit in the same partition after the broadcast cross
    // join), so the exchange carries 1 row per candidate. The ordering
    // struct (cosine, -cent_id) reproduces the window's tie-break
    // (cosine DESC, cent_id ASC) exactly.
    val assignment = cands.crossJoin(broadcast(cents))
      .select(col("cand_id"), col("ce"), col("cnorm"), col("cent_id"),
        centScore("ce", "cnorm").as("_cs"))
      .groupBy(col("cand_id"))
      .agg(max_by(
        struct(col("ce"), col("cnorm"), col("cent_id").as("cell")),
        struct(col("_cs"), (-col("cent_id")).as("_nc"))).as("_best"))
      .select(col("cand_id"), col("_best.ce").as("ce"),
        col("_best.cnorm").as("cnorm"), col("_best.cell").as("cell"))

    // nprobe=2 closest cells per probe: bounded sorted-list agg (16
    // elements per group) instead of a window — same map-side collapse.
    val probeCells = probes.crossJoin(broadcast(cents))
      .select(col("query_id"), col("qe"), col("qnorm"),
        struct((-centScore("qe", "qnorm")).as("_ns"),
          col("cent_id").as("cell")).as("_sk"))
      .groupBy(col("query_id"))
      .agg(first(col("qe")).as("qe"), first(col("qnorm")).as("qnorm"),
        slice(sort_array(collect_list(col("_sk"))), 1, nProbeCells)
          .as("_cells"))
      .select(col("query_id"), col("qe"), col("qnorm"),
        explode(col("_cells.cell")).as("cell"))

    val scored = assignment.join(broadcast(probeCells), Seq("cell"))
      .select(col("query_id"), col("cand_id"),
        (dot(col("qe"), col("ce")) / (col("qnorm") * col("cnorm"))).as("cosine"))
    topKPerQuery(scored, 3)
  }

  val annIvfTopKSql: String = {
    def cosSql(a: String, b: String, na: String, nb: String) =
      s"${dotSql(a, b)} / ($na * $nb)"
    s"""WITH emb AS (
       |  SELECT vec_id, e, sqrt(${dotSql("e", "e")}) AS norm
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
       |), cents AS (
       |  SELECT vec_id AS cent_id, e AS cent_e, norm AS cent_norm FROM emb WHERE vec_id < $nCentroids
       |), assignment AS (
       |  SELECT cand_id, ce, cnorm, cell FROM (
       |    SELECT c.vec_id AS cand_id, c.e AS ce, c.norm AS cnorm, k.cent_id AS cell,
       |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
       |        ORDER BY ${cosSql("c.e", "k.cent_e", "c.norm", "k.cent_norm")} DESC, k.cent_id) AS crnk
       |    FROM emb c CROSS JOIN cents k WHERE c.vec_id >= $nCentroids
       |  ) WHERE crnk = 1
       |), probe_cells AS (
       |  SELECT query_id, qe, qnorm, cell FROM (
       |    SELECT q.vec_id AS query_id, q.e AS qe, q.norm AS qnorm, k.cent_id AS cell,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${cosSql("q.e", "k.cent_e", "q.norm", "k.cent_norm")} DESC, k.cent_id) AS crnk
       |    FROM emb q CROSS JOIN cents k WHERE q.vec_id < 4
       |  ) WHERE crnk <= $nProbeCells
       |), scored AS (
       |  SELECT p.query_id, a.cand_id,
       |    ${cosSql("p.qe", "a.ce", "p.qnorm", "a.cnorm")} AS cosine
       |  FROM assignment a JOIN probe_cells p ON a.cell = p.cell
       |), ranked AS (
       |  SELECT query_id, cand_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rnk
       |  FROM scored
       |)
       |SELECT query_id, rnk, cand_id, cosine FROM ranked WHERE rnk <= 3
       |ORDER BY query_id, rnk""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_kmeans_step — one Lloyd iteration of IVF centroid TRAINING (the
  // "a real pipeline plugs trained centroids into the same plan" half
  // of q_ann_ivf_topk): assign every vector to its nearest centroid
  // (max_by partial agg, same shape as the search-side assignment),
  // then recompute each centroid as the member mean per dimension.
  //
  // Distributed float means are partitioning-DEPENDENT (double
  // addition is not associative), which would break the oracle hash —
  // so the mean runs on 1e-6-quantized integers: floor(x·1e6) sums
  // exactly and commutatively in any order, and the single final
  // division is one double op. The quantization (≤1e-6 per component)
  // is far below embedding noise; what matters is that the SHAPE —
  // posexplode to (cell, dim), partial-agg'd sum, repack — is the
  // 100 TB-correct training step.
  def kmeansStep(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Catalog.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("norm", sqrt(dot(col("e"), col("e"))))
    val cents = emb.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cent_id"), col("e").as("cent_e"),
        col("norm").as("cent_norm"))
    val assignment = emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("e"),
        col("cent_id"),
        (dot(col("e"), col("cent_e")) / (col("norm") * col("cent_norm")))
          .as("_cs"))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("e"), col("cent_id").as("cell")),
        struct(col("_cs"), (-col("cent_id")).as("_nc"))).as("_best"))
      .select(col("_best.cell").as("cell"), col("_best.e").as("e"))
    assignment
      .select(col("cell"), posexplode(col("e")).as(Seq("pos", "v")))
      .groupBy(col("cell"), (col("pos") + 1).as("dim"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("v") * 1e6).cast("long")).as("q"))
      .select(col("cell"), col("dim").cast("long").as("dim"), col("n"),
        ((col("q").cast("double") / 1e6) / col("n").cast("double"))
          .as("centroid"))
      .orderBy(col("cell"), col("dim"))
  }

  val kmeansStepSql: String = {
    val cos = s"${dotSql("v.e", "k.cent_e")} / (v.norm * k.cent_norm)"
    s"""WITH emb AS (
       |  SELECT vec_id, e, sqrt(${dotSql("e", "e")}) AS norm
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
       |), cents AS (
       |  SELECT vec_id AS cent_id, e AS cent_e, norm AS cent_norm
       |  FROM emb WHERE vec_id < $nCentroids
       |), assignment AS (
       |  SELECT cell, e FROM (
       |    SELECT v.vec_id, v.e, k.cent_id AS cell,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |        ORDER BY $cos DESC, k.cent_id) AS crnk
       |    FROM emb v CROSS JOIN cents k
       |  ) WHERE crnk = 1
       |)
       |SELECT cell, CAST(dim AS BIGINT) AS dim, COUNT(*) AS n,
       |  (CAST(CAST(SUM(CAST(floor(e[dim] * 1e6) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e6)
       |    / CAST(COUNT(*) AS DOUBLE) AS centroid
       |FROM assignment, (SELECT unnest(range(1, ${dims + 1})) AS dim)
       |GROUP BY cell, dim
       |ORDER BY cell, dim""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_embed_diversity — per-label embedding DISPERSION: each label's
  // centroid (exact quantized-integer mean, the q_kmeans_step rule)
  // and its members' mean cosine to it. The curation dial mixture
  // pipelines read before sampling: a label whose members hug their
  // centroid (mean cos → 1) is redundant — semantic dedup will
  // collapse it — while a dispersed label carries diversity worth
  // oversampling; SemDeDup's own extreme-points observation made
  // per-cluster dispersion the keep/drop signal.
  //
  // Float-parity discipline end to end: centroid components from
  // 1e-6-quantized integer sums (order-free), per-member cosine =
  // sequential-fold dot / norms (one expression, identical operands
  // both engines), the per-label MEAN again over 1e-6-quantized longs
  // with one final division. Shape: one posexplode + partial-agg'd
  // groupBy(label, dim) for centroids (centroid table = labels × dims
  // rows, broadcast back), map-side cosine, one groupBy(label) — no
  // shuffle carries vectors beyond the first aggregation.
  def embedDiversity(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Catalog.table(spark, sfDir, "embeddings")
      .select(col("label").cast("long").as("label"), col("vec_id"),
        asDouble(col("embedding")).as("e"))
    val cents = emb
      .select(col("label"), posexplode(col("e")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(floor(col("v") * 1e6).cast("long")).as("q"),
        count(lit(1)).as("n"))
      .withColumn("c",
        (col("q").cast("double") / 1e6) / col("n").cast("double"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("cent"))
    emb.join(broadcast(cents), Seq("label"))
      .select(col("label"),
        (dot(col("e"), col("cent"))
          / (sqrt(dot(col("e"), col("e"))) * sqrt(dot(col("cent"), col("cent")))))
          .as("cos"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(floor(col("cos") * 1e6).cast("long")).as("qsum"))
      .select(col("label"), col("n_vecs"),
        ((col("qsum").cast("double") / 1e6) / col("n_vecs").cast("double"))
          .as("mean_cos"))
      .orderBy(col("label"))
  }

  val embedDiversitySql: String = {
    val cosExpr = s"${dotSql("m.e", "c.cent")} / " +
      s"(sqrt(${dotSql("m.e", "m.e")}) * sqrt(${dotSql("c.cent", "c.cent")}))"
    s"""WITH emb AS (
       |  SELECT CAST(label AS BIGINT) AS label, vec_id,
       |    CAST(embedding AS DOUBLE[]) AS e
       |  FROM embeddings
       |), comp AS (
       |  SELECT label, dim,
       |    (CAST(SUM(CAST(floor(e[dim] * 1e6) AS BIGINT)) AS DOUBLE) / 1e6)
       |      / CAST(COUNT(*) AS DOUBLE) AS c
       |  FROM emb, (SELECT unnest(range(1, ${dims + 1})) AS dim)
       |  GROUP BY label, dim
       |), cents AS (
       |  SELECT label, list(c ORDER BY dim) AS cent FROM comp GROUP BY label
       |), scored AS (
       |  SELECT m.label, $cosExpr AS cos
       |  FROM emb m JOIN cents c USING (label)
       |)
       |SELECT label, COUNT(*) AS n_vecs,
       |  (CAST(SUM(CAST(floor(cos * 1e6) AS BIGINT)) AS DOUBLE) / 1e6)
       |    / CAST(COUNT(*) AS DOUBLE) AS mean_cos
       |FROM scored GROUP BY label ORDER BY label""".stripMargin
  }

  /** Full Lloyd training loop around the oracle-verified step shape:
    * seed with the k lowest-id vectors (deterministic), iterate
    * assignment (max_by against broadcast centroids) + quantized-mean
    * update, each iteration's centroids pinned through store.Iteration
    * (reliable checkpoint() when a checkpoint dir is configured —
    * cluster fault tolerance — localCheckpoint otherwise). Empty
    * cells keep their previous centroid. Returns (cent_id, cent_e) —
    * exactly what annIvfTopK-style search plans take as their
    * centroid set.
    *
    * `emb` needs (vec_id: long, e: array<double>).
    */
  def kmeansTrain(emb: DataFrame, k: Int, iters: Int): DataFrame =
    graft.store.Kmeans.train(emb, k, iters)

  // ---------------------------------------------------------------------
  // q_pq_encode — product quantization: the embedding-compression
  // stage of a 100 TB vector store. The 64-dim vector splits into 8
  // subvectors of 8 dims; each subvector is replaced by the id of its
  // nearest codeword in that subspace's 16-entry codebook → a 256-byte
  // float vector compresses to 8 codes (32× smaller; ADC search then
  // scans codes against a per-query lookup table instead of raw
  // floats). Codebooks here are the 16 lowest-vec_id vectors' slices —
  // the same deterministic seed convention as q_ann_ivf_topk's
  // centroids (production would train each subspace codebook with
  // kmeansTrain on the slice columns; the encode plan is identical).
  //
  // Shape: broadcast cross join against the 16 codewords, per-slice
  // squared-L2 as sequential left-folds (bit-exact vs the oracle), and
  // the per-(vector, slice) argmin as a min_by PARTIAL aggregation —
  // one row per (vector, slice) crosses the exchange, not the ×16
  // scored set; codes reassemble via the sorted-struct-collect trick
  // (same as the k-means mean update).
  private val pqSlices = 8
  private val pqSubDim = 8
  private val pqCodebook = 16

  /** Per-slice squared-L2 between vector columns `a` and `b`:
    * array of (s, d) structs, one per subspace, each a sequential
    * left-fold (bit-exact vs the oracle). Native one-pass loop
    * ([[graft.functions.SliceL2Dists]]) — the interpreted
    * aggregate(zip_with(slice…)) chain it replaced dominated the PQ
    * queries' profile (SliceDistsSpec pins bit-for-bit parity with
    * that chain).
    */
  private def pqSliceDists(a: Column, b: Column): Column =
    graft.functions.SliceDists.sliceL2(
      org.apache.spark.sql.SparkSession.active, a, b, pqSlices, pqSubDim)

  private def pqEmb(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))

  private def pqCents(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") < pqCodebook)
      .select(col("vec_id").as("cent_id"), col("e").as("ce"))

  /** One (vec_id, s, code) row per vector and subspace — the exploded
    * code table ADC search joins against; `pqEncode` reassembles it
    * into per-vector code arrays.
    */
  private def pqCodesExploded(emb: DataFrame, cents: DataFrame): DataFrame =
    emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cent_id"),
        explode(pqSliceDists(col("e"), col("ce"))).as("sd"))
      .select(col("vec_id"), col("cent_id"),
        col("sd.s").as("s"), col("sd.d").as("d"))
      .groupBy(col("vec_id"), col("s"))
      .agg(min_by(col("cent_id"), struct(col("d"), col("cent_id"))).as("code"))

  /** The per-vector code ARRAY — the library surface downstream
    * consumers (persisted code tables, ADC search) use.
    */
  def pqEncodeCodes(emb: DataFrame, cents: DataFrame): DataFrame =
    pqCodesExploded(emb, cents)
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("s"), col("code")))),
        x => x.getField("code")).as("codes"))

  // The oracle-checked query serializes the code array to a CSV string:
  // the driver's pandas-based hash check sorts result columns, and a
  // numpy array column is unhashable/unsortable there — the string form
  // carries identical information and is order-stable on both engines.
  def pqEncode(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = pqEmb(spark, sfDir)
    pqEncodeCodes(emb, pqCents(emb))
      .select(col("vec_id"),
        concat_ws(",", transform(col("codes"), c => c.cast("string"))).as("codes"))
      .orderBy(col("vec_id"))
  }

  val pqEncodeSql: String =
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |cents AS (SELECT vec_id AS cent_id, e AS ce FROM emb WHERE vec_id < $pqCodebook),
       |sliced AS (
       |  SELECT v.vec_id, k.cent_id, s.s AS s,
       |    list_reduce(list_prepend(0.0, list_transform(range(1, ${pqSubDim + 1}),
       |      i -> (v.e[s.s*$pqSubDim + i] - k.ce[s.s*$pqSubDim + i]) * (v.e[s.s*$pqSubDim + i] - k.ce[s.s*$pqSubDim + i]))),
       |      (acc, x) -> acc + x) AS d
       |  FROM emb v CROSS JOIN cents k CROSS JOIN (SELECT unnest(range(0, $pqSlices)) AS s) s
       |), best AS (
       |  SELECT vec_id, s, cent_id FROM (
       |    SELECT vec_id, s, cent_id,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, cent_id) AS rnk
       |    FROM sliced) WHERE rnk = 1
       |)
       |SELECT vec_id, array_to_string(list(cent_id ORDER BY s), ',') AS codes
       |FROM best GROUP BY vec_id ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_ann_pq_topk — ADC (asymmetric distance computation) search over
  // the PQ codes: each probe precomputes a 16×8 lookup table of
  // (codeword, slice) → squared-L2 against ITS OWN raw subvectors,
  // then a candidate's approximate distance is just the sum of 8 table
  // entries selected by its codes — the scan never touches candidate
  // floats, which is the whole point at 100 TB (8 bytes/vector read
  // instead of 256). The per-slice LUT distances are 1e-6-quantized to
  // longs before summing (same convention as q_kmeans_step): an
  // 8-value double sum inside a groupBy would be partition-order-
  // dependent; quantized longs add exactly and commutatively on any
  // cluster shape. Shape: codes ⋈ broadcast LUT on (s, code) — an
  // equi-join — then one partial-agg'd sum per (query, candidate) and
  // the WindowGroupLimit top-k.
  def annPqTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = pqEmb(spark, sfDir)
    val cents = pqCents(emb)
    val codes = pqCodesExploded(emb.filter(col("vec_id") >= pqCodebook), cents)
    val lut = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("e").as("qe"))
      .crossJoin(broadcast(cents))
      .select(col("query_id"), col("cent_id").as("code"),
        explode(pqSliceDists(col("qe"), col("ce"))).as("sd"))
      .select(col("query_id"), col("code"), col("sd.s").as("s"),
        floor(col("sd.d") * 1e6).cast("long").as("qd"))
    val ranked = codes.join(broadcast(lut), Seq("s", "code"))
      .groupBy(col("query_id"), col("vec_id").as("cand_id"))
      .agg(sum(col("qd")).as("adist"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("adist"), col("cand_id"))).cast("long"))
      .filter(col("rnk") <= 3)
    ranked.select(col("query_id"), col("rnk"), col("cand_id"), col("adist"))
      .orderBy(col("query_id"), col("rnk"))
  }

  val annPqTopKSql: String = {
    val sliceDist = (a: String, b: String) =>
      s"""list_reduce(list_prepend(0.0, list_transform(range(1, ${pqSubDim + 1}),
         |      i -> ($a[s.s*$pqSubDim + i] - $b[s.s*$pqSubDim + i]) * ($a[s.s*$pqSubDim + i] - $b[s.s*$pqSubDim + i]))),
         |      (acc, x) -> acc + x)""".stripMargin
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |cents AS (SELECT vec_id AS cent_id, e AS ce FROM emb WHERE vec_id < $pqCodebook),
       |sliced AS (
       |  SELECT v.vec_id, k.cent_id, s.s AS s, ${sliceDist("v.e", "k.ce")} AS d
       |  FROM emb v CROSS JOIN cents k CROSS JOIN (SELECT unnest(range(0, $pqSlices)) AS s) s
       |  WHERE v.vec_id >= $pqCodebook
       |), best AS (
       |  SELECT vec_id, s, cent_id AS code FROM (
       |    SELECT vec_id, s, cent_id,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, cent_id) AS rnk
       |    FROM sliced) WHERE rnk = 1
       |), lut AS (
       |  SELECT q.vec_id AS query_id, k.cent_id AS code, s.s AS s,
       |    CAST(floor(${sliceDist("q.e", "k.ce")} * 1e6) AS BIGINT) AS qd
       |  FROM emb q CROSS JOIN cents k CROSS JOIN (SELECT unnest(range(0, $pqSlices)) AS s) s
       |  WHERE q.vec_id < 4
       |), scored AS (
       |  SELECT l.query_id, b.vec_id AS cand_id, CAST(SUM(l.qd) AS BIGINT) AS adist
       |  FROM best b JOIN lut l ON b.s = l.s AND b.code = l.code
       |  GROUP BY l.query_id, b.vec_id
       |), ranked AS (
       |  SELECT query_id, cand_id, adist,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adist, cand_id) AS rnk
       |  FROM scored
       |)
       |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, cand_id, adist
       |FROM ranked WHERE rnk <= 3
       |ORDER BY query_id, rnk""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_ann_ivfpq_topk — the COMPOSED production ANN shape (the FAISS
  // IVFPQ layout, re-expressed as Spark joins): IVF cells cut WHICH
  // candidates are read (probes visit nprobe=2 of 16 cells — at scale,
  // directory-level partition pruning via store/Ivf), and residual PQ
  // codes cut the BYTES read per candidate (8 codes instead of 64
  // floats — store/Pq). Candidates encode their RESIDUAL r = e −
  // centroid[cell] (residual encoding is what makes IVFPQ accurate:
  // residuals are centered near 0, so one shared codebook covers every
  // cell), and each probe builds one LUT PER PROBED CELL against its
  // own residual in that cell — ADC then scores a candidate as the sum
  // of 8 quantized table entries selected by (cell, s, code), never
  // touching candidate floats.
  //
  // Determinism for the oracle: cells = the 16 lowest-vec_id vectors
  // (the q_ann_ivf_topk convention), codebooks = the residuals of the
  // 16 lowest CANDIDATE vec_ids (16..31), one codeword per slice each
  // (production trains both with Kmeans/Pq.trainBooks and plugs them
  // into this same plan); argmin/argmax tie-break on the lower id; LUT
  // entries 1e-6-quantize to longs so candidate sums are exact and
  // commutative on any partitioning.
  def annIvfPqTopK(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.store.Iteration.materialize
    val emb = materialize(Catalog.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("norm", sqrt(dot(col("e"), col("e")))))
    val cents = emb.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cent_id"), col("e").as("cent_e"),
        col("norm").as("cent_norm"))

    // candidate → nearest cell (max_by partial agg; cent_e rides along
    // for the residual) → residual r = e − centroid[cell]
    val resid = materialize(emb.filter(col("vec_id") >= nCentroids)
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("e"), col("cent_id"), col("cent_e"),
        (dot(col("e"), col("cent_e")) / (col("norm") * col("cent_norm")))
          .as("_cs"))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("e"), col("cent_id").as("cell"), col("cent_e")),
        struct(col("_cs"), (-col("cent_id")).as("_nc"))).as("_best"))
      .select(col("vec_id"), col("_best.cell").as("cell"),
        sub(col("_best.e"), col("_best.cent_e")).as("r")))

    // shared codebook: the residuals of candidates 16..31, codeword j =
    // vec_id − 16 (slice s of seed j is subspace s's j-th codeword)
    val books = resid
      .filter(col("vec_id") < nCentroids + pqCodebook)
      .select((col("vec_id") - nCentroids).as("code"), col("r").as("br"))

    // encode: per (candidate, slice) argmin over the 16 codewords —
    // min_by partial agg, one row per (vec_id, s) crosses the exchange
    val codes = resid.crossJoin(broadcast(books))
      .select(col("vec_id"), col("cell"), col("code"),
        explode(pqSliceDists(col("r"), col("br"))).as("sd"))
      .groupBy(col("vec_id"), col("cell"), col("sd.s").as("s"))
      .agg(min_by(col("code"), struct(col("sd.d"), col("code"))).as("code"))

    // probes (vec_id < 4) pick their nprobe=2 closest cells — bounded
    // sorted-list agg, same shape as q_ann_ivf_topk — and carry the
    // probed cell's centroid for the per-cell query residual
    val probeCells = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("e").as("qe"),
        col("norm").as("qnorm"))
      .crossJoin(broadcast(cents))
      .select(col("query_id"),
        struct(
          (-(dot(col("qe"), col("cent_e")) / (col("qnorm") * col("cent_norm"))))
            .as("_ns"),
          col("cent_id").as("cell"),
          sub(col("qe"), col("cent_e")).as("qr"))
          .as("_sk"))
      .groupBy(col("query_id"))
      .agg(slice(sort_array(collect_list(col("_sk"))), 1, nProbeCells)
        .as("_cells"))
      .select(col("query_id"), explode(col("_cells")).as("_c"))
      .select(col("query_id"), col("_c.cell").as("cell"), col("_c.qr").as("qr"))

    // per-(query, cell) residual LUT: 2 cells × 8 slices × 16 codes per
    // probe, quantized to longs — tiny, broadcast
    val lut = probeCells.crossJoin(broadcast(books))
      .select(col("query_id"), col("cell"), col("code"),
        explode(pqSliceDists(col("qr"), col("br"))).as("sd"))
      .select(col("query_id"), col("cell"), col("sd.s").as("s"), col("code"),
        floor(col("sd.d") * 1e6).cast("long").as("qd"))

    // ADC: equi-join on (cell, s, code) routes candidates to the
    // queries probing their cell AND selects their 8 LUT entries in
    // one go; partial-agg'd sum, WindowGroupLimit top-k
    val ranked = codes.join(broadcast(lut), Seq("cell", "s", "code"))
      .groupBy(col("query_id"), col("vec_id").as("cand_id"))
      .agg(sum(col("qd")).as("adist"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("adist"), col("cand_id"))).cast("long"))
      .filter(col("rnk") <= 3)
    ranked.select(col("query_id"), col("rnk"), col("cand_id"), col("adist"))
      .orderBy(col("query_id"), col("rnk"))
  }

  val annIvfPqTopKSql: String = {
    val cos = (e: String, n: String) =>
      s"${dotSql(e, "k.cent_e")} / ($n * k.cent_norm)"
    val sliceDist = (a: String, b: String) =>
      s"""list_reduce(list_prepend(0.0, list_transform(range(1, ${pqSubDim + 1}),
         |      i -> ($a[s.s*$pqSubDim + i] - $b[s.s*$pqSubDim + i]) * ($a[s.s*$pqSubDim + i] - $b[s.s*$pqSubDim + i]))),
         |      (acc, x) -> acc + x)""".stripMargin
    s"""WITH emb AS (
       |  SELECT vec_id, e, sqrt(${dotSql("e", "e")}) AS norm
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
       |), cents AS (
       |  SELECT vec_id AS cent_id, e AS cent_e, norm AS cent_norm
       |  FROM emb WHERE vec_id < $nCentroids
       |), resid AS (
       |  SELECT vec_id, cell,
       |    list_transform(range(1, ${dims + 1}), i -> e[i] - cent_e[i]) AS r
       |  FROM (
       |    SELECT c.vec_id, c.e, k.cent_id AS cell, k.cent_e,
       |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
       |        ORDER BY ${cos("c.e", "c.norm")} DESC, k.cent_id) AS crnk
       |    FROM emb c CROSS JOIN cents k WHERE c.vec_id >= $nCentroids
       |  ) WHERE crnk = 1
       |), books AS (
       |  SELECT vec_id - $nCentroids AS code, r AS br FROM resid
       |  WHERE vec_id < ${nCentroids + pqCodebook}
       |), codes AS (
       |  SELECT vec_id, cell, s, code FROM (
       |    SELECT v.vec_id, v.cell, s.s AS s, b.code,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id, s.s
       |        ORDER BY ${sliceDist("v.r", "b.br")}, b.code) AS rnk
       |    FROM resid v CROSS JOIN books b
       |      CROSS JOIN (SELECT unnest(range(0, $pqSlices)) AS s) s
       |  ) WHERE rnk = 1
       |), probe_cells AS (
       |  SELECT query_id, cell,
       |    list_transform(range(1, ${dims + 1}), i -> qe[i] - cent_e[i]) AS qr
       |  FROM (
       |    SELECT q.vec_id AS query_id, q.e AS qe, k.cent_id AS cell, k.cent_e,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${cos("q.e", "q.norm")} DESC, k.cent_id) AS crnk
       |    FROM emb q CROSS JOIN cents k WHERE q.vec_id < 4
       |  ) WHERE crnk <= $nProbeCells
       |), lut AS (
       |  SELECT p.query_id, p.cell, s.s AS s, b.code,
       |    CAST(floor(${sliceDist("p.qr", "b.br")} * 1e6) AS BIGINT) AS qd
       |  FROM probe_cells p CROSS JOIN books b
       |    CROSS JOIN (SELECT unnest(range(0, $pqSlices)) AS s) s
       |), scored AS (
       |  SELECT l.query_id, c.vec_id AS cand_id, CAST(SUM(l.qd) AS BIGINT) AS adist
       |  FROM codes c JOIN lut l ON c.cell = l.cell AND c.s = l.s AND c.code = l.code
       |  GROUP BY l.query_id, c.vec_id
       |), ranked AS (
       |  SELECT query_id, cand_id, adist,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adist, cand_id) AS rnk
       |  FROM scored
       |)
       |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, cand_id, adist
       |FROM ranked WHERE rnk <= 3
       |ORDER BY query_id, rnk""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_semantic_dedup — SemDeDup (Abbas et al. 2023, arXiv:2303.09540):
  // embedding-level semantic deduplication for pretraining corpora.
  // Where MinHash/SimHash catch LEXICAL near-dups, this catches
  // re-phrasings: cluster the embedding space (k-means cells — here
  // the deterministic 16-seed convention; production plugs
  // kmeansTrain output into the same plan), compare vectors ONLY
  // within their cell, and keep one representative per
  // cosine-connected component. The cell partitioning is what makes
  // it tractable at 100 TB: candidate pairs are in-cell only (equi-
  // join on the cell id, skew-bounded through PairExpansion's grid
  // tasks, ids-only payload), never a corpus×corpus product — the
  // same shape as q_embed_near_dup but with a clustering endgame the
  // cell structure makes CHEAP: edges are in-cell by construction, so
  // components never span cells and one per-cell union-find pass
  // ([[cellComponents]]) replaces the global pointer-jumping fixpoint;
  // representative = min vec_id, keep = (vec_id == cluster). The
  // oracle recomputes the same components as a recursive transitive
  // closure.
  private val semThreshold = 0.3

  def semanticDedup(spark: SparkSession, sfDir: String): DataFrame =
    cellComponents(semanticEdges(spark, sfDir))
      .select(col("doc_id").as("vec_id"), col("cluster"),
        (col("doc_id") === col("cluster")).as("keep"))
      .orderBy(col("vec_id"))

  /** Connected components of a CELL-LOCAL edge set — the SemDeDup
    * endgame specialized to the graph it actually runs on: every edge
    * joins two members of the SAME k-means cell (candidates are
    * generated in-cell), so no component can span cells and the global
    * pointer-jumping fixpoint (log-rounds of joins, each checkpointed)
    * collapses to ONE shuffle on the cell id + a per-cell union-find
    * inside `flatMapGroups`. Representative = min member id (union
    * attaches the larger root under the smaller), bit-identical to the
    * min-label fixpoint [[DedupOps.connectedComponents]] computes.
    *
    * Scale: per-task state is the cell's VERTEX set (not its edges —
    * the iterator streams), so memory is bounded by the largest cell,
    * the same bound the in-cell pair expansion already imposes — and
    * since round 12 that bound is enforced WITHOUT operator tuning:
    * [[autoSplitCells]] refines any cell past `defaultMaxCellSize`
    * before pairs are ever generated, so a skewed corpus cannot hand
    * this stage (or PairExpansion) a degenerate giant cell. The
    * per-task vertex peak is observable through [[lastCcPeak]].
    */
  private[graft] def cellComponents(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val peak = new MaxAcc
    spark.sparkContext.register(peak, "graft.cc.peakVertices")
    lastCcPeak = Some(peak)
    edges
      .select(col("cell").cast("long"), col("doc_a").cast("long"),
        col("doc_b").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (_, a, b) =>
          if (!parent.contains(a)) parent(a) = a
          if (!parent.contains(b)) parent(b) = b
          val (ra, rb) = (find(a), find(b))
          // attach the larger root under the smaller: the root stays
          // the component's MIN id — the oracle's representative
          if (ra < rb) parent(rb) = ra
          else if (rb < ra) parent(ra) = rb
        }
        peak.add(parent.size.toLong)
        parent.keysIterator.map(k => (k, find(k))).toSeq
      }
      .toDF("doc_id", "cluster")
  }

  /** Max-of-task-values accumulator (Spark ships sum/list only). */
  private[graft] class MaxAcc
      extends org.apache.spark.util.AccumulatorV2[Long, Long] {
    private var m = 0L
    override def isZero: Boolean = m == 0L
    override def copy(): MaxAcc = { val c = new MaxAcc; c.m = m; c }
    override def reset(): Unit = m = 0L
    override def add(v: Long): Unit = m = math.max(m, v)
    override def merge(
        o: org.apache.spark.util.AccumulatorV2[Long, Long]): Unit =
      m = math.max(m, o.value)
    override def value: Long = m
  }

  /** Observability hook (Prof + specs): the max vertex-set size any
    * single task held during the most recent [[cellComponents]]
    * ACTION — the giant-cell memory bound, measured, not asserted.
    * Driver-side, last-call-wins; test/profiling use only.
    */
  private[graft] var lastCcPeak: Option[MaxAcc] = None

  /** The verified in-cell cosine edge set semanticDedup clusters,
    * with the cell id each edge lives in (columns doc_a, doc_b, cell)
    * — graft-visible so profiling harnesses can time CC variants on
    * the real edge distribution.
    */
  private[graft] def semanticEdges(spark: SparkSession, sfDir: String): DataFrame =
    semanticEdgesOf(Catalog.table(spark, sfDir, "embeddings"),
      defaultMaxCellSize)

  /** Largest vertex set one cell may hold before [[autoSplitCells]]
    * refines it. 4096 keeps the quadratic in-cell pair step ≤ ~8M
    * candidate pairs per cell and the union-find task ≤ 4096 parents —
    * comfortably inside one executor task at any corpus size. Far
    * above every cell the driver's SFs produce (≤2000 vectors total),
    * so oracle semantics are untouched at verification scale.
    */
  private[graft] val defaultMaxCellSize = 4096

  /** [[semanticEdges]] over an arbitrary (vec_id, embedding) frame
    * with an explicit giant-cell bound — the spec drives skewed
    * synthetic corpora through the exact production plan.
    */
  private[graft] def semanticEdgesOf(
      embRaw: DataFrame, maxCellSize: Int): DataFrame = {
    val spark = embRaw.sparkSession
    import graft.store.Iteration.materialize
    // emb feeds only the (broadcast-sized) cents filter and the one
    // assignment pass that `assigned` pins — recomputing the narrow
    // projection twice is cheaper than an extra eager checkpoint job
    val emb = embRaw
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("norm", sqrt(dot(col("e"), col("e"))))
    val cents = emb.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cent_id"), col("e").as("cent_e"),
        col("norm").as("cent_norm"))
    // every vector (seeds included — they are corpus members) to its
    // nearest cell: broadcast cents, max_by partial agg; then collapse
    // exact-duplicate vectors inside degenerate giant cells (the case
    // clustering cannot split) and refine what remains
    val assigned0 = materialize(emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("e"), col("norm"), col("cent_id"),
        (dot(col("e"), col("cent_e")) / (col("norm") * col("cent_norm")))
          .as("_cs"))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("e"), col("norm"), col("cent_id").as("cell")),
        struct(col("_cs"), (-col("cent_id")).as("_nc"))).as("_best"))
      .select(col("vec_id"), col("_best.e").as("e"),
        col("_best.norm").as("norm"), col("_best.cell").as("cell")))
    val (deduped, dupPairs) = collapseExactDups(assigned0, maxCellSize)
    val assigned = autoSplitCells(deduped, maxCellSize)
    // in-cell pairs, ids only through the grid; vectors join back onto
    // the (small) pair set for the exact-cosine edge filter
    val edges = graft.store.PairExpansion.pairsWithinBuckets(
        assigned.select(col("vec_id"), col("cell")),
        keyCols = Seq("cell"), idCol = "vec_id", payloadCols = Seq("cell"))
      .select(col("a.vec_id").as("doc_a"), col("b.vec_id").as("doc_b"),
        col("a.cell").as("cell"))
      .join(assigned.select(col("vec_id").as("doc_a"), col("e").as("ea"),
        col("norm").as("na")), Seq("doc_a"))
      .join(assigned.select(col("vec_id").as("doc_b"), col("e").as("eb"),
        col("norm").as("nb")), Seq("doc_b"))
      .filter(dot(col("ea"), col("eb")) / (col("na") * col("nb"))
        >= semThreshold)
      .select(col("doc_a"), col("doc_b"), col("cell"))
    // dup members rejoin through rep→member edges, tagged with the
    // rep's POST-split cell so cellComponents keeps one group per
    // vertex; cos(rep, member) = 1 ≥ any threshold — no verify needed
    dupPairs match {
      case Some(dp) => edges.unionByName(dp.join(
          assigned.select(col("vec_id").as("doc_a"), col("cell")),
          Seq("doc_a"))
        .select(col("doc_a"), col("doc_b"), col("cell")))
      case None => edges
    }
  }

  /** EXACT-DUPLICATE COLLAPSE inside oversized cells: bit-identical
    * vectors trivially satisfy any cosine threshold, so a cell of N
    * copies needs no pairs at all — the one degenerate shape
    * [[autoSplitCells]] provably cannot split (every copy ties on
    * every sub-seed). Members group by their full (cell, vector); the
    * min-id representative stays in the assignment for pair
    * generation, every other member leaves it and re-enters the edge
    * set as a direct rep→member edge. The pair step becomes quadratic
    * in DISTINCT vectors only, and components are exactly preserved:
    * any old edge (a, b) has the same cosine as (rep(a), rep(b)), and
    * each member rides its dup edge to the rep. Only cells past
    * `maxCellSize` pay the (cell, vector) shuffle — the common path
    * adds one metadata-scale count aggregate.
    */
  private def collapseExactDups(
      assigned: DataFrame, maxCellSize: Int): (DataFrame, Option[DataFrame]) = {
    import graft.store.Iteration.materialize
    val spark = assigned.sparkSession
    import spark.implicits._
    val oversized = assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > maxCellSize)
      .select(col("cell").cast("long")).as[Long].collect().toSeq
    if (oversized.isEmpty) return (assigned, None)
    val over = assigned.filter(col("cell").isin(oversized: _*))
    val keep = assigned.filter(!col("cell").isin(oversized: _*))
    val w = Window.partitionBy(col("cell"), col("e"))
    val tagged = materialize(
      over.withColumn("_rep", min(col("vec_id")).over(w)))
    val dupPairs = tagged.filter(col("vec_id") =!= col("_rep"))
      .select(col("_rep").as("doc_a"), col("vec_id").as("doc_b"))
    val reps = tagged.filter(col("vec_id") === col("_rep")).drop("_rep")
    (keep.unionByName(reps), Some(dupPairs))
  }

  /** GIANT-CELL AUTO-SPLIT: recursively re-cluster any cell whose
    * vertex count exceeds `maxCellSize`, using the same deterministic
    * machinery as the top level — sub-seeds are the `subK` smallest
    * member vec_ids (the engine's seed convention), assignment is one
    * broadcast-cosine max_by pass. Skew stops being an operator
    * judgment ("use more centroids"): both the quadratic in-cell pair
    * expansion and the per-cell union-find stay bounded by
    * `maxCellSize` automatically, at any corpus shape.
    *
    * Mechanics per round (≤ `maxRounds`, each a bounded job):
    * oversized cells come from a count aggregate (driver list ≤ cell
    * count — metadata-scale); sub-seed selection is a
    * `row_number ≤ subK` window, which InferWindowGroupLimit rewrites
    * into a per-partition top-k (no full sort of the giant cell, the
    * same bounded pattern [[topkPerQuery]] documents); refined cell
    * ids are `-(seed vec_id) - 1` — globally unique because a vector
    * seeds at most the one cell it belongs to, and negative so they
    * never collide with top-level centroid ids. Vectors whose cosine
    * ties across sub-seeds break deterministically (largest sub_cell
    * id = smallest seed id). A cell of IDENTICAL vectors cannot be
    * split by any clustering — rounds stop making progress and the cap
    * leaves it intact (its pairs are genuinely quadratic; that is the
    * data, not skew).
    */
  private[graft] def autoSplitCells(
      assigned: DataFrame, maxCellSize: Int,
      subK: Int = 8, maxRounds: Int = 8): DataFrame = {
    import graft.store.Iteration.materialize
    val spark = assigned.sparkSession
    import spark.implicits._
    var cur = assigned
    var round = 0
    var doneSplitting = false
    while (round < maxRounds && !doneSplitting) {
      val oversized = cur.groupBy(col("cell"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > maxCellSize)
        .select(col("cell").cast("long")).as[Long].collect().toSeq
      if (oversized.isEmpty) doneSplitting = true
      else {
        val over = cur.filter(col("cell").isin(oversized: _*))
        val keep = cur.filter(!col("cell").isin(oversized: _*))
        val w = Window.partitionBy(col("cell")).orderBy(col("vec_id"))
        val subCents = over
          .withColumn("_rk", row_number().over(w))
          .filter(col("_rk") <= subK)
          .select(col("cell"), (-col("vec_id") - lit(1L)).as("sub_cell"),
            col("e").as("cent_e"), col("norm").as("cent_norm"))
        val reassigned = over.join(broadcast(subCents), Seq("cell"))
          .select(col("vec_id"), col("e"), col("norm"), col("sub_cell"),
            (dot(col("e"), col("cent_e")) / (col("norm") * col("cent_norm")))
              .as("_cs"))
          .groupBy(col("vec_id"))
          .agg(max_by(
            struct(col("e"), col("norm"), col("sub_cell").as("cell")),
            struct(col("_cs"), col("sub_cell").as("_tie"))).as("_best"))
          .select(col("vec_id"), col("_best.e").as("e"),
            col("_best.norm").as("norm"), col("_best.cell").as("cell"))
        cur = materialize(keep.unionByName(reassigned))
      }
      round += 1
    }
    cur
  }

  val semanticDedupSql: String =
    s"""WITH RECURSIVE emb AS (
       |  SELECT vec_id, e, sqrt(${dotSql("e", "e")}) AS norm
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
       |), cents AS (
       |  SELECT vec_id AS cent_id, e AS cent_e, norm AS cent_norm
       |  FROM emb WHERE vec_id < $nCentroids
       |), assigned AS (
       |  SELECT vec_id, e, norm, cell FROM (
       |    SELECT c.vec_id, c.e, c.norm, k.cent_id AS cell,
       |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
       |        ORDER BY ${dotSql("c.e", "k.cent_e")} / (c.norm * k.cent_norm) DESC, k.cent_id) AS crnk
       |    FROM emb c CROSS JOIN cents k
       |  ) WHERE crnk = 1
       |), vpairs AS (
       |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
       |  FROM assigned a JOIN assigned b
       |    ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE ${dotSql("a.e", "b.e")} / (a.norm * b.norm) >= $semThreshold
       |), edges AS (
       |  SELECT doc_a AS s, doc_b AS d FROM vpairs
       |  UNION ALL
       |  SELECT doc_b AS s, doc_a AS d FROM vpairs
       |), reach AS (
       |  SELECT s AS src, s AS dst FROM (SELECT DISTINCT s FROM edges)
       |  UNION
       |  SELECT r.src, e.d AS dst FROM reach r JOIN edges e ON r.dst = e.s
       |)
       |SELECT src AS vec_id, MIN(dst) AS cluster,
       |  (src = MIN(dst)) AS keep
       |FROM reach GROUP BY src
       |ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_hybrid_rrf — hybrid lexical + semantic retrieval, the serving
  // shape RAG pipelines deploy (and the natural fusion of the two
  // index families this engine maintains — store/Hybrid.searchRrf is
  // the persisted-index form; this op is the same math as a pure
  // query). Two independent rankings over the same doc space:
  //   lexical — the SERVED scorer: BM25 (k1=1.2, b=0.75 — FTS5's
  //     constants, the exact formula Fts.searchRanked computes over
  //     the persisted index) for MATCH 'spark AND vector': idf(t) =
  //     ln((N - df + 0.5)/(df + 0.5) + 1), score(d) = Σ_t idf(t) ·
  //     tf·(k1+1) / (tf + k1·(1-b + b·dl/avgdl)), both terms
  //     required. N/avgdl are corpus stats, df corpus-wide per term —
  //     the same statistics the index's 1-row stats table persists.
  //   semantic — exact cosine of every other doc's embedding against
  //     doc 0's (the pinned left-fold double kernel).
  // Each leg truncates to depth 50 (ranks are UNDEFINED below the
  // retrieval depth — the truncated-list RRF form), then reciprocal-
  // rank fusion: rrf(d) = Σ 1/(60 + rank_leg(d)), absent legs
  // contribute 0 (Cormack et al., SIGIR'09; K=60 is the paper's
  // constant). Ranks fuse, never raw scores — BM25's unbounded sums
  // and cosine's [-1,1] need no calibration. Float parity: the BM25
  // expression tree is written identically on both sides (same
  // association, same literals — 2.2 is bit-equal to 1.2+1 in
  // binary64); the per-doc sum adds exactly TWO doubles (one per
  // query term), where IEEE addition is commutative, so aggregation
  // order cannot fork; ranks then fuse via 1/(60+r), one
  // exact-operand division. Scale: each leg is a bounded top-depth
  // list (posting-pruned scan; broadcast probe over the candidate
  // scan), so the fusion join touches ≤2·depth rows regardless of
  // corpus size. (Until r13 the lexical leg was a tf-sum stand-in
  // for oracle bit-parity; the oracle now carries the true scorer.)
  private val rrfK = 60
  private val rrfDepth = 50

  def hybridRrf(spark: SparkSession, sfDir: String): DataFrame = {
    // dl and both term frequencies are per-doc ARRAY statistics — no
    // explode, no token ever crosses a shuffle: one map-only pass
    // computes size(tokens) and two filtered counts per document (the
    // exploded groupBy(doc) form shuffled/aggregated every token and
    // measured ~2× this plan at sf0.1; tf-idf-style ops that need
    // per-token state still explode — BM25 over a FIXED query term
    // set does not). The corpus constants (N, avgdl, per-term df) are
    // then one 1-row aggregate, broadcast back.
    // pinned + fanned out: docStats feeds BOTH the corpus-stats
    // aggregate and the scored leg — lazy, the regex tokenize ran
    // twice (once per DAG branch; no cross-branch reuse in Spark) and
    // serialized on the narrow scan (measured: one 1.2 s single-task
    // stage). The pin is a ≤N-row narrow (id, 3 numbers) frame.
    val docStats = graft.store.Iteration.materialize(
      graft.store.Iteration.fanOutNarrow(
        Catalog.table(spark, sfDir, "documents"))
      .select(col("doc_id"),
        graft.ingest.Transforms.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("dl"),
        size(filter(col("toks"), t => t === "spark")).cast("double").as("tf_s"),
        size(filter(col("toks"), t => t === "vector")).cast("double").as("tf_v"))
      // a zero-token doc has no postings: it is absent from an FTS
      // index and from the oracle's exploded token stream — N/avgdl
      // must not count it
      .filter(col("dl") > 0))
    val stats = docStats.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"),
      count(when(col("tf_s") > 0, 1)).cast("double").as("df_s"),
      count(when(col("tf_v") > 0, 1)).cast("double").as("df_v"))
    // the same expression tree as the SQL, one leg per term; the
    // per-doc score is the two legs' explicit sum (IEEE addition of
    // two doubles is commutative, so this equals the SQL's SUM over
    // the two per-term rows)
    def idf(df: Column): Column =
      log((col("n_docs") - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))
    def leg(tf: Column, df: Column): Column =
      idf(df) * (tf * lit(2.2)) /
        (tf + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    val lexTop = docStats
      .filter(col("tf_s") > 0 && col("tf_v") > 0) // AND: both terms
      .crossJoin(broadcast(stats))
      .withColumn("score",
        leg(col("tf_s"), col("df_s")) + leg(col("tf_v"), col("df_v")))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(rrfDepth)
    // rank windows run AFTER the limit: a ≤depth-row frame, so the
    // unpartitioned window is bounded work, not a corpus funnel
    val lex = lexTop.withColumn("lex_rank", row_number().over(
      Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("lex_rank"))
    val emb = Catalog.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("norm", sqrt(dot(col("e"), col("e"))))
    val q = emb.filter(col("vec_id") === 0)
      .select(col("e").as("qe"), col("norm").as("qnorm"))
    val semTop = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        (dot(col("qe"), col("e")) / (col("qnorm") * col("norm"))).as("cosine"))
      .orderBy(col("cosine").desc, col("doc_id"))
      .limit(rrfDepth)
    val sem = semTop.withColumn("sem_rank", row_number().over(
      Window.orderBy(col("cosine").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("sem_rank"))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(lit(1.0) / (lit(rrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("sem_rank")), lit(0.0))).as("rrf"),
        col("lex_rank"), col("sem_rank"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(20)
  }

  val hybridRrfSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> '')) AS token
       |  FROM documents
       |), dl AS (
       |  SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
       |), stats AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl
       |), tf AS (
       |  SELECT doc_id, token, CAST(COUNT(*) AS DOUBLE) AS tf
       |  FROM toks WHERE token IN ('spark', 'vector')
       |  GROUP BY doc_id, token
       |), dfreq AS (
       |  SELECT token, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
       |  FROM tf GROUP BY token
       |), lex AS (
       |  SELECT doc_id, SUM(s) AS score FROM (
       |    SELECT t.doc_id,
       |      ln((st.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
       |        * (t.tf * 2.2) /
       |        (t.tf + 1.2 * (0.25 + 0.75 * l.dl / st.avgdl)) AS s
       |    FROM tf t
       |    JOIN dfreq d USING (token)
       |    JOIN dl l USING (doc_id)
       |    CROSS JOIN stats st)
       |  GROUP BY doc_id
       |  HAVING COUNT(*) = 2
       |), lexr AS (
       |  SELECT doc_id, lex_rank FROM (
       |    SELECT doc_id, score,
       |      row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rank
       |    FROM lex)
       |  ORDER BY score DESC, doc_id LIMIT $rrfDepth
       |), emb AS (
       |  SELECT vec_id, e, sqrt(${dotSql("e", "e")}) AS norm
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
       |), semr AS (
       |  SELECT doc_id, sem_rank FROM (
       |    SELECT doc_id, cosine,
       |      row_number() OVER (ORDER BY cosine DESC, doc_id) AS sem_rank
       |    FROM (
       |      SELECT c.vec_id AS doc_id,
       |        ${dotSql("q.e", "c.e")} / (q.norm * c.norm) AS cosine
       |      FROM emb c JOIN emb q ON q.vec_id = 0 AND c.vec_id <> 0))
       |  ORDER BY cosine DESC, doc_id LIMIT $rrfDepth
       |)
       |SELECT doc_id,
       |  COALESCE(1.0 / ($rrfK + lex_rank), 0.0) +
       |    COALESCE(1.0 / ($rrfK + sem_rank), 0.0) AS rrf,
       |  lex_rank, sem_rank
       |FROM lexr FULL JOIN semr USING (doc_id)
       |ORDER BY rrf DESC, doc_id
       |LIMIT 20""".stripMargin

  def ops: Seq[Op] = Seq(
    Op("q_hybrid_rrf", hybridRrf, Some(hybridRrfSql)),
    Op("q_pq_encode", pqEncode, Some(pqEncodeSql)),
    Op("q_ann_ivfpq_topk", annIvfPqTopK, Some(annIvfPqTopKSql)),
    Op("q_semantic_dedup", semanticDedup, Some(semanticDedupSql)),
    Op("q_ann_pq_topk", annPqTopK, Some(annPqTopKSql)),
    Op("q_kmeans_step", kmeansStep, Some(kmeansStepSql)),
    Op("q_embed_diversity", embedDiversity, Some(embedDiversitySql)),
    Op("q_cosine_topk", cosineTopK, Some(cosineTopKSql)),
    Op("q_ann_lsh_buckets", annLshBuckets, Some(annLshBucketsSql)),
    Op("q_ann_lsh_topk", annLshTopK, Some(annLshTopKSql)),
    Op("q_ann_lsh_multiprobe", annLshMultiprobe, Some(annLshMultiprobeSql)),
    Op("q_ann_ivf_topk", annIvfTopK, Some(annIvfTopKSql)),
    Op("q_embed_near_dup", embedNearDup, Some(embedNearDupSql)),
    Op("q_embed_norms", embedNorms, Some(embedNormsSql)),
    Op("q_int8_quant", int8Quant, Some(int8QuantSql)),
    Op("q_ann_sq_topk", annSqTopK, Some(annSqTopKSql)),
    Op("q_ann_filtered", annFiltered, Some(annFilteredSql)),
    Op("q_ann_rerank", annRerank, Some(annRerankSql)),
    Op("q_ann_hamming_topk", annHammingTopK, Some(annHammingTopKSql)),
    Op("q_ann_hamming_rerank", annHammingRerank, Some(annHammingRerankSql)),
    Op("q_random_projection", randomProjection, Some(randomProjectionSql)))
}
