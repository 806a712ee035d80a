package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stateful / incremental operators (SURVEY.md §2.4): the since_id
  * high-watermark (A1, `/root/reference/utils.py:154-225`), the
  * follower-count change-data-capture append (A2,
  * `/root/reference/utils.py:676-701`), and their batch-analytics
  * equivalents over the `events` stream table. Streaming variants live
  * in graft.streaming; these are the batch/window re-expressions the
  * oracle can check.
  */
object StateOps {

  // ---------------------------------------------------------------------
  // q_watermark_max — A1: per-(type,key) monotone max id persisted as
  // the resume watermark (`since_ids` table). Batch form: max(id) per
  // key — partial aggregation map-side, one narrow shuffle.
  def watermarkMax(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "events")
      .groupBy(col("event_type"))
      .agg(max(col("event_id")).as("since_id"), count(lit(1)).as("n_seen"))
      .orderBy(col("event_type"))

  val watermarkMaxSql: String =
    """SELECT event_type, MAX(event_id) AS since_id, COUNT(*) AS n_seen
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q_cdc_changes — A2: `save_user_counts` inserts a (type,user,ts,count)
  // row only when the count CHANGED vs the latest stored row — i.e.
  // change-data-capture compression of a time series. Batch form:
  // lag() over (user,type ordered by ts) and keep rows that differ.
  // Scale note: the window partitions by (user_id, event_type) — state
  // is bounded per key and shuffles once on the key, no global sort.
  def cdcChanges(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Catalog.table(spark, sfDir, "events")
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .filter(col("prev_value").isNull || col("value") =!= col("prev_value"))
      .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
      .orderBy(col("user_id"), col("event_type"), col("event_id"))
  }

  val cdcChangesSql: String =
    """SELECT user_id, event_type, event_id, value FROM (
      |  SELECT user_id, event_type, event_id, value,
      |         LAG(value) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev_value
      |  FROM events
      |) WHERE prev_value IS NULL OR value <> prev_value
      |ORDER BY user_id, event_type, event_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_top1_per_group — A2's read side: `order by datetime desc limit 1`
  // per (type,user) = top-1-per-group via row_number (TakeOrdered per
  // key, single shuffle on the group key).
  def top1PerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Catalog.table(spark, sfDir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy(col("user_id"))
  }

  val top1PerGroupSql: String =
    """SELECT user_id, event_id, event_type, value FROM (
      |  SELECT user_id, event_id, event_type, value,
      |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events
      |) WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_window_hourly — SURVEY §2.7: the reference has no event-time
  // windows (its only watermark is since_id); tumbling windows over
  // `events` are the idiomatic Spark extension. Batch form of the
  // streaming `groupBy(window($"ts","1 hour"))` aggregation.
  def windowHourly(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "events")
      .groupBy(
        date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
      .orderBy(col("hour"), col("event_type"))

  val windowHourlySql: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY date_trunc('hour', ts), event_type
      |ORDER BY hour, event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q_sessionize — extension shown against events: gap-based session
  // assignment (30-min inactivity) via lag + running conditional sum —
  // the batch analog of flatMapGroupsWithState sessionization.
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // gap math goes through an explicit TimestampType cast (a no-op on
    // already-normalized ts, an exact reinterpretation on NTZ under the
    // pinned-UTC session) so the query analyzes whatever timestamp
    // annotation the testdata generation carries
    val tzTs = col("ts").cast("timestamp")
    val newSession = when(
      tzTs.cast("long") -
        lag(tzTs, 1).over(byUser).cast("long") > 1800, 1)
      .otherwise(0)
    Catalog.table(spark, sfDir, "events")
      .withColumn("new_s", coalesce(newSession, lit(0)))
      .withColumn("session_idx",
        sum(col("new_s")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"), max(col("event_id")).as("last_event"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  val sessionizeSql: String =
    """SELECT user_id, session_idx, COUNT(*) AS n_events, MAX(event_id) AS last_event
      |FROM (
      |  SELECT user_id, event_id,
      |         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
      |  FROM (
      |    SELECT user_id, event_id, ts,
      |           CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
      |                THEN 1 ELSE 0 END AS new_s
      |    FROM events
      |  )
      |)
      |GROUP BY user_id, session_idx
      |ORDER BY user_id, session_idx""".stripMargin

  // ---------------------------------------------------------------------
  // q_funnel — ordered 3-stage conversion funnel (signup → click →
  // purchase, each stage strictly AFTER the previous per user): the
  // event-analytics staple. Each stage is a filtered min-timestamp
  // aggregation joined on user_id — co-partitioned equi-joins, state
  // bounded per user, no window over the whole stream. Conversion
  // rates are single-division doubles.
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Catalog.table(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, Seq("user_id"))
      .filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id"))
      .filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val n1 = s1.agg(count(lit(1)).as("n_signup"))
    val n2 = s2.agg(count(lit(1)).as("n_click_after"))
    val n3 = s3.agg(count(lit(1)).as("n_purchase_after"))
    n1.crossJoin(n2).crossJoin(n3)
      .select(col("n_signup"), col("n_click_after"), col("n_purchase_after"),
        (col("n_click_after").cast("double") / col("n_signup").cast("double"))
          .as("conv_click"),
        (col("n_purchase_after").cast("double") /
          col("n_click_after").cast("double")).as("conv_purchase"))
  }

  val funnelSql: String =
    """WITH s1 AS (
      |  SELECT user_id, MIN(ts) AS t1 FROM events
      |  WHERE event_type = 'signup' GROUP BY user_id
      |), s2 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t2
      |  FROM events e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click' AND e.ts > s1.t1
      |  GROUP BY e.user_id
      |), s3 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t3
      |  FROM events e JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      |  GROUP BY e.user_id
      |)
      |SELECT (SELECT COUNT(*) FROM s1) AS n_signup,
      |  (SELECT COUNT(*) FROM s2) AS n_click_after,
      |  (SELECT COUNT(*) FROM s3) AS n_purchase_after,
      |  CAST((SELECT COUNT(*) FROM s2) AS DOUBLE) /
      |    CAST((SELECT COUNT(*) FROM s1) AS DOUBLE) AS conv_click,
      |  CAST((SELECT COUNT(*) FROM s3) AS DOUBLE) /
      |    CAST((SELECT COUNT(*) FROM s2) AS DOUBLE) AS conv_purchase""".stripMargin

  // ---------------------------------------------------------------------
  // q_cohort_retention — first-seen-day cohorts × day-offset activity
  // (the retention triangle, offsets 0-7): cohort assignment is one
  // min-aggregation, activity one distinct projection, both joined on
  // user_id. countDistinct shuffles on (cohort, offset) after a
  // per-key partial — the standard scalable retention shape.
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Catalog.table(spark, sfDir, "events")
    val cohort = ev.groupBy(col("user_id"))
      .agg(to_date(min(col("ts"))).as("cohort_day"))
    val active = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    active.join(cohort, Seq("user_id"))
      .select(col("user_id"), col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .filter(col("day_offset") >= 0 && col("day_offset") <= 7)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  val cohortRetentionSql: String =
    """WITH cohort AS (
      |  SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day
      |  FROM events GROUP BY user_id
      |), active AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      |)
      |SELECT c.cohort_day, datediff('day', c.cohort_day, a.day) AS day_offset,
      |  COUNT(DISTINCT a.user_id) AS n_active
      |FROM active a JOIN cohort c ON a.user_id = c.user_id
      |WHERE datediff('day', c.cohort_day, a.day) BETWEEN 0 AND 7
      |GROUP BY 1, 2
      |ORDER BY cohort_day, day_offset""".stripMargin

  // ---------------------------------------------------------------------
  // q_cardinality_kmv — A3 (`/root/reference/cli.py:151-157`): the
  // reference estimates a table's distinct-value cardinality to size
  // its progress bar. SQLite can afford COUNT(DISTINCT); at 100 TB
  // that is a full shuffle of every distinct value, so the engine form
  // is a k-minimum-values sketch: hash every value with k independent
  // salted hashes onto [0,1); per group keep only the k per-hash
  // MINIMA (k plain min() aggregates — bounded state, partial-agg'd
  // map-side, mergeable across partitions, k doubles cross the
  // exchange per group); estimate n̂ = k/Σminᵢ − 1 (E[min of n uniform
  // draws] = 1/(n+1)). Duplicates hash identically so they never move
  // a minimum — the estimator sees distinct values only, no distinct
  // shuffle needed.
  //
  // Determinism: hash i of v = first 12 hex chars of md5("i|v") read
  // as a 48-bit integer over 16^12 (exact in a double); the k-term sum
  // is one fixed left-assoc chain and the estimate one division, so
  // both engines floor the same double. The exact COUNT(DISTINCT)
  // rides along as the accuracy ground truth for the demo (it is NOT
  // part of the production sketch path).
  private val kmvK = 16
  private val kmvDenom = math.pow(16.0, 12) // 2^48, exact

  /** Per-hash [0,1) fraction columns for value column `v`. */
  private def kmvFracs(v: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] =
    (0 until kmvK).map { i =>
      conv(substring(md5(concat(lit(s"$i|"), v)), 1, 12), 16, 10)
        .cast("long").cast("double") / lit(kmvDenom)
    }

  def cardinalityKmv(spark: SparkSession, sfDir: String): DataFrame = {
    val mins = kmvFracs(col("text")).zipWithIndex.map {
      case (f, i) => min(f).as(s"_m$i")
    }
    val sumMins = (0 until kmvK).map(i => col(s"_m$i")).reduce(_ + _)
    Catalog.table(spark, sfDir, "documents")
      .groupBy(col("source"))
      .agg(countDistinct(col("text")).as("exact_distinct"),
        mins: _*)
      .select(col("source"), col("exact_distinct"),
        floor(lit(kmvK.toDouble) / sumMins - lit(1.0)).cast("long")
          .as("est_distinct"))
      .orderBy(col("source"))
  }

  val cardinalityKmvSql: String = {
    // hex → 48-bit int: left fold acc*16 + digit over the 12 chars
    def frac(i: Int): String =
      s"""(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(range(1, 13), j ->
         |      CAST(strpos('0123456789abcdef',
         |        substr(md5('$i|' || text), CAST(j AS INT), 1)) - 1 AS BIGINT))),
         |    (acc, d) -> acc * 16 + d) AS DOUBLE) / $kmvDenom)""".stripMargin
    val mins = (0 until kmvK).map(i => s"MIN(${frac(i)}) AS _m$i").mkString(",\n  ")
    val sum = (0 until kmvK).map(i => s"_m$i").mkString(" + ")
    s"""WITH sk AS (
       |  SELECT source, COUNT(DISTINCT text) AS exact_distinct,
       |  $mins
       |  FROM documents GROUP BY source
       |)
       |SELECT source, exact_distinct,
       |  CAST(floor($kmvK.0 / ($sum) - 1.0) AS BIGINT) AS est_distinct
       |FROM sk
       |ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_cardinality_kmv_exact — the EXACT k-minimum-values sketch (the
  // estimator literature's canonical form, sharper than the k-mins-of-
  // k-hashes variant above): keep the k smallest DISTINCT hash values
  // per group via the native bounded-state aggregate
  // functions/KmvMins (a TypedImperativeAggregate — ≤ k longs of
  // state, partial-agg'd map-side, bounded set-union merge), then
  // n̂ = (k−1)·2^48 / h_k with h_k the kth smallest 48-bit hash.
  // Groups with fewer than k distinct hashes are counted EXACTLY
  // (the sketch degenerates to the true distinct set — size < k is
  // the tell). One IEEE division + floor on identical operands keeps
  // both engines bit-agreed; exact COUNT(DISTINCT) rides along as
  // ground truth.
  private val kmvExactC = (kmvK - 1).toDouble * 281474976710656.0 // (k−1)·2^48

  def cardinalityKmvExact(spark: SparkSession, sfDir: String): DataFrame = {
    val h = conv(substring(md5(col("text")), 1, 12), 16, 10).cast("long")
    Catalog.table(spark, sfDir, "documents")
      .groupBy(col("source"))
      .agg(countDistinct(col("text")).as("exact_distinct"),
        graft.functions.KmvMins.kmvMins(spark, h, kmvK).as("mins"))
      .select(col("source"), col("exact_distinct"),
        when(size(col("mins")) < kmvK, size(col("mins")).cast("long"))
          .otherwise(floor(lit(kmvExactC) /
            element_at(col("mins"), size(col("mins"))).cast("double"))
            .cast("long"))
          .as("est_distinct"))
      .orderBy(col("source"))
  }

  val cardinalityKmvExactSql: String =
    s"""WITH h AS (
       |  SELECT DISTINCT source,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, 13), j ->
       |        CAST(strpos('0123456789abcdef',
       |          substr(md5(text), CAST(j AS INT), 1)) - 1 AS BIGINT))),
       |      (acc, d) -> acc * 16 + d) AS h
       |  FROM documents
       |), ranked AS (
       |  SELECT source, h,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS r
       |  FROM h
       |), sk AS (
       |  SELECT source, COUNT(*) AS n_mins, MAX(h) AS hk
       |  FROM ranked WHERE r <= $kmvK GROUP BY source
       |), ex AS (
       |  SELECT source, COUNT(DISTINCT text) AS exact_distinct
       |  FROM documents GROUP BY source
       |)
       |SELECT ex.source, ex.exact_distinct,
       |  CASE WHEN sk.n_mins < $kmvK THEN sk.n_mins
       |       ELSE CAST(floor($kmvExactC / CAST(sk.hk AS DOUBLE)) AS BIGINT)
       |  END AS est_distinct
       |FROM ex JOIN sk ON ex.source = sk.source
       |ORDER BY ex.source""".stripMargin

  // ---------------------------------------------------------------------
  // q_quantile_sketch — rank statistics from a BOUNDED mergeable
  // sample, the third member of the sketch family (KMV counts
  // distincts, Misra-Gries counts frequencies, this samples
  // payloads). The exact-quantile plan q_quantile_hist avoids a
  // global sort but still passes the whole corpus through a
  // histogram; when an approximate answer suffices — progress
  // estimates, auto-tuning length cutoffs for q_quality_filter-style
  // gates — a deterministic bottom-k-by-hash uniform sample answers
  // ANY quantile from ≤ k longs of per-group state
  // (functions/BottomKSample: partial-agg'd map-side, bounded
  // ordered-set merge, ≤ k triples per group cross the exchange).
  //
  // Determinism: the sample is the k rows with the smallest
  // (md5-48bit("q|" || doc_id), doc_id) key — a function of the data
  // only, so any partitioning, cluster size, or ENGINE replays it
  // exactly; the oracle rebuilds it with a window rank over the same
  // order. Estimates are the lower-quantile elements (index
  // ⌊p·(n−1)⌋ of the value-sorted sample) — pure integer picks, no
  // interpolation to drift cross-engine.
  private val qskK = 64

  def quantileSketch(spark: SparkSession, sfDir: String): DataFrame = {
    val h = conv(substring(md5(concat(lit("q|"), col("doc_id").cast("string"))), 1, 12), 16, 10)
      .cast("long")
    val sample = graft.functions.BottomKSample
      .bottomK(spark, h, col("doc_id"), col("n_chars"), qskK)
    def pick(sorted: org.apache.spark.sql.Column, p: Double) =
      element_at(sorted,
        (floor(lit(p) * (size(sorted) - 1)) + 1).cast("int"))
    Catalog.table(spark, sfDir, "documents")
      .groupBy(col("source"))
      .agg(sample.as("sample"))
      .select(col("source"), size(col("sample")).cast("long").as("n_sample"),
        sort_array(col("sample")).as("sorted"))
      .select(col("source"), col("n_sample"),
        pick(col("sorted"), 0.5).as("p50_est"),
        pick(col("sorted"), 0.9).as("p90_est"),
        pick(col("sorted"), 0.99).as("p99_est"))
      .orderBy(col("source"))
  }

  val quantileSketchSql: String =
    s"""WITH h AS (
       |  SELECT source, doc_id, n_chars,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, 13), j ->
       |        CAST(strpos('0123456789abcdef',
       |          substr(md5('q|' || CAST(doc_id AS VARCHAR)), CAST(j AS INT), 1)) - 1 AS BIGINT))),
       |      (acc, d) -> acc * 16 + d) AS h
       |  FROM documents
       |), picked AS (
       |  SELECT source, n_chars,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
       |  FROM h
       |), smp AS (
       |  SELECT source, n_chars FROM picked WHERE rn <= $qskK
       |), sorted AS (
       |  SELECT source, n_chars,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars) AS rv,
       |    COUNT(*) OVER (PARTITION BY source) AS n
       |  FROM smp
       |)
       |SELECT source, CAST(MAX(n) AS BIGINT) AS n_sample,
       |  MAX(CASE WHEN rv = CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1 THEN n_chars END) AS p50_est,
       |  MAX(CASE WHEN rv = CAST(floor(0.9 * (n - 1)) AS BIGINT) + 1 THEN n_chars END) AS p90_est,
       |  MAX(CASE WHEN rv = CAST(floor(0.99 * (n - 1)) AS BIGINT) + 1 THEN n_chars END) AS p99_est
       |FROM sorted GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // q_pivot — wide-format reshaping via Spark's NATIVE pivot operator
  // (RelationalGroupedDataset.pivot with explicit values — the
  // explicit list keeps the plan static; the values-discovering
  // overload runs an eager distinct scan at plan time, the
  // construction-laziness contract every Op keeps). Daily event
  // counts per type, one row per day, one column per type. The
  // oracle spells the same reshape as conditional aggregation —
  // which is exactly the physical form Catalyst lowers pivot to
  // (PivotFirst/conditional agg), so this pins Spark's pivot
  // semantics against an independent engine. One partial-agg'd
  // shuffle on the day key at any scale.
  def pivotCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Catalog.table(spark, sfDir, "events")
      .select(to_date(col("ts")).as("day"), col("event_type"))
      .groupBy(col("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      // pivot leaves NULL for absent (day, type) cells; the count
      // semantics ("no events") is 0 on both engines
      .select(col("day") +: types.map(t =>
        coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
      .orderBy(col("day"))
  }

  val pivotCountsSql: String = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val cols = types.map(t =>
      s"CAST(COUNT(CASE WHEN event_type = '$t' THEN 1 END) AS BIGINT) AS n_$t")
      .mkString(",\n  ")
    s"""SELECT CAST(ts AS DATE) AS day,
       |  $cols
       |FROM events
       |GROUP BY 1
       |ORDER BY day""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_unpivot — the inverse reshape via Spark's NATIVE Dataset.unpivot
  // (melt): the wide day × per-type matrix back to long
  // (day, metric, n) rows. Round-tripping q_pivot's output pins both
  // reshape operators against the oracle, INCLUDING the zero-filled
  // cells pivot materializes for absent (day, type) combinations —
  // which a naive groupBy re-derivation would drop. The oracle spells
  // unpivot as the UNION ALL it desugars to.
  def unpivotCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    pivotCounts(spark, sfDir)
      .unpivot(Array(col("day")),
        types.map(t => col(s"n_$t")).toArray, "metric", "n")
      .orderBy(col("day"), col("metric"))
  }

  val unpivotCountsSql: String = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val branches = types.map(t =>
      s"SELECT day, 'n_$t' AS metric, n_$t AS n FROM w").mkString(
      "\nUNION ALL\n")
    s"""WITH w AS (
       |${pivotCountsSql.stripSuffix("ORDER BY day")}
       |)
       |$branches
       |ORDER BY day, metric""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_feature_corr — Pearson correlation per group (feature-QA: does
  // the value column drift with time of day?). Spark's corr() and
  // DuckDB's corr() both stream double sums in partition order — NOT
  // bit-reproducible — so the engine form follows the repo's exact-
  // sums discipline: the five moments accumulate as EXACT decimals
  // (value carries 2 fractional digits → decimal sums are lossless
  // and partitioning-independent), and r is derived from those exact
  // scalars by one fixed double formula — identical inputs, identical
  // expression, identical bits on both engines.
  def featureCorr(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Catalog.table(spark, sfDir, "events")
      .select(col("event_type"),
        col("value").cast("decimal(12,2)").as("x"),
        hour(col("ts")).cast("decimal(4,0)").as("y"))
    ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).cast("decimal(38,2)").as("sx"),
        sum(col("y")).cast("decimal(38,0)").as("sy"),
        sum(col("x") * col("y")).cast("decimal(38,2)").as("sxy"),
        sum(col("x") * col("x")).cast("decimal(38,4)").as("sxx"),
        sum(col("y") * col("y")).cast("decimal(38,0)").as("syy"))
      .select(col("event_type"), col("n"),
        col("sx").cast("double").as("dx_"),
        col("sy").cast("double").as("dy_"),
        col("sxy").cast("double").as("dxy_"),
        col("sxx").cast("double").as("dxx_"),
        col("syy").cast("double").as("dyy_"))
      // zero-variance guard: Spark's 0/0 is NULL, DuckDB's IEEE
      // division is NaN — r is mathematically undefined there, so
      // BOTH engines must say NULL explicitly
      .select(col("event_type"), col("n"),
        when(col("n") * col("dxx_") === col("dx_") * col("dx_") ||
          col("n") * col("dyy_") === col("dy_") * col("dy_"),
          lit(null).cast("double"))
          .otherwise(
            (col("n") * col("dxy_") - col("dx_") * col("dy_")) /
              (sqrt(col("n") * col("dxx_") - col("dx_") * col("dx_")) *
                sqrt(col("n") * col("dyy_") - col("dy_") * col("dy_"))))
          .as("r"))
      .orderBy(col("event_type"))
  }

  val featureCorrSql: String =
    """WITH m AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS DECIMAL(38,2)) AS sx,
      |    CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
      |    CAST(SUM(x * y) AS DECIMAL(38,2)) AS sxy,
      |    CAST(SUM(x * x) AS DECIMAL(38,4)) AS sxx,
      |    CAST(SUM(y * y) AS DECIMAL(38,0)) AS syy
      |  FROM (SELECT event_type, CAST(value AS DECIMAL(12,2)) AS x,
      |          CAST(hour(ts) AS DECIMAL(4,0)) AS y FROM events)
      |  GROUP BY event_type
      |)
      |SELECT event_type, n,
      |  CASE WHEN n * CAST(sxx AS DOUBLE) = CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
      |         OR n * CAST(syy AS DOUBLE) = CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
      |  THEN NULL ELSE
      |  (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |  (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |   sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
      |  END AS r
      |FROM m
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q_profile — the ANALYZE/data-profiling surface every lake runs
  // before trusting a new drop: per-column null count, distinct
  // count, min/max, all in ONE partial-agg'd pass over the table (no
  // per-column scans — the profile of a 100 TB table costs one read).
  // Stringly-typed output (one row per column) so heterogeneous
  // column types share a schema, numeric renderings pinned to
  // integer-exact forms.
  def profile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val orders = Catalog.table(spark, sfDir, "orders")
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val row = orders.agg(count(lit(1)).as("n_rows"), aggs: _*)
    // one output row per profiled column
    row.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("n_rows"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_str"),
        col(s"${c}__max").as("max_str"))): _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("col_name"))
  }

  val profileSql: String = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val branches = cols.map { c =>
      s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(MIN($c) AS VARCHAR) AS min_str,
         |  CAST(MAX($c) AS VARCHAR) AS max_str
         |FROM orders""".stripMargin
    }
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  def ops: Seq[Op] = Seq(
    Op("q_pivot", pivotCounts, Some(pivotCountsSql)),
    Op("q_unpivot", unpivotCounts, Some(unpivotCountsSql)),
    Op("q_feature_corr", featureCorr, Some(featureCorrSql)),
    Op("q_profile", profile, Some(profileSql)),
    Op("q_cardinality_kmv", cardinalityKmv, Some(cardinalityKmvSql)),
    Op("q_cardinality_kmv_exact", cardinalityKmvExact, Some(cardinalityKmvExactSql)),
    Op("q_quantile_sketch", quantileSketch, Some(quantileSketchSql)),
    Op("q_funnel", funnel, Some(funnelSql)),
    Op("q_cohort_retention", cohortRetention, Some(cohortRetentionSql)),
    Op("q_watermark_max", watermarkMax, Some(watermarkMaxSql)),
    Op("q_cdc_changes", cdcChanges, Some(cdcChangesSql)),
    Op("q_top1_per_group", top1PerGroup, Some(top1PerGroupSql)),
    Op("q_window_hourly", windowHourly, Some(windowHourlySql)),
    Op("q_sessionize", sessionize, Some(sessionizeSql)))
}
