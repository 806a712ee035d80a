package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's delegated SQL query surface (SURVEY.md §2.6, §2.3):
  * twitter-to-sqlite executes arbitrary SQL over its normalized tables
  * (`/root/reference/utils.py:514-531`; README.md:222-259 recipes).
  * Each op here re-expresses one exercised pattern as a declarative
  * DataFrame program, leaving join selection / pushdown / partial
  * aggregation to Catalyst.
  *
  * Determinism-for-oracle notes:
  *  - every result has a total ORDER BY over key columns (never over
  *    floating-point results);
  *  - monetary math runs in exact DECIMAL on both engines and is cast
  *    to DOUBLE only at the end, so value hashes are bit-identical
  *    regardless of partitioning / summation order.
  */
object RelationalOps {

  /** Exact decimal view of a monetary/quantity double column. */
  private def dec(c: Column, p: Int = 12, s: Int = 2): Column =
    c.cast(DecimalType(p, s))

  /** Decimal sum rendered as double (order-independent, bit-exact). */
  private def dsum(c: Column): Column = sum(c).cast("double")

  // ---------------------------------------------------------------------
  // q_agg_pricing — the groupBy/agg surface (SURVEY §2.6 aggregates):
  // pricing-summary shape over lineitem; sums exact via decimal.
  def aggPricing(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Catalog.table(spark, sfDir, "lineitem")
    val disc  = dec(lit(1), 4, 2) - dec(col("l_discount"), 4, 2)
    val taxed = dec(lit(1), 4, 2) + dec(col("l_tax"), 4, 2)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(dec(col("l_quantity"))).as("sum_qty"),
        dsum(dec(col("l_extendedprice"))).as("sum_base_price"),
        dsum(dec(col("l_extendedprice")) * disc).as("sum_disc_price"),
        dsum(dec(col("l_extendedprice")) * disc * taxed).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val aggPricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------------
  // q_semi_facet — J4 (README.md:212): `id in (subquery)` semi-join +
  // descending sort + facet group-count, the flagship Datasette shape.
  def semiFacet(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Catalog.table(spark, sfDir, "orders")
    val li = Catalog.table(spark, sfDir, "lineitem")
      .filter(col("l_quantity") > 45)
    orders
      .join(li, orders("o_orderkey") === li("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("o_orderpriority"))
  }

  val semiFacetSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n
      |FROM orders
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
      |GROUP BY o_orderpriority
      |ORDER BY n DESC, o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------
  // q_anti_join — J1/J3 (cli.py:483-487 --skip-existing; README.md:246
  // `not in` recipe): keys on one side absent from the other.
  def antiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val customer = Catalog.table(spark, sfDir, "customer")
    val bigOrders = Catalog.table(spark, sfDir, "orders")
      .filter(col("o_totalprice") > 300000)
    customer
      .join(bigOrders, customer("c_custkey") === bigOrders("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val antiJoinSql: String =
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // q_semi_lookup — J2 (utils.py:647-653): case-folded IN-list lookup
  // (`select id from users where lower(screen_name) in (...)`).
  def semiLookup(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "customer")
      .filter(lower(col("c_mktsegment")).isin("building", "machinery"))
      .select(col("c_custkey"))
      .orderBy(col("c_custkey"))

  val semiLookupSql: String =
    """SELECT c_custkey FROM customer
      |WHERE lower(c_mktsegment) IN ('building', 'machinery')
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // q_distinct — SURVEY §2.6 (README.md:326 `distinct`).
  def distinctPairs(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val distinctPairsSql: String =
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------------
  // q_topk — SURVEY §2.6 sort/limit: top-k with unique-key tiebreak;
  // Catalyst plans TakeOrderedAndProject (no global sort materialized).
  def topK(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .limit(25)

  val topKSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 25""".stripMargin

  // ---------------------------------------------------------------------
  // q_join_agg — multi-way join + facet (README.md:212 facet over a
  // joined provenance table): revenue per nation; dims broadcast.
  def joinAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val customer = Catalog.table(spark, sfDir, "customer")
    val orders = Catalog.table(spark, sfDir, "orders")
    val nation = Catalog.table(spark, sfDir, "nation")
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        dsum(dec(col("o_totalprice"))).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("n_name"))
  }

  val joinAggSql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------------
  // q_set_ops — SURVEY §2.6 union/except/intersect: customers in the
  // 'BUILDING' segment vs customers that placed high-value orders.
  def setOps(spark: SparkSession, sfDir: String): DataFrame = {
    val customer = Catalog.table(spark, sfDir, "customer")
    val orders = Catalog.table(spark, sfDir, "orders")
    val building = customer
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val bigSpenders = orders
      .filter(col("o_totalprice") > 200000)
      .select(col("o_custkey").as("c_custkey"))
    val both = building.intersect(bigSpenders)
      .withColumn("tag", lit("both"))
    val onlyBuilding = building.except(bigSpenders)
      .withColumn("tag", lit("building_only"))
    both.unionByName(onlyBuilding)
      .orderBy(col("tag"), col("c_custkey"))
  }

  val setOpsSql: String =
    """WITH building AS (
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |), big AS (
      |  SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 200000
      |)
      |SELECT c_custkey, 'both' AS tag FROM (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM big)
      |UNION ALL
      |SELECT c_custkey, 'building_only' AS tag FROM (SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM big)
      |ORDER BY tag, c_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // q_rollup — SURVEY §7.2-3 grouping-sets breadth (Catalyst-native
  // Expand): counts by returnflag × linestatus with subtotals.
  def rollupCounts(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  val rollupCountsSql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------------
  // q_not_null_projection — J6 (README.md:113-116): `where … is not
  // null` projection feeding a statuses-lookup; here: orders that are
  // replies-to-something analog via a filtered projection on events.
  def notNullProjection(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "events")
      .filter(col("event_type") === "purchase" && col("value") > 150)
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy(col("event_id"))

  val notNullProjectionSql: String =
    """SELECT event_id, user_id, value FROM events
      |WHERE event_type = 'purchase' AND value > 150
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_insert_select — J5 (README.md:362-363 `INSERT OR IGNORE … SELECT`):
  // new-rows-only = source anti-join destination, then union; shown as
  // the rows that WOULD be inserted (favorited_by from archive_like).
  def insertSelect(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Catalog.table(spark, sfDir, "events")
    // "destination" link table: (user_id, day) pairs seen for purchases;
    // "source": pairs for clicks; insert-ignore = clicks not already
    // present as purchase pairs.
    val dst = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val src = events.filter(col("event_type") === "click")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    src.join(dst, Seq("user_id", "day"), "left_anti")
      .orderBy(col("user_id"), col("day"))
  }

  val insertSelectSql: String =
    """WITH dst AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'purchase'
      |), src AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'click'
      |)
      |SELECT user_id, day FROM src
      |WHERE NOT EXISTS (SELECT 1 FROM dst WHERE dst.user_id = src.user_id AND dst.day = src.day)
      |ORDER BY user_id, day""".stripMargin

  // ---------------------------------------------------------------------
  // q_cube_having — grouping-sets breadth (Expand operator) + HAVING:
  // event counts by (event_type × hour-of-day bucket) with all
  // subtotal combinations, keeping only groups above a threshold.
  def cubeHaving(spark: SparkSession, sfDir: String): DataFrame =
    Catalog.table(spark, sfDir, "events")
      .select(col("event_type"), (hour(col("ts")) / lit(6)).cast("long").as("day_quarter"))
      .cube(col("event_type"), col("day_quarter"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 10)
      .orderBy(
        col("event_type").asc_nulls_first,
        col("day_quarter").asc_nulls_first)

  val cubeHavingSql: String =
    """SELECT event_type, day_quarter, COUNT(*) AS n
      |FROM (SELECT event_type, CAST(hour(ts) // 6 AS BIGINT) AS day_quarter FROM events)
      |GROUP BY CUBE (event_type, day_quarter)
      |HAVING COUNT(*) >= 10
      |ORDER BY event_type ASC NULLS FIRST, day_quarter ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------------
  // q_bloom_skip_existing — J1's skip-existing anti-join, re-shaped for
  // the 100 TB incremental-ingest case: when "seen" is billions of
  // fingerprints, a plain left_anti shuffles the ENTIRE incoming batch
  // against it. Instead, build a bloom filter over the seen keys
  // (mergeable bounded sketch — numBits/8 bytes cross the exchange,
  // not the keys), broadcast it, and route each incoming row by a
  // per-row bit test: definitely-new rows (filter says no) skip the
  // join entirely; only maybe-seen rows (true dups + the ~1% false
  // positives) reach the exact anti-join verification. No false
  // negatives → the result set is EXACTLY the plain anti-join's, which
  // is what the oracle checks; the bloom only changes how much data
  // the join stage sees.
  //
  // CAPS: Spark's BloomFilterAggregate enforces
  // spark.sql.optimizer.runtime.bloomFilter.maxNumItems (default 4M)
  // and .maxNumBits (default 64M bits = 8 MB) — ONE filter cannot hold
  // billions of keys without raising both confs, and a multi-GB blob
  // embedded as a plan literal would not broadcast anyway. Past the
  // caps, use skipExistingBloomSharded below.
  def skipExistingBloom(
      batch: DataFrame, seen: DataFrame, keyCol: String,
      expectedItems: Long, numBits: Long): DataFrame = {
    import graft.functions.BloomFns
    val spark = batch.sparkSession
    val h = xxhash64(col(keyCol))
    // the filter build is an EAGER distributed aggregation (partitions
    // fill bits locally, merge is bitwise OR); the numBits/8-byte blob
    // lands on the driver — Spark's might_contain requires a constant
    // filter, and the blob is exactly what a broadcast would ship
    val blob = seen
      .agg(BloomFns.bloomAgg(spark, xxhash64(col(keyCol)),
        expectedItems, numBits).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    // zero seen rows aggregate to a NULL blob (and might_contain(NULL)
    // is NULL, which would silently drop every batch row) — with
    // nothing seen, everything is new
    if (blob == null) return batch
    val flagged = batch
      .withColumn("_maybe", BloomFns.mightContain(spark, lit(blob), h))
    val definitelyNew = flagged.filter(!col("_maybe")).drop("_maybe")
    val verified = flagged.filter(col("_maybe")).drop("_maybe")
      .join(seen.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    definitelyNew.unionByName(verified)
  }

  // skipExistingBloom for seen-key spaces PAST the single-filter caps:
  // shard the seen keys by pmod(hash, shards), build one in-cap filter
  // per shard (a single groupBy-aggregate — each blob stays ≤ 8 MB
  // under default confs), keep the blobs as a tiny (shard, blob)
  // TABLE, and equi-join each batch row to its shard's row; the
  // native [[graft.functions.KeyedBloomMightContain]] probe tests the
  // JOINED blob column (Spark's own might_contain refuses non-constant
  // blobs). Blobs therefore travel as join DATA — broadcast once per
  // executor when the planner picks BHJ, or one shard's blob per
  // reducer under SMJ — never as plan literals serialized with every
  // task, so shards (and with them total seen-key capacity) scale to
  // billions of keys with no driver/plan-size ceiling. The probe
  // deserializes each shard's blob once per task (cached by shard id).
  //
  // Parallelism note for the shuffle path: a join on _shard hashes the
  // batch into ≤ `shards` streams, so pick shards ≥ the parallelism
  // you want at the probe stage (at 100 TB that's thousands — which is
  // exactly where the per-shard caps need the headroom anyway).
  //
  // A shard with no seen keys has no blob row; the left join leaves
  // its batch rows' blob NULL → definitely new. Result remains EXACTLY
  // the plain anti-join's.
  def skipExistingBloomSharded(
      batch: DataFrame, seen: DataFrame, keyCol: String,
      expectedItemsPerShard: Long, numBitsPerShard: Long,
      shards: Int): DataFrame = {
    import graft.functions.{BloomFns, KeyedBloom}
    val spark = batch.sparkSession
    val h = xxhash64(col(keyCol))
    // pinned: the probe plan forks into the definitely-new and verify
    // branches below, and each shard's filter should be built once,
    // not once per branch
    val blobs = graft.store.Iteration.materialize(seen
      .groupBy(pmod(xxhash64(col(keyCol)), lit(shards.toLong)).as("_shard"))
      .agg(BloomFns.bloomAgg(spark, xxhash64(col(keyCol)),
        expectedItemsPerShard, numBitsPerShard).as("_bf")))
    // zero seen rows ⇒ zero shard blobs ⇒ everything is new — skip
    // the join pipeline entirely (the common cold-start batch); the
    // probe on the pinned frame is one cheap partition peek
    if (blobs.isEmpty) return batch
    val flagged = batch
      .withColumn("_shard", pmod(h, lit(shards.toLong)))
      .join(blobs, Seq("_shard"), "left")
      .withColumn("_maybe", coalesce(
        KeyedBloom.keyedMightContain(spark, col("_shard"), col("_bf"), h),
        lit(false)))
      .drop("_shard", "_bf")
    val definitelyNew = flagged.filter(!col("_maybe")).drop("_maybe")
    val verified = flagged.filter(col("_maybe")).drop("_maybe")
      .join(seen.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    definitelyNew.unionByName(verified)
  }

  // The oracle-checked demo: docs with doc_id >= 250 are "the incoming
  // batch", the first 250 are "already ingested"; new = no seen doc
  // shares the exact-dedup fingerprint. The oracle can't see the bloom
  // (engine-specific bits) — it checks the SEMANTICS: result ==
  // fingerprint anti-join.
  def bloomSkipExisting(spark: SparkSession, sfDir: String): DataFrame = {
    val fps = Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        graft.ingest.Transforms.exactFingerprint(col("text")).as("fp"))
    skipExistingBloom(
      fps.filter(col("doc_id") >= 250),
      fps.filter(col("doc_id") < 250).select(col("fp")),
      "fp", expectedItems = 1000L, numBits = 10000L)
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
  }

  val bloomSkipExistingSql: String =
    """WITH fp AS (
      |  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\W+', ' ', 'g'))) AS f
      |  FROM documents
      |)
      |SELECT n.doc_id FROM fp n
      |WHERE n.doc_id >= 250
      |  AND NOT EXISTS (SELECT 1 FROM fp s WHERE s.doc_id < 250 AND s.f = n.f)
      |ORDER BY doc_id""".stripMargin

  // q_bloom_skip_sharded — the same skip-existing SEMANTICS routed
  // through the billions-of-keys path: per-shard filters kept as a
  // (shard, blob) table, batch rows equi-joined to their shard's blob,
  // probed by the native keyed_might_contain (no plan-embedded blob —
  // BloomSkipSpec pins the plan shape). Same oracle: the bloom is
  // invisible to the result.
  def bloomSkipSharded(spark: SparkSession, sfDir: String): DataFrame = {
    val fps = Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        graft.ingest.Transforms.exactFingerprint(col("text")).as("fp"))
    skipExistingBloomSharded(
      fps.filter(col("doc_id") >= 250),
      fps.filter(col("doc_id") < 250).select(col("fp")),
      "fp", expectedItemsPerShard = 200L, numBitsPerShard = 2000L,
      shards = 8)
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------------
  // q_asof_join — the AS-OF (temporal point-in-time) join: for each
  // purchase event, the user's most recent view at or before it (the
  // attribution/feature-lookup primitive every event pipeline needs;
  // DuckDB runs it natively as ASOF LEFT JOIN, which is the oracle).
  // Spark has no asof operator; the scale-right expression is the
  // UNION-WINDOW trick, not a range join: tag both streams, union,
  // and carry the last view timestamp forward per user with one
  // ordered window — ONE shuffle on user_id, state bounded per user,
  // no (purchase × candidate-view) intermediate at all. A range-join
  // formulation (join on user, filter v.ts <= p.ts, argmax) would
  // build every historical candidate pair before discarding all but
  // one — quadratic per user; the window form is linear. Equal
  // timestamps order views FIRST (is_q tiebreak), matching ASOF's
  // inclusive >= bound. Purchases with no prior view keep NULL
  // (left-join semantics); the lag is exact integer micros on both
  // engines.
  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Catalog.table(spark, sfDir, "events")
    val views = ev.filter(col("event_type") === "view")
      .select(lit(null).cast("long").as("event_id"), col("user_id"),
        col("ts"), lit(0).as("is_q"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), lit(1).as("is_q"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_q"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    views.unionByName(purchases)
      .withColumn("view_ts",
        last(when(col("is_q") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("is_q") === 1)
      .select(col("event_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("view_ts"),
        (unix_micros(col("ts")) - unix_micros(col("view_ts"))).as("lag_us"))
      .orderBy(col("event_id"))
  }

  val asofJoinSql: String =
    """SELECT p.event_id, p.user_id, p.ts AS purchase_ts, v.ts AS view_ts,
      |  epoch_us(p.ts) - epoch_us(v.ts) AS lag_us
      |FROM (SELECT event_id, user_id, ts FROM events
      |      WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN
      |     (SELECT user_id, ts FROM events WHERE event_type = 'view') v
      |  ON p.user_id = v.user_id AND p.ts >= v.ts
      |ORDER BY p.event_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_interval_join — interval-containment (range) join: census every
  // event falling inside an "incident window" (error bursts padded by
  // a minute). Spark has no native interval join; a raw theta-join
  // (`ev.ts BETWEEN w.start AND w.end`) plans as BroadcastNestedLoop
  // — O(events × windows). The scale-right expression is BANDING:
  // slice time into fixed-width buckets, explode each window into the
  // buckets it overlaps (a window touches span/width + 1 of them),
  // key each event by its single bucket, equi-join on the bucket id,
  // and keep the exact BETWEEN as a residual filter. A pair can meet
  // in only one bucket (the event's), so no post-join dedup — one
  // hash shuffle on bucket, never a cross product. The oracle runs
  // the same query as DuckDB's native IEJoin.
  //
  // Window derivation (lag-gap sessionization of the ERROR stream) is
  // DISTRIBUTED in two levels: range-partition the error timestamps,
  // gap-merge each partition LOCALLY into (start, end) spans inside
  // one mapPartitions pass (range partitions hold disjoint contiguous
  // ts slices, so the local merge is exact within its slice), then
  // run the ordered window only over the SPANS — merging boundary
  // spans whose gap crosses a partition edge and assigning the
  // sequential wid the oracle's semantics demand. The inherently
  // sequential step thus sees O(bursts + partitions) rows instead of
  // every error event — the same
  // aggregate-locally-then-order-the-summary shape as the sketch
  // family. Span-level gap-merge equals event-level: within a span
  // consecutive gaps are ≤ the threshold by construction, so only
  // boundary gaps remain to test. The JOIN side stays fully
  // distributed.
  def intervalJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val bucketUs = 600L * 1000000L // 10-minute bands
    val gapUs = 300L * 1000000L
    val ev = Catalog.table(spark, sfDir, "events")
    val par = spark.sessionState.conf.numShufflePartitions
    val localSpans = ev.filter(col("event_type") === "error")
      .select(unix_micros(col("ts")).as("us"))
      .repartitionByRange(par, col("us"))
      .sortWithinPartitions(col("us"))
      .as[Long]
      .mapPartitions { it =>
        // local gap-merge: one span per burst within this ts slice
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var start = 0L
        var last = 0L
        var open = false
        it.foreach { us =>
          if (!open) { start = us; last = us; open = true }
          else if (us - last > gapUs) { out += ((start, last)); start = us; last = us }
          else last = us
        }
        if (open) out += ((start, last))
        out.iterator
      }
      .toDF("s_us", "e_us")
    val w = Window.orderBy(col("s_us"))
    val windows = localSpans
      .withColumn("brk",
        when(lag(col("e_us"), 1).over(w).isNull ||
          col("s_us") - lag(col("e_us"), 1).over(w) > gapUs, 1).otherwise(0))
      .withColumn("wid", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("wid"))
      .agg((min(col("s_us")) - 60L * 1000000L).as("w_start_us"),
        (max(col("e_us")) + 60L * 1000000L).as("w_end_us"))
    val banded = windows.select(col("wid"), col("w_start_us"), col("w_end_us"),
      explode(sequence(floor(col("w_start_us") / bucketUs),
        floor(col("w_end_us") / bucketUs))).as("bkt"))
    val pts = ev.select(col("ts"), col("user_id"),
      floor(unix_micros(col("ts")) / bucketUs).as("bkt"))
    pts.join(banded, Seq("bkt"))
      .filter(unix_micros(col("ts")).between(col("w_start_us"), col("w_end_us")))
      .groupBy(col("wid"))
      .agg(timestamp_micros(first(col("w_start_us"))).as("w_start"),
        timestamp_micros(first(col("w_end_us"))).as("w_end"),
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("wid"))
  }

  val intervalJoinSql: String =
    """WITH e AS (
      |  SELECT ts FROM events WHERE event_type = 'error'
      |), g AS (
      |  SELECT ts, CASE WHEN lag(ts) OVER (ORDER BY ts) IS NULL
      |      OR epoch_us(ts) - epoch_us(lag(ts) OVER (ORDER BY ts)) > 300000000
      |    THEN 1 ELSE 0 END AS brk
      |  FROM e
      |), s AS (
      |  SELECT ts, CAST(SUM(brk) OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING)
      |    AS BIGINT) AS wid
      |  FROM g
      |), win AS (
      |  SELECT wid, min(ts) - INTERVAL 1 MINUTE AS w_start,
      |    max(ts) + INTERVAL 1 MINUTE AS w_end
      |  FROM s GROUP BY wid
      |)
      |SELECT w.wid, w.w_start, w.w_end, COUNT(*) AS n_events,
      |  COUNT(DISTINCT ev.user_id) AS n_users
      |FROM win w JOIN events ev ON ev.ts BETWEEN w.w_start AND w.w_end
      |GROUP BY w.wid, w.w_start, w.w_end
      |ORDER BY w.wid""".stripMargin

  def ops: Seq[Op] = Seq(
    Op("q_asof_join", asofJoin, Some(asofJoinSql)),
    Op("q_interval_join", intervalJoin, Some(intervalJoinSql)),
    Op("q_bloom_skip_existing", bloomSkipExisting, Some(bloomSkipExistingSql)),
    Op("q_bloom_skip_sharded", bloomSkipSharded, Some(bloomSkipExistingSql)),
    Op("q_cube_having", cubeHaving, Some(cubeHavingSql)),
    Op("q_agg_pricing", aggPricing, Some(aggPricingSql)),
    Op("q_semi_facet", semiFacet, Some(semiFacetSql)),
    Op("q_anti_join", antiJoin, Some(antiJoinSql)),
    Op("q_semi_lookup", semiLookup, Some(semiLookupSql)),
    Op("q_distinct", distinctPairs, Some(distinctPairsSql)),
    Op("q_topk", topK, Some(topKSql)),
    Op("q_join_agg", joinAgg, Some(joinAggSql)),
    Op("q_set_ops", setOps, Some(setOpsSql)),
    Op("q_rollup", rollupCounts, Some(rollupCountsSql)),
    Op("q_not_null_projection", notNullProjection, Some(notNullProjectionSql)),
    Op("q_insert_select", insertSelect, Some(insertSelectSql)))
}
