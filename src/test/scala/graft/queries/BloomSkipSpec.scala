package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom-pruned skip-existing: the result must be EXACTLY the plain
  * anti-join's under any filter sizing — a roomy filter (false
  * positives rare: most new rows bypass the verify join) and a
  * deliberately starved one (nearly everything flags maybe-seen and
  * funnels through verification). No false negatives means no new row
  * is ever lost; the verify join absorbs every false positive.
  */
class BloomSkipSpec extends SparkSpec {
  import spark.implicits._

  private def frame(ids: Range) =
    ids.map(i => (i.toLong, s"key_${i % 60}")).toDF("id", "k")

  test("bloom-pruned result equals the plain anti-join, roomy and starved") {
    val batch = frame(0 until 200)          // keys key_0..key_59 cycling
    val seen = frame(1000 until 1030)       // keys key_40..key_59 + key_0..key_9
      .select(col("k"))

    val plain = batch.join(seen.distinct(), Seq("k"), "left_anti")
      .select(col("id")).collect().map(_.getLong(0)).sorted

    // roomy: 10 bits per seen item (~1% fp)
    val roomy = RelationalOps.skipExistingBloom(
        batch, seen, "k", expectedItems = 64L, numBits = 640L)
      .select(col("id")).collect().map(_.getLong(0)).sorted
    assert(roomy.toSeq === plain.toSeq)

    // starved: 16 bits TOTAL for 30 items — saturated filter, nearly
    // every probe answers "maybe"; exactness must survive
    val starved = RelationalOps.skipExistingBloom(
        batch, seen, "k", expectedItems = 64L, numBits = 16L)
      .select(col("id")).collect().map(_.getLong(0)).sorted
    assert(starved.toSeq === plain.toSeq)

    // sanity on the fixture: some batch rows are genuinely dups and
    // some genuinely new, so both paths are exercised
    assert(plain.nonEmpty && plain.length < 200)
  }

  test("empty seen set keeps every batch row") {
    val batch = frame(0 until 50)
    val seen = frame(0 until 0).select(col("k"))
    val got = RelationalOps.skipExistingBloom(
        batch, seen, "k", expectedItems = 16L, numBits = 160L)
      .count()
    assert(got === 50L)
  }

  test("sharded variant equals the plain anti-join across shard counts") {
    val batch = frame(0 until 200)
    val seen = frame(1000 until 1030).select(col("k"))
    val plain = batch.join(seen.distinct(), Seq("k"), "left_anti")
      .select(col("id")).collect().map(_.getLong(0)).sorted

    // 256 shards on 30 seen keys: far past where a plan-embedded
    // CASE chain was viable, and most shards hold no blob row at all
    for (shards <- Seq(1, 4, 16, 256)) {
      val got = RelationalOps.skipExistingBloomSharded(
          batch, seen, "k",
          expectedItemsPerShard = 64L, numBitsPerShard = 640L,
          shards = shards)
        .select(col("id")).collect().map(_.getLong(0)).sorted
      assert(got.toSeq === plain.toSeq, s"shards=$shards")
    }
  }

  test("sharded plan carries NO blob literal — blobs are join data") {
    val batch = frame(0 until 200)
    val seen = frame(1000 until 1030).select(col("k"))
    val df = RelationalOps.skipExistingBloomSharded(
      batch, seen, "k",
      expectedItemsPerShard = 64L, numBitsPerShard = 640L, shards = 16)
    // the whole point of the (shard, blob)-table design: at billions
    // of seen keys, plan-embedded blobs are a driver/task-serialization
    // killer — every filter must reach the probe as a COLUMN
    val binaryLits = df.queryExecution.optimizedPlan.collect {
      case plan => plan.expressions.flatMap(_.collect {
        case l: org.apache.spark.sql.catalyst.expressions.Literal
            if l.dataType == org.apache.spark.sql.types.BinaryType && l.value != null => l
      })
    }.flatten
    assert(binaryLits.isEmpty,
      s"found ${binaryLits.length} binary literal(s) embedded in the plan")
  }

  test("keyed probe agrees with Spark's constant-blob might_contain") {
    import graft.functions.{BloomFns, KeyedBloom}
    val keys = (0 until 300).map(i => s"item_$i")
    val seen = keys.filter(_.hashCode % 3 == 0).toDF("k")
    val blob = seen
      .agg(BloomFns.bloomAgg(spark, xxhash64(col("k")), 128L, 1280L).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    val probes = keys.toDF("k")
      .withColumn("h", xxhash64(col("k")))
      .withColumn("blob", lit(blob))
      .withColumn("shard", lit(0L))
    val got = probes.select(col("k"),
        KeyedBloom.keyedMightContain(
          spark, col("shard"), col("blob"), col("h")).as("m"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val want = probes.select(col("k"),
        BloomFns.mightContain(spark, lit(blob), col("h")).as("m"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got === want)
    // and the filter genuinely discriminates on this fixture
    assert(got.values.exists(identity) && got.values.exists(!_))
  }

  test("at 256 shards the probe stage is keyed to scale with the shard count") {
    // realistic shard count on a bigger fixture, on the SHUFFLE path
    // (at 100 TB the blobs table is shards × 8 MB — no broadcast):
    // exactness must hold, the probe join must be exchanged on _shard
    // (so reducer concurrency is bounded by `shards`, not by any plan
    // constant — the SCALING.md claim), and the batch must actually
    // occupy every shard so that bound is attainable.
    val batch = (0 until 5000).map(i => (i.toLong, s"key_$i")).toDF("id", "k")
    val seen = (0 until 2000).map(i => s"key_${i * 2}").toDF("k")
    val plain = batch.join(seen.distinct(), Seq("k"), "left_anti")
      .select(col("id")).collect().map(_.getLong(0)).sorted

    val prevBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = RelationalOps.skipExistingBloomSharded(
        batch, seen, "k",
        expectedItemsPerShard = 64L, numBitsPerShard = 640L, shards = 256)
      val got = df.select(col("id")).collect().map(_.getLong(0)).sorted
      assert(got.toSeq === plain.toSeq)

      import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      val shardExchanges = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e.outputPartitioning match {
          case hp: HashPartitioning
              if hp.expressions.exists(
                _.references.exists(_.name == "_shard")) => Some(e)
          case _ => None
        }
      }.flatten
      assert(shardExchanges.nonEmpty,
        "probe join carries no _shard-hashed exchange — parallelism " +
          "would not follow the shard count")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }

    // 5000 keys over 256 shards: every shard occupied (deterministic
    // for this fixture) — ≤-shards concurrency is also =-shards here
    val occupied = batch
      .select(pmod(xxhash64(col("k")), lit(256L)).as("s"))
      .distinct().count()
    assert(occupied === 256L, s"only $occupied of 256 shards occupied")
  }

  test("keyed probe runs codegen-only and matches interpreted rows") {
    // the probe sits in every skip-existing scan row: it must COMPILE
    // (no silent CodegenFallback demoting the stage) and the compiled
    // path must agree with interpreted eval. LocalRelations are
    // pre-evaluated interpreted by ConvertToLocalRelation, so exclude
    // it — otherwise this assertion is vacuous (see KernelCodegenSpec).
    import graft.functions.{BloomFns, KeyedBloom}
    val keys = (0 until 300).map(i => s"item_$i")
    val seen = keys.filter(_.hashCode % 3 == 0).toDF("k")
    val blob = seen
      .agg(BloomFns.bloomAgg(spark, xxhash64(col("k")), 128L, 1280L).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    val conf = spark.conf
    val oldMode = conf.getOption("spark.sql.codegen.factoryMode")
    val oldFb = conf.getOption("spark.sql.codegen.fallback")
    val oldEx = conf.getOption("spark.sql.optimizer.excludedRules")
    def rows(mode: String): Seq[(String, Boolean)] = {
      conf.set("spark.sql.codegen.factoryMode", mode)
      keys.toDF("k")
        .withColumn("h", xxhash64(col("k")))
        .withColumn("blob", lit(blob))
        .withColumn("shard", pmod(col("h"), lit(4L)))
        .select(col("k"), KeyedBloom.keyedMightContain(
          spark, col("shard"), col("blob"), col("h")).as("m"))
        .collect().map(r => r.getString(0) -> r.getBoolean(1)).sorted.toSeq
    }
    try {
      conf.set("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
      conf.set("spark.sql.codegen.fallback", "false")
      val interpreted = rows("NO_CODEGEN")
      val compiled = rows("CODEGEN_ONLY")
      assert(compiled === interpreted)
      assert(interpreted.exists(_._2) && interpreted.exists(!_._2))
    } finally {
      def restore(k: String, v: Option[String]): Unit =
        v.fold(conf.unset(k))(conf.set(k, _))
      restore("spark.sql.codegen.factoryMode", oldMode)
      restore("spark.sql.codegen.fallback", oldFb)
      restore("spark.sql.optimizer.excludedRules", oldEx)
    }
  }

  test("sharded variant with empty seen set keeps every batch row") {
    val batch = frame(0 until 50)
    val seen = frame(0 until 0).select(col("k"))
    val got = RelationalOps.skipExistingBloomSharded(
        batch, seen, "k",
        expectedItemsPerShard = 16L, numBitsPerShard = 160L, shards = 8)
      .count()
    assert(got === 50L)
  }
}
