package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BottomKSample must be a deterministic function of the DATA: the
  * aggregate's bounded-state path has to reproduce exactly the rows a
  * full window-rank over the same (hash, tie) order would pick, on
  * any partitioning — that equivalence is what lets the q_quantile_
  * sketch oracle replay the sample in another engine.
  */
class BottomKSampleSpec extends SparkSpec {
  import spark.implicits._

  private val k = 8

  // deterministic skewed fixture: ids 0..499, value = a lumpy shape
  private def fixture: DataFrame =
    (0 until 500).map { i =>
      (i.toLong, ((i * 37) % 100 + (if (i % 7 == 0) 400 else 0)).toLong,
        s"g${i % 3}")
    }.toDF("id", "v", "g")

  private def hashed(df: DataFrame): DataFrame =
    df.withColumn("h",
      conv(substring(md5(concat(lit("t|"), col("id").cast("string"))), 1, 12), 16, 10)
        .cast("long"))

  test("aggregate equals the window-rank reference on every group") {
    val df = hashed(fixture)
    val got = df.groupBy("g")
      .agg(BottomKSample.bottomK(spark, col("h"), col("id"), col("v"), k).as("s"))
      .select(col("g"), col("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

    val ref = df
      .withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("h"), col("id"))))
      .filter(col("rn") <= k)
      .groupBy("g")
      // collect in (h, id) order — the aggregate's documented order
      .agg(sort_array(collect_list(struct(col("h"), col("id"), col("v")))).as("t"))
      .select(col("g"), expr("transform(t, x -> x.v)").as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

    assert(got === ref)
    assert(got.values.forall(_.size == k))
  }

  test("partitioning-invariant: 1 partition == 13 partitions") {
    def run(parts: Int): Map[String, Seq[Long]] =
      hashed(fixture).repartition(parts)
        .groupBy("g")
        .agg(BottomKSample.bottomK(spark, col("h"), col("id"), col("v"), k).as("s"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(run(1) === run(13))
  }

  test("sub-k group degenerates to the exact value list; nulls skipped") {
    val df = Seq(
      (1L, Some(10L), "a"), (2L, Some(20L), "a"), (3L, None, "a"),
      (4L, Some(5L), "b"))
      .toDF("id", "v", "g")
    val got = hashed(df).groupBy("g")
      .agg(BottomKSample.bottomK(spark, col("h"), col("id"), col("v"), k).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).sorted).toMap
    assert(got("a") === Seq(10L, 20L)) // null row contributes nothing
    assert(got("b") === Seq(5L))
  }

  test("duplicate (hash, tie) keys collapse to the MIN value on any partitioning") {
    // the documented contract passes a unique tie; a general SQL
    // caller might not — the surviving value must then be a pure
    // function of the input multiset (min), not of encounter order
    val df = Seq(
      (1L, 1L, 50L), (1L, 1L, 10L), (1L, 1L, 30L), // same key, 3 values
      (2L, 2L, 7L))
      .toDF("h", "tie", "v")
    def run(parts: Int): Seq[Long] =
      df.repartition(parts)
        .agg(BottomKSample.bottomK(spark, col("h"), col("tie"), col("v"), 4).as("s"))
        .head.getSeq[Long](0).sorted
    assert(run(1) === Seq(7L, 10L))
    assert(run(7) === Seq(7L, 10L))
  }

  test("an invalid k argument raises a named AnalysisException, not an NPE") {
    import org.apache.spark.sql.AnalysisException
    BottomKSample.register(spark)
    val df = Seq((1L, 1L, 5L)).toDF("h", "tie", "v").cache()
    df.createOrReplaceTempView("bks_t")
    def bad(sql: String): Unit = {
      val ex = intercept[AnalysisException] {
        spark.sql(sql).collect()
      }
      assert(ex.getMessage.contains("bottom_k_sample"), s"for [$sql]: ${ex.getMessage}")
    }
    bad("SELECT bottom_k_sample(h, tie, v, NULL) FROM bks_t")       // null literal
    bad("SELECT bottom_k_sample(h, tie, v, h) FROM bks_t")          // non-foldable
    bad("SELECT bottom_k_sample(h, tie, v, 'lots') FROM bks_t")     // non-numeric
    // a good literal still works, including a long
    assert(spark.sql("SELECT bottom_k_sample(h, tie, v, 4L) FROM bks_t")
      .head.getSeq[Long](0) === Seq(5L))
  }

  test("sample quantiles land near exact quantiles (uniform-hash guarantee)") {
    // k=64 over 3 groups of ~167 rows: the sampled median of a
    // 0..99(+400 spike) distribution must sit inside the central
    // band. This is a deterministic fixture, so the bound is a fixed
    // regression pin, not a flaky statistical assertion.
    val df = hashed(fixture)
    val est = df.groupBy("g")
      .agg(BottomKSample.bottomK(spark, col("h"), col("id"), col("v"), 64).as("s"))
      .select(col("g"), expr(
        "element_at(sort_array(s), cast(floor(0.5 * (size(s) - 1)) as int) + 1)").as("p50"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = df.groupBy("g")
      .agg(expr("percentile(v, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    est.foreach { case (g, p) =>
      assert(math.abs(p - exact(g)) <= 30.0,
        s"group $g: sampled p50 $p vs exact ${exact(g)}")
    }
  }
}
