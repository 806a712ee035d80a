package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale-path proof for co-located joins (SURVEY.md §4.1 "secondary
  * indexes both directions" → bucketing choice): when both sides of a
  * key join are bucketed on the join key, Catalyst plans the join with
  * ZERO shuffle exchanges — the property that keeps the reference's
  * biggest join (tweets ⋈ provenance links, following ⋈ users) viable
  * at 100 TB where a shuffle would dominate.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key join and aggregation plan without shuffle exchanges") {
    val orders = Catalog.table(spark, "/root/testdata/sf0.001", "orders")
    val lineitem = Catalog.table(spark, "/root/testdata/sf0.001", "lineitem")

    orders.write.mode("overwrite")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bucketed")
    lineitem.write.mode("overwrite")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bucketed")

    // force SMJ (at this toy size Catalyst would broadcast, which hides
    // the property under test: bucketing removes the SHUFFLE)
    val joined = spark.table("orders_bucketed").hint("merge")
      .join(spark.table("lineitem_bucketed"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(sum(col("l_quantity")).as("qty"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle, but plan has a shuffle Exchange:\n$plan")
    assert(joined.count() > 0)

    // contrast: the same join on unbucketed parquet DOES shuffle
    val unbucketed = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey")).agg(sum(col("l_quantity")))
    // (broadcast may kick in at this size; force SMJ view via hint)
    val smj = orders.hint("merge")
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
    assert(smj.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning"))
    assert(unbucketed.count() === joined.count())
  }
}
