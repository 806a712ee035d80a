package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale-path proof #2 (companion to BucketingSpec): date-partitioned
  * lake layout → a time predicate prunes partitions at PLANNING time,
  * so the scan touches only the matching directories. This is the
  * layout the `events` firehose sink would use at 100 TB (SCALING.md
  * "Scans & filters").
  */
class PartitionPruningSpec extends SparkSpec {

  test("TableStore.overwrite(partitionBy=day): store-written table prunes") {
    val store = new graft.store.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-store-part").toString)
    val events = Catalog.table(spark, "/root/testdata/sf0.001", "events")
      .withColumn("day", to_date(col("ts")))
    store.overwrite("events", events, partitionBy = Seq("day"))

    val lake = store.read("events")
    val minDay = lake.select(min(col("day"))).collect()(0).getDate(0)
    val oneDay = lake.filter(col("day") === minDay)
    val scan = oneDay.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metadata("PartitionFilters").contains("day"))
    assert(scan.selectedPartitions.partitionCount === 1)
    // swap-write semantics preserved: a second partitioned overwrite
    // fully replaces the tree
    store.overwrite("events", events.filter(col("day") === minDay),
      partitionBy = Seq("day"))
    assert(store.read("events").select("day").distinct().count() === 1)
  }

  test("day-partitioned events: time predicate prunes to matching partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val events = Catalog.table(spark, "/root/testdata/sf0.001", "events")
      .withColumn("day", to_date(col("ts")))
    events.write.partitionBy("day").parquet(s"$dir/events")

    val lake = spark.read.parquet(s"$dir/events")
    val nDays = lake.select("day").distinct().count()
    assert(nDays > 3) // testdata spans multiple days

    val minDay = lake.select(min(col("day"))).collect()(0).getDate(0)
    val oneDay = lake.filter(col("day") === minDay)

    // the physical scan carries the predicate as a PARTITION filter
    // (directory-level pruning), not a data filter
    val scan = oneDay.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metadata("PartitionFilters").contains("day"))
    // and the selected partition set is exactly one directory
    assert(scan.selectedPartitions.partitionCount === 1)
    assert(oneDay.count() > 0)
    assert(oneDay.count() < lake.count())
  }
}
