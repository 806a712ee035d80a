package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native bounded k-smallest-distinct aggregate: exact result under
  * partial aggregation + merge across many partitions, duplicate
  * collapse, sub-k groups returned whole, and serialization round-trip
  * (the TypedImperativeAggregate spill path).
  */
class KmvMinsSpec extends SparkSpec {
  import spark.implicits._

  test("k smallest distinct survive partials, merges, and duplicates") {
    // values 0..99 and their duplicates, shuffled across 13 partitions
    val vals = (0 until 100).flatMap(i => Seq(i.toLong, i.toLong, (99 - i).toLong))
    val df = vals.toDF("v").repartition(13)
    val got = df.agg(KmvMins.kmvMins(spark, col("v"), 8)).head
      .getSeq[Long](0)
    assert(got === (0L until 8L))
  }

  test("a group with fewer than k distinct values returns them all, sorted") {
    val df = Seq(5L, 3L, 5L, 9L, 3L).toDF("v").repartition(4)
    val got = df.agg(KmvMins.kmvMins(spark, col("v"), 16)).head
      .getSeq[Long](0)
    assert(got === Seq(3L, 5L, 9L))
  }

  test("serialization round-trips the bounded buffer") {
    val agg = KmvMins(org.apache.spark.sql.catalyst.expressions.Literal(1L), 4)
    val buf = agg.createAggregationBuffer()
    Seq(7L, 3L, 9L, 1L, 8L, 3L).foreach { v =>
      // drive update through the public path with a literal child
      val a = KmvMins(org.apache.spark.sql.catalyst.expressions.Literal(v), 4)
      a.update(buf, org.apache.spark.sql.catalyst.InternalRow.empty)
    }
    val restored = agg.deserialize(agg.serialize(buf))
    assert(agg.eval(restored)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq === Seq(1L, 3L, 7L, 8L))
  }
}
