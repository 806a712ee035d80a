package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Shard-local greedy sequence packing (SamplingOps.packIntoBins):
  * shard count is a parameter (cluster-sized by default) and packing
  * within a shard is a pure function of that shard's docs — checked
  * against a driver-side reference model at two shard counts.
  */
class SeqPackSpec extends SparkSpec {
  import spark.implicits._

  private val budget = 128L

  private def docs = (1L to 200L).map(id => (id, 1L + (id * 37) % 100)).toSeq

  /** Reference model: md5-first-byte shard, running-sum div packing. */
  private def model(rows: Seq[(Long, Long)], n: Int): Map[Long, (Long, Long)] = {
    def bucket(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      ((d(0).toInt & 0xff) % n).toLong
    }
    rows.groupBy { case (id, _) => bucket(id) }.flatMap { case (s, rs) =>
      var cum = 0L
      rs.sortBy(_._1).map { case (id, t) =>
        val bin = cum / budget
        cum += t
        id -> (s, bin)
      }
    }
  }

  private def run(n: Int): Map[Long, (Long, Long)] =
    SamplingOps.packIntoBins(docs.toDF("doc_id", "n_tokens"), budget.toInt, n)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3)))
      .toMap

  test("packing matches the reference model at two shard counts") {
    assert(run(4) === model(docs, 4))
    assert(run(16) === model(docs, 16))
  }

  test("within a shard, bin assignment is stable when other shards change") {
    // docs that share a shard at n=4 AND n=16 keep their relative
    // packing order; re-sharding only re-partitions, never reorders
    val at4 = run(4)
    val at16 = run(16)
    val shared = docs.map(_._1).groupBy(id => (at4(id)._1, at16(id)._1))
    shared.values.filter(_.size >= 2).foreach { ids =>
      val sorted = ids.sorted
      val bins4 = sorted.map(at4(_)._2)
      val bins16 = sorted.map(at16(_)._2)
      assert(bins4 === bins4.sorted, "bins must be non-decreasing in doc order")
      assert(bins16 === bins16.sorted, "bins must be non-decreasing in doc order")
    }
  }

  test("default shard count is the session's shuffle parallelism") {
    val conf = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val shards = SamplingOps.packIntoBins(docs.toDF("doc_id", "n_tokens"), budget.toInt)
      .select(col("shard")).distinct().collect().map(_.getLong(0))
    assert(shards.forall(s => s >= 0 && s < conf))
    assert(run(conf) === model(docs, conf))
  }
}
