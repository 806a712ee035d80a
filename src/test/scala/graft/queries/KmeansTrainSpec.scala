package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Lloyd training loop: on two well-separated synthetic blobs the
  * trained centroids land on the blob means and the assignment
  * separates the blobs — deterministic (seeded with the lowest-id
  * vectors, quantized-integer means).
  */
class KmeansTrainSpec extends SparkSpec {
  import spark.implicits._

  test("two separable blobs converge to blob means in 3 iterations") {
    // blob A around (+10, +10, 0, 0) on even ids, blob B around
    // (-10, -10, 0, 0) on odd ids — the k lowest-id seeds (0, 1) then
    // start one per blob, as a real pipeline would ensure via k-means++
    // or pre-shuffled ids; jitter is deterministic from the index
    def jit(i: Int, s: Int) = (i * 7 + s) % 5 * 0.1
    val vecs = (0 until 40).map { i =>
      val sign = if (i % 2 == 0) 1.0 else -1.0
      (i.toLong, Seq(sign * (10.0 + jit(i, 0)), sign * (10.0 + jit(i, 1)),
        jit(i, 2), jit(i, 3)))
    }
    val emb = vecs.toDF("vec_id", "e")

    val cents = SimilarityOps.kmeansTrain(emb, k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(cents.keySet === Set(0L, 1L)) // seeded from the 2 lowest ids

    // after training, one centroid points into each blob's quadrant
    val dirs = cents.values.map(e => (math.signum(e.head), math.signum(e(1)))).toSet
    assert(dirs === Set((1.0, 1.0), (-1.0, -1.0)))
    // and the magnitudes moved from the seed vectors to ~blob means
    cents.values.foreach { e =>
      assert(math.abs(e.head.abs - 10.2) < 0.3, s"centroid $e")
    }
  }
}
