package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over (vec_id, e) frames — cosine
  * assignment against broadcast centroids, quantized-integer means
  * (exact, commutative sums on any partitioning), each round pinned
  * through [[Iteration.materialize]]. Lives in store/ so the persisted
  * vector indexes ([[Ivf]]) can train without depending on the query
  * inventory; `queries/SimilarityOps.kmeansTrain` delegates here.
  */
object Kmeans {

  private def dot(a: Column, b: Column): Column =
    graft.functions.SliceDists.dotFold(
      org.apache.spark.sql.SparkSession.active, a, b)

  /** Train `k` centroids for `iters` rounds. Seeds with the k
    * lowest-id vectors (deterministic); empty cells keep their
    * previous centroid. `emb` needs (vec_id: long, e: array<double>);
    * returns (cent_id, cent_e).
    */
  def train(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    import Iteration.materialize
    var cents = materialize(emb.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cent_id"), col("e").as("cent_e"))
      .withColumn("cent_norm", sqrt(dot(col("cent_e"), col("cent_e")))))
    (1 to iters).foreach { _ =>
      val assignment = emb
        .withColumn("norm", sqrt(dot(col("e"), col("e"))))
        .crossJoin(broadcast(cents))
        .select(col("vec_id"), col("e"), col("cent_id"),
          (dot(col("e"), col("cent_e")) / (col("norm") * col("cent_norm")))
            .as("_cs"))
        .groupBy(col("vec_id"))
        .agg(max_by(struct(col("e"), col("cent_id").as("cell")),
          struct(col("_cs"), (-col("cent_id")).as("_nc"))).as("_best"))
        .select(col("_best.cell").as("cell"), col("_best.e").as("e"))
      val updated = assignment
        .select(col("cell"), posexplode(col("e")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("v") * 1e6).cast("long")).as("q"))
        .select(col("cell"), col("pos"),
          ((col("q").cast("double") / 1e6) / col("n").cast("double")).as("m"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("new_e"))
      cents = materialize(cents
        .join(updated.withColumnRenamed("cell", "cent_id"), Seq("cent_id"), "left")
        .select(col("cent_id"),
          coalesce(col("new_e"), col("cent_e")).as("cent_e"))
        .withColumn("cent_norm", sqrt(dot(col("cent_e"), col("cent_e")))))
    }
    cents.select(col("cent_id"), col("cent_e"))
  }
}
