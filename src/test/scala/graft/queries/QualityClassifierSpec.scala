package graft.queries

import graft.SparkSpec

/** The trained quality classifier must LEARN, not parrot: the oracle
  * row-compare proves cross-engine parity, but a constant-prediction
  * model would pass it too. This pins the statistical claim — the
  * nearest-centroid rule trained on hashed bag-of-words beats the
  * majority-class baseline on its weak labels, and predicts both
  * classes (the batch-perceptron design it replaced failed exactly
  * here: it oscillated into the majority predictor).
  */
class QualityClassifierSpec extends SparkSpec {

  test("nearest-centroid quality classifier beats the majority baseline") {
    val rows = Inventory.byName("q_quality_classifier")
      .fn(spark, "/root/testdata/sf0.01").collect()
    val n = rows.length
    assert(n > 0)
    val acc = rows.count(_.getAs[Int]("correct") == 1).toDouble / n
    val pos = rows.count(_.getAs[Int]("label_y") == 1).toDouble / n
    val majority = math.max(pos, 1 - pos)
    assert(majority < 0.95, s"labels degenerate ($majority) — nothing to learn")
    assert(acc > majority + 0.05,
      f"no learning signal: acc=$acc%.3f vs majority=$majority%.3f")
    assert(rows.map(_.getAs[Int]("pred")).toSet === Set(1, -1),
      "constant predictor — the model collapsed to one class")
  }

  test("the model side broadcasts; no cartesian fallback") {
    // the scale claim: 256-row weights + 1-row scalars broadcast, the
    // only sort-merge join is the doc-keyed label-score outer join
    val df = Inventory.byName("q_quality_classifier")
      .fn(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "model weights did not broadcast")
    assert(!plan.contains("CartesianProduct"),
      s"planned a CartesianProduct:\n${plan.take(1200)}")
  }
}
