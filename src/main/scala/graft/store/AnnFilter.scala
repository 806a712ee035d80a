package graft.store

import org.apache.spark.sql.DataFrame

/** The one shared piece of every filtered-search variant: restrict a
  * candidate scan to the pks in `allowed` — a single-column frame by
  * contract (enforced loudly; silently joining on whichever column
  * happens to be first is how a wrong-but-plausible result ships).
  * One definition so the contract can evolve (broadcast hints, named
  * key columns) in one place instead of per index family.
  */
private[store] object AnnFilter {
  def semiJoinAllowed(
      scan: DataFrame, allowed: DataFrame, keyCol: String): DataFrame = {
    require(allowed.columns.length == 1,
      s"allowed must be a single pk column; got (${allowed.columns.mkString(", ")})")
    scan.join(allowed.toDF(keyCol), Seq(keyCol), "left_semi")
  }
}
