package graft

import org.apache.spark.sql.SparkSession

/** Local smoke main mirroring the driver's t1 check: entry() on
  * sf0.001 must return >0 rows. Usage: tools/run_main.sh graft.Smoke
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions",
        classOf[graft.functions.GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows=$n (need >0: ${if (n > 0) "OK" else "FAIL"})")
    spark.stop()
  }
}
