package graft

/** Whole-stage-codegen health sweep: run EVERY oracle query with
  * `spark.sql.codegen.fallback=false`, so a janino compile failure in
  * any generated stage fails the suite instead of silently dropping
  * that stage to interpreted execution. The bug class is real: the
  * gram/hash kernels generated `false = true;` for non-nullable
  * children and every affected stage quietly paid the interpreted
  * path until the round-13 fix (−21% on the bench pin). Interpreted
  * execution is CORRECT — the oracle gate can never catch this — so
  * the only regression guard is making compile failures loud.
  *
  * (Deliberate `CodegenFallback` expressions and imperative
  * aggregates are unaffected: Spark plans those outside whole-stage
  * codegen; the flag only governs COMPILE FAILURES of stages that
  * claimed to be compilable.)
  */
class CodegenFallbackSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every oracle query executes with codegen fallback disabled") {
    assume(new java.io.File(sf).isDirectory, s"driver testdata missing: $sf")
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, q) =>
          try { q(spark, sf).count(); None }
          catch {
            case e: Throwable
              if Iterator.iterate(e: Throwable)(_.getCause)
                .takeWhile(_ != null).take(8)
                .exists(_.getClass.getName.contains("CompileException")) =>
              Some(name -> e.getMessage.linesIterator.take(2).mkString(" "))
            // anything else (data/contract errors) should fail the
            // normal way — rethrow so it is not misfiled as codegen
          }
      }
      assert(failures.isEmpty,
        "stages failed to COMPILE and would silently run interpreted " +
          "in production:\n" +
          failures.map { case (n, m) => s"  $n: $m" }.mkString("\n"))
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
