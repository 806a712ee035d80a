package graft.functions

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/** The one-list function surface: registerAll installs every name on
  * a session registry, and GraftExtensions injects the same list at
  * session build time — with the injected functions surviving into
  * session CLONES, which is precisely what the manual registration
  * calls in the streaming sinks defend against.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("registerAll resolves every listed function through plain SQL") {
    GraftFunctions.registerAll(spark)
    val reg = spark.sessionState.functionRegistry
    GraftFunctions.all.foreach { case (name, _) =>
      assert(reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name)), name)
    }
    // spot-check real evaluation through the SQL surface
    assert(spark.sql(
      "SELECT dot_fold(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head.getDouble(0) === 11.0)
    assert(spark.sql(
      "SELECT hamming_fold(sign_pack(array(1.0d, -1.0d)), " +
        "sign_pack(array(-1.0d, -1.0d))) AS h")
      .head.getInt(0) === 1)
    assert(spark.sql(
      "SELECT size(word_grams('one two three', 2, true)) AS n")
      .head.getInt(0) === 2)
  }

  test("an extensions-built session resolves graft functions with ZERO register calls") {
    // build a sibling session (same SparkContext) through the
    // SparkSessionExtensions path — the canonical library integration
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val ext = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      try {
        assert(ext ne spark, "builder must have created a NEW session")
        assert(ext.sql(
          "SELECT dot_fold(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
          .head.getDouble(0) === 11.0)
        assert(ext.sql("SELECT minhash_sig('one two three four') AS s")
          .head.getString(0).length === 32)
        // the inheritance claim: a CLONE of the session (the
        // streaming micro-batch shape) resolves without registration
        val clone = ext.newSession()
        assert(clone.sql(
          "SELECT hamming_fold(sign_pack(array(1.0d, -1.0d, 3.0d)), " +
            "sign_pack(array(1.0d, 1.0d, -3.0d))) AS h")
          .head.getInt(0) === 2)
      } finally {
        // the session shares the JVM-wide SparkContext — never stop it
        SparkSession.clearDefaultSession()
        SparkSession.clearActiveSession()
      }
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
