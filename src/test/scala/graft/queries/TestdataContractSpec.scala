package graft.queries

import graft.SparkSpec

/** The testdata contract, pinned (round-7 postmortem).
  *
  * Round 7 lost three queries to a silent driver-side testdata
  * regeneration: `events.ts` flipped from parquet TIMESTAMP(NANOS) to
  * tz-naive timestamp[us] (TIMESTAMP_NTZ) and the failures surfaced
  * only as two incidental plan-shape guards plus a shrunk CORRECTNESS
  * row count. This suite makes both failure modes loud and immediate:
  *
  *  1. a RAW schema canary — the sf0.001 footers must match the
  *     committed fingerprint exactly, so any regeneration is detected
  *     by one named test at round start, with the diff in the message;
  *  2. a NORMALIZED contract — [[Catalog.table]] must present every
  *     timestamp column as plain TimestampType whatever physical
  *     annotation the generation carries (nanos-as-long, NTZ, or TZ);
  *  3. a SMOKE pass — every Inventory entry executes at sf0.001
  *     (`.count()`, no throw), so schema drift that breaks analysis
  *     fails here by query name instead of leaking to verify time.
  */
class TestdataContractSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  // Fingerprint of the driver-generated footers as Spark reads them
  // raw (nanosAsLong on, NTZ inference on — the Catalog read path).
  // If the driver regenerates with a different annotation, update this
  // pin AND re-check Catalog.table normalizes the new form.
  private val rawPin = Map(
    "region" -> "struct<r_regionkey:int,r_name:string>",
    "nation" -> "struct<n_nationkey:int,n_name:string,n_regionkey:int>",
    "customer" -> ("struct<c_custkey:bigint,c_name:string,c_nationkey:int," +
      "c_acctbal:double,c_mktsegment:string>"),
    "supplier" -> ("struct<s_suppkey:bigint,s_name:string,s_nationkey:int," +
      "s_acctbal:double>"),
    "part" -> ("struct<p_partkey:bigint,p_name:string,p_brand:string," +
      "p_type:string,p_size:int,p_retailprice:double>"),
    "orders" -> ("struct<o_orderkey:bigint,o_custkey:bigint," +
      "o_orderstatus:string,o_totalprice:double,o_orderdate:timestamp_ntz," +
      "o_orderpriority:string>"),
    "lineitem" -> ("struct<l_orderkey:bigint,l_partkey:bigint," +
      "l_suppkey:bigint,l_linenumber:int,l_quantity:double," +
      "l_extendedprice:double,l_discount:double,l_tax:double," +
      "l_returnflag:string,l_linestatus:string,l_shipdate:timestamp_ntz>"),
    "events" -> ("struct<event_id:bigint,ts:timestamp_ntz,user_id:bigint," +
      "event_type:string,value:double,props:string>"),
    "documents" -> ("struct<doc_id:bigint,text:string,lang:string," +
      "source:string,n_chars:bigint>"),
    "embeddings" -> "struct<vec_id:bigint,embedding:array<float>,label:int>")

  test("schema canary: sf0.001 footers match the committed fingerprint") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val diffs = Catalog.tableNames.flatMap { t =>
      val got = spark.read.parquet(s"$sf/$t.parquet").schema.simpleString
      if (got == rawPin(t)) None
      else Some(s"$t:\n  expected ${rawPin(t)}\n  got      $got")
    }
    assert(diffs.isEmpty,
      s"TESTDATA DRIFT — driver regenerated parquet with a new schema:\n" +
        diffs.mkString("\n"))
  }

  test("normalized contract: Catalog.table folds every timestamp form to TimestampType") {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val tsCols = Map(
      "events" -> Seq("ts"),
      "orders" -> Seq("o_orderdate"),
      "lineitem" -> Seq("l_shipdate"))
    for ((t, cols) <- tsCols; c <- cols) {
      val f = Catalog.table(spark, sf, t).schema(c)
      assert(f.dataType == TimestampType,
        s"$t.$c: expected TimestampType, got ${f.dataType}")
      assert(f.dataType != TimestampNTZType)
    }
  }

  test("smoke: every Inventory query analyzes and runs at sf0.001") {
    val failures = Inventory.all.flatMap { op =>
      try { op.fn(spark, sf).count(); None }
      catch { case e: Throwable =>
        Some(s"${op.name}: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(300)}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size}/${Inventory.all.size} queries failed at sf0.001:\n" +
        failures.mkString("\n"))
  }
}
