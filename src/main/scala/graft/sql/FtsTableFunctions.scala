package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.store.{Fts, TableStore}

/** FTS MATCH as a COMPOSABLE table-valued function — the missing half
  * of the SQL-only search surface. `CALL graft.system.search` answers
  * a standalone lookup but its result is a driver-local k-bounded
  * relation a SQL user cannot JOIN, facet, or nest; the reference's
  * FTS results are ordinary SQL relations composed freely into larger
  * statements (the `*_fts` MATCH subqueries throughout
  * `/root/reference/README.md:222-259`, semi-joined against other
  * tables exactly like the timeline recipe at README.md:212; the
  * indexes serving them: utils.py:330-352). These TVFs restore that
  * composability on Spark:
  *
  * {{{
  * -- matching pks as a real relation (AND/OR/NOT, phrases, prefix,
  * -- NEAR, column filters — the full MATCH grammar):
  * SELECT d.lang, count(*) AS n
  * FROM graft.docs d
  * WHERE d.id IN (SELECT pk FROM graft_fts('docs', 'spark AND vector'))
  * GROUP BY d.lang
  *
  * -- BM25-ranked (pk, score) for joins that keep the rank:
  * SELECT d.*, m.score
  * FROM graft_fts_ranked('docs', 'zebra') m JOIN graft.docs d
  *   ON d.id = m.pk
  * ORDER BY m.score DESC
  * }}}
  *
  * The 2-argument form resolves against the `graft` catalog's store;
  * a 3-argument form (`graft_fts('<catalog>', table, query)`) names
  * another mounted graft catalog. The returned plan IS
  * [[Fts.search]]/[[Fts.searchRanked]]'s own distributed frame —
  * token-pruned postings scan, file-envelope skipping, no collect and
  * no k truncation; Catalyst composes it like any other relation
  * (semi-join pushes into the postings side, the facet aggregates
  * above). Arguments must be literal strings: the MATCH query shapes
  * the PLAN (each term becomes scans/joins), so a per-row query has
  * no single plan to build — the same restriction SQL imposes on
  * `range(n)` and friends.
  *
  * Injected by [[graft.functions.GraftExtensions]]
  * (`injectTableFunction`), so every extensions-configured session —
  * including streaming micro-batch clones — resolves them with no
  * registration calls. `CALL graft.system.search` stays as the
  * convenience verb.
  */
object FtsTableFunctions {

  /** (name, ranked?) of every injected MATCH table function. */
  val all: Seq[(String, Boolean)] =
    Seq("graft_fts" -> false, "graft_fts_ranked" -> true)

  private def litStr(fn: String, e: Expression, what: String): String = {
    require(e.foldable,
      s"$fn: $what must be a literal string — the MATCH query shapes " +
        "the plan, so it cannot vary per row")
    val v = e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    require(v != null, s"$fn: $what must not be NULL")
    v.toString
  }

  /** Build the logical plan for one invocation — runs at analysis
    * time, so the store root resolves from the LIVE session conf (the
    * same re-rooting contract the catalog itself keeps).
    */
  def plan(name: String, ranked: Boolean, args: Seq[Expression]): LogicalPlan = {
    val (cat, table, query) = args match {
      case Seq(t, q) =>
        ("graft", litStr(name, t, "table"), litStr(name, q, "query"))
      case Seq(c, t, q) =>
        (litStr(name, c, "catalog"), litStr(name, t, "table"),
          litStr(name, q, "query"))
      case other => throw new IllegalArgumentException(
        s"$name takes (table, query) or (catalog, table, query) — " +
          s"got ${other.size} argument(s)")
    }
    val spark = SparkSession.active
    val root = Option(
      spark.conf.get(s"spark.sql.catalog.$cat.root", null)).getOrElse(
      throw new IllegalArgumentException(
        s"$name: no graft catalog '$cat' is mounted — set " +
          s"spark.sql.catalog.$cat and spark.sql.catalog.$cat.root"))
    val store = new TableStore(spark, root)
    val df =
      if (ranked) Fts.searchRanked(spark, store, table, query)
      else Fts.search(spark, store, table, query)
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
      .queryExecution.analyzed
  }
}
