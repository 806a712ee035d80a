package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The second (and only other) `private[sql]` doorway: executing SQL
  * DML (UPDATE / MERGE INTO) through the engine's own upsert/retract
  * verbs requires re-wrapping the ANALYZED child plans and resolved
  * expressions Spark hands a post-hoc rule as public DataFrame/Column
  * values — `Dataset.ofRows` and `ExpressionUtils.column` are the
  * constructors Spark itself uses for exactly this (e.g. in its
  * row-level-command rewrites), both `private[sql]`. Like
  * [[StreamingFrame]], this object lives under `org.apache.spark.sql`
  * solely to satisfy the access qualifier; it contains no logic.
  *
  * Re-using the analyzed plans/expressions verbatim (not re-parsing
  * SQL text) is what keeps attribute binding exact: the captured
  * expressions reference the child plans' attributes by exprId, and
  * both conversions preserve those ids.
  */
object PlanFrame {

  /** An analyzed logical plan as a DataFrame (attribute ids kept). */
  def frameOf(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** A resolved catalyst expression as a Column (binding by exprId). */
  def columnOf(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}
