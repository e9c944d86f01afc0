package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's private[sql] Column ↔ Expression converters, needed
  * to expose custom Catalyst expressions as user-facing Columns in
  * Spark 4 (where `new Column(expr)` no longer exists). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** An uncorrelated scalar subquery as a lazy Catalyst expression — the
    * subplan stays inside the outer query's plan (visible to the
    * optimizer, reusable, no jobs until an action). Runtime contract:
    * null on zero rows, error on >1 row. */
  def scalarSubquery(df: org.apache.spark.sql.DataFrame): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
        df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
          .queryExecution.analyzed))

  /** `EXISTS (subquery)` as a lazy Catalyst predicate. */
  def existsSubquery(df: org.apache.spark.sql.DataFrame): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.Exists(
        df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
          .queryExecution.analyzed))

  /** A DataFrame over an arbitrary logical plan (Dataset.ofRows is
    * private[sql]) — used by the bench to re-plan a query with its
    * trailing presentation sort stripped. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Bridge to Dataset.showString (private[sql] in Spark 4) — the ASCII
    * table renderer behind df.show(), needed for the FORMAT Pretty twin. */
  def showString(df: org.apache.spark.sql.DataFrame, numRows: Int,
      truncate: Int): String =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .showString(numRows, truncate, vertical = false)
}
