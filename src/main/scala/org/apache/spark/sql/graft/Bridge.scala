package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made these `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so the engine — a
  * Catalyst extension library — exposes them from a `sql` subpackage,
  * the conventional pattern for Spark-native extensions. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** FULL column-node → expression conversion: unlike
    * `ExpressionUtils.expression` (which only unwraps plain expression
    * nodes), this runs the classic converter, so UDF/UDAF invocation
    * nodes — e.g. `functions.udaf(agg).apply(col)` — resolve to their
    * real `ScalaAggregator` expressions. Needed to register Aggregators
    * in the SQL FunctionRegistry via expression builders. */
  def convertedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Register a SQL function on an EXISTING session (extensions only
    * apply at session build time). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
}
