package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Column ↔ Expression bridge for graft's FunctionRegistry builders.
  *
  * Spark 4 moved `Column` onto ColumnNode (shared with Connect) and made
  * the classic converters `private[sql]`; registering a COMPOSED Column
  * combinator as a SQL function (graft.functions.TextSql) needs exactly
  * these two conversions and nothing else. This object lives in the
  * `org.apache.spark.sql` package purely to re-expose them — the JVM
  * classes are public and stable (columnNodeSupport.scala); only the
  * Scala-level access modifier is being crossed, with no behavior of
  * our own.
  *
  * Column → Expression goes through the EAGER node converter, not
  * `ExpressionUtils.expression`: the latter returns a lazy
  * `ColumnNodeExpression` wrapper that only unwraps when the analyzer
  * converts a full plan — returned from a function-registry builder it
  * would survive analysis unresolved and die at codegen. The converted
  * tree may still carry `UnresolvedFunction`/lambda nodes; that is
  * correct, the analyzer's function resolution iterates until they are
  * gone.
  */
object graftbridge {
  def expressionOf(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
  def columnOf(e: Expression): Column = ExpressionUtils.column(e)
}
