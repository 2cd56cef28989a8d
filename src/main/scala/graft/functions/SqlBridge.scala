/* Expression <-> Column bridge: Spark 4 moved these conversions behind
 * private[sql] (org.apache.spark.sql.classic.ExpressionUtils). Custom
 * Catalyst expressions still need them, so this 6-line shim lives in the
 * org.apache.spark.sql package — same approach the Spark ecosystem uses
 * for native expression libraries. */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
