package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the package-private Column ↔ catalyst-Expression
  * converters (org.apache.spark.sql.classic.ExpressionUtils, Spark
  * 4.x). Custom Catalyst expressions need this to surface as public
  * `Column`s; confined to this one file. */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
