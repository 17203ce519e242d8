package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 made the Column ⇄ Expression conversions `private[sql]`
  * (`classic.ExpressionUtils`), so a library that implements its own
  * codegen'd `Expression`s needs one file inside the `org.apache.spark.sql`
  * namespace to re-export them — the standard extension-library technique
  * (Delta, Sedona, et al. ship such shims). This object is the ONLY graft
  * code outside the `graft` package, and it contains no logic.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
