package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression conversions (Spark 4
  * classic mode) so graft's custom Catalyst expressions can be exposed as
  * `Column`s. Lives in org.apache.spark.sql purely for access; no Spark
  * internals are modified.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

/** Re-exposes `ExpectsInputTypes` with a signature graft code can implement:
  * `AbstractDataType` is `private[sql]`, so expressions outside this package
  * can't override `inputTypes` directly. Concrete `DataType`s are public and
  * `acceptsType` compares them nullability-insensitively, which is exactly
  * the strictness we want (misuse fails analysis; no silent implicit casts).
  */
trait GraftExpectsInputTypes
    extends org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  self: Expression =>
  def graftInputTypes: Seq[types.DataType]
  override def inputTypes: Seq[types.AbstractDataType] = graftInputTypes
}
