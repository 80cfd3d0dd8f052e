package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
import org.apache.spark.sql.types.{AbstractDataType, DataType}

/** `ImplicitCastInputTypes` with a public-type signature. Spark 4 made
  * `AbstractDataType` private[sql], so expressions living in `graft.*`
  * cannot override `inputTypes` directly; they implement
  * [[graftInputTypes]] with plain `DataType`s (public, and a subtype of
  * AbstractDataType) and this trait adapts. Gives SQL-registered kernels
  * Catalyst coercion: array<int> arguments cast, non-arrays are analysis
  * errors, instead of eval misreading raw ArrayData.
  */
trait GraftImplicitCasts extends ImplicitCastInputTypes {
  def graftInputTypes: Seq[DataType]
  override def inputTypes: Seq[AbstractDataType] = graftInputTypes
}
