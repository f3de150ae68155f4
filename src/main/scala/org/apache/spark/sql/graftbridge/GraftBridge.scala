package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression↔Column bridge. Spark 4 gates `ExpressionUtils` (and most
  * Column internals) behind `private[sql]`; hosting this one-liner inside a
  * subpackage of `org.apache.spark.sql` is the established pattern OSS
  * Catalyst-extension libraries use to wrap custom native expressions into
  * user-facing Columns without a function-registry round-trip. */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over pre-built InternalRows (e.g. UnsafeRows written by a
    * hand-rolled emitter), skipping the external Row → Catalyst conversion
    * layer entirely. `SparkSession.internalCreateDataFrame` is the supported
    * path Spark's own sources use; it is `private[sql]`, hence this shim. */
  def internalCreateDataFrame(
      spark: org.apache.spark.sql.SparkSession,
      rows: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rows, schema)
}
