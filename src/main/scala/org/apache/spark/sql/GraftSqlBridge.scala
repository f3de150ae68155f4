package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StructType

/** Bridge into `private[sql]` constructors needed by graft's custom
  * logical operator (the standard extension-library technique — the class
  * lives in the `org.apache.spark.sql` package solely to satisfy the
  * qualified-private access; it contains no Spark-internal logic). */
object GraftSqlBridge {

  /** Wraps a custom LogicalPlan as a DataFrame on the session. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** DataFrame over an InternalRow RDD with a known schema (no
    * row-encoder round trip). */
  def internalDf(spark: SparkSession, rdd: RDD[InternalRow],
                 schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)

  /** The session's experimental planner-strategy hook (classic API). */
  def experimental(spark: SparkSession): ExperimentalMethods =
    spark.asInstanceOf[classic.SparkSession].experimental
}
