package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-handling utilities [north: salting + range partitioning].
  *
  * The reference hash-partitions state by raw node id
  * (/root/reference/examples/triangles.rs:46-47) — on a power-law graph the
  * hot key's worker becomes the straggler. Our first line of defense is AQE
  * (`spark.sql.adaptive.skewJoin.enabled`); these helpers are the explicit
  * fallback for joins/partitionings AQE cannot rewrite.
  */
object Skew {

  /** Salted equi-join: the skewed fact side gets a deterministic salt in
    * [0, numSalts) derived from `saltSource` (any column(s) that vary within
    * a hot key — e.g. the payload), the dim side is replicated to every
    * salt, and the join key becomes (key, salt). Result equals the plain
    * inner join. */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, keys: Seq[String],
                 numSalts: Int, saltSource: Column): DataFrame = {
    val s = skewed.withColumn("_salt", pmod(xxhash64(saltSource), lit(numSalts.toLong)))
    val d = dim.withColumn("_salt", explode(sequence(lit(0L), lit(numSalts.toLong - 1))))
    s.join(d, keys :+ "_salt").drop("_salt")
  }

  /** Range partitioning by key — keeps hot keys spread over sorted ranges
    * and gives downstream per-partition locality. */
  def rangePartition(df: DataFrame, numPartitions: Int, keys: Seq[String]): DataFrame =
    df.repartitionByRange(numPartitions, keys.map(col): _*)

  /** Two-phase (salted) aggregation for hot group keys: partial aggregate on
    * (keys, salt), then final on keys. Spark's hash aggregate already does
    * map-side partials; this adds an extra reduce tier for extreme skew. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                numSalts: Int, saltSource: Column): DataFrame = {
    val s = df.withColumn("_salt", pmod(xxhash64(saltSource), lit(numSalts.toLong)))
    s.groupBy((keys :+ "_salt").map(col): _*).agg(sum(valueCol).as("_partial"))
      .groupBy(keys.map(col): _*).agg(sum("_partial").as(valueCol))
  }
}
