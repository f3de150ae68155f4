package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's primary input format: whitespace-separated `src dst`
  * lines, one edge per line, `#`-prefixed comment lines skipped
  * (/root/reference/examples/motif.rs:82-103). An optional third column is
  * read as the Z-set weight (default +1).
  *
  * Both forms are a projection over Spark's text source, so at cluster
  * scale the scan parallelizes per file-split and the parse is
  * whole-stage-codegen'd column ops (no UDF). */
object EdgeTextSource {

  private def parse(lines: DataFrame): DataFrame = {
    val t = trim(col("value"))
    // try_cast (not cast): under ANSI mode a malformed numeric token must
    // SKIP the row per the reference's parse contract, not fail the task
    lines
      .where(length(t) > 0 && !t.startsWith("#"))
      .select(split(t, "\\s+").as("p"))
      .select(
        expr("try_cast(try_element_at(p, 1) AS BIGINT)").as("src"),
        expr("try_cast(try_element_at(p, 2) AS BIGINT)").as("dst"),
        coalesce(expr("try_cast(try_element_at(p, 3) AS BIGINT)"), lit(1L)).as("w"))
      .where(col("src").isNotNull && col("dst").isNotNull)
  }

  /** Batch read of an edge text file/directory. */
  def read(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.text(path))

  /** Streaming read: one trigger per `maxFilesPerTrigger` files, feeding the
    * incremental engine exactly like the reference's file replay. */
  def readStream(spark: SparkSession, path: String,
                 maxFilesPerTrigger: Int = 1): DataFrame =
    parse(spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .text(path))
}
