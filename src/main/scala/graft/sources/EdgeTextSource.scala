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
    val parts = split(t, "\\s+")
    lines
      .where(length(t) > 0 && !t.startsWith("#"))
      .select(
        try_element_at(parts, lit(1)).cast("long").as("src"),
        try_element_at(parts, lit(2)).cast("long").as("dst"),
        coalesce(try_element_at(parts, lit(3)).cast("long"), lit(1L)).as("w"))
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
