package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time window aggregations over edge-delta / match-delta streams
  * [north: tumbling/sliding/session windows + watermarks]. The reference has
  * only per-epoch counts (/root/reference/examples/triangles.rs:69-77);
  * these are the north-rule windowed generalizations, built entirely on
  * Spark's built-in `window`/`session_window`. Each works identically on a
  * batch frame (for oracle comparison). `valueCol` defaults to the Z-set
  * weight, so counts are net-of-retraction. */
object Windows {

  private def agg(df: DataFrame, windowCol: Column, keys: Seq[String], valueCol: String) = {
    val gb = windowCol.as("win") +: keys.map(col)
    df.groupBy(gb: _*)
      .agg(sum(valueCol).as("net"), count(lit(1)).as("rows"))
      .select((Seq(col("win.start").as("win_start"), col("win.end").as("win_end")) ++
        keys.map(col) :+ col("net") :+ col("rows")): _*)
  }

  def tumbling(df: DataFrame, tsCol: String, width: String,
               keys: Seq[String] = Nil, valueCol: String = "w"): DataFrame =
    agg(df, window(col(tsCol), width), keys, valueCol)

  def sliding(df: DataFrame, tsCol: String, width: String, slide: String,
              keys: Seq[String] = Nil, valueCol: String = "w"): DataFrame =
    agg(df, window(col(tsCol), width, slide), keys, valueCol)

  def session(df: DataFrame, tsCol: String, gap: String,
              keys: Seq[String] = Nil, valueCol: String = "w"): DataFrame =
    agg(df, session_window(col(tsCol), gap), keys, valueCol)

  /** Streaming variants: caller applies `.withWatermark(tsCol, d)` first;
    * the same functions apply (Spark requires the watermark for append-mode
    * windowed aggregation). */
}
