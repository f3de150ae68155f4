package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — for every left row, the most recent right row at
  * or before it, per key. Spark has no native ASOF operator; the naive
  * rewrite (inequality join + per-left-row argmax) is a cross-product per
  * key. This implementation is the scalable form: UNION both sides with a
  * side tag, ONE keyed sort (the same shuffle an ordinary window needs),
  * and a running `last(_, ignoreNulls)` that carries each right payload
  * forward to the left rows that follow it — O(n log n) per key, one
  * shuffle total, no join node at all. It is also exactly the shape a
  * streaming as-of takes (keyed state carrying the latest right row), so
  * batch and stream agree by construction — the same union-the-inputs trick
  * the reference uses to treat a static prefix and live updates as one
  * stream (/root/reference/examples/motif.rs:108-126).
  *
  * Determinism: ties at equal timestamp order right-before-left (a right
  * row at t is visible to a left row at the same t), and multiple right
  * rows at one (key, ts) resolve by largest tiebreak column.
  */
object AsofJoin {

  /** For each row of `left`, attach `payload` columns from the latest
    * `right` row with the same `key` and right.ts <= left.ts (nulls when no
    * predecessor exists). `tieBreak` orders right rows sharing (key, ts);
    * output = all left columns + payload columns (null-filled). */
  def backward(left: DataFrame, right: DataFrame, key: String, ts: String,
               tieBreak: String, payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "asof join needs at least one payload column")
    val leftCols = left.columns.toSeq
    // the whole right payload travels as ONE struct so every asof_* output
    // column comes from the SAME right row even when payload values are null
    val payloadStruct = struct(payload.map(col): _*)
    val l = left.withColumn("_side", lit(1))
      .withColumn("_tie", col(tieBreak).cast("long"))
      .withColumn("_p", lit(null).cast(
        org.apache.spark.sql.types.StructType(payload.map(p => right.schema(p)))))
    val r0 = right.select(col(key), col(ts),
      col(tieBreak).cast("long").as("_tie"), lit(0).as("_side"),
      payloadStruct.as("_p"))
    // null-fill the left-only columns on the right side
    val rAligned = leftCols.foldLeft(r0)((d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val outCols = leftCols.map(col) ++ Seq(col("_side"), col("_tie"), col("_p"))
    val u = l.select(outCols: _*).unionByName(rAligned.select(outCols: _*))

    // keyed running state: right rows (side 0) sort before left rows at the
    // same ts; last(ignoreNulls) carries the newest right payload forward
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("_side").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("_asof", last(col("_p"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"_asof.$p").as(s"asof_$p")): _*)
  }
}
