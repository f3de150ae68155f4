package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Interval-containment (range) join — match each point to every interval
  * containing it, with NO equi-key to hang the join on. Spark's own plan
  * for `a JOIN b ON pt >= s AND pt < e` is a broadcast-nested-loop (or a
  * cartesian) — quadratic work at scale. The scalable form is bin
  * bucketing: quantize time into fixed-width bins, explode each interval to
  * the bins it overlaps, map each point to its single bin, and equi-join on
  * the bin — the shuffle is keyed, the exact predicate re-filters inside
  * the matched bin, and every (point, interval) pair meets on EXACTLY one
  * bin (the point's), so no dedup pass is needed.
  *
  * Cost model: intervals explode to ceil(len/binWidth)+1 rows; points to 1.
  * Pick binWidth near the typical interval length — the explode factor
  * stays O(1) and each bin's population is load-balanced by time. A
  * pathological mega-interval (spanning the whole corpus) explodes to
  * O(range/binWidth) rows — cap it by splitting such intervals into a
  * broadcast side (`hotSpanBins`), the same hot/cold split the engine uses
  * for hub nodes (graft.fast.DeltaEngine hot-hub replica).
  */
object RangeJoin {

  /** Join `points` (long column `ptCol`) to `intervals` (long columns
    * `startCol`, `endCol`, half-open [start, end)) on containment. Output:
    * all point columns + all interval columns, one row per containing
    * interval. `hotSpanBins`: intervals overlapping more than this many
    * bins are broadcast instead of exploded (they would dominate the
    * shuffle), and the two match sets are unioned — identical semantics. */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      binWidth: Long, hotSpanBins: Long = 4096L): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val span = (floor(col(endCol).cast("long").minus(1) / binWidth) -
      floor(col(startCol).cast("long") / binWidth)).plus(1)
    val nonEmpty = intervals.where(col(endCol) > col(startCol))
      .withColumn("_span", span)
    val cold = nonEmpty.where(col("_span") <= hotSpanBins)
      .withColumn("_bin", explode(sequence(
        floor(col(startCol).cast("long") / binWidth).cast("long"),
        floor((col(endCol).cast("long") - 1) / binWidth).cast("long"))))
      .drop("_span")
    val hot = nonEmpty.where(col("_span") > hotSpanBins).drop("_span")

    val p = points.withColumn("_bin",
      floor(col(ptCol).cast("long") / binWidth).cast("long"))
    val contains = col(ptCol) >= col(startCol) && col(ptCol) < col(endCol)
    val coldMatches = p.join(cold, Seq("_bin")).where(contains).drop("_bin")
    val hotMatches = p.drop("_bin")
      .join(broadcast(hot), contains, "inner")
    coldMatches.unionByName(hotMatches)
  }
}
