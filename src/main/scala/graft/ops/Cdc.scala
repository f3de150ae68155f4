package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog (CDC) application: collapse a stream of keyed
  * insert/update/delete changes into final table state — the MERGE INTO /
  * changelog-compaction primitive an Iceberg-shaped engine needs for
  * upsert sinks and snapshot maintenance. The reference engine's analog is
  * its `((K,V), ±1)` update stream folded into the index by
  * `Index::update/merge_to` (/root/reference/src/index.rs); here the
  * "index" is a keyed table and the weight is a sequence number.
  *
  * Contract: `seqCol` is unique per key (a commit LSN / batch offset);
  * the highest sequence wins, and a winning delete removes the key.
  *
  * 100-TB shape: one keyed shuffle with map-side partial aggregation —
  * `max_by(struct(change), seq)` is associative/commutative, so each map
  * task pre-collapses its partition's churn before the exchange (a key
  * updated 1000× in one batch ships once). The incremental form
  * ([[foldBatch]]) keeps winning DELETES as tombstones in its state, so
  * folding is confluent: any batching/ordering of the same changelog
  * converges to the same state (`cdc_apply_stream` replays a different
  * chunking than the batch gate to pin exactly this).
  */
object Cdc {

  /** Per-key winning change, INCLUDING deletes (tombstones) — the internal
    * state form. Output columns: key, seq, op, payload. */
  def compactLog(log: DataFrame, keyCol: String, seqCol: String,
                 opCol: String, payloadCols: Seq[String]): DataFrame = {
    val changeCols = (Seq(seqCol, opCol) ++ payloadCols).map(col)
    log.groupBy(col(keyCol))
      .agg(max_by(struct(changeCols: _*), col(seqCol)).as("_w"))
      .select(col(keyCol) +: (Seq(seqCol, opCol) ++ payloadCols)
        .map(c => col(s"_w.$c").as(c)): _*)
  }

  /** Final table state of a changelog: winner per key, deletes dropped.
    * Output columns: key, payload. */
  def applyLog(log: DataFrame, keyCol: String, seqCol: String,
               opCol: String, payloadCols: Seq[String]): DataFrame =
    compactLog(log, keyCol, seqCol, opCol, payloadCols)
      .where(col(opCol) =!= "D")
      .select((keyCol +: payloadCols).map(col): _*)

  /** Fold one change batch into an existing compacted state (the
    * foreachBatch / upsert-sink form): union the batch's winners with the
    * state and take the winner again. `state` must be a [[compactLog]]
    * output (or null/empty for the first batch). Tombstones ride along so
    * a straggler change below a seen delete's seq can never resurrect the
    * key. */
  def foldBatch(state: DataFrame, batch: DataFrame, keyCol: String,
                seqCol: String, opCol: String,
                payloadCols: Seq[String]): DataFrame = {
    val b = compactLog(batch, keyCol, seqCol, opCol, payloadCols)
    if (state == null) b
    else compactLog(state.unionByName(b), keyCol, seqCol, opCol, payloadCols)
  }

  /** Read the final table out of a fold state: drop tombstones and the
    * bookkeeping columns. */
  def stateTable(state: DataFrame, keyCol: String, seqCol: String,
                 opCol: String, payloadCols: Seq[String]): DataFrame =
    state.where(col(opCol) =!= "D")
      .select((keyCol +: payloadCols).map(col): _*)

  /** Changelog between two snapshots of a keyed table — the snapshot-diff /
    * incremental-export primitive, inverse of [[applyLog]]: keys only in
    * `before` emit D, only in `after` emit I, present in both with a
    * different payload emit U (null-safe comparison; unchanged keys emit
    * nothing). Payload columns carry the AFTER side (null for D).
    *
    * One full-outer keyed join: both snapshots shuffle on the key and
    * stream through a sort-merge/hash join — at 100 TB this is the one
    * unavoidable exchange, and bucketed-by-key table layouts (see
    * BucketingSpec) make it exchange-free. Round-trip law (spec-pinned):
    * applyLog(before-as-inserts ∪ diff(before, after)) == after. */
  def diff(before: DataFrame, after: DataFrame, keyCol: String,
           payloadCols: Seq[String]): DataFrame = {
    val b = before.select(col(keyCol).as("_bk") +:
      payloadCols.map(c => col(c).as(s"_b_$c")): _*)
    val a = after.select(col(keyCol).as("_ak") +:
      payloadCols.map(c => col(c).as(s"_a_$c")): _*)
    val bPay = struct(payloadCols.map(c => col(s"_b_$c")): _*)
    val aPay = struct(payloadCols.map(c => col(s"_a_$c")): _*)
    b.join(a, col("_bk") === col("_ak"), "full_outer")
      .where(col("_ak").isNull || col("_bk").isNull || !(bPay <=> aPay))
      .select(
        coalesce(col("_bk"), col("_ak")).as(keyCol) +:
          when(col("_ak").isNull, "D").when(col("_bk").isNull, "I")
            .otherwise("U").as("op") +:
          payloadCols.map(c => col(s"_a_$c").as(c)): _*)
  }
}
