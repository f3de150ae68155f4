package graft.transcripts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Turn-level document operations over the north rule's transcript table
  * (conv_id, turn_idx, role, text, …) — the "per-turn text equality under
  * stable (conv_id, turn_idx) ordering" invariant (BASELINE.json
  * input_hint) made executable:
  *
  *  - [[render]] flattens each conversation into ONE training document with
  *    the turns concatenated in turn_idx order — the chat→document step of
  *    an LLM training pipeline. A single hash-partitioned groupBy on
  *    conv_id; the per-group payload is one conversation (bounded by max
  *    turns × max text, never by corpus size), so the shuffle is the only
  *    cost and it scales horizontally to 10^12 turns. Ordering does NOT
  *    rely on `collect_list` order (undefined under retries/AQE): each
  *    piece carries its turn_idx and `array_sort` on (turn_idx, piece)
  *    structs restores the stable order inside the group, deterministically
  *    at any parallelism.
  *
  *  - [[roleStats]] validates turn ordering per conversation: counts
  *    adjacent turns with the same role (alternation violations) via a
  *    conv-partitioned lag window — each conversation ranks inside its own
  *    task, nothing funnels through one partition.
  *
  * Reference: the per-turn ordering contract is the reference's epoch/order
  * guarantee on streamed tuples (/root/reference/src/lib.rs:120-156
  * extend_using prefix streams keep input order); here it is a first-class
  * relational op rather than a property of the dataflow runtime.
  */
object TranscriptDocs {

  /** "role:text" with SQL-null role/text rendered as '' (concat_ws would
    * silently drop a null operand AND its separator — coalesce first so
    * the DuckDB `coalesce(x,'') || ':' || coalesce(y,'')` twin matches). */
  private def piece(role: Column, text: Column): Column =
    concat_ws(":", coalesce(role, lit("")), coalesce(text, lit("")))

  /** One row per conversation: (conv_id, n_turns, doc) where doc is the
    * turn pieces joined by `sep` in ascending turn_idx order. */
  def render(t: DataFrame, sep: String = "\n"): DataFrame =
    t.select(col("conv_id"),
        struct(col("turn_idx"), piece(col("role"), col("text")).as("p")).as("tp"))
      .groupBy("conv_id")
      .agg(count(lit(1)).as("n_turns"),
        array_join(
          transform(array_sort(collect_list(col("tp"))), x => x("p")),
          sep).as("doc"))

  /** Per-conversation response-latency stats: exact integer aggregates over
    * the gaps between consecutive turns (micros, `unix_micros`): n_gaps,
    * min/max/sum. All-integer and mergeable (no mean/median), so the same
    * figures fall out of the O(1)-state streaming kernel
    * ([[graft.streaming.LatencyStream]]) and a partial-aggregated batch
    * plan alike. Conversations with a single turn have no gaps and emit no
    * row. One conv-partitioned lag window + a groupBy on the same key —
    * ENSURE_REQUIREMENTS reuses the window exchange, nothing funnels
    * through one partition. */
  def latencyStats(t: DataFrame): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t.withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("gap", col("ts_us") - lag("ts_us", 1).over(w))
      .where(col("gap").isNotNull)
      .groupBy("conv_id")
      .agg(count(lit(1)).as("n_gaps"), min("gap").as("min_gap_us"),
        max("gap").as("max_gap_us"), sum("gap").as("sum_gap_us"))
  }

  /** SFT training-pair extraction — the transcripts→training-examples step
    * of an LLM data pipeline: every turn whose role is `targetRole` becomes
    * a (prompt, completion) example, the prompt being the last ≤`ctxTurns`
    * PRIOR turns rendered "role:text" and joined by `sep` under stable
    * (conv_id, turn_idx) order (the north rule's per-turn text equality as
    * the example boundary). Implemented as `ctxTurns` lag() columns over
    * ONE conv-partitioned sort: bounded context means row-local work after
    * the sort — no per-turn prefix re-aggregation and no O(turns²) string
    * growth — and the conv_id partitioning keeps 10^12 turns horizontal
    * (each conversation ranks inside its own task). Turns with no prior
    * context (turn_idx == 1) emit nothing. */
  def sftPairs(t: DataFrame, targetRole: String, ctxTurns: Int = 4,
               sep: String = "\n"): DataFrame = {
    require(ctxTurns >= 1, s"ctxTurns $ctxTurns must be >= 1")
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    val p = piece(col("role"), col("text"))
    // oldest-first: lag(ctxTurns) … lag(1); concat_ws drops the leading
    // nulls (< ctxTurns turns of history) without a phantom separator
    val ctxCols = (ctxTurns to 1 by -1).map(i => lag(p, i).over(w))
    t.select(col("conv_id"), col("turn_idx"), col("role"), col("text"),
        concat_ws(sep, ctxCols: _*).as("prompt"))
      .where(col("role") === targetRole && col("turn_idx") > 1)
      .select(col("conv_id"), col("turn_idx").cast("long").as("turn_idx"),
        col("prompt"), col("text").as("completion"))
  }

  /** PREFERENCE-pair extraction (RLHF/DPO data prep from logged feedback):
    * per conversation, the target-role turns are ranked by a logged reward
    * column and the best/worst become one (chosen, rejected) pair —
    * chosen = first by (reward DESC, turn_idx ASC), rejected = first by
    * (reward ASC, turn_idx DESC), so ties are deterministic and an
    * all-equal-reward conversation still yields a valid (min-idx, max-idx)
    * pair. Conversations with fewer than two target turns emit nothing
    * (no pair exists). Turns with a NULL reward are excluded up front —
    * un-scored candidates cannot rank, and NULL ordering differs between
    * engines (Spark sorts NULLs first ascending, DuckDB last), so
    * admitting them would make "rejected" engine-dependent. Reward values
    * pass through RAW — no arithmetic on
    * them, so the float column hash-compares exactly across engines.
    * Three conv-partitioned windows + a conv-keyed self-join, all on the
    * same key: one exchange, reused by ENSURE_REQUIREMENTS, nothing
    * funnels through a single partition. */
  def preferencePairs(t: DataFrame, targetRole: String,
                      rewardCol: String): DataFrame = {
    val tgt = t.where(col("role") === targetRole && col(rewardCol).isNotNull)
      .select(col("conv_id"), col("turn_idx"), col("text"),
        col(rewardCol).as("_rw"))
    val wc = Window.partitionBy("conv_id")
      .orderBy(col("_rw").desc, col("turn_idx").asc)
    val wr = Window.partitionBy("conv_id")
      .orderBy(col("_rw").asc, col("turn_idx").desc)
    val ranked = tgt
      .withColumn("_rc", row_number().over(wc))
      .withColumn("_rr", row_number().over(wr))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy("conv_id")))
      .where(col("_n") >= 2)
    val chosen = ranked.where(col("_rc") === 1)
      .select(col("conv_id"), col("turn_idx").cast("long").as("chosen_idx"),
        col("text").as("chosen_text"), col("_rw").as("chosen_reward"))
    val rejected = ranked.where(col("_rr") === 1)
      .select(col("conv_id"), col("turn_idx").cast("long").as("rejected_idx"),
        col("text").as("rejected_text"), col("_rw").as("rejected_reward"))
    chosen.join(rejected, Seq("conv_id"))
  }

  /** Per-conversation alternation stats: n_turns and n_repeats = count of
    * turns whose role equals the previous turn's role (standard SQL `=`
    * null semantics: a null role never counts as a repeat — matches the
    * DuckDB twin's CASE WHEN role = prev THEN 1 form). */
  def roleStats(t: DataFrame): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t.withColumn("prev_role", lag("role", 1).over(w))
      .groupBy("conv_id")
      .agg(count(lit(1)).as("n_turns"),
        sum(when(col("role") === col("prev_role"), 1L).otherwise(0L))
          .as("n_repeats"))
  }
}
