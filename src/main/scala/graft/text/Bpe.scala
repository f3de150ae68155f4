package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE merge-candidate counting — the inner loop of byte-pair-encoding
  * tokenizer training (Sennrich et al. 2016): over the corpus WORD
  * HISTOGRAM (never the raw token stream — a word's pairs are counted
  * once and weighted by its frequency), split each distinct word into
  * character symbols plus an end-of-word sentinel, count adjacent symbol
  * pairs weighted by word frequency, and emit the top-K merge candidates.
  * Training iterates: apply the argmax merge to the symbol sequences and
  * recount — each iteration is this same job over ~|vocab| rows, so the
  * expensive corpus scan happens ONCE (the histogram), and the loop runs
  * over Heaps'-law-bounded data.
  *
  * Output: (p1, p2, cnt) — the K heaviest pairs, ties broken by (p1, p2)
  * so the K-boundary is deterministic cross-engine. The sentinel is
  * U+001F (unit separator), a character the whitespace tokenizer can
  * never emit inside a word.
  *
  * Scale shape: the histogram is one explode + map-side-combined groupBy;
  * pair formation is ROW-LOCAL (char split + slice + arrays_zip +
  * explode) over DISTINCT words only; the final top-K is
  * TakeOrderedAndProject (parallel partial top-K, no global sort, no
  * single-partition window). */
object Bpe {

  val Eow = "\u001f"

  /** Weighted adjacent-pair counts over the word histogram, top `k`. */
  def topMerges(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val words = docs
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    // Spark's split(w, "") (limit -1) keeps a trailing "" that DuckDB's
    // string_split_regex does not emit — strip it before appending EOW
    val syms = words.select(col("freq"),
      concat(array_remove(split(col("w"), ""), ""), array(lit(Eow))).as("cs"))
    val pairs = syms
      .select(col("freq"),
        slice(col("cs"), lit(1), size(col("cs")) - 1).as("ctx"),
        slice(col("cs"), lit(2), size(col("cs")) - 1).as("nxt"))
      .select(col("freq"), explode(arrays_zip(col("ctx"), col("nxt"))).as("p"))
      .select(col("p.ctx").as("p1"), col("p.nxt").as("p2"), col("freq"))
    pairs.groupBy("p1", "p2").agg(sum("freq").as("cnt"))
      .orderBy(col("cnt").desc, col("p1").asc, col("p2").asc)
      .limit(k)
  }

  /** Frozen 6-merge tokenizer trained by iterating [[topMerges]]'s
    * pair-count → argmax → merge loop on the sf0.01 word histogram
    * (rank order, ties by (p1, p2) ascending) — the production shape:
    * train ONCE offline over the Heaps-bounded histogram, freeze, apply
    * everywhere at scan speed. BpeSpec re-derives rank 1 from the live
    * trainer so the frozen list stays tied to [[topMerges]]. */
  val FrozenMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("e", Eow), ("n", Eow), ("er", Eow), ("o", "w"), ("ow", Eow))

  /** Symbol delimiter for the replace-based encoder; '~' cannot appear in
    * a whitespace-tokenized word of the fixture corpus (charset audited:
    * lowercase a–y), and the oracle replays the identical replaces, so
    * the gate is bit-exact regardless. */
  val Sep = "~"

  /** Word separator for the document-level encoded string. */
  val WordSep = "/"

  /** Encode ONE word with the frozen merges: chars + EOW as a
    * `~`-delimited symbol string, then one non-overlapping left-to-right
    * `replace` per merge rank, replayed bit-for-bit by the DuckDB oracle.
    * KNOWN DIVERGENCE from Sennrich et al.'s regex-sub (which uses
    * zero-width lookarounds): because the delimiter is consumed by the
    * match, ADJACENT occurrences of the same pair merge only once per
    * rank pass (in `~e~r~e~r~` the first `(e,r)` match consumes the
    * shared `~`, so the second is left unmerged at that rank). The oracle
    * replays the identical single-pass replace, so the gate pins THIS
    * semantics; switching to a fixpoint loop would change encodings and
    * is deliberately not done while the oracle SQL is frozen.
    * Pure row-local string ops: zero shuffle, whole-stage-codegen'd —
    * tokenizer application at 100 TB is a map-only scan. */
  def encodeWord(w: Column): Column = {
    val init = concat(lit(Sep), array_join(
      concat(array_remove(split(w, ""), ""), array(lit(Eow))), Sep), lit(Sep))
    FrozenMerges.foldLeft(init) { case (c, (l, r)) =>
      replace(c, lit(Sep + l + Sep + r + Sep), lit(Sep + l + r + Sep))
    }
  }

  /** Encode a whole document: every whitespace token through
    * [[encodeWord]], words joined by [[WordSep]]. */
  def encodeDoc(text: Column): Column =
    array_join(transform(TextOps.tokens(text), w => encodeWord(w)), WordSep)
}
