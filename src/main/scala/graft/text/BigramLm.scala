package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram-LM surprisal scoring — the integer-exact stand-in for the
  * KenLM-style n-gram perplexity filter CCNet-class pipelines run over a
  * crawl. [[Rarity.tokenRarity]] scores tokens context-free; this scores
  * each token GIVEN its predecessor: the per-occurrence cost is the
  * inverse MLE conditional probability, odds = floor(c(a·) · 2^16 /
  * c(a,b)) where c(a,b) is the corpus count of bigram (a,b) and c(a·)
  * the count of bigram occurrences whose context is a. odds = 2^16 for a
  * deterministic continuation, large for a surprising one; a document's
  * surprisal_sum/nbig is its mean perplexity proxy. All arithmetic is
  * BIGINT (floor division) so the DuckDB oracle replays it bit-exactly —
  * a float log-prob could never be hash-gated cross-engine.
  *
  * Output: (doc_id, nbig, surprisal_sum) — nbig the doc's bigram
  * occurrence count (ntok-1, 0 for docs under two tokens), surprisal_sum
  * the sum of odds over occurrences. Downstream filters divide.
  *
  * Scale shape: bigram formation is ROW-LOCAL (slice + arrays_zip +
  * explode — codegen'd, no window, no shuffle; a per-doc `lead` window
  * would shuffle the exploded corpus by doc_id first). The bigram and
  * context dictionaries are two map-side-combined groupBys; Heaps' law
  * keeps even a 100 TB crawl's bigram vocabulary ~10^9, so the
  * dict-attribution join is AQE's choice of broadcast vs shuffle, never
  * all-pairs. SCALE = 2^16 keeps c(a·)·2^16 inside BIGINT up to ~1.4e14
  * bigram occurrences (≈ a full 100 TB text corpus); raise the headroom
  * by lowering SCALE if a corpus ever exceeds it.
  *
  * [[oddsDict]] is the "trained model": at ingest time a streaming
  * pipeline scores arriving documents against a FROZEN dict via a
  * stream-static join (entry `lm_bigram_score_stream`) — the same shape
  * as benchmark decontamination's static-side broadcast. */
object BigramLm {

  val Scale = 65536L // 2^16

  /** One row per bigram occurrence: (doc_id, w1, w2). Row-local. */
  def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        TextOps.tokens(col(textCol)).as("t"))
      .where(size(col("t")) >= 2)
      .select(col("doc_id"),
        slice(col("t"), lit(1), size(col("t")) - 1).as("ctx"),
        slice(col("t"), lit(2), size(col("t")) - 1).as("nxt"))
      .select(col("doc_id"), explode(arrays_zip(col("ctx"), col("nxt"))).as("p"))
      .select(col("doc_id"), col("p.ctx").as("w1"), col("p.nxt").as("w2"))

  /** The trained LM: (w1, w2, odds) with odds = floor(c(w1·)·2^16 /
    * c(w1,w2)). Two map-side-combined groupBys + one dict-sized join. */
  def oddsDict(bg: DataFrame): DataFrame = {
    val cb = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val cc = bg.groupBy("w1").agg(count(lit(1)).as("cc"))
    cb.join(cc, "w1")
      .select(col("w1"), col("w2"), expr("(cc * 65536L) div cb").as("odds"))
  }

  /** Attribute `dict` odds back onto `docs` (docs absent from the dict's
    * support — under two tokens — report 0/0). */
  def scoreAgainst(docs: DataFrame, idCol: String, textCol: String,
                   dict: DataFrame): DataFrame = {
    val perDoc = bigrams(docs, idCol, textCol)
      .join(dict, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nbig"), sum("odds").as("surprisal_sum"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nbig"), lit(0L)).as("nbig"),
        coalesce(col("surprisal_sum"), lit(0L)).as("surprisal_sum"))
  }

  /** Self-scoring form: train the dict on the corpus and score it. */
  def bigramScore(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    scoreAgainst(docs, idCol, textCol, oddsDict(bigrams(docs, idCol, textCol)))
}
