package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Layout

/** Token-rarity scoring — the integer-exact stand-in for the unigram-LM
  * perplexity filter CCNet-style pipelines run over a crawl: documents
  * whose tokens are globally rare (high mean rank in the corpus frequency
  * table) are boilerplate/gibberish candidates; documents of only
  * ultra-common tokens are low-content. A real LM emits float log-probs,
  * which no cross-engine hash gate can pin last-ulp; ranking tokens by
  * corpus frequency keeps the signal (rank ≈ -log p up to monotonic
  * distortion, Zipf) while every number stays a BIGINT the oracle replays
  * exactly.
  *
  * Output: (doc_id, ntok, rarity_sum) — rarity_sum the sum over the doc's
  * token OCCURRENCES (not distinct tokens) of the token's global rank
  * (0 = most frequent; ties by token string). Empty docs report 0/0.
  * Downstream filters divide rarity_sum/ntok themselves.
  *
  * Scale shape, three stages, each the cheapest available form:
  * (1) the corpus histogram is one explode + groupBy(token) with map-side
  * combine; (2) the rank is [[Layout.denseRankByOrder]]'s size-gated
  * kernel — one window under 10^7 distinct tokens (Heaps' law keeps real
  * vocabularies near there even at 100 TB), a range-partitioned sort +
  * zipWithIndex past it; (3) attribution is one equi-join of the exploded
  * corpus against the vocabulary dict — LEFT to Catalyst/AQE whether that
  * broadcasts (vocab ≪ corpus, the normal case) or shuffles, then one
  * groupBy(doc). No all-pairs anything, no driver state beyond the scan
  * kernel's O(#partitions) offsets. */
object Rarity {

  def tokenRarity(docs: DataFrame, idCol: String, textCol: String,
                  windowMaxRows: Long = Layout.defaultWindowMaxRows): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
        explode(TextOps.tokens(col(textCol))).as("w"))
    val freq = toks.groupBy("w").agg(count(lit(1)).as("c"))
    val ranked = Layout.denseRankByOrder(freq,
        Seq(col("c").desc, col("w").asc), "rank", base = 0L,
        windowMaxRows = windowMaxRows)
      .select("w", "rank")
    val perDoc = toks.join(ranked, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("ntok"), sum("rank").as("rarity_sum"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("ntok"), lit(0L)).as("ntok"),
        coalesce(col("rarity_sum"), lit(0L)).as("rarity_sum"))
  }
}
