package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leakage-safe dataset splits for training pipelines (beyond-reference
  * pipeline axis). A per-document hash split leaks: near-duplicate pairs
  * (paraphrases, mirrors, the same page crawled twice) straddle the
  * train/validation boundary and the eval set stops measuring
  * generalization. The fix is to assign splits by near-duplicate CLUSTER:
  * connected components over the candidate-pair graph pick one
  * representative per cluster, and the REPRESENTATIVE's hash decides the
  * side for every member.
  *
  * Scale shape: one alternating large-star/small-star connected-components
  * pass over the pair set (O(log² n) keyed-shuffle rounds, no driver
  * state — [[ConnectedComponents.run]]), then a stateless codegen'd hash
  * per document. No global ordering, no windows, no collect.
  */
object Splits {

  val P = 1000003L

  /** (doc → component) labels from near-dup pairs, then split by the
    * component representative's multiplicative hash: documents whose
    * cluster hashes below `trainPermille`/1000 of the hash space go to
    * "train", the rest to "val". Every member of a cluster lands on the
    * same side by construction.
    *
    * @param pairs candidate near-dup pairs with columns (id_a, id_b) —
    *              e.g. [[graft.dedup.Dedup.minhashPairs]] output
    * @return (doc_id, keep_id, split) — keep_id is the cluster
    *         representative (min doc id of the component)
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
                       trainPermille: Int = 800): DataFrame = {
    require(trainPermille >= 0 && trainPermille <= 1000,
      s"trainPermille $trainPermille must be in [0, 1000]")
    val cut = P * trainPermille / 1000L
    ConnectedComponents.run(pairs, "id_a", "id_b",
        vertices = Some(docs.select(idCol)))
      .select(col("node").as("doc_id"), col("component").as("keep_id"),
        when(pmod(col("component") * 48271L + 7L, lit(P)) < cut, "train")
          .otherwise("val").as("split"))
  }
}
