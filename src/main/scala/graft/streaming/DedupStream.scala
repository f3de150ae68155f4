package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.dedup.Dedup

/** STREAMING near-duplicate detection with historical state — the
  * training-pipeline shape where an unbounded document stream is deduped
  * against everything already ingested (not just within one batch).
  *
  * Design: each incoming document computes its MinHash signature and LSH
  * band keys row-locally (the same portable signatures as
  * [[graft.dedup.Dedup.minhashPairs]]); the stream is then keyed by
  * (band index, band key) and each bucket holds the signatures of its
  * historical members in `flatMapGroupsWithState`. A new document is
  * compared ONLY against its buckets' members (never all-pairs); the first
  * qualifying member in arrival order is emitted as a per-bucket
  * candidate, and the cross-bucket minimum (a stateless aggregation of the
  * output stream) is the document's keeper.
  *
  * Why per-bucket first-hit suffices: a document's globally-minimal
  * qualifying predecessor a* shares some band with it, and within that
  * bucket no earlier member can qualify (it would contradict a*'s
  * minimality) — so a* IS that bucket's first hit, and min over buckets
  * of first hits = the global minimum.
  *
  * Scale shape: state is sharded by band key across executors (the same
  * partitioning the batch LSH join uses), per-bucket membership is small
  * by construction (identical band keys imply near-identical docs, plus
  * hash dispersion), and a document touches exactly `bands` buckets.
  * State is historical by design (NoTimeout): dedup-against-everything is
  * the contract; bound it operationally by keying retention windows
  * upstream if the corpus is unbounded in time.
  *
  * Determinism: precedence is ARRIVAL order. Fed in doc-id order (the
  * driver entry does), the result equals the batch mirror "min id_a over
  * pairs sharing a band with est_jaccard ≥ threshold" — the exact
  * `minhash_lsh_pairs` pair set aggregated by min, which is how the
  * DuckDB oracle replays it. Exactly-once: a redelivered document id
  * already in the bucket is a no-op.
  */
object DedupStream {

  final case class BandRow(docId: Long, bidx: Int, bkey: Long, sig: Array[Long])
  final case class DupCand(doc_id: Long, dup_of: Long)
  final case class Member(docId: Long, sig: Array[Long])
  final case class BucketState(members: List[Member])

  /** Fraction of equal signature components. */
  private def estJaccard(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  /** Row-local signature + band-key derivation (no shuffle; the groupByKey
    * downstream is the only exchange). */
  def bandRows(docs: DataFrame, idCol: String, textCol: String,
               n: Int = 3, k: Int = 16, bands: Int = 4,
               hash: Dedup.HashMode = Dedup.PortableHash): Dataset[BandRow] = {
    require(k % bands == 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val r = k / bands
    Dedup.minhashSignatures(docs, idCol, textCol, n, k, hash)
      .select(col("id"), col("sig"),
        posexplode(Dedup.lshBandKeys(col("sig"), bands, r)).as(Seq("bidx", "bkey")))
      .select(col("id").as("docId"), col("bidx").cast("int").as("bidx"),
        col("bkey"), col("sig"))
      .as[BandRow]
  }

  /** One bucket invocation: compare each new doc against historical
    * members in arrival order, emit the first qualifying member, append
    * the doc to the bucket. Redelivered ids are no-ops. */
  def updateBucket(threshold: Double)(
      key: (Int, Long), rows: Iterator[BandRow],
      state: GroupState[BucketState]): Iterator[DupCand] = {
    val old = state.getOption.getOrElse(BucketState(Nil))
    val known = old.members.iterator.map(_.docId).toSet
    val incoming = rows.filter(r => !known.contains(r.docId))
      .toSeq.distinctBy(_.docId).sortBy(_.docId)
    if (incoming.isEmpty) return Iterator.empty
    // members stay in arrival (ascending-precedence) order; appends go to
    // the tail via a buffer to keep the fold linear
    val members = scala.collection.mutable.ArrayBuffer.from(old.members)
    val out = scala.collection.mutable.ListBuffer.empty[DupCand]
    for (r <- incoming) {
      val hit = members.find(m => estJaccard(m.sig, r.sig) >= threshold)
      hit.foreach(m => out += DupCand(r.docId, m.docId))
      members += Member(r.docId, r.sig)
    }
    state.update(BucketState(members.toList))
    out.iterator
  }

  /** The streaming operator: per-bucket duplicate candidates. Aggregate
    * `min(dup_of) group by doc_id` over the output (stateless) for the
    * final keeper assignment. */
  def dedupStream(docs: DataFrame, idCol: String, textCol: String,
                  n: Int = 3, k: Int = 16, bands: Int = 4,
                  threshold: Double = 0.5,
                  hash: Dedup.HashMode = Dedup.PortableHash): Dataset[DupCand] = {
    val spark = docs.sparkSession
    import spark.implicits._
    bandRows(docs, idCol, textCol, n, k, bands, hash)
      .groupByKey(r => (r.bidx, r.bkey))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        updateBucket(threshold))
  }

  /** Batch mirror of the stream fed in doc-id order: for every document,
    * the minimal earlier document sharing ≥1 band with signature-estimated
    * Jaccard ≥ threshold. Oracle form of [[dedupStream]]; also the bulk
    * backfill path (one shot, no state). */
  def dedupBatch(docs: DataFrame, idCol: String, textCol: String,
                 n: Int = 3, k: Int = 16, bands: Int = 4,
                 threshold: Double = 0.5,
                 hash: Dedup.HashMode = Dedup.PortableHash): DataFrame =
    Dedup.minhashPairs(docs, idCol, textCol, n, k, bands, threshold, hash)
      .groupBy(col("id_b").as("doc_id"))
      .agg(min("id_a").as("dup_of"))
}
