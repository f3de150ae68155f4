package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Deduplication suite for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard. Everything is shuffle-conscious:
  * signatures are computed row-local (whole-stage codegen, no UDFs),
  * candidate generation goes through band-bucket equi-joins (never an
  * all-pairs cross join), and verification runs only on candidates.
  *
  * Portable-hash discipline: see [[TextOps]] — signatures are exactly
  * reproducible in DuckDB SQL, which is how the driver oracles verify them.
  */
object Dedup {

  import TextOps.{P, fastHash, polyHash, tokens}

  /** String-hash choice for signatures. The DEFAULT everywhere is
    * `PortableHash` (polyHash — bit-exact in DuckDB, so persisted
    * signatures and oracle comparisons are stable across versions);
    * production pipelines opt into `FastHash` (xxhash64 mod P — same value
    * range, so every band/minhash expression is shared; ~10× cheaper on
    * shingle workloads) explicitly at the call site, as Bench's
    * minhash_lsh_pairs_fast does. One default for every signature family —
    * a mixed default would silently produce incomparable signatures. */
  type HashMode = Column => Column
  val PortableHash: HashMode = polyHash
  val FastHash: HashMode = fastHash

  /** Distinct n-word shingles from a PRE-MATERIALIZED token-array column.
    * Callers that can afford a projection boundary should bind `tokens(...)`
    * to a column first and pass the attribute here: inlining the whole
    * token expression re-executes the regex split once PER SHINGLE POSITION
    * inside the (interpreted) lambda — measured as the dominant cost of the
    * sf0.1 inverted-index build (§4 of the optimization guide: keep
    * expensive subtrees out of opaque/interpreted operators). */
  def shinglesOfTokens(t: Column, n: Int): Column =
    when(size(t) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(0), size(t) - n),
          i => concat_ws(" ", slice(t, i + 1, lit(n))))))

  /** Distinct n-word shingles of a text column. */
  def shingles(text: Column, n: Int): Column =
    shinglesOfTokens(tokens(text), n)

  /** Spread row-local heavy compute (interpreted HOF shingling/hashing)
    * across the session's cores when the upstream scan has fewer
    * partitions — small parquet inputs arrive as 1-2 file splits and would
    * otherwise serialize the whole signature pass onto 1-2 tasks (measured
    * 8-10 s of the sf0.1 ngram_jaccard entries). Hash repartition on `key`
    * (no round-robin pre-sort); a no-op when the scan is already as
    * parallel as the session. */
  private def spread(docs: DataFrame, key: String): DataFrame = {
    if (docs.isStreaming) return docs // micro-batches partition per trigger
    val p = docs.sparkSession.sparkContext.defaultParallelism
    if (docs.rdd.getNumPartitions >= p) docs
    else docs.repartition(p, col(key))
  }

  /** k MinHash values over the shingle set: h_i(s) = ((2i+1)·H(s) + 17i+3)
    * mod P with H the portable polynomial hash. Empty OR NULL shingle set →
    * all P (an impossible hash, so empty docs never collide with content) —
    * the null case is normalized here so the native expression and the HOF
    * form agree on null-text documents. */
  def minhashSignature(shingleCol: Column, k: Int,
                       hash: HashMode = PortableHash): Column =
    // hash each shingle once, then ONE native pass computing all k minima
    // (graft.functions.MinHashSig — bit-identical to the k-interpreted-pass
    // HOF formulation it replaced; see minhashSignatureHof)
    graft.functions.MinHashSig(
      coalesce(transform(shingleCol, s => hash(s)), array().cast("array<bigint>")), k)

  /** The original pure-`functions` formulation (k interpreted array passes);
    * kept as the equality oracle for the native expression. */
  def minhashSignatureHof(shingleCol: Column, k: Int,
                          hash: HashMode = PortableHash): Column = {
    val hs = transform(shingleCol, s => hash(s)) // hash each shingle once
    transform(sequence(lit(0), lit(k - 1)), i =>
      coalesce(
        array_min(transform(hs, h => (h * (i * 2 + 1) + (i * 17 + 3)) % P)),
        lit(P)))
  }

  /** LSH band keys: b bands of r rows; band j's key folds signature slice
    * [j·r, j·r+r) polynomially. Returns array of b longs. */
  def lshBandKeys(sig: Column, b: Int, r: Int): Column =
    transform(sequence(lit(0), lit(b - 1)), j =>
      aggregate(slice(sig, j * r + 1, lit(r)), lit(0L), (acc, v) => (acc * 131L + v) % P))

  /** Signature-estimated Jaccard: fraction of equal MinHash components. */
  def sigJaccard(a: Column, bCol: Column, k: Int): Column =
    size(filter(zip_with(a, bCol, (x, y) => x === y), e => e)).cast("double") / k

  /** id + minhash signature per document. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, k: Int = 32,
                        hash: HashMode = PortableHash): DataFrame =
    // spread + materialize the token array before the interpreted shingle
    // lambda (see shinglesOfTokens) — row-local signature compute then
    // parallelizes with the session instead of the file-split count
    spread(docs, idCol)
      .select(col(idCol).as("id"), tokens(col(textCol)).as("_t"))
      .select(col("id"),
        minhashSignature(shinglesOfTokens(col("_t"), n), k, hash).as("sig"))

  /** MinHash+LSH near-duplicate pairs: shingle→minhash→band→bucket-join.
    * Output (id_a < id_b, est_jaccard ≥ threshold). The band join is the
    * only shuffle; buckets are skew-bounded because identical band keys
    * imply near-identical docs. */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, k: Int = 32, bands: Int = 8,
                   threshold: Double = 0.5,
                   hash: HashMode = PortableHash): DataFrame = {
    require(k % bands == 0,
      s"bands ($bands) must divide the signature length k ($k) — otherwise the " +
        s"trailing k % bands components would be silently excluded from every band")
    val r = k / bands
    // materialized once (localCheckpoint, eager): both sides of the band
    // self-join read this frame — without it Spark computes the
    // shingle+signature subtree twice. localCheckpoint, unlike persist,
    // does not pin the frame in the session CacheManager, so long-lived
    // drivers don't accumulate a cached frame per invocation; the blocks
    // are reclaimed with the frame itself.
    val sigs = minhashSignatures(docs, idCol, textCol, n, k, hash)
      .localCheckpoint()
      .withColumn("band", explode(
        transform(sequence(lit(0), lit(bands - 1)),
          j => struct(j.as("bidx"),
            aggregate(slice(col("sig"), j * r + 1, lit(r)), lit(0L),
              (acc, v) => (acc * 131L + v) % P).as("bkey")))))
      .select(col("id"), col("sig"), col("band.bidx"), col("band.bkey"))
    val a = sigs.select(col("id").as("id_a"), col("sig").as("sig_a"), col("bidx"), col("bkey"))
    val b = sigs.select(col("id").as("id_b"), col("sig").as("sig_b"), col("bidx"), col("bkey"))
    a.join(b, Seq("bidx", "bkey"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        sigJaccard(col("sig_a"), col("sig_b"), k).as("est_jaccard"))
      .groupBy("id_a", "id_b").agg(max("est_jaccard").as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
  }

  /** Exact edit-distance VERIFICATION of near-duplicate candidate pairs —
    * the verify stage of a production dedup pipeline (reference analog:
    * none — beyond-reference pipeline axis). LSH candidate generation
    * trades recall for work and admits false positives; keeper decisions
    * (deletion!) want certainty, so each candidate pair joins its full
    * texts back and computes Levenshtein distance with Spark's BOUNDED
    * form (`levenshtein(l, r, maxDist)`), which early-exits outside the
    * ±maxDist band and returns -1 — O(len·maxDist) per pair instead of
    * O(len²), the at-scale defense for book-length documents.
    *
    * Scale shape: the distance evaluates ONLY on the bucketed candidate
    * set (never all-pairs); the two text-fetch joins are plain keyed
    * equi-joins on doc id (sort-merge at scale, broadcast when the
    * candidate set is small); the expression is a codegen'd built-in.
    * Output: (id_a, id_b, lev, verified∈{0,1}) — lev = -1 where the
    * bounded scan bailed (distance provably > maxDist). */
  def verifyPairs(docs: DataFrame, pairs: DataFrame,
                  idCol: String, textCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist $maxDist must be non-negative")
    val ta = docs.select(col(idCol).as("id_a"), col(textCol).as("text_a"))
    val tb = docs.select(col(idCol).as("id_b"), col(textCol).as("text_b"))
    pairs.select("id_a", "id_b")
      .join(ta, Seq("id_a")).join(tb, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("text_a"), col("text_b"), maxDist).cast("long").as("lev"))
      .withColumn("verified", when(col("lev") >= 0, 1L).otherwise(0L))
  }

  /** Exact n-gram Jaccard pairs ≥ threshold, via shared-shingle candidate
    * join (inverted index), never all-pairs.
    *
    * `maxShingleFreq` (> 0) drops shingles occurring in more than that many
    * documents from the inverted index BEFORE the candidate join — the
    * standard document-frequency cut for at-scale dedup: one stop-phrase
    * shingle shared by 10^6 docs otherwise creates a quadratic candidate
    * bucket. Semantics under the cut: `inter` counts only surviving shared
    * shingles (denominators keep the full shingle counts), so a pair whose
    * ONLY shared shingles are ultra-common may fall below threshold — the
    * usual df-cut trade, mirrored exactly by the driver oracle. 0 = exact
    * (no cut). */
  /** (id, nsh, s) inverted index of distinct n-shingles — the shared input
    * of both exact-Jaccard algorithms and the shape measurement.
    *
    * `hashKeys` swaps the string shingle for its FULL-WIDTH xxhash64 (not
    * mod P — folding 10^4+ distinct shingles into 10^6 buckets would
    * produce real birthday collisions and wrong intersections; at 64 bits
    * the collision odds are ~2^-64 per pair): ~20-byte string shuffle keys
    * become 8-byte longs through the index checkpoint, the self-join, and
    * the df aggregation. Distinctness per doc is preserved w.h.p., so df
    * counts, both algorithms' outputs, and the shape stats are unchanged —
    * the production-hash swap every signature family here documents, made
    * concrete for the exact-Jaccard path. */
  private def invIndex(docs: DataFrame, idCol: String, textCol: String,
                       n: Int, hashKeys: Boolean = false): DataFrame = {
    // spread + token-array projection boundary: see shinglesOfTokens/spread.
    // explode_outer + null filter instead of explode: a plain explode lets
    // InferFiltersFromGenerate push `size(sh) > 0` — with the WHOLE
    // interpreted shingle tree substituted in — down into the parquet scan
    // BELOW the repartition, re-evaluating the heaviest expression per row
    // on the 1-2 file-split partitions (measured 6.5 s of the sf0.1 index
    // build; the outer form infers nothing, and empty-shingle docs drop via
    // the cheap null filter — same rows either way)
    val raw = spread(docs, idCol)
      .select(col(idCol).as("id"), tokens(col(textCol)).as("_t"))
      .select(col("id"), shinglesOfTokens(col("_t"), n).as("sh"))
      .withColumn("nsh", size(col("sh")).cast("long"))
      .select(col("id"), col("nsh"), explode_outer(col("sh")).as("s"))
      .where(col("s").isNotNull)
    if (hashKeys) raw.withColumn("s", xxhash64(col("s"))) else raw
  }

  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.5,
                   maxShingleFreq: Long = 0L,
                   hashKeys: Boolean = false): DataFrame =
    // materialized once (localCheckpoint — not persist, see minhashPairs):
    // the inverted index feeds both join sides
    jaccardPairsOnInv(invIndex(docs, idCol, textCol, n, hashKeys).localCheckpoint(),
      None, threshold, maxShingleFreq)

  private def jaccardPairsOnInv(invAll: DataFrame, dfcAll: Option[DataFrame],
                                threshold: Double, maxShingleFreq: Long): DataFrame = {
    val inv =
      if (maxShingleFreq <= 0L) invAll
      else invAll.join(
        // shingles are distinct per doc, so count(*) per shingle = doc freq
        dfcAll.getOrElse(invAll.groupBy("s").agg(count(lit(1)).as("_df")))
          .where(col("_df") <= maxShingleFreq).select("s"),
        "s")
    val a = inv.select(col("id").as("id_a"), col("nsh").as("na"), col("s"))
    val b = inv.select(col("id").as("id_b"), col("nsh").as("nb"), col("s"))
    a.join(b, "s").where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "na", "nb").agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact n-gram Jaccard pairs via PREFIX FILTERING (the AllPairs/PPJoin
    * family, published in Bayardo et al. WWW'07): IDENTICAL output to
    * [[jaccardPairs]] — including the `maxShingleFreq` capped semantics.
    *
    * WHEN TO USE WHICH (measured, `graft.tools.JaccardShape` +
    * BASELINE.md round 4): this form wins — 3× at df=6000 and growing as
    * df² — when heavy SUB-threshold boilerplate (site chrome, license
    * headers) makes the naive form's Σ df(s)² candidate aggregation
    * superlinear while few pairs actually qualify; unlike the
    * `maxShingleFreq` df-cut it keeps the jaccard EXACT. The naive
    * [[jaccardPairs]] wins on near-unique corpora (df ≈ 1-2, Σ df² already
    * linear — the sandbox documents table) and when duplication is ABOVE
    * threshold (quadratic true-pair output: nothing to prune, and count
    * aggregation beats per-pair array verification). Both are exact;
    * DedupSpec pins their equality.
    *
    * Shingles get a global canonical order (document frequency asc, shingle
    * asc — rarest first); a doc whose surviving shingle set has size m
    * indexes only its first m - ⌈t·n_full⌉ + 1 shingles. Prefix-filter
    * lemma: J(A,B) ≥ t ⟹ |A'∩B'| ≥ t·|A∪B| ≥ ⌈t·n_full⌉ surviving shared
    * shingles, and the smallest shared shingle (in the common order) must
    * then sit inside BOTH prefixes — so the prefix self-join loses no
    * qualifying pair. Verification then computes the exact intersection per
    * CANDIDATE pair from the two docs' sorted surviving-shingle arrays
    * (`array_intersect`, one hash pass per pair) instead of aggregating the
    * full inverted index — the aggregation that dominated
    * `ngram_jaccard_pairs` wall time (12.4 s at sf0.1, BENCH_r03). */
  def jaccardPairsPrefix(docs: DataFrame, idCol: String, textCol: String,
                         n: Int = 3, threshold: Double = 0.5,
                         maxShingleFreq: Long = 0L): DataFrame = {
    val inv = invIndex(docs, idCol, textCol, n)
    jaccardPairsPrefixOnInv(inv, inv.groupBy("s").agg(count(lit(1)).as("_df")),
      threshold, maxShingleFreq)
  }

  private def jaccardPairsPrefixOnInv(inv: DataFrame, dfc: DataFrame,
                                      threshold: Double,
                                      maxShingleFreq: Long): DataFrame = {
    require(threshold > 0.0, "prefix filtering needs a positive threshold")
    val kept =
      if (maxShingleFreq <= 0L) inv.join(dfc, "s")
      else inv.join(dfc.where(col("_df") <= maxShingleFreq), "s")
    // ONE aggregation per doc; the canonical (df asc, shingle asc) order is
    // established ROW-LOCALLY by sorting the collected (df, s) structs — no
    // window sorts, no second shuffle over the inverted index
    val docSets = kept.groupBy(col("id"), col("nsh"))
      .agg(array_sort(collect_list(struct(col("_df"), col("s")))).as("ord"))
      .withColumn("ss", transform(col("ord"), e => e.getField("s")))
      .withColumn("plen",
        greatest(lit(0L),
          size(col("ord")) - ceil(lit(threshold) * col("nsh")) + 1).cast("int"))
      .select(col("id"), col("nsh"), col("ss"),
        slice(col("ss"), lit(1), col("plen")).as("pre"))
      .localCheckpoint() // feeds the prefix index AND both verify sides
    val pre = docSets.select(col("id"), explode(col("pre")).as("s"))
    val cand = pre.select(col("id").as("id_a"), col("s"))
      .join(pre.select(col("id").as("id_b"), col("s")), "s")
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(docSets.select(col("id").as("id_a"), col("nsh").as("na"), col("ss").as("sa")), "id_a")
      .join(docSets.select(col("id").as("id_b"), col("nsh").as("nb"), col("ss").as("sb")), "id_b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Corpus-shape statistics driving [[jaccardPairsAuto]]'s strategy pick —
    * one pass over the inverted index plus two tiny aggregations.
    *
    *  - `postings` = Σ df(s) (inverted-index size, the linear baseline);
    *  - `work` = Σ df(s)² (the naive form's shared-shingle aggregation
    *    volume);
    *  - `heavyFrac` = average over documents of (shingles with df >
    *    `heavyDf`) / (all shingles) — how much of a typical document is
    *    corpus-wide template;
    *  - `estTemplateJaccard` = f/(2−f) with f = heavyFrac: the Jaccard two
    *    documents would score if they shared exactly their template parts
    *    (intersection f·n over union (2−f)·n) — the quantity whose position
    *    relative to the query threshold separates SUB-threshold boilerplate
    *    (prefix filtering prunes everything) from ABOVE-threshold
    *    duplication (output quadratic, nothing prunable).
    *
    * When `maxShingleFreq` > 0 the stats are computed over the SURVIVING
    * shingles (the df-cut removes the heavy buckets from both algorithms,
    * so cut shingles must not count toward work). */
  final case class JaccardStats(
      nDocs: Long, postings: Long, work: Double, distinctShingles: Long,
      heavyShingles: Long, heavyFrac: Double) {
    def estTemplateJaccard: Double =
      if (heavyFrac <= 0.0) 0.0 else heavyFrac / (2.0 - heavyFrac)
  }

  def jaccardStats(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, heavyDf: Long = 16L,
                   maxShingleFreq: Long = 0L): JaccardStats = {
    val inv = invIndex(docs, idCol, textCol, n).localCheckpoint()
    jaccardStatsOnInv(inv,
      inv.groupBy("s").agg(count(lit(1)).as("_df")).localCheckpoint(),
      heavyDf, maxShingleFreq)
  }

  private def jaccardStatsOnInv(inv: DataFrame, dfcAll: DataFrame,
                                heavyDf: Long, maxShingleFreq: Long): JaccardStats = {
    val dfc = if (maxShingleFreq > 0L) dfcAll.where(col("_df") <= maxShingleFreq)
              else dfcAll
    // work in DOUBLE space: a handful of df≈10^9 template shingles would
    // wrap a Long Σdf² negative and silently flip the strategy pick; the
    // heuristic needs magnitude, not exactness
    val g = dfc.agg(
      coalesce(sum(col("_df")), lit(0L)).as("postings"),
      coalesce(sum(col("_df").cast("double") * col("_df")), lit(0.0)).as("work"),
      count(lit(1)).as("distinct"),
      coalesce(sum(when(col("_df") > heavyDf, 1L).otherwise(0L)), lit(0L)).as("heavy"))
      .collect()(0)
    // docs with an empty shingle set aren't in the index; they can't pair,
    // so excluding them from the heavy-fraction denominator is correct
    val nDocs = inv.agg(count_distinct(col("id"))).collect()(0).getLong(0)
    // per-doc heavy fraction; docs with no heavy shingles contribute 0 by
    // summing matched fractions over ALL docs (no left join needed). The
    // heavy set is small by construction in the regime where this branch
    // matters; Catalyst broadcasts it when under the threshold.
    val heavy = dfc.where(col("_df") > heavyDf).select("s")
    val fracSum = inv.join(heavy, Seq("s"))
      .where(col("nsh") > 0L)
      .groupBy("id").agg((count(lit(1)).cast("double") / first(col("nsh"))).as("hf"))
      .agg(coalesce(sum("hf"), lit(0.0))).collect()(0).getDouble(0)
    JaccardStats(nDocs, g.getLong(0), g.getDouble(1), g.getLong(2), g.getLong(3),
      if (nDocs == 0) 0.0 else fracSum / nDocs)
  }

  /** The regime map measured in `graft.tools.JaccardShape` (BASELINE.md
    * round 4), as a decision function:
    *  - Σdf² within a small factor of Σdf → the naive aggregation is
    *    already linear; prefix filtering's extra sort/verify cannot pay
    *    (near-unique corpora, df ≈ 1–2);
    *  - heavy templates whose implied pair similarity REACHES the query
    *    threshold → the qualifying output is itself quadratic, no candidate
    *    filter prunes anything, and the count aggregation beats per-pair
    *    array verification (dup-heavy corpora) → naive;
    *  - otherwise heavy SUB-threshold boilerplate dominates Σdf² while few
    *    pairs qualify — exactly what prefix filtering exists for. */
  def chooseJaccardStrategy(stats: JaccardStats, threshold: Double,
                            workFactor: Double = 8.0): String =
    if (stats.work <= workFactor * math.max(1L, stats.postings)) "naive"
    else if (stats.estTemplateJaccard >= threshold) "naive"
    else "prefix"

  /** Exact n-gram Jaccard with AUTOMATIC strategy selection: one cheap
    * shape measurement ([[jaccardStats]]) picks [[jaccardPairs]] or
    * [[jaccardPairsPrefix]] per corpus — the engine makes the call the
    * JaccardShape measurements dictate instead of the caller guessing.
    * Both branches are exact and emit identical pairs (DedupSpec pins it),
    * so the pick is a pure plan decision, like Catalyst choosing a join. */
  def jaccardPairsAuto(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, threshold: Double = 0.5,
                       maxShingleFreq: Long = 0L,
                       hashKeys: Boolean = false): DataFrame = {
    // ONE materialized inverted index + df table serve the measurement AND
    // the chosen algorithm — the pick costs two tiny aggregations plus one
    // heavy-set pass, not a rebuild of the index (measured: the rebuild
    // form added ~60% to ngram_jaccard_pairs at sf0.1)
    val inv = invIndex(docs, idCol, textCol, n, hashKeys).localCheckpoint()
    val dfcAll = inv.groupBy("s").agg(count(lit(1)).as("_df")).localCheckpoint()
    val stats = jaccardStatsOnInv(inv, dfcAll, heavyDf = 16L, maxShingleFreq)
    val pick = chooseJaccardStrategy(stats, threshold)
    System.err.println(s"[dedup] jaccard strategy=$pick " +
      s"(docs=${stats.nDocs} postings=${stats.postings} work=${stats.work} " +
      f"heavy=${stats.heavyShingles} heavyFrac=${stats.heavyFrac}%.3f " +
      f"estTemplateJ=${stats.estTemplateJaccard}%.3f threshold=$threshold)")
    if (pick == "prefix")
      jaccardPairsPrefixOnInv(inv, dfcAll, threshold, maxShingleFreq)
    else jaccardPairsOnInv(inv, Some(dfcAll), threshold, maxShingleFreq)
  }

  /** 64-bit SimHash over tokens, materialized as 4×16-bit band values
    * (keeps all arithmetic < 2^62 → ANSI-safe and SQL-portable; banding on
    * 16-bit chunks is also exactly the hamming-LSH candidate scheme).
    * Output: array of 4 longs. Null text → all-zero bands (normalized here,
    * matching the minhash convention). One native codegen'd pass
    * ([[graft.functions.SimHashSig]]); [[simhashBandsHof]] is its equality
    * oracle. */
  def simhashBands(text: Column, hash: HashMode = PortableHash): Column =
    graft.functions.SimHashSig(
      coalesce(transform(tokens(text), tok => hash(tok)), array().cast("array<bigint>")))

  /** The original nested-HOF formulation (64 interpreted array passes);
    * kept as the equality oracle for the native expression. */
  def simhashBandsHof(text: Column, hash: HashMode = PortableHash): Column = {
    // hash every token once, then derive per-bit votes by cheap rehash
    // parity: bit b's vote for token h is ((h·(2b+3) + 5b+1) mod P) mod 2
    val th = transform(tokens(text), tok => hash(tok))
    transform(sequence(lit(0), lit(3)), band =>
      aggregate(sequence(lit(0), lit(15)), lit(0L), (acc, bit) => {
        val b = band * 16 + bit
        val vote = aggregate(th, lit(0L), (a, h) =>
          a + when((h * (b * 2 + 3) + (b * 5 + 1)) % P % 2 === 1, 1L).otherwise(-1L))
        acc * 2 + when(vote > 0, 1L).otherwise(0L)
      }))
  }

  /** SimHash near-dup pairs: docs sharing ≥1 identical 16-bit band, with
    * hamming distance over the 64 bits ≤ maxHamming. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 8): DataFrame = {
    val hammingBand: (Column, Column) => Column = (x, y) =>
      bit_count(x.bitwiseXOR(y)).cast("long")
    val sigs = docs.select(col(idCol).as("id"), simhashBands(col(textCol)).as("sh"))
      .localCheckpoint() // both sides read this; not persist (see minhashPairs)
      .withColumn("bidx", explode(sequence(lit(0), lit(3))))
      .withColumn("bkey", element_at(col("sh"), col("bidx") + 1))
    val a = sigs.select(col("id").as("id_a"), col("sh").as("sh_a"), col("bidx"), col("bkey"))
    val b = sigs.select(col("id").as("id_b"), col("sh").as("sh_b"), col("bidx"), col("bkey"))
    a.join(b, Seq("bidx", "bkey")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        aggregate(sequence(lit(0), lit(3)), lit(0L), (acc, i) =>
          acc + hammingBand(element_at(col("sh_a"), i + 1), element_at(col("sh_b"), i + 1)))
          .as("hamming"))
      .groupBy("id_a", "id_b").agg(min("hamming").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Exact dedup keyed on a normalized fingerprint (cheap pre-pass for the
    * near-dup pipeline; hash-groupBy, one shuffle on the fingerprint). */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), TextOps.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp").agg(min("id").as("keeper"), count(lit(1)).as("members"))

  /** Benchmark decontamination: flag every corpus document that shares at
    * least `minHits` DISTINCT word n-grams with a benchmark/eval set —
    * the standard pre-training hygiene pass (eval questions leaking into
    * the training corpus must be found by n-gram overlap, not exact match,
    * because scrapes mutate whitespace and framing).
    *
    * Output: (idCol, n_hits) for flagged documents only.
    *
    * 100-TB shape: the benchmark side is eval sets — thousands to millions
    * of n-grams, NOT corpus-scale — so its distinct shingle set is
    * broadcast and the corpus side never shuffles (explode → broadcast-hash
    * semi-join → partial-agg groupBy on the doc id, which re-shuffles only
    * the ~0.1% of exploded rows that hit). For a benchmark too large to
    * broadcast, `broadcastBench = false` degrades to a shuffle join on the
    * shingle; a Bloom pre-filter (see [[graft.sketch.Bloom]]) composes in
    * front of either form. */
  def decontaminate(corpus: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, n: Int, minHits: Long = 1L,
                    broadcastBench: Boolean = true): DataFrame = {
    // shingles() is already per-doc distinct, so post-join count(*) counts
    // distinct contaminated n-grams without a second distinct pass
    val corpSh = corpus.select(col(idCol), explode(shingles(col(textCol), n)).as("s"))
    val benchSh0 = bench.select(explode(shingles(col(textCol), n)).as("s")).distinct()
    val benchSh = if (broadcastBench) broadcast(benchSh0) else benchSh0
    corpSh.join(benchSh, "s")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
      .where(col("n_hits") >= minHits)
  }

  /** Duplicated-passage statistics — the span-level (substring) complement
    * of the doc-level dedups: for every document, how many of its `n`-token
    * spans (every position, NOT per-doc distinct — a passage pasted twice
    * into one doc counts twice) also occur verbatim in at least one OTHER
    * document. MassiveText/RefinedWeb-style pipelines use exactly this
    * signal to strip boilerplate passages that doc-level MinHash misses.
    *
    * Output: (doc_id, n_spans, n_dup_spans), one row per input doc (docs
    * shorter than `n` tokens report 0/0).
    *
    * Scale shape: span extraction is a narrow flatMap (higher-order
    * functions, codegen'd); the cross-doc test is ONE groupBy(span) with a
    * map-side-combinable distinct-doc count, and the attribution back to
    * docs is a semi-join on the span key — never an all-pairs doc join.
    * Spans stay strings here so the gate is EXACT; a production run at
    * 100 TB would pre-hash spans with xxhash64 (8-byte shuffle keys, the
    * same swap every signature family in this file exposes) and accept the
    * ~2^-64 collision rate. */
  def spanDupStats(docs: DataFrame, idCol: String, textCol: String,
                   n: Int): DataFrame = {
    require(n > 0, s"span length $n must be positive")
    val t = tokens(col(textCol))
    val spansArr = when(size(t) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(t) - n),
        i => array_join(slice(t, i + 1, lit(n)), " ")))
    // localCheckpoint: the span explode (n-token array_join per position
    // per doc, the dominant cost) feeds THREE aggregations below — same
    // shared-subtree discipline as the other candidate generators here
    val spans = docs.select(col(idCol).as("doc_id"), explode(spansArr).as("span"))
      .localCheckpoint()
    // spans seen in >= 2 distinct docs; count(distinct) partial-aggregates
    val dup = spans.groupBy("span")
      .agg(countDistinct("doc_id").as("nd"))
      .where(col("nd") >= 2)
      .select("span")
    val totals = spans.groupBy("doc_id").agg(count(lit(1)).as("n_spans"))
    val dupPerDoc = spans.join(dup, Seq("span"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup_spans"))
    docs.select(col(idCol).as("doc_id"))
      .join(totals, Seq("doc_id"), "left")
      .join(dupPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"))
  }

  /** Duplicated-substring REMOVAL — the excision half of [[spanDupStats]]
    * and the corpus-level substring dedup of Lee et al. 2022
    * ("Deduplicating Training Data Makes Language Models Better"): every
    * token covered by ANY n-token span occurring ≥ 2 times in the corpus
    * (within or across documents) is removed; the survivors re-join as
    * `clean_text`. Overlapping duplicated spans merge into maximal
    * removed runs for free — removal is per-position union, so no
    * interval arithmetic is materialized.
    *
    * Output: (doc_id, n_tokens, n_removed, clean_text).
    *
    * Scale shape: span extraction and the final excision are row-local
    * higher-order expressions; the global duplicate test is one
    * groupBy(span) count (map-side combined) + a semi-join; per-doc
    * removed-start lists aggregate to O(doc length) each. The only new
    * state vs [[spanDupStats]] is the per-doc start list — bounded by the
    * doc's own span count, never corpus-sized. */
  /** Positioned n-token spans: (doc_id, s, span) with s the 1-based start.
    * Row-local (works on a streaming DataFrame too). */
  def spanStarts(docs: DataFrame, idCol: String, textCol: String,
                 n: Int): DataFrame = {
    require(n > 0, s"span length $n must be positive")
    val t = tokens(col(textCol))
    val spansArr = when(size(t) < n, array().cast("array<struct<s:long,span:string>>"))
      .otherwise(transform(sequence(lit(0), size(t) - n),
        i => struct((i + 1).cast("long").as("s"),
          array_join(slice(t, i + 1, lit(n)), " ").as("span"))))
    docs.select(col(idCol).as("doc_id"), explode(spansArr).as("p"))
      .select(col("doc_id"), col("p.s").as("s"), col("p.span").as("span"))
  }

  /** Excise every token of `docs` covered by a start in `dupStarts`
    * (doc_id, starts: array<long>); docs absent from it keep everything. */
  def exciseWith(docs: DataFrame, idCol: String, textCol: String, n: Int,
                 dupStarts: DataFrame): DataFrame =
    docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
      .join(dupStarts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("t"),
        coalesce(col("starts"), array().cast("array<long>")).as("starts"))
      .withColumn("kept",
        filter(transform(col("t"), (x, i) => struct(x.as("w"), (i + 1).cast("long").as("pos"))),
          p => !exists(col("starts"),
            st => p.getField("pos") >= st && p.getField("pos") <= st + (n - 1))))
      .select(col("doc_id"),
        size(col("t")).cast("long").as("n_tokens"),
        (size(col("t")) - size(col("kept"))).cast("long").as("n_removed"),
        array_join(transform(col("kept"), p => p.getField("w")), " ").as("clean_text"))

  def substringDedup(docs: DataFrame, idCol: String, textCol: String,
                     n: Int): DataFrame = {
    val spans = spanStarts(docs, idCol, textCol, n).localCheckpoint()
    // ≥ 2 occurrences ANYWHERE (a within-doc repeat is as much a dup as a
    // cross-doc one — this is what distinguishes excision from the
    // distinct-doc counting above)
    val dup = spans.groupBy("span").agg(count(lit(1)).as("c"))
      .where(col("c") >= 2).select("span")
    val dupStarts = spans.join(dup, Seq("span"), "left_semi")
      .groupBy("doc_id").agg(collect_list(col("s")).as("starts"))
    exciseWith(docs, idCol, textCol, n, dupStarts)
  }
}
