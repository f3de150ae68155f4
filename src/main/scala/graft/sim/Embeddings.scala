package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.gen.TranscriptGen.splitmix64

/** Similarity search over an embedding column (array<float>): brute-force
  * cosine top-k as the exactness baseline, and a random-hyperplane
  * LSH-bucketed variant as the scale path (candidates from bucket
  * equi-joins, exact cosine re-ranking on candidates only).
  *
  * Vector math is `zip_with` + `aggregate` (whole-stage codegen, doubles in
  * fixed fold order → reproducible). At cluster scale the broadcast side is
  * the query set; the corpus is scanned once per batch of queries.
  */
object Embeddings {

  /** dot(a,b) in double precision, left-to-right fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** CONTRACT: inputs must have nonzero norm (every fixture/generator in
    * this repo guarantees it). A zero-norm or null-component vector makes
    * the division NaN, and NaN ordering differs between Spark's
    * max(struct) (NaN sorts greatest) and plain comparison folds — the
    * semanticDecontaminate twins would disagree on such rows. Guarding
    * here (e.g. returning null) is deliberately NOT done while the DuckDB
    * oracle SQL, which computes the same unguarded division, is frozen. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine for each query against the corpus (self-match
    * excluded). Rank on cosine rounded to 9 dp with id tie-break, so the
    * ordering is reproducible across engines. Queries are broadcast. */
  /** Spread row-local heavy vector math across the session's cores when the
    * upstream scan has fewer partitions (small parquet inputs arrive as 1-2
    * file splits and would otherwise serialize the interpreted per-pair
    * cosine fold onto 1-2 tasks; same fix as Dedup's signature spread).
    * No-op for streaming frames and already-parallel scans. */
  private def spread(df: DataFrame, key: String): DataFrame = {
    if (df.isStreaming) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df
    else df.repartition(p, col(key))
  }

  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = spread(corpus, idCol).select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 9))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("cos"), col("rank").cast("long").as("rank"))
  }

  /** Deterministic random hyperplanes: nPlanes × dim doubles from
    * splitmix64(seed, plane, dim), in [-1, 1). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (p, d) =>
      val h = splitmix64(splitmix64(seed ^ (p * 0x9e3779b97f4a7c15L)) ^ d.toLong)
      (h >>> 11).toDouble / (1L << 52).toDouble - 1.0
    }

  /** Sign-bucket id under the given hyperplanes (one long, nPlanes ≤ 62). */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.foldLeft(lit(0L)) { case (acc, (plane, _)) =>
      val planeCol = array(plane.map(lit): _*)
      val d = aggregate(zip_with(vec, planeCol, (x, w) => x.cast("double") * w),
        lit(0.0), (a, v) => a + v)
      acc * 2 + when(d >= 0, 1L).otherwise(0L)
    }

  /** LSH-bucketed near-neighbor pairs: multi-probe via `tables` independent
    * hash tables; candidates from bucket equi-joins; exact cosine ≥
    * threshold verified on candidates only. */
  def lshCosinePairs(df: DataFrame, threshold: Double, nPlanes: Int = 12,
                     tables: Int = 4, seed: Long = 42L, dim: Int = 64,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketed = (0 until tables).map { t =>
      val planes = hyperplanes(nPlanes, dim, seed + t * 7919L)
      df.select(col(idCol).as("id"), col(vecCol).as("v"),
        lit(t).as("tbl"), lshBucket(col(vecCol), planes).as("bucket"))
    }.reduce(_ unionByName _)
    val a = bucketed.select(col("id").as("id_a"), col("v").as("va"), col("tbl"), col("bucket"))
    val b = bucketed.select(col("id").as("id_b"), col("v").as("vb"), col("tbl"), col("bucket"))
    a.join(b, Seq("tbl", "bucket")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(cosine(col("va"), col("vb")), 9).as("cos"))
      .groupBy("id_a", "id_b").agg(max("cos").as("cos"))
      .where(col("cos") >= threshold)
  }

  /** kNN-GRAPH construction over the LSH candidate set — the SemDeDup /
    * curation primitive (every vector's k nearest neighbors, not a query
    * batch's): candidates come from the multi-table hyperplane buckets
    * (never all-pairs), exact cosine re-ranks them, and a per-source
    * row_number window (partitioned by vector id — fully parallel) keeps
    * the top k with deterministic (cos DESC, neighbor id ASC) tie-breaks.
    * Vectors whose buckets contain no other vector emit no rows — at
    * recall-sensitive scale, raise `tables` (more probes) rather than
    * falling back to a quadratic pass. Output: (vec_id, rank, nbr_id, cos).
    */
  def knnGraph(df: DataFrame, k: Int, nPlanes: Int = 12, tables: Int = 4,
               seed: Long = 42L, dim: Int = 64,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"k $k must be positive")
    // threshold -1 keeps every candidate (cos ∈ [-1, 1]); the pair set is
    // already deduped per (id_a, id_b) with one cos each
    val pairs = lshCosinePairs(df, threshold = -1.0, nPlanes, tables, seed,
      dim, idCol, vecCol)
    val sym = pairs.select(col("id_a").as("src"), col("id_b").as("nbr"), col("cos"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("nbr"), col("cos")))
    val w = Window.partitionBy("src").orderBy(col("cos").desc, col("nbr").asc)
    sym.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("src").as("vec_id"), col("rank"), col("nbr").as("nbr_id"), col("cos"))
  }

  /** IVF-style ANN top-k: a coarse quantizer of `nCells` DETERMINISTIC
    * centroids (the corpus vectors with the smallest ids — IVF needs a
    * fixed coarse quantizer, not necessarily a trained one, and member
    * centroids keep the whole computation SQL-reproducible) partitions the
    * corpus into inverted lists; each query probes its `nProbe` nearest
    * cells and reranks ONLY those lists by exact cosine. The scale path vs
    * brute force: per-query work drops to ~|corpus|·nProbe/nCells, the
    * centroid set is a tiny broadcast, and the assignment pass is one
    * corpus scan. Orderings rank on cosine rounded to 9 dp with id
    * tie-breaks (reproducible across engines, like [[bruteForceTopK]]). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the nCells SMALLEST ids (not `id < nCells`, which silently under-fills
    // the quantizer on sparse/offset id spaces). orderBy+limit plans as
    // TakeOrderedAndProject — a parallel per-partition top-nCells then a
    // tiny driver merge — where an unpartitioned row_number window would
    // funnel the ENTIRE corpus through one task's sort at 10^9 vectors.
    val cent = corpus.select(col(idCol), col(vecCol))
      .orderBy(col(idCol).asc).limit(nCells)
      .select(col(idCol).as("cell"), col(vecCol).as("cvec"))
    // inverted lists: every corpus vector joins its single nearest cell
    val aw = Window.partitionBy("cand_id")
      .orderBy(col("ccos").desc, col("cell").asc)
    val assigned = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
      .join(broadcast(cent))
      .withColumn("ccos", round(cosine(col("cv"), col("cvec")), 9))
      .withColumn("arn", row_number().over(aw))
      .where(col("arn") === 1)
      .select(col("cand_id"), col("cv"), col("cell"))
    // each query probes its nProbe nearest cells
    val pw = Window.partitionBy("query_id")
      .orderBy(col("pcos").desc, col("cell").asc)
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .join(broadcast(cent))
      .withColumn("pcos", round(cosine(col("qv"), col("cvec")), 9))
      .withColumn("prn", row_number().over(pw))
      .where(col("prn") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell"))
    // candidates = probed inverted lists only; exact rerank
    val rw = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("cand_id").asc)
    probes.join(assigned, "cell")
      .where(col("query_id") =!= col("cand_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 9))
      .withColumn("rank", row_number().over(rw))
      .where(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("cos"),
        col("rank").cast("long").as("rank"))
  }

  /** Embedding scaled to 64-bit integers (floor(x·2^20 + 0.5)): the exact,
    * order-independent arithmetic domain for [[ivfTopKKMeans]]. */
  def toIntVec(c: Column, scale: Double = 1048576.0): Column =
    transform(c, x => floor(x.cast("double") * scale + 0.5).cast("long"))

  /** Squared L2 distance between two integer vectors (exact, long). */
  def dist2Int(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)

  /** IVF top-k with a TRAINED coarse quantizer: fixed-iteration Lloyd's
    * k-means run entirely in scaled-INTEGER arithmetic, so training and
    * search are deterministic and bit-exactly reproducible in SQL (the
    * driver oracle replays the same iterations in DuckDB) while recall at a
    * fixed nProbe improves over [[ivfTopK]]'s untrained member-centroids on
    * clustered corpora (pinned by EmbeddingsSpec on a planted-cluster
    * fixture).
    *
    * Determinism: embeddings → floor(x·2^20 + 0.5) longs; distances are
    * exact long sums (order-independent); per-coordinate means are
    * floor(sum/count) with the one double division exact below 2^53;
    * assignment/probe/rank ties break on the lowest cell / candidate id.
    * Scale shape unchanged from ivfTopK: tiny centroid broadcast, one
    * corpus scan per iteration + one per assignment, per-query rerank work
    * ~|corpus|·nProbe/nCells. Cells that lose all members keep their
    * previous centroid. Output: (query_id, cand_id, dist, rank) with dist
    * the exact integer squared L2 (ascending = most similar first). */
  def ivfTopKKMeans(queries: DataFrame, corpus: DataFrame, k: Int,
                    nCells: Int = 8, nProbe: Int = 2, iters: Int = 2,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val corpusInt = corpus.select(col(idCol).as("cand_id"), toIntVec(col(vecCol)).as("cv"))
    // init: the nCells smallest-id vectors, cells renumbered 0..nCells-1.
    // orderBy+limit = TakeOrderedAndProject (parallel top-nCells); the
    // renumbering window then sorts only the nCells surviving rows, never
    // the corpus (the round-4 form windowed the full corpus in one task).
    val cw = Window.orderBy(col("cand_id").asc)
    var cent = corpusInt
      .orderBy(col("cand_id").asc).limit(nCells)
      .withColumn("crn", row_number().over(cw))
      .select((col("crn") - 1).cast("long").as("cell"), col("cv").as("cvec"))
      .localCheckpoint()
    for (_ <- 0 until iters) {
      val aw = Window.partitionBy("cand_id").orderBy(col("dist").asc, col("cell").asc)
      val assigned = corpusInt.join(broadcast(cent))
        .withColumn("dist", dist2Int(col("cv"), col("cvec")))
        .withColumn("arn", row_number().over(aw)).where(col("arn") === 1)
        .select(col("cell"), col("cv"))
      val means = assigned
        .select(col("cell"), posexplode(col("cv")).as(Seq("pos", "v")))
        .groupBy("cell", "pos")
        .agg(floor(sum("v").cast("double") / count(lit(1))).cast("long").as("m"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("nvec"))
      cent = cent.join(means, Seq("cell"), "left")
        .select(col("cell"), coalesce(col("nvec"), col("cvec")).as("cvec"))
        .localCheckpoint() // nCells rows; keeps the iteration plan flat
    }
    val aw = Window.partitionBy("cand_id").orderBy(col("dist").asc, col("cell").asc)
    val assigned = corpusInt.join(broadcast(cent))
      .withColumn("dist", dist2Int(col("cv"), col("cvec")))
      .withColumn("arn", row_number().over(aw)).where(col("arn") === 1)
      .select(col("cand_id"), col("cv"), col("cell"))
    val pw = Window.partitionBy("query_id").orderBy(col("pdist").asc, col("cell").asc)
    val probes = queries.select(col(idCol).as("query_id"), toIntVec(col(vecCol)).as("qv"))
      .join(broadcast(cent))
      .withColumn("pdist", dist2Int(col("qv"), col("cvec")))
      .withColumn("prn", row_number().over(pw)).where(col("prn") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell"))
    val rw = Window.partitionBy("query_id").orderBy(col("dist").asc, col("cand_id").asc)
    probes.join(assigned, "cell")
      .where(col("query_id") =!= col("cand_id"))
      .withColumn("dist", dist2Int(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(rw)).where(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("dist"),
        col("rank").cast("long").as("rank"))
  }

  /** Product-quantization ANN top-k (the 100-TB ANN architecture: PQ codes +
    * ADC scan + exact rerank), run entirely in the same scaled-integer
    * domain as [[ivfTopKKMeans]] so the whole pipeline — codebook training,
    * encoding, the ADC scan, the rerank — is deterministic and bit-exactly
    * replayable in SQL.
    *
    * Structure: the `dim`-wide vector splits into `m` subspaces of
    * `dim/m` coordinates; each subspace trains its own `ksub`-centroid
    * codebook (fixed-iteration integer Lloyd's, init = the subvectors of
    * the `ksub` smallest-id corpus vectors, empty cells keep their previous
    * centroid, ties to the lowest code). A corpus vector's PQ code is its
    * per-subspace argmin — `m` small integers standing in for `dim` floats
    * (64 floats → 4 codes here: 64× compression). A query precomputes its
    * distance table (d² to every sub-centroid, `m·ksub` longs); the ADC
    * scan approximates d²(q, x) as the sum of `m` table lookups, and only
    * the top `rerank·k` ADC candidates are reranked by exact integer d²
    * on the full vectors.
    *
    * Scale shape: codebooks and distance tables are tiny broadcasts
    * (m·ksub rows); training is `iters+1` corpus scans; the ADC scan
    * touches only codes (never the raw vectors), so the compressed corpus
    * is what streams through the shuffle; the rerank reads full vectors
    * for just |queries|·rerank·k candidates via a broadcast semijoin of the
    * pool against one corpus scan. No global windows: every row_number
    * partitions by cand_id or query_id. Output: (query_id, cand_id, dist,
    * rank) with dist the exact integer squared L2 of the reranked top-k. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
             m: Int = 4, ksub: Int = 8, iters: Int = 1, rerank: Int = 4,
             dim: Int = 64,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(dim % m == 0, s"dim=$dim not divisible by m=$m subspaces")
    import org.apache.spark.sql.expressions.Window
    val dsub = dim / m
    val corpusInt = corpus.select(col(idCol).as("cand_id"), toIntVec(col(vecCol)).as("cv"))
    // (cand_id, s, sv): the corpus exploded into its m subvectors
    def subspaces(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(id), posexplode(array(
        (0 until m).map(s => slice(col(vec), s * dsub + 1, dsub)): _*)).as(Seq("s", "sv")))
    val subv = subspaces(corpusInt, "cand_id", "cv")
    // init: every subspace's codebook starts from the subvectors of the
    // ksub smallest-id corpus vectors (TakeOrderedAndProject, then a window
    // over just ksub rows to number the codes)
    val iw = Window.orderBy(col("cand_id").asc)
    var cb = subspaces(
      corpusInt.orderBy(col("cand_id").asc).limit(ksub)
        .withColumn("code", row_number().over(iw) - 1),
      "code", "cv")
      .select(col("s"), col("code").cast("long").as("code"), col("sv").as("cvec"))
      .localCheckpoint()
    def argmin(rows: DataFrame, id: String, keep: Seq[Column]): DataFrame = {
      val w = Window.partitionBy(col(id), col("s")).orderBy(col("dist").asc, col("code").asc)
      rows.join(broadcast(cb), "s")
        .withColumn("dist", dist2Int(col("sv"), col("cvec")))
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(keep: _*)
    }
    for (_ <- 0 until iters) {
      val assigned = argmin(subv, "cand_id", Seq(col("s"), col("code"), col("sv")))
      val means = assigned
        .select(col("s"), col("code"), posexplode(col("sv")).as(Seq("pos", "v")))
        .groupBy("s", "code", "pos")
        .agg(floor(sum("v").cast("double") / count(lit(1))).cast("long").as("mm"))
        .groupBy("s", "code")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mm")))),
          t => t.getField("mm")).as("nvec"))
      cb = cb.join(means, Seq("s", "code"), "left")
        .select(col("s"), col("code"), coalesce(col("nvec"), col("cvec")).as("cvec"))
        .localCheckpoint() // m·ksub rows; keeps the iteration plan flat
    }
    // PQ encoding: (cand_id, s, code) — m codes per corpus vector
    val enc = argmin(subv, "cand_id", Seq(col("cand_id"), col("s"), col("code")))
    // per-query ADC distance tables: d²(query subvector, sub-centroid)
    val queriesInt = queries.select(col(idCol).as("query_id"), toIntVec(col(vecCol)).as("qv"))
    val dtab = subspaces(queriesInt, "query_id", "qv")
      .join(broadcast(cb), "s")
      .select(col("query_id"), col("s"), col("code"),
        dist2Int(col("sv"), col("cvec")).as("pd"))
    // ADC scan: m table lookups per (query, candidate), summed
    val adc = enc.join(broadcast(dtab), Seq("s", "code"))
      .where(col("query_id") =!= col("cand_id"))
      .groupBy("query_id", "cand_id").agg(sum("pd").as("adist"))
    val pw = Window.partitionBy("query_id").orderBy(col("adist").asc, col("cand_id").asc)
    val pool = adc.withColumn("prn", row_number().over(pw))
      .where(col("prn") <= rerank * k)
      .select(col("query_id"), col("cand_id"))
    // exact rerank on the ADC pool only
    val rw = Window.partitionBy("query_id").orderBy(col("dist").asc, col("cand_id").asc)
    corpusInt.join(broadcast(pool), "cand_id")
      .join(broadcast(queriesInt), "query_id")
      .withColumn("dist", dist2Int(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(rw)).where(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("dist"),
        col("rank").cast("long").as("rank"))
  }

  /** One-pass covariance SUFFICIENT STATISTICS over the embedding column —
    * the PCA / whitening / feature-correlation prep stage of a training-data
    * pipeline. Emits one row per upper-triangle coordinate pair (i ≤ j)
    * carrying everything covariance (or the Gram matrix, or Pearson
    * correlation) is a closed form of: n, Σxᵢ, Σxⱼ and Σxᵢxⱼ —
    * cov(i,j) = (s_ij − s_i·s_j/n)/n, derivable exactly by the consumer.
    *
    * Runs in the same scaled-integer domain as [[ivfTopKKMeans]]
    * (floor(x·2^20 + 0.5) longs), so every statistic is an exact,
    * order-independent integer sum — bit-identical across partitionings,
    * reruns and engines, and replayed verbatim by the DuckDB oracle.
    *
    * Scale shape: each vector expands to its d(d+1)/2 upper-triangle
    * products INSIDE one whole-stage-codegen'd generate stage and feeds a
    * hash aggregate — partial (map-side) aggregation collapses every
    * partition to ≤ d(d+1)/2 rows before the one shuffle, so shuffle volume
    * is O(d²·partitions), independent of row count; the per-coordinate sums
    * ride the same pattern (d rows/partition) and join back as a broadcast
    * of d rows. No windows, no driver collect. At 10^12 rows the long Σxᵢxⱼ
    * would near 2^63 — shard the corpus and merge stats (they are additive),
    * or widen the accumulator to decimal(38,0); the sandbox SFs stay below
    * 2^51. */
  def covarianceStats(df: DataFrame, dim: Int = 64,
                      vecCol: String = "embedding"): DataFrame = {
    val iv = df.select(toIntVec(col(vecCol)).as("v"))
    // (i, j, xi·xj) for j ≥ i, generated from the slice of v at offset i —
    // d(d+1)/2 structs per row, one generator, no self-join
    val tri = iv.select(explode(flatten(transform(col("v"), (xi, i) =>
        transform(slice(col("v"), i + lit(1), lit(dim) - i),
          (xj, jj) => struct(i.as("i"), (i + jj).as("j"),
            (xi * xj).as("p")))))).as("e"))
      .select(col("e.i"), col("e.j"), col("e.p"))
    val gram = tri.groupBy("i", "j").agg(sum("p").as("s_ij"))
    // materialized (d rows): joined twice below — without the checkpoint the
    // plan would re-scan the corpus once per join arm
    val sums = iv.select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("i").agg(sum("x").as("s"), count(lit(1)).as("n"))
      .localCheckpoint()
    gram
      .join(broadcast(sums.select(col("i"), col("s").as("s_i"), col("n"))), "i")
      .join(broadcast(sums.select(col("i").as("j"), col("s").as("s_j"))), "j")
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        col("n"), col("s_i"), col("s_j"), col("s_ij"))
  }

  /** Top principal component by FIXED-POINT power iteration over
    * [[covarianceStats]] — the direction PCA whitening, embedding-drift
    * monitoring and spectral outlier checks all start from.
    *
    * The heavy lifting is the one-pass distributed covariance pass; the
    * iteration itself operates on the d×d integer covariance numerators
    * (c_ij = n·Σxᵢxⱼ − Σxᵢ·Σxⱼ, exact longs), which are O(d²) NO MATTER the
    * corpus size — so they are collected (2080 longs at d=64, the same at
    * 10^12 rows) and iterated on the driver in exact integer arithmetic:
    *   c'ᵢⱼ = floor(cᵢⱼ / 2^28)        (keeps u below 2^59 at every SF)
    *   v₀   = (2^20, …, 2^20)
    *   uᵢ   = Σⱼ c'ᵢⱼ·vⱼ ;  q = max(1, floor(max|u| / 2^20))
    *   vᵢ   = floor(uᵢ / q)            (max-norm renormalize, floor division)
    * Every step is floor division by a positive integer, so the whole
    * trajectory — including the sign of the returned direction — is
    * bit-reproducible across engines; the DuckDB oracle replays the same
    * `iters` steps verbatim. A rank-0 (all-zero) covariance collapses v to
    * the zero vector after one step, same in both engines.
    *
    * Output: (i, v) — the unnormalized fixed-point direction; callers
    * needing a unit vector divide by its norm in their own precision. */
  def pcaPowerTop(df: DataFrame, dim: Int = 64, iters: Int = 8,
                  vecCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    pcaPowerVector(df, dim, iters, vecCol).zipWithIndex
      .map { case (x, i) => (i.toLong, x) }.toSeq.toDF("i", "v")
  }

  /** The raw fixed-point direction of [[pcaPowerTop]], for composition
    * (projection, whitening). */
  private[graft] def pcaPowerVector(df: DataFrame, dim: Int, iters: Int,
                                    vecCol: String): Array[Long] = {
    val S = 1048576L // 2^20 target max-norm
    val cs = covarianceStats(df, dim, vecCol).collect()
    val mat = Array.ofDim[Long](dim, dim)
    cs.foreach { r =>
      val (i, j) = (r.getLong(0).toInt, r.getLong(1).toInt)
      val c = Math.floorDiv(r.getLong(2) * r.getLong(5) -
        r.getLong(3) * r.getLong(4), 1L << 28)
      mat(i)(j) = c; mat(j)(i) = c
    }
    var v = Array.fill(dim)(S)
    for (_ <- 0 until iters) {
      val u = Array.tabulate(dim) { i =>
        var acc = 0L; var j = 0
        while (j < dim) { acc += mat(i)(j) * v(j); j += 1 }; acc
      }
      val q = math.max(1L, u.map(math.abs).max / S)
      v = u.map(Math.floorDiv(_, q))
    }
    v
  }

  /** Every embedding's exact integer projection onto the fixed-point top
    * principal component — the distributed per-row leg of the PCA family
    * (spectral outlier scores, 1-D quantization, whitening's first step).
    * The direction rides along as a d-long broadcast literal folded into
    * one codegen'd `aggregate(zip_with(...))` scan — no shuffle at all on
    * the projection pass itself (the only shuffles are inside the stats
    * pass that trains the direction). proj = Σ vᵢ·pcᵢ stays below 2^47
    * (2^20-scaled coords × 2^20-max-norm direction × d=64). */
  def pcaProject(df: DataFrame, dim: Int = 64, iters: Int = 8,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val pc = pcaPowerVector(df, dim, iters, vecCol)
    val pcCol = array(pc.map(lit): _*)
    df.select(col(idCol),
      aggregate(zip_with(toIntVec(col(vecCol)), pcCol, (a, b) => a * b),
        lit(0L), (acc, x) => acc + x).as("proj"))
  }

  /** Semantic benchmark DECONTAMINATION (the embedding-space complement of
    * `decontaminate_ngram`'s lexical overlap): a corpus vector is
    * contaminated when its max cosine against ANY benchmark vector reaches
    * `tau` — the "did an eval item leak into the training set, possibly
    * paraphrased" scan run before every training mix. The benchmark side
    * is small by definition, so it BROADCASTS and the corpus is scanned
    * once; the per-corpus-row max is partial-aggregated map-side, so the
    * one shuffle carries |corpus| rows, never |corpus|×|bench|. Emits
    * every corpus row's audit record (max_cos at 9 dp, the argmax bench id
    * with min-id tie-break, the drop verdict) — richer than a keep-list,
    * and the scoring math itself is what the hash gate pins. */
  def semanticDecontaminate(corpus: DataFrame, bench: DataFrame, tau: Double,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    // same guard as the frozen twin: an empty bench would silently emit
    // ZERO audit rows (empty cross product -> empty groupBy) instead of
    // one all-clear record per corpus vector — a caller anti-joining on
    // the verdict would drop the whole corpus
    require(!bench.isEmpty, "bench set must be non-empty")
    val b = bench.select(col(idCol).as("bench_id"), col(vecCol).as("bv"))
    corpus.select(col(idCol), col(vecCol).as("cv"))
      .join(broadcast(b))
      .select(col(idCol), col("bench_id"),
        round(cosine(col("cv"), col("bv")), 9).as("cos"))
      // argmax with deterministic ties: max struct orders by cos first,
      // then by -bench_id, so the surviving bench_id is the SMALLEST
      // among those sharing the (9 dp-rounded) max cosine
      .groupBy(col(idCol))
      .agg(max(struct(col("cos"), (-col("bench_id")).as("nid"))).as("m"))
      .select(col(idCol), col("m.cos").as("max_cos"),
        (-col("m.nid")).as("bench_id"),
        (col("m.cos") >= tau).as("contaminated"))
  }

  /** FROZEN-benchmark decontamination as a ROW-LOCAL kernel — the ingest
    * twin of [[semanticDecontaminate]]: the (small) benchmark set is
    * collected once and folded into a single codegen'd `aggregate(...)`
    * lambda over literal arrays, so each arriving vector computes its
    * (max_cos, argmax bench id) in one expression with ZERO joins and
    * ZERO state — scoring-at-ingest runs at scan speed on an append
    * stream. The fold carries (best_cos, best_id) as a struct through a
    * lambda variable (linear expression tree, not an inlined 3^n blowup),
    * recomputes each bench norm exactly as the batch form does (same IEEE
    * operation order, so the 9 dp-rounded cosines are identical), and
    * applies the same min-id tie-break at the rounded max. */
  def semanticDecontaminateFrozen(df: DataFrame, bench: Array[(Long, Array[Float])],
                                  tau: Double, idCol: String = "vec_id",
                                  vecCol: String = "embedding"): DataFrame = {
    require(bench.nonEmpty, "bench set must be non-empty")
    val bvecs = array(bench.map { case (_, v) =>
      array(v.map(lit).toSeq: _*) }.toSeq: _*)
    val bids = array(bench.map { case (id, _) => lit(id) }.toSeq: _*)
    val folded = aggregate(
      sequence(lit(1), lit(bench.length)),
      struct(lit(-2.0).as("cos"), lit(Long.MaxValue).as("bid")),
      (acc, i) => {
        val bv = element_at(bvecs, i)
        val bid = element_at(bids, i)
        val c = round(cosine(col(vecCol), bv), 9)
        val better = c > acc.getField("cos") ||
          (c === acc.getField("cos") && bid < acc.getField("bid"))
        when(better, struct(c.as("cos"), bid.as("bid"))).otherwise(acc)
      })
    df.select(col(idCol), folded.as("m"))
      .select(col(idCol), col("m.cos").as("max_cos"),
        col("m.bid").as("bench_id"),
        (col("m.cos") >= tau).as("contaminated"))
  }

  /** Exact all-pairs cosine ≥ threshold (baseline / oracle form; quadratic —
    * sandbox scales only). */
  def bruteForcePairs(df: DataFrame, threshold: Double,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(cosine(col("va"), col("vb")), 9).as("cos"))
      .where(col("cos") >= threshold)
  }
}
