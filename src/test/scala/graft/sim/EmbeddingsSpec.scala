package graft.sim

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** IVF ANN properties: probing every cell degenerates to exact brute-force
  * top-k (the candidate set is the whole corpus), and partial probing keeps
  * per-query candidate work bounded by the probed inverted lists. */
class EmbeddingsSpec extends AnyFunSuite with SparkTestBase {

  private val dim = 8

  private def corpus(n: Int, seed: Long) = {
    import scala.jdk.CollectionConverters._
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      Row(i.toLong, (0 until dim).map(_ => rnd.nextFloat() * 2 - 1).toArray.toSeq)
    }
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)))))
  }

  private def sorted(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSeq.sortBy(t => (t._1, t._4))

  test("IVF with nProbe = nCells == exact brute-force top-k") {
    val c = corpus(80, 5L)
    val q = c.where(org.apache.spark.sql.functions.col("vec_id") < 10)
    val exact = sorted(Embeddings.bruteForceTopK(q, c, k = 4))
    val full = sorted(Embeddings.ivfTopK(q, c, k = 4, nCells = 6, nProbe = 6))
    assert(full == exact)
  }

  test("partial probing returns valid ranked results with bounded candidates") {
    val c = corpus(80, 7L)
    val q = c.where(org.apache.spark.sql.functions.col("vec_id") < 10)
    val approx = Embeddings.ivfTopK(q, c, k = 4, nCells = 8, nProbe = 2).collect()
    assert(approx.nonEmpty)
    // ranks are 1..k per query, cosines non-increasing within a query
    approx.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getLong(3))
      assert(byRank.map(_.getLong(3)).toSeq == (1L to byRank.size))
      val cosines = byRank.map(_.getDouble(2)).toSeq
      assert(cosines == cosines.sorted.reverse)
    }
    // approximate top-k scores never exceed the exact ones
    val exact = sorted(Embeddings.bruteForceTopK(q, c, k = 4))
      .groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._3).max }
    approx.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      assert(rows.map(_.getDouble(2)).max <= exact(qid) + 1e-12)
    }
  }

  // ---- trained (k-means) IVF ----

  /** Clustered corpus: `nClusters` well-separated centers, docs = center +
    * small noise. `skewedInit=true` places the first nCells docs (the
    * quantizer's init vectors) all inside cluster 0 — the adversarial init
    * that an UNTRAINED member-centroid quantizer cannot recover from. */
  private def clustered(n: Int, nClusters: Int, seed: Long,
                        skewedInit: Boolean, initK: Int) = {
    import scala.jdk.CollectionConverters._
    val rnd = new scala.util.Random(seed)
    val centers = Array.tabulate(nClusters, dim)((c, d) =>
      math.sin(c * 3.7 + d * 1.3).toFloat) // fixed, well-separated
    def point(cl: Int): Seq[Float] =
      (0 until dim).map(d => centers(cl)(d) + (rnd.nextFloat() - 0.5f) * 0.1f)
    val rows = (0 until n).map { i =>
      val cl =
        if (i < initK) { if (skewedInit) 0 else i % nClusters }
        else i % nClusters
      Row(i.toLong, point(cl))
    }
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)))))
  }

  /** Exact integer-L2 top-k ground truth, computed in plain Scala with the
    * same floor(x·2^20 + 0.5) scaling the engine uses. */
  private def intTopK(df: org.apache.spark.sql.DataFrame, nQ: Int, k: Int): Map[Long, Seq[Long]] = {
    val vecs = df.collect().map { r =>
      r.getLong(0) -> r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1048576.0 + 0.5).toLong).toArray
    }.toMap
    (0L until nQ.toLong).map { q =>
      val qv = vecs(q)
      val ranked = vecs.toSeq.filter(_._1 != q).map { case (id, v) =>
        var s = 0L; var i = 0
        while (i < v.length) { val d = qv(i) - v(i); s += d * d; i += 1 }
        (id, s)
      }.sortBy(t => (t._2, t._1)).take(k).map(_._1)
      q -> ranked
    }.toMap
  }

  private def recallOf(got: Array[Row], truth: Map[Long, Seq[Long]], k: Int): Double = {
    val byQ = got.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    val scores = truth.map { case (q, t) =>
      t.toSet.intersect(byQ.getOrElse(q, Set.empty)).size.toDouble / k
    }
    scores.sum / scores.size
  }

  test("k-means IVF with nProbe = nCells == exhaustive integer top-k") {
    val c = clustered(90, 6, 11L, skewedInit = false, initK = 6)
    val q = c.where(org.apache.spark.sql.functions.col("vec_id") < 12)
    val got = Embeddings.ivfTopKKMeans(q, c, k = 4, nCells = 6, nProbe = 6, iters = 2)
      .collect()
    val truth = intTopK(c, 12, 4)
    got.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      assert(rows.sortBy(_.getLong(3)).map(_.getLong(1)).toSeq == truth(qid),
        s"query $qid")
    }
  }

  test("training recovers from a skewed init: recall(iters=2) > recall(iters=0)") {
    // all 6 init vectors inside cluster 0 — member-centroids (iters=0) can
    // only serve cluster-0 geometry; two Lloyd's iterations must spread the
    // centroids enough to beat it at the same nProbe
    val c = clustered(120, 6, 13L, skewedInit = true, initK = 6)
    val q = c.where(org.apache.spark.sql.functions.col("vec_id") < 24)
    val truth = intTopK(c, 24, 4)
    val untrained = recallOf(
      Embeddings.ivfTopKKMeans(q, c, k = 4, nCells = 6, nProbe = 2, iters = 0).collect(),
      truth, 4)
    val trained = recallOf(
      Embeddings.ivfTopKKMeans(q, c, k = 4, nCells = 6, nProbe = 2, iters = 2).collect(),
      truth, 4)
    assert(trained > untrained,
      s"trained recall $trained should beat untrained $untrained")
    assert(trained >= 0.8, s"trained recall $trained below 0.8")
  }

  // ---- product quantization ----

  test("PQ with a full-corpus rerank pool == exhaustive integer top-k") {
    // rerank·k ≥ |corpus|-1 makes the ADC pool the whole corpus, so the
    // exact rerank must reproduce brute-force integer top-k regardless of
    // how lossy the 4-subspace codes are
    val c = clustered(60, 5, 19L, skewedInit = false, initK = 6)
    val q = c.where(org.apache.spark.sql.functions.col("vec_id") < 10)
    val got = Embeddings.pqTopK(q, c, k = 4, m = 4, ksub = 6, iters = 1,
      rerank = 15, dim = dim).collect()
    val truth = intTopK(c, 10, 4)
    got.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      assert(rows.sortBy(_.getLong(3)).map(_.getLong(1)).toSeq == truth(qid),
        s"query $qid")
    }
  }

  test("PQ ADC pruning keeps high recall on a clustered corpus") {
    val c = clustered(120, 6, 23L, skewedInit = false, initK = 8)
    val q = c.where(org.apache.spark.sql.functions.col("vec_id") < 24)
    val truth = intTopK(c, 24, 4)
    val r = recallOf(
      Embeddings.pqTopK(q, c, k = 4, m = 4, ksub = 8, iters = 1,
        rerank = 4, dim = dim).collect(),
      truth, 4)
    assert(r >= 0.8, s"PQ recall $r below 0.8 at rerank=4")
  }

  test("PQ is deterministic across runs and partitionings") {
    val c = clustered(80, 5, 29L, skewedInit = false, initK = 6)
    val q = c.where(org.apache.spark.sql.functions.col("vec_id") < 8)
    def run(cc: org.apache.spark.sql.DataFrame) =
      Embeddings.pqTopK(q, cc, k = 3, m = 2, ksub = 6, iters = 2,
        rerank = 3, dim = dim)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sortBy(t => (t._1, t._4))
    assert(run(c) == run(c))
    assert(run(c.repartition(7)) == run(c))
  }

  test("k-means IVF is deterministic across runs and partitionings") {
    val c = clustered(80, 5, 17L, skewedInit = false, initK = 5)
    val q = c.where(org.apache.spark.sql.functions.col("vec_id") < 8)
    def run() = Embeddings.ivfTopKKMeans(q, c, k = 3, nCells = 5, nProbe = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(t => (t._1, t._4))
    assert(run() == run())
    val rep = Embeddings.ivfTopKKMeans(q, c.repartition(7), k = 3, nCells = 5,
      nProbe = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(t => (t._1, t._4))
    assert(rep == run())
  }

  // ---- covariance sufficient statistics ----

  test("covarianceStats equals the driver-side brute force, any partitioning") {
    val c = corpus(60, 11L)
    // driver-side reference in the same integer domain
    val vecs = c.collect().map(_.getSeq[Float](1).map(x =>
      math.floor(x.toDouble * 1048576.0 + 0.5).toLong).toArray)
    val n = vecs.length.toLong
    val si = Array.tabulate(dim)(i => vecs.map(_(i)).sum)
    val expect = (for { i <- 0 until dim; j <- i until dim } yield
      (i.toLong, j.toLong, n, si(i), si(j),
        vecs.map(v => v(i) * v(j)).sum)).sorted
    def run(cc: org.apache.spark.sql.DataFrame) =
      Embeddings.covarianceStats(cc, dim = dim).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSeq.sorted
    assert(run(c) == expect)
    assert(run(c.repartition(7)) == expect)
    // every upper-triangle pair present exactly once
    assert(expect.size == dim * (dim + 1) / 2)
  }

  test("covarianceStats recovers a planted covariance exactly") {
    import scala.jdk.CollectionConverters._
    // two coordinates perfectly anti-correlated: x1 = -x0
    val rows = (0 until 40).map { i =>
      val x = (i % 7 - 3).toFloat / 4f
      Row(i.toLong, Seq(x, -x))
    }
    val df = spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)))))
    val m = Embeddings.covarianceStats(df, dim = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val (n, s0, s1, s01) = m((0L, 1L))
    val s00 = m((0L, 0L))._4
    val s11 = m((1L, 1L))._4
    assert(n == 40L && s1 == -s0)
    // cov numerator n·s01 − s0·s1 must be the exact negative of the
    // variance numerator n·s00 − s0² (x1 = −x0 ⇒ cov = −var)
    assert(n * s01 - s0 * s1 == -(n * s00 - s0 * s0))
    assert(s11 == s00)
  }

  test("pcaPowerTop recovers a planted dominant direction") {
    import scala.jdk.CollectionConverters._
    // docs = alpha * d1 + small noise, d1 the known dominant direction
    val d1 = Array(0.6f, -0.3f, 0.5f, 0.2f, -0.4f, 0.1f, 0.3f, -0.2f)
    val rnd = new scala.util.Random(3L)
    val rows = (0 until 120).map { i =>
      val a = (rnd.nextFloat() * 2 - 1) * 0.8f
      Row(i.toLong, d1.map(x => x * a + (rnd.nextFloat() - 0.5f) * 0.05f).toSeq)
    }
    val df = spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)))))
    val v = Embeddings.pcaPowerTop(df, dim = dim, iters = 8).collect()
      .sortBy(_.getLong(0)).map(_.getLong(1).toDouble)
    val n1 = math.sqrt(d1.map(x => x.toDouble * x).sum)
    val nv = math.sqrt(v.map(x => x * x).sum)
    assert(nv > 0)
    val cos = math.abs(d1.map(_.toDouble).zip(v).map { case (a, b) => a * b }.sum / (n1 * nv))
    assert(cos > 0.99, s"recovered direction cos=$cos, expected ≈1")
  }

  test("pcaPowerTop is deterministic across runs and partitionings") {
    val c = corpus(70, 19L)
    def run(cc: org.apache.spark.sql.DataFrame) =
      Embeddings.pcaPowerTop(cc, dim = dim, iters = 8).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val a = run(c)
    assert(a == run(c) && a == run(c.repartition(7)))
    assert(a.exists(_._2 != 0L)) // non-degenerate on a random corpus
  }

  test("pcaProject equals the driver-side dot with the power direction") {
    val c = corpus(50, 23L)
    val pc = Embeddings.pcaPowerTop(c, dim, iters = 8).collect()
      .sortBy(_.getLong(0)).map(_.getLong(1))
    val proj = Embeddings.pcaProject(c, dim, iters = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = c.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1048576.0 + 0.5).toLong))
    assert(vecs.nonEmpty && proj.size == vecs.length)
    vecs.foreach { case (id, v) =>
      assert(proj(id) == v.zip(pc).map { case (a, b) => a * b }.sum)
    }
  }

  test("covarianceStats plan has no single-partition exchange") {
    val c = corpus(60, 13L)
    val plan = Embeddings.covarianceStats(c, dim = dim)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      "covariance stats must aggregate in parallel, never via one partition")
  }

  // ---- semantic decontamination ----

  test("semanticDecontaminate flags exact AND perturbed bench leaks, nothing else") {
    import org.apache.spark.sql.functions._
    val c = corpus(60, 11L)
    // bench = 3 corpus vectors; plant one PARAPHRASED leak: vec 50 becomes
    // bench vec 7 with a small perturbation on the first coordinate (the
    // "eval item reworded into the training set" case cosine catches and
    // exact n-gram overlap misses)
    val bench = c.where(col("vec_id").isin(7L, 21L, 33L))
    // build the perturbed copy driver-side to keep the fixture explicit
    val benchVec = c.where(col("vec_id") === 7L)
      .collect()(0).getSeq[Float](1).toArray
    val near = benchVec.clone(); near(0) = near(0) + 0.01f
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val nearRow = spark.createDataFrame(
      Seq(org.apache.spark.sql.Row(50L, near.toSeq)).asJava,
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    val corpus2 = c.where(col("vec_id") =!= 50L).unionByName(nearRow)
    val out = Embeddings.semanticDecontaminate(corpus2, bench, tau = 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out.size == 60)
    val flagged = out.filter(_._2).keySet
    assert(flagged == Set(7L, 21L, 33L, 50L),
      s"expected the 3 exact leaks + the perturbed copy, got $flagged")
  }

  test("frozen row-local kernel == distributed semanticDecontaminate") {
    import org.apache.spark.sql.functions._
    val c = corpus(70, 17L)
    val benchDf = c.where(col("vec_id") % 9 === 0)
    val bench = benchDf.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    val dist = canon(Embeddings.semanticDecontaminate(c, benchDf, tau = 0.6))
    val frozen = canon(Embeddings.semanticDecontaminateFrozen(c, bench, tau = 0.6))
    assert(frozen == dist,
      "the literal-array fold must reproduce the broadcast-join form exactly")
  }

  test("semanticDecontaminate argmax bench id is deterministic under ties") {
    import org.apache.spark.sql.functions._
    val c = corpus(20, 13L)
    // duplicate bench vectors: ids 3 and 9 carry the IDENTICAL vector, so
    // every corpus row ties at its max — the reported bench_id must be the
    // smaller of the two for rows whose argmax is that shared vector
    val v3 = c.where(col("vec_id") === 3L).collect()(0).getSeq[Float](1)
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val dup = spark.createDataFrame(
      Seq(org.apache.spark.sql.Row(9L, v3)).asJava,
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    val bench = c.where(col("vec_id") === 3L).unionByName(dup)
    val out = Embeddings.semanticDecontaminate(c, bench, tau = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // corpus row 3 matches both bench copies at cosine 1.0 → min id wins
    assert(out(3L) == 3L)
  }
}
