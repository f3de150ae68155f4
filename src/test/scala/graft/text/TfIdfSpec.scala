package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** TfIdf.cosinePairs vs a plain-Scala mirror of the exact integer
  * arithmetic (weights, df-cut, norms, dot) — no tolerance on the integer
  * columns, exact 6-dp match on the one rounded double. */
class TfIdfSpec extends AnyFunSuite with SparkTestBase {

  // "z" appears in every doc (df 4) so maxDf=3 must cut it; docs 1/2 share
  // the rare "a b" profile (high cos), 3/4 share "c" (lower cos)
  private val corpus = Seq(
    (1L, "a a b z"),
    (2L, "a b z"),
    (3L, "c d z"),
    (4L, "c z b"))

  private def mirror(maxDf: Long, threshold: Double): Map[(Long, Long), (Long, Double)] = {
    val toks = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val tf = toks.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, o) => (id, t, o.size.toLong) } }
    val dfm = tf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      .filter(_._2 <= maxDf)
    val n = toks.size.toLong
    val w = tf.collect { case (id, t, f) if dfm.contains(t) =>
      (id, t, f * (n * TfIdf.Scale / dfm(t))) }
    val norms = w.groupBy(_._1).view.mapValues(_.map(x => x._3 * x._3).sum).toMap
    val byTerm = w.groupBy(_._2)
    val dots = byTerm.values.flatMap { ps =>
      for (a <- ps; b <- ps if a._1 < b._1) yield ((a._1, b._1), a._3 * b._3)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    dots.flatMap { case ((ia, ib), dot) =>
      val cos = BigDecimal(dot / (math.sqrt(norms(ia).toDouble) *
        math.sqrt(norms(ib).toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (cos >= threshold) Some((ia, ib) -> (dot, cos)) else None
    }.toMap
  }

  private def run(maxDf: Long, threshold: Double): Map[(Long, Long), (Long, Double)] = {
    import spark.implicits._
    TfIdf.cosinePairs(corpus.toDF("doc_id", "text"), "doc_id", "text",
        maxDf, threshold)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
  }

  test("pairs == integer mirror, stop word cut, tf > 1 exercised") {
    val got = run(maxDf = 3, threshold = 0.0)
    assert(got == mirror(3, 0.0))
    // z (df 4) was cut: docs 3 and 4 meet ONLY on c — one shared term
    assert(got.contains((3L, 4L)))
    // doc 1's tf(a)=2 separates its dot from doc 2's symmetric profile
    assert(got((1L, 2L))._2 > got((3L, 4L))._2)
  }

  test("threshold filters low-cosine pairs; no cut keeps the stop word") {
    val all = run(maxDf = 4, threshold = 0.0)
    assert(all == mirror(4, 0.0))
    // with z kept every pair shares a term → all 6 pairs present
    assert(all.size == 6)
    val high = run(maxDf = 4, threshold = 0.9)
    assert(high == mirror(4, 0.9))
    assert(high.keySet.subsetOf(all.keySet) && high.size < all.size)
  }

  test("maxDf = 0 terms would all be cut — rejected, not silently empty") {
    intercept[IllegalArgumentException] {
      TfIdf.cosinePairs(null, "doc_id", "text", maxDf = 0, threshold = 0.5)
    }
  }
}
