package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** BM25 integer form vs hand-computed values and a plain-Scala mirror of
  * the exact rational formula (bit equality, no tolerance). */
class Bm25Spec extends AnyFunSuite with SparkTestBase {

  private val corpus = Seq(
    (1L, "a b a c"), // len 4, tf(a)=2
    (2L, "a d"),     // len 2, tf(a)=1
    (3L, "e e e"),   // len 3, tf(e)=3
    (4L, "x y z"))   // no query terms — must not be scored

  private def mirror(terms: Seq[String]): Map[Long, Long] = {
    val toks = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val n = toks.size.toLong
    val l = toks.map(_._2.size.toLong).sum
    val tf = for {
      (id, ts) <- toks; term <- terms
      c = ts.count(_ == term) if c > 0
    } yield (id, term, c.toLong)
    val dfm = tf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    tf.groupBy(_._1).view.mapValues(_.map { case (id, term, t) =>
      val len = toks.find(_._1 == id).get._2.size.toLong
      val df = dfm(term)
      (Bm25.Scale * (2 * n - 2 * df + 1) * (44 * t * l)) /
        ((2 * df + 1) * (20 * t * l + 6 * l + 18 * len * n))
    }.sum).toMap
  }

  test("topK == mirror; unmatched docs excluded; ranked 3 > 1 > 2") {
    import spark.implicits._
    val got = Bm25.topK(corpus.toDF("doc_id", "text"), "doc_id", "text",
        Seq("a", "e"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.map(_._1).toSeq == Seq(3L, 1L, 2L)) // rank order, doc 4 absent
    assert(got.toMap == mirror(Seq("a", "e")))
    // hand-computed with N=4, L=12:
    // doc3/e: idf 7/3, tf-part 1584/1008 → (1e6·7·1584) div (3·1008) = 3666666
    assert(got.toMap.apply(3L) == 3666666L)
    // doc1/a: idf 5/5, tf-part 1056/840 → (1e6·5·1056) div (5·840) = 1257142
    assert(got.toMap.apply(1L) == 1257142L)
  }

  test("k boundary truncates after the (score desc, doc_id asc) order") {
    import spark.implicits._
    val got = Bm25.topK(corpus.toDF("doc_id", "text"), "doc_id", "text",
        Seq("a", "e"), k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L, 1L))
  }

  test("multi-term doc sums per-term contributions") {
    import spark.implicits._
    val both = Seq((7L, "a e a e")) ++ corpus
    val got = Bm25.topK(both.toDF("doc_id", "text"), "doc_id", "text",
        Seq("a", "e"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = {
      val toks = both.map { case (id, t) => id -> t.split("\\s+").toSeq }
      val n = toks.size.toLong
      val l = toks.map(_._2.size.toLong).sum
      val tfs = for {
        (id, ts) <- toks; term <- Seq("a", "e")
        c = ts.count(_ == term) if c > 0
      } yield (id, term, c.toLong)
      val dfm = tfs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      tfs.groupBy(_._1).view.mapValues(_.map { case (id, term, t) =>
        val len = toks.find(_._1 == id).get._2.size.toLong
        val df = dfm(term)
        (Bm25.Scale * (2 * n - 2 * df + 1) * (44 * t * l)) /
          ((2 * df + 1) * (20 * t * l + 6 * l + 18 * len * n))
      }.sum).toMap
    }
    assert(got == m)
  }
}
