package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Bigram surprisal: brute-force equality on a hand-countable fixture,
  * sub-bigram docs, and the row-local (window-free) bigram plan. */
class BigramLmSpec extends AnyFunSuite with SparkTestBase {

  // corpus bigrams: (a,b)×2 [docs 0,1], (b,a)×1, (a,c)×1 [doc 1]
  // contexts: c(a·)=3, c(b·)=1
  // odds: (a,b) = 3*65536/2 = 98304; (b,a) = 1*65536/1 = 65536
  //       (a,c) = 3*65536/1 = 196608
  private val fixture = Seq(
    (0L, "a b"),       // nbig 1, surprisal 98304
    (1L, "a b a c"),   // nbig 3, surprisal 98304 + 65536 + 196608 = 360448
    (2L, "solo"),      // one token → 0/0
    (3L, ""),          // empty → 0/0
    (4L, "   "))       // whitespace-only → 0/0

  test("bigramScore == hand-computed conditional odds; short docs report 0/0") {
    import spark.implicits._
    val got = BigramLm.bigramScore(fixture.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      0L -> ((1L, 98304L)), 1L -> ((3L, 360448L)),
      2L -> ((0L, 0L)), 3L -> ((0L, 0L)), 4L -> ((0L, 0L))))
  }

  test("floor division binds: 4*65536/3 truncates per occurrence") {
    import spark.implicits._
    // "a b a b a b a c": bigrams (a,b)×3, (b,a)×3, (a,c)×1 → c(a·)=4,
    // c(b·)=3. odds(a,b) = floor(4·65536/3) = 87381 (truncated),
    // odds(b,a) = 65536, odds(a,c) = 262144.
    // sum = 3·87381 + 3·65536 + 262144 = 720895, nbig = 7
    val got = BigramLm.bigramScore(Seq((0L, "a b a b a b a c")).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(got === ((7L, 720895L)))
  }

  test("frozen dict: out-of-vocabulary bigrams drop from nbig and the sum") {
    import spark.implicits._
    val train = Seq((0L, "a b")).toDF("doc_id", "text") // dict: (a,b) odds 65536
    val dict = BigramLm.oddsDict(BigramLm.bigrams(train, "doc_id", "text"))
    val got = BigramLm.scoreAgainst(
        Seq((7L, "a b z q a b")).toDF("doc_id", "text"), "doc_id", "text", dict)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    // 5 bigrams, only the two (a,b) occurrences are in-dict
    assert(got === ((7L, 2L, 131072L)))
  }

  test("bigram formation is row-local: no Window in the plan") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, s"t${i % 5} t${i % 3} t${i % 7}"))
      .toDF("doc_id", "text")
    val plan = BigramLm.bigramScore(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "bigrams must come from slice+zip+explode, not a per-doc lead window")
    assert(!plan.contains("Exchange SinglePartition"))
  }
}
