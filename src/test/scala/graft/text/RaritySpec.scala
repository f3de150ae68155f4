package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Token rarity: brute-force equality on a hand-rankable fixture, empty
  * docs, occurrence (not distinct) semantics, and the plan switch. */
class RaritySpec extends AnyFunSuite with SparkTestBase {

  // corpus: "a" ×4, "b" ×2, "c" ×1 → ranks a=0, b=1, c=2
  private val fixture = Seq(
    (0L, "a a b"),   // ntok 3, rarity 0+0+1 = 1
    (1L, "a b c a"), // ntok 4, rarity 0+1+2+0 = 3
    (2L, ""),        // empty → 0/0
    (3L, "   "))     // whitespace-only → 0/0

  test("tokenRarity == hand-computed ranks; empty docs report 0/0") {
    import spark.implicits._
    val got = Rarity.tokenRarity(fixture.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      0L -> ((3L, 1L)), 1L -> ((4L, 3L)), 2L -> ((0L, 0L)), 3L -> ((0L, 0L))))
  }

  test("frequency ties rank by token string") {
    import spark.implicits._
    // "x" and "y" both ×1 → x=0, y=1 (tie on c, lexicographic)
    val got = Rarity.tokenRarity(Seq((0L, "x y")).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(got === ((2L, 1L))) // 0 + 1
  }

  test("window and scan rank paths emit identical rows") {
    import spark.implicits._
    val docs = (0L until 60L).map(i => (i, s"t${i % 11} t${i % 7} t${i % 3}"))
      .toDF("doc_id", "text")
    def run(maxRows: Long) =
      Rarity.tokenRarity(docs, "doc_id", "text", windowMaxRows = maxRows)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(Long.MaxValue) === run(0L))
  }

  test("scan-path plan carries no single-partition exchange") {
    import spark.implicits._
    val docs = (0L until 60L).map(i => (i, s"t${i % 11} t${i % 7} t${i % 3}"))
      .toDF("doc_id", "text")
    val plan = Rarity.tokenRarity(docs, "doc_id", "text", windowMaxRows = 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      "past the vocab threshold the rank must not funnel through one task")
  }
}
