package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** BPE merge counting: hand-weighted pairs, histogram (not stream)
  * weighting, the EOW sentinel, deterministic k-boundary, and the
  * TakeOrdered plan. */
class BpeSpec extends AnyFunSuite with SparkTestBase {

  private val E = Bpe.Eow

  test("pairs weight by word frequency; EOW closes every word") {
    import spark.implicits._
    // words: ab x3, cd x1, a x1 → (a,b)=3, (b,E)=3, (c,d)=1, (d,E)=1, (a,E)=1
    val docs = Seq((0L, "ab ab cd"), (1L, "ab a")).toDF("doc_id", "text")
    val got = Bpe.topMerges(docs, "doc_id", "text", k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("a", "b", 3L), ("b", E, 3L), ("a", E, 1L)))
  }

  test("distinct-word counting: repeating a word changes cnt, not the pair set") {
    import spark.implicits._
    val once = Bpe.topMerges(Seq((0L, "xy")).toDF("doc_id", "text"),
      "doc_id", "text", 10).collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val five = Bpe.topMerges(Seq((0L, "xy xy xy xy xy")).toDF("doc_id", "text"),
      "doc_id", "text", 10).collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(once === Set(("x", "y", 1L), ("y", E, 1L)))
    assert(five === Set(("x", "y", 5L), ("y", E, 5L)))
  }

  test("top-k boundary ties break by (p1, p2)") {
    import spark.implicits._
    // pairs (a,b),(b,E),(c,d),(d,E) all cnt=1; ordered by (cnt desc, p1,
    // p2) the k=2 cut is exactly (a,b),(b,E)
    val got = Bpe.topMerges(Seq((0L, "ab cd")).toDF("doc_id", "text"),
      "doc_id", "text", 2).collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("a", "b"), ("b", E)))
  }

  test("plan is TakeOrdered, not a global sort or single-partition window") {
    import spark.implicits._
    val docs = (0L until 50L).map(i => (i, s"w${i % 9} w${i % 4}")).toDF("doc_id", "text")
    val plan = Bpe.topMerges(docs, "doc_id", "text", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("Window"))
  }

  test("frozen tokenizer: rank-1 merge matches the live trainer on sf0.01") {
    val sf = "/root/testdata/sf0.01/documents.parquet"
    assume(new java.io.File(sf).exists())
    val top = Bpe.topMerges(spark.read.parquet(sf), "doc_id", "text", 1)
      .collect().map(r => (r.getString(0), r.getString(1))).head
    assert(top === Bpe.FrozenMerges.head)
  }

  test("encodeWord applies merges in rank order, EOW merges included") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 'newer': n e w e r $ → (e,r): n e w er $ → (er,$): n e w er$ →
    // (o,w)/(ow,$) don't apply, (e,$)/(n,$) don't apply mid-word
    val got = Seq("newer", "on", "we")
      .toDF("w").select(Bpe.encodeWord(col("w")).as("e"))
      .collect().map(_.getString(0)).toSeq
    val E = Bpe.Eow
    assert(got == Seq(
      s"~n~e~w~er$E~",   // (e,r) then (er,EOW)
      s"~o~n$E~",        // (n,EOW); (o,w) needs a 'w' after 'o'
      s"~w~e$E~"))       // (e,EOW)
  }
}
