package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Gopher-style repetition metrics: hand-computed fixtures, empty-input
  * zeros, and the planted-tail non-vacuity the driver entry relies on. */
class RepetitionSpec extends AnyFunSuite with SparkTestBase {

  private def stats(text: String): (Double, Double, Double) = {
    import spark.implicits._
    val row = Seq(text).toDF("text").select(
      TextOps.dupTokenFrac(col("text")),
      TextOps.topTokenFrac(col("text")),
      TextOps.dupNgramFrac(col("text"), 3)).head()
    (row.getDouble(0), row.getDouble(1), row.getDouble(2))
  }

  test("hand-computed fractions") {
    // tokens: a b a b c → 5 tokens, 3 distinct → dup 0.4; top 'a' 2/5
    // 3-grams: [a b a][b a b][a b c] → 3 distinct of 3 → dup 0
    val (d, t, g) = stats("a b a b c")
    assert(math.abs(d - 0.4) < 1e-12)
    assert(math.abs(t - 0.4) < 1e-12)
    assert(g == 0.0)
    // x x x x: dup 0.75, top 1.0, 3-grams [x x x][x x x] → dup 0.5
    val (d2, t2, g2) = stats("x x x x")
    assert(math.abs(d2 - 0.75) < 1e-12 && t2 == 1.0 && math.abs(g2 - 0.5) < 1e-12)
  }

  test("empty and sub-n inputs give zeros, not nulls or NaN") {
    assert(stats("") == ((0.0, 0.0, 0.0)))
    assert(stats("  ") == ((0.0, 0.0, 0.0)))
    val (d, t, g) = stats("one two") // < 3 tokens → no 3-grams
    assert(g == 0.0 && d == 0.0 && t == 0.5)
  }

  test("the driver entry's planted tail guarantees a duplicate 3-gram") {
    // unique text + ' r1 r2 r3 r1 r2 r3' must yield dup_3gram_frac > 0
    val (_, _, g) = stats("alpha beta gamma r1 r2 r3 r1 r2 r3")
    assert(g > 0.0)
  }
}
