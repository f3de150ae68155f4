package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** BPE-ish pre-tokenizer counts: the Catalyst expression must agree with a
  * direct java.util.regex mirror on strings that exercise every branch of
  * the pattern (contraction suffixes, letter runs, digit runs, punctuation
  * runs, mixed classes, unicode letters, empties). */
class TextOpsSpec extends AnyFunSuite with SparkTestBase {

  private val fixtures = Seq(
    "Hello, world! I'm fine... 123 tokens",
    "don't stop me now",
    "a1b2 c-d_e",
    "", "   ", "\t\n",
    "naïve café déjà-vu",      // unicode letters
    "x'll y've z're q'd",      // all contraction branches
    "42 4,200 3.14159",        // digit runs split by punctuation
    "!!!???...",               // pure punctuation run
    "snake_case camelCase kebab-case",
    "it's it's it's",
    "ab! c") // vertical tab: Java \s and RE2 \s disagree on it —
                   // the explicit whitespace class must treat it as a gap

  private def mirror(s: String): Long = {
    val m = java.util.regex.Pattern.compile(TextOps.bpePattern).matcher(s)
    var n = 0L
    while (m.find()) n += 1
    n
  }

  test("tokenCountBpe == java.util.regex mirror on every branch") {
    import spark.implicits._
    val got = fixtures.toDF("text")
      .select(col("text"), TextOps.tokenCountBpe(col("text")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (s <- fixtures)
      assert(got(s) == mirror(s), s"'$s': got ${got(s)}, mirror ${mirror(s)}")
    // sanity: the BPE count genuinely differs from the whitespace count
    assert(got("Hello, world! I'm fine... 123 tokens") == 10)
    assert(got("don't stop me now") == 5)
    assert(got("a1b2 c-d_e") == 9)
    assert(got("") == 0 && got("   ") == 0)
    assert(got("ab! c") == 4) // a, b, !, ' c' — U+000B is a gap
  }
}
