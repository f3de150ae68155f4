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

  test("piiRedact replaces whole planted matches; counts agree; clean text unchanged") {
    import spark.implicits._
    val rows = Seq(
      "reach user42@example.com today",             // email, full extent
      "call +1-555-010-2345 now",                   // phone, full extent
      "a user42@example.com b +44 201 555 0199 c",  // both; space-separated phone
      "no pii here at all",                         // clean
      "half@way and 555-010-2345")                  // no dotted TLD / no +CC
    val got = rows.toDF("text")
      .select(col("text"), TextOps.piiRedact(col("text")).as("r"),
        TextOps.piiCounts(col("text"))._1.as("ne"),
        TextOps.piiCounts(col("text"))._2.as("np"))
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(rows(0)) === (("reach <EMAIL> today", 1L, 0L)))
    assert(got(rows(1)) === (("call <PHONE> now", 0L, 1L)))
    assert(got(rows(2))._1 === "a <EMAIL> b <PHONE> c")
    assert(got(rows(3)) === ((rows(3), 0L, 0L)))
    // "half@way" lacks a dotted TLD tail → not an email; a phone without
    // the leading +CC is deliberately out of pattern (conservative false
    // negatives beat corrupting arithmetic like 555-010-2345 elsewhere)
    assert(got(rows(4)) === ((rows(4), 0L, 0L)))
  }

  test("curationFailMask: each rule bit fires alone and composes") {
    import spark.implicits._
    // 24 distinct 5-char words + 4 stopwords: n=28, distinct=28, alpha=130
    // ∈ [4n,5n]=[112,140] — all four rules pass
    val ok = (1 to 24).map(i => f"wd$i%03d").mkString(" ") + " the is of and"
    val rows = Seq(
      ok,                                               // 0: keep
      "and slope crane forks",                          // 1: too short (4 toks; alpha 18 ∈ [16,20])
      (1 to 30).map(i => f"x$i%03d").mkString(" "),     // 2: no stopword marker
      (("dup " * 26) + "the is").trim,                  // 4 (+8): dup-heavy
      (1 to 24).map(i => f"longword$i%02d").mkString(" ") +
        " the is of and",                               // 8: mean word len > 5
      "")                                               // empty: len+stop fail
    val got = rows.toDF("text")
      .select(col("text"), TextOps.curationFailMask(col("text")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got(rows(0)) == 0L)
    assert(got(rows(1)) == 1L)
    assert(got(rows(2)) == 2L)
    assert((got(rows(3)) & 4L) == 4L)
    assert(got(rows(4)) == 8L)
    assert(got(rows(5)) == 3L) // 0 toks: len fails, stop fails; dup/wordlen vacuous-pass
  }

  test("lineFilter: short and unterminated lines are excised, survivors re-joined") {
    import spark.implicits._
    val doc = "this first line is long enough to keep.\nshort one.\n" +
      "this line has enough words but no terminal period\n" +
      "the final line also qualifies with its period."
    val (nl, nk, clean) = TextOps.lineFilter(col("text"), minWords = 5)
    val r = Seq(doc).toDF("text")
      .select(nl.as("n_lines"), nk.as("n_kept"), clean.as("clean"))
      .collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L)
    assert(r.getString(2) ==
      "this first line is long enough to keep.\nthe final line also qualifies with its period.")
    // single-line doc with no qualifying line → everything excised
    val r2 = Seq("nope").toDF("text")
      .select(nl.as("n_lines"), nk.as("n_kept"), clean.as("clean")).collect()(0)
    assert(r2.getLong(0) == 1L && r2.getLong(1) == 0L && r2.getString(2) == "")
  }
}
