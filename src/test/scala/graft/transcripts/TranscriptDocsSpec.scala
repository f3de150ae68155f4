package graft.transcripts

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Brute-force gates for the chat→document render and the role-alternation
  * stats, on a planted fixture that is non-vacuous in both directions:
  * out-of-order input rows MUST be restored by turn_idx (a sort-free render
  * would emit a different doc), convs exist with and without alternation
  * violations, and null role/text exercise the coalesce seams. */
class TranscriptDocsSpec extends AnyFunSuite with SparkTestBase {

  private val schema = StructType(Seq(
    StructField("conv_id", StringType), StructField("turn_idx", IntegerType),
    StructField("role", StringType), StructField("text", StringType)))

  // conv a: alternating, delivered REVERSED (render must reorder);
  // conv b: user,user,assistant — one repeat; null text on one turn;
  // conv c: single turn with null role
  private val turns = Seq(
    ("a", 3, "user", "t3"), ("a", 2, "assistant", "t2"), ("a", 1, "user", "t1"),
    ("b", 1, "user", "hi"), ("b", 2, "user", null), ("b", 3, "assistant", "yo"),
    ("c", 1, null, "solo"))

  private def df(parts: Int) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      turns.map(t => Row(t._1, t._2, t._3, t._4)).asJava, schema)
      .repartition(parts)
  }

  test("render restores turn order, joins with separator, coalesces nulls") {
    val got = TranscriptDocs.render(df(5)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    val expect = Seq(
      ("a", 3L, "user:t1\nassistant:t2\nuser:t3"),
      ("b", 3L, "user:hi\nuser:\nassistant:yo"),
      ("c", 1L, ":solo"))
    assert(got.toSeq == expect)
  }

  test("render is parallelism-invariant") {
    def rows(p: Int) = TranscriptDocs.render(df(p)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sortBy(_._1).toSeq
    assert(rows(1) == rows(7))
  }

  test("roleStats counts adjacent same-role turns; null role never repeats") {
    val got = TranscriptDocs.roleStats(df(3)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // b has exactly one user→user repeat; a none; c's null role counts none
    assert(got.toSeq == Seq(("a", 3L, 0L), ("b", 3L, 1L), ("c", 1L, 0L)))
  }

  test("roleStats: consecutive null roles do not count as repeats (= semantics)") {
    import scala.jdk.CollectionConverters._
    val d = spark.createDataFrame(Seq(
      Row("n", 1, null, "x"), Row("n", 2, null, "y"), Row("n", 3, "user", "z"),
      Row("n", 4, "user", "w")).asJava, schema)
    val r = TranscriptDocs.roleStats(d).collect()(0)
    assert((r.getString(0), r.getLong(1), r.getLong(2)) == (("n", 4L, 1L)))
  }

  test("sftPairs: bounded context window, oldest-first, short history trims") {
    import scala.jdk.CollectionConverters._
    // 7-turn conv delivered SHUFFLED; assistant turns at 2 (1 turn of
    // history — shorter than the window), 5 and 7 (full 4-turn windows)
    val d = spark.createDataFrame(Seq(
      Row("s", 5, "assistant", "a5"), Row("s", 1, "user", "u1"),
      Row("s", 7, "assistant", "a7"), Row("s", 3, "user", "u3"),
      Row("s", 2, "assistant", "a2"), Row("s", 6, "user", "u6"),
      Row("s", 4, "user", "u4")).asJava, schema).repartition(5)
    val got = TranscriptDocs.sftPairs(d, "assistant", ctxTurns = 4).collect()
      .map(r => (r.getLong(1), r.getString(2), r.getString(3))).sortBy(_._1)
    val expect = Seq(
      (2L, "user:u1", "a2"),
      (5L, "user:u1\nassistant:a2\nuser:u3\nuser:u4", "a5"),
      (7L, "user:u3\nuser:u4\nassistant:a5\nuser:u6", "a7"))
    assert(got.toSeq == expect,
      "prompt must be exactly the last <=4 prior turns, oldest first")
  }

  test("preferencePairs: reward ranking, deterministic ties, <2 targets drop") {
    import scala.jdk.CollectionConverters._
    val vschema = StructType(Seq(
      StructField("conv_id", StringType), StructField("turn_idx", IntegerType),
      StructField("role", StringType), StructField("text", StringType),
      StructField("value", DoubleType)))
    val d = spark.createDataFrame(Seq(
      // conv p: clear best (t4, 9.0) and worst (t2, 1.0); user turns ignored
      Row("p", 1, "user", "u1", 5.0), Row("p", 2, "assistant", "bad", 1.0),
      Row("p", 3, "user", "u3", 7.0), Row("p", 4, "assistant", "good", 9.0),
      // conv q: ALL-EQUAL rewards — chosen must be min idx, rejected max idx
      Row("q", 1, "assistant", "a", 3.0), Row("q", 2, "assistant", "b", 3.0),
      Row("q", 3, "assistant", "c", 3.0),
      // conv s: single target — no pair
      Row("s", 1, "assistant", "solo", 8.0)).asJava, vschema).repartition(5)
    val got = TranscriptDocs.preferencePairs(d, "assistant", "value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getLong(4), r.getString(5), r.getDouble(6)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      ("p", 4L, "good", 9.0, 2L, "bad", 1.0),
      ("q", 1L, "a", 3.0, 3L, "c", 3.0)))
  }

  test("sftPairs == brute force on seeded random conversations (3 seeds)") {
    import scala.jdk.CollectionConverters._
    val roles = Seq("user", "assistant", "tool", null)
    for (seed <- Seq(101L, 202L, 303L)) {
      val rnd = new scala.util.Random(seed)
      val turns = for {
        c <- 0 until 12
        n = 1 + rnd.nextInt(9)
        i <- 1 to n
      } yield (s"c$c", i, roles(rnd.nextInt(roles.size)),
        if (rnd.nextInt(10) == 0) null else s"x${rnd.nextInt(50)}")
      val ctxN = 1 + rnd.nextInt(4)
      // brute force: per conv, window of the <= ctxN immediately prior turns
      def piece(r: String, t: String) =
        (if (r == null) "" else r) + ":" + (if (t == null) "" else t)
      val expect = turns.groupBy(_._1).flatMap { case (c, ts) =>
        val s = ts.sortBy(_._2)
        s.zipWithIndex.collect {
          case ((_, idx, role, text), pos) if role == "assistant" && idx > 1 =>
            val ctx = s.slice(math.max(0, pos - ctxN), pos)
              .map(t => piece(t._3, t._4))
            (c, idx.toLong, ctx.mkString("\n"), text)
        }
      }.toSet
      val shuffled = rnd.shuffle(turns)
      val df = spark.createDataFrame(
        shuffled.map(t => Row(t._1, t._2, t._3, t._4)).asJava, schema)
        .repartition(5)
      val got = TranscriptDocs.sftPairs(df, "assistant", ctxN).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
        .toSet
      assert(got == expect, s"seed=$seed ctxTurns=$ctxN")
    }
  }

  test("preferencePairs == brute force on seeded random rewards (3 seeds)") {
    import scala.jdk.CollectionConverters._
    val vschema = StructType(Seq(
      StructField("conv_id", StringType), StructField("turn_idx", IntegerType),
      StructField("role", StringType), StructField("text", StringType),
      StructField("value", DoubleType)))
    for (seed <- Seq(11L, 22L, 33L)) {
      val rnd = new scala.util.Random(seed)
      val turns = for {
        c <- 0 until 15
        n = 1 + rnd.nextInt(6)
        i <- 1 to n
      } yield (s"c$c", i, if (rnd.nextInt(3) == 0) "user" else "assistant",
        s"t$i", if (rnd.nextInt(8) == 0) null
                else java.lang.Double.valueOf(rnd.nextInt(5).toDouble))
      val expect = turns.groupBy(_._1).flatMap { case (c, ts) =>
        val tgt = ts.filter(t => t._3 == "assistant" && t._5 != null)
        if (tgt.size < 2) None
        else {
          val ch = tgt.minBy(t => (-t._5.doubleValue, t._2))
          val rj = tgt.minBy(t => (t._5.doubleValue, -t._2))
          Some((c, ch._2.toLong, ch._4, ch._5.doubleValue,
            rj._2.toLong, rj._4, rj._5.doubleValue))
        }
      }.toSet
      val df = spark.createDataFrame(
        rnd.shuffle(turns).map(t => Row(t._1, t._2, t._3, t._4, t._5)).asJava,
        vschema).repartition(4)
      val got = TranscriptDocs.preferencePairs(df, "assistant", "value")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
          r.getDouble(3), r.getLong(4), r.getString(5), r.getDouble(6))).toSet
      assert(got == expect, s"seed=$seed")
    }
  }

  test("sftPairs: turn 1 targets emit nothing; parallelism-invariant") {
    import scala.jdk.CollectionConverters._
    val d = spark.createDataFrame(Seq(
      Row("x", 1, "assistant", "a1"), Row("x", 2, "user", "u2")).asJava, schema)
    assert(TranscriptDocs.sftPairs(d, "assistant").count() == 0)
    def rows(p: Int) = TranscriptDocs.sftPairs(df(p), "assistant", 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(rows(1) == rows(7) && rows(1).nonEmpty)
  }
}
